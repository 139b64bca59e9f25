#!/usr/bin/env python3
"""Generate lossless WebP (VP8L) test fixtures for WebpSpec using the system
libwebp (ground truth encoder). Dev tooling only — the engine's decoder is
pure JVM; these blobs pin it against the reference implementation.

Each fixture <name>.webp is paired with <name>.expect:
  expect = [width:i32][height:i32][channels:i32]
           [pixels: height*width*channels bytes, row-major, RGB or RGBA]
All little-endian. Lossless encoding ⇒ expected pixels ARE the encoder
input, but we still round-trip through WebPDecodeRGBA so the .expect bytes
are libwebp's own decode (identical for VP8L; keeps the contract uniform).

Usage: python3 tools/make_webp_fixtures.py <outDir>
"""
import ctypes
import struct
import sys
from pathlib import Path

import numpy as np

L = ctypes.CDLL("libwebp.so.7")
L.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
L.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
L.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)


def encode(data, channels):
    h, w = data.shape[:2]
    raw = np.ascontiguousarray(data, dtype=np.uint8).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    fn = L.WebPEncodeLosslessRGB if channels == 3 else L.WebPEncodeLosslessRGBA
    n = fn(raw, w, h, w * channels, ctypes.byref(out))
    assert n > 0, "libwebp encode failed"
    blob = ctypes.string_at(out, n)
    L.WebPFree(out)
    return blob


def decode_rgba(blob):
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    p = L.WebPDecodeRGBA(blob, ctypes.c_size_t(len(blob)),
                         ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp decode failed"
    px = np.frombuffer(ctypes.string_at(p, w.value * h.value * 4),
                       dtype=np.uint8).reshape(h.value, w.value, 4).copy()
    L.WebPFree(p)
    return px


def write(outdir, name, data, channels):
    blob = encode(data, channels)
    px = decode_rgba(blob)[:, :, :channels]
    assert np.array_equal(px, data), f"{name}: lossless round-trip mismatch"
    (outdir / f"{name}.webp").write_bytes(blob)
    h, w = data.shape[:2]
    (outdir / f"{name}.expect").write_bytes(
        struct.pack("<iii", w, h, channels) + px.tobytes())
    print(f"{name}: {w}x{h}x{channels} webp={len(blob)}B")


def main(outdir):
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)

    # 1. tiny flat color — exercises simple huffman codes / trivial paths
    flat = np.full((4, 4, 3), (10, 200, 30), dtype=np.uint8)
    write(outdir, "flat_4x4_rgb", flat, 3)

    # 2. smooth gradient — predictor transform territory
    yy, xx = np.mgrid[0:64, 0:64]
    grad = np.stack([(xx * 4) % 256, (yy * 4) % 256, (xx + yy) % 256],
                    axis=-1).astype(np.uint8)
    write(outdir, "gradient_64x64_rgb", grad, 3)

    # 3. random noise — stresses full huffman alphabet + color cache
    noise = rng.integers(0, 256, (57, 43, 3), dtype=np.uint8)
    write(outdir, "noise_57x43_rgb", noise, 3)

    # 4. few-color image — palette (color-indexing) transform, pixel packing
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]],
                   dtype=np.uint8)
    idx = rng.integers(0, 4, (33, 70))
    write(outdir, "palette4_70x33_rgb", pal[idx], 3)

    # 5. many-color palette (no pixel packing, >16 colors)
    pal2 = rng.integers(0, 256, (48, 3), dtype=np.uint8)
    idx2 = rng.integers(0, 48, (40, 40))
    write(outdir, "palette48_40x40_rgb", pal2[idx2], 3)

    # 6. RGBA with a real alpha channel (alpha kept nonzero: libwebp's
    # default lossless mode may rewrite RGB under fully-transparent pixels)
    rgba = np.dstack([grad[:32, :32],
                      (1 + (xx[:32, :32] * 8) % 255).astype(np.uint8)])
    write(outdir, "gradient_32x32_rgba", rgba, 4)

    # 7. repeated tiles — LZ77 backward references
    tile = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    rep = np.tile(tile, (16, 16, 1))
    write(outdir, "repeat_128x128_rgb", rep, 3)

    # 8. large natural-ish image — multiple huffman groups (meta-huffman)
    yy2, xx2 = np.mgrid[0:256, 0:256]
    nat = np.stack([
        (128 + 90 * np.sin(xx2 / 9.0) + 30 * np.cos(yy2 / 13.0)),
        (128 + 90 * np.cos(xx2 / 17.0) * np.sin(yy2 / 7.0)),
        (xx2 // 2 + yy2 // 4),
    ], axis=-1)
    nat = np.clip(nat + rng.normal(0, 14, nat.shape), 0, 255).astype(np.uint8)
    write(outdir, "natural_256x256_rgb", nat, 3)

    # 9. 1-pixel and 1-row edge cases
    write(outdir, "one_1x1_rgb", np.array([[[7, 77, 177]]], dtype=np.uint8), 3)
    row = rng.integers(0, 256, (1, 97, 3), dtype=np.uint8)
    write(outdir, "row_97x1_rgb", row, 3)

    # 10. grayscale-as-rgb (subtract-green friendly)
    g = ((xx + 2 * yy) % 256).astype(np.uint8)
    write(outdir, "gray_64x64_rgb", np.stack([g, g, g], axis=-1), 3)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/webp")
