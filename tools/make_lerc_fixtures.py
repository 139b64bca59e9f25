#!/usr/bin/env python3
"""Generate LERC (Lerc2 v5/v6) test fixtures for LercSpec using the system
liblerc (ground truth encoder). Dev tooling only — the engine's decoder is
pure JVM; these blobs pin it against the reference implementation.

Each fixture <name>.lerc2 is paired with <name>.expect:
  expect = [nRows:i32][nCols:i32][nDim:i32][dataType:i32]
           [mask bytes: nRows*nCols, 1=valid]
           [values: nRows*nCols*nDim in the NATIVE dtype, LE, invalid = 0]
All little-endian. Values are the ground-truth decode by liblerc itself
(NOT the encoder input), so lossy fixtures pin exact reconstruction.

Usage: python3 tools/make_lerc_fixtures.py <outDir>
"""
import ctypes
import struct
import sys
from pathlib import Path

import numpy as np

L = ctypes.CDLL("libLerc.so.4")
DT_NP = {0: np.int8, 1: np.uint8, 2: np.int16, 3: np.uint16,
         4: np.int32, 5: np.uint32, 6: np.float32, 7: np.float64}


def encode(ver, data, dt, maxz=0.0, ndim=1, mask=None):
    h, w = data.shape[:2]
    buf = ctypes.create_string_buffer(8 * 1024 * 1024)
    nb = ctypes.c_uint(0)
    pv = mask.ctypes.data_as(ctypes.c_char_p) if mask is not None else None
    st = L.lerc_encodeForVersion(
        np.ascontiguousarray(data).ctypes.data_as(ctypes.c_void_p),
        ver, dt, ndim, w, h, 1, 1 if mask is not None else 0, pv,
        ctypes.c_double(maxz), buf, len(buf), ctypes.byref(nb))
    assert st == 0, f"lerc_encode status {st}"
    return bytes(buf[:nb.value])


def native_decode(blob, dt, w, h, ndim):
    out = np.zeros((h, w, ndim), dtype=DT_NP[dt])
    m = np.zeros((h, w), dtype=np.uint8)
    st = L.lerc_decode(blob, len(blob), 1, m.ctypes.data_as(ctypes.c_char_p),
                       ndim, w, h, 1, dt, out.ctypes.data_as(ctypes.c_void_p))
    assert st == 0, f"lerc_decode status {st}"
    return out, m


def write_fixture(outdir, name, blob, dt, w, h, ndim):
    vals, mask = native_decode(blob, dt, w, h, ndim)
    vals = vals.copy()
    vals[mask == 0] = 0
    (outdir / f"{name}.lerc2").write_bytes(blob)
    exp = struct.pack('<4i', h, w, ndim, dt) + mask.tobytes() + vals.tobytes()
    (outdir / f"{name}.expect").write_bytes(exp)
    print(f"{name}: blob {len(blob)}B")


def main(outdir):
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(42)

    grad16 = np.arange(256, dtype=np.uint8).reshape(16, 16)
    m1 = np.ones((16, 16), np.uint8); m1[0, 0] = 0; m1[5, 7] = 0
    skew = np.where(rng.rand(32, 32) < 0.85, 9,
                    rng.randint(0, 256, (32, 32))).astype(np.uint8)
    rows = np.repeat(np.arange(16, dtype=np.uint8) * 15, 16).reshape(16, 16)
    deadm = np.ones((24, 24), np.uint8); deadm[8:16, 8:16] = 0

    for ver in (5, 6):
        v = f"v{ver}"
        write_fixture(outdir, f"{v}_u8_grad", encode(ver, grad16, 1), 1, 16, 16, 1)
        write_fixture(outdir, f"{v}_u8_grad_masked",
                      encode(ver, grad16, 1, mask=m1), 1, 16, 16, 1)
        noise = rng.randint(0, 256, (16, 16)).astype(np.uint8)
        write_fixture(outdir, f"{v}_u8_noise_sweep", encode(ver, noise, 1), 1, 16, 16, 1)
        write_fixture(outdir, f"{v}_u8_huff_plain", encode(ver, skew, 1), 1, 32, 32, 1)
        write_fixture(outdir, f"{v}_u8_rows_lut", encode(ver, rows, 1), 1, 16, 16, 1)
        write_fixture(outdir, f"{v}_u8_const",
                      encode(ver, np.full((16, 16), 42, np.uint8), 1), 1, 16, 16, 1)
        write_fixture(outdir, f"{v}_u8_all_invalid",
                      encode(ver, grad16, 1, mask=np.zeros((16, 16), np.uint8)),
                      1, 16, 16, 1)
        i8 = (np.arange(64, dtype=np.int8) - 30).reshape(8, 8)
        write_fixture(outdir, f"{v}_i8_grad", encode(ver, i8, 0), 0, 8, 8, 1)
        i16 = (rng.randint(-900, 900, (24, 24))).astype(np.int16)
        write_fixture(outdir, f"{v}_i16_dead_block",
                      encode(ver, i16, 2, mask=deadm), 2, 24, 24, 1)
        u16 = (np.arange(256, dtype=np.uint16) * 200).reshape(16, 16)
        write_fixture(outdir, f"{v}_u16_grad", encode(ver, u16, 3), 3, 16, 16, 1)
        i32 = (np.arange(256, dtype=np.int32) * 99999 - 5000000).reshape(16, 16)
        write_fixture(outdir, f"{v}_i32_grad", encode(ver, i32, 4), 4, 16, 16, 1)
        u32 = (np.arange(256, dtype=np.uint32) * 10000000).reshape(16, 16)
        write_fixture(outdir, f"{v}_u32_big", encode(ver, u32, 5), 5, 16, 16, 1)
        f32 = (rng.rand(16, 16) * 100).astype(np.float32)
        write_fixture(outdir, f"{v}_f32_lossy",
                      encode(ver, f32, 6, 0.01), 6, 16, 16, 1)
        fi = rng.randint(0, 1000, (16, 16)).astype(np.float32)
        write_fixture(outdir, f"{v}_f32_integral", encode(ver, fi, 6, 0.0), 6, 16, 16, 1)
        f64 = (rng.rand(16, 16) * 1e6).astype(np.float64)
        write_fixture(outdir, f"{v}_f64_lossy",
                      encode(ver, f64, 7, 0.25), 7, 16, 16, 1)
        rgb = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        write_fixture(outdir, f"{v}_u8_ndim3", encode(ver, rgb, 1, ndim=3), 1, 16, 16, 3)
        nm = rng.randint(0, 200, (13, 11)).astype(np.uint8)
        write_fixture(outdir, f"{v}_u8_13x11", encode(ver, nm, 1), 1, 11, 13, 1)
        big = ((np.add.outer(np.arange(256), np.arange(256)) // 2) % 256).astype(np.uint8)
        write_fixture(outdir, f"{v}_u8_256x256", encode(ver, big, 1), 1, 256, 256, 1)

    # refusal fixtures: FPL (lossless non-integral float) and old version
    fpl = (rng.rand(16, 16).astype(np.float32) * 1.7)
    (outdir / "v6_f32_fpl_refused.lerc2").write_bytes(encode(6, fpl, 6, 0.0))
    (outdir / "v4_refused.lerc2").write_bytes(encode(4, grad16, 1))
    print("refusal blobs written")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/lerc")
