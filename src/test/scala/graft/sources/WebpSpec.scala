package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Webp]] bit-for-bit against libwebp-encoded ground truth: every
  * fixture in src/test/resources/webp was encoded by libwebp's lossless
  * encoder and the .expect pixels are libwebp's own decode of that blob
  * (tools/make_webp_fixtures.py asserts the round-trip), so a pass means
  * pixel-exact agreement with the reference implementation across the
  * transform/entropy features each image provokes: simple prefix codes
  * (flat), predictor transform (gradient), full literal alphabets +
  * color cache (noise), palette with and without sub-byte packing,
  * native alpha, LZ77 backward references (repeat), and meta-Huffman
  * group images (natural 256x256). */
class WebpSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/webp/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** expect = [width][height][channels] i32 LE + row-major RGB(A) bytes. */
  private def readExpect(name: String): (Int, Int, Int, Array[Byte]) = {
    val b = res(name)
    (le32(b, 0), le32(b, 4), le32(b, 8), b.drop(12))
  }

  private val fixtures = Seq(
    "flat_4x4_rgb", "gradient_64x64_rgb", "noise_57x43_rgb",
    "palette4_70x33_rgb", "palette48_40x40_rgb", "gradient_32x32_rgba",
    "repeat_128x128_rgb", "natural_256x256_rgb", "one_1x1_rgb",
    "row_97x1_rgb", "gray_64x64_rgb")

  for (name <- fixtures) {
    test(s"$name decodes identically to libwebp") {
      val img = Webp.decode(res(s"$name.webp"))
      val (w, h, ch, px) = readExpect(s"$name.expect")
      assert(img.width == w && img.height == h,
        s"decoded ${img.width}x${img.height}, expected ${w}x$h")
      var i = 0
      var bad = 0
      while (i < w * h && bad < 5) {
        val p = img.pixels(i)
        val r = (p >> 16) & 0xff
        val g = (p >> 8) & 0xff
        val b = p & 0xff
        val a = (p >>> 24) & 0xff
        val er = px(i * ch) & 0xff
        val eg = px(i * ch + 1) & 0xff
        val eb = px(i * ch + 2) & 0xff
        val ea = if (ch == 4) px(i * ch + 3) & 0xff else 255
        if (r != er || g != eg || b != eb || a != ea) {
          info(s"pixel $i (${i % w},${i / w}): got ($r,$g,$b,$a) want ($er,$eg,$eb,$ea)")
          bad += 1
        }
        i += 1
      }
      assert(bad == 0, s"$bad+ mismatching pixels (first few logged above)")
    }
  }

  test("lossy VP8 is refused by name") {
    // minimal RIFF container carrying a (truncated) lossy VP8 chunk tag:
    // the refusal must trigger on the tag, before any payload parsing
    val b = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(22); b.put("WEBP".getBytes)
    b.put("VP8 ".getBytes); b.putInt(10); b.put(new Array[Byte](10))
    val e = intercept[java.io.IOException](Webp.decode(b.array()))
    assert(e.getMessage.contains("lossy") && e.getMessage.contains("VP8L"))
  }

  test("garbage container is refused") {
    val e = intercept[java.io.IOException](Webp.decode(Array.fill[Byte](64)(0x41)))
    assert(e.getMessage.contains("RIFF"))
  }

  test("truncated VP8L stream throws rather than returning short pixels") {
    val good = res("noise_57x43_rgb.webp")
    val cut = good.take(good.length / 2)
    // patch the RIFF + chunk sizes so only the bitstream itself is short
    val b = cut.clone()
    def putLe(o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe(4, b.length - 8)
    putLe(16, b.length - 20) // VP8L chunk payload size
    intercept[java.io.IOException](Webp.decode(b))
  }
}
