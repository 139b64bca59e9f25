package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Lerc]] bit-for-bit against liblerc-encoded ground truth: every
  * fixture blob in src/test/resources/lerc was encoded AND decoded by the
  * reference implementation (tools/make_lerc_fixtures.py), so the .expect
  * values are the reference decoder's own reconstruction — lossy cases
  * verify exact quantization behavior, not a tolerance. */
class LercSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/lerc/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** expect = [nRows][nCols][nDim][dataType] i32 LE, mask bytes, values
    * in the native dtype LE. Returns (rows, cols, ndim, dt, mask, values
    * as Double). */
  private def readExpect(name: String): (Int, Int, Int, Int, Array[Boolean], Array[Double]) = {
    val b = res(name)
    val rows = le32(b, 0); val cols = le32(b, 4); val ndim = le32(b, 8); val dt = le32(b, 12)
    val total = rows * cols
    val mask = Array.tabulate(total)(i => b(16 + i) != 0)
    val off = 16 + total
    val bb = java.nio.ByteBuffer.wrap(b, off, b.length - off)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = total * ndim
    val vals = new Array[Double](n)
    var i = 0
    while (i < n) {
      vals(i) = dt match {
        case 0 => bb.get().toDouble
        case 1 => (bb.get() & 0xff).toDouble
        case 2 => bb.getShort().toDouble
        case 3 => (bb.getShort() & 0xffff).toDouble
        case 4 => bb.getInt().toDouble
        case 5 => (bb.getInt() & 0xffffffffL).toDouble
        case 6 => bb.getFloat().toDouble
        case 7 => bb.getDouble()
      }
      i += 1
    }
    (rows, cols, ndim, dt, mask, vals)
  }

  private val fixtures = Seq(
    "u8_grad", "u8_grad_masked", "u8_noise_sweep", "u8_huff_plain",
    "u8_rows_lut", "u8_const", "u8_all_invalid", "i8_grad",
    "i16_dead_block", "u16_grad", "i32_grad", "u32_big", "f32_lossy",
    "f32_integral", "f64_lossy", "u8_ndim3", "u8_13x11", "u8_256x256")

  for (ver <- Seq("v5", "v6"); name <- fixtures) {
    test(s"${ver}_$name decodes identically to liblerc") {
      val full = s"${ver}_$name"
      val tile = Lerc.decode(res(s"$full.lerc2"))
      val (rows, cols, ndim, dt, mask, vals) = readExpect(s"$full.expect")
      assert(tile.nRows == rows && tile.nCols == cols)
      assert(tile.nDim == ndim && tile.dataType == dt)
      assert(tile.mask.sameElements(mask), "mask mismatch")
      var i = 0
      while (i < vals.length) {
        val got = tile.values(i)
        val want = vals(i)
        // float32 ground truth is stored as float32: compare at that width
        val same =
          if (dt == 6) got.toFloat == want.toFloat
          else got == want
        assert(same, s"$full value[$i]: got $got want $want")
        i += 1
      }
    }
  }

  test("v6 lossless non-integral float (FPL) is refused by name") {
    val e = intercept[java.io.IOException](Lerc.decode(res("v6_f32_fpl_refused.lerc2")))
    assert(e.getMessage.contains("FPL") && e.getMessage.contains("MAX_Z_ERROR"))
  }

  test("blob versions before 5 are refused with the version named") {
    val e = intercept[java.io.IOException](Lerc.decode(res("v4_refused.lerc2")))
    assert(e.getMessage.contains("version 4"))
  }

  test("garbage input fails loudly, never returns pixels") {
    intercept[java.io.IOException](Lerc.decode(Array.fill[Byte](80)(0x41)))
    intercept[java.io.IOException](Lerc.decode("Lerc2 ".getBytes ++ Array.fill[Byte](60)(0)))
    // truncated real blob
    val good = res("v6_u8_grad.lerc2")
    intercept[Exception](Lerc.decode(good.take(good.length / 2)))
  }
}
