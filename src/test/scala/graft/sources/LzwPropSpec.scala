package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Randomized round-trip coverage for the TIFF LZW pair beyond the
  * gradient fixtures: arbitrary bytes, long runs (KwKwK chains), and
  * dictionary-overflow-sized inputs (mid-stream clears). Fixed seed keeps
  * runs reproducible. */
class LzwPropSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)

  private def roundTrip(raw: Array[Byte]): Array[Byte] =
    CogReader.lzwDecode(TiffWriter.lzwEncode(raw), raw.length)

  test("random byte arrays round-trip (100 cases, lengths 0..20000)") {
    for (_ <- 0 until 100) {
      val n = rnd.nextInt(20000)
      val raw = new Array[Byte](n)
      rnd.nextBytes(raw)
      assert(roundTrip(raw).sameElements(raw), s"length $n")
    }
  }

  test("long single-byte runs round-trip (KwKwK chain stress)") {
    for (n <- Seq(1, 2, 3, 5, 100, 4096, 70000)) {
      val raw = Array.fill[Byte](n)(7)
      assert(roundTrip(raw).sameElements(raw), s"run length $n")
    }
  }

  test("repeating short patterns round-trip across the 9->10->11->12 bit widths and clears") {
    val pattern = Array[Byte](1, 2, 3, 4, 5, 1, 2, 9)
    val raw = Array.tabulate[Byte](300000)(i => pattern(i % pattern.length))
    assert(roundTrip(raw).sameElements(raw))
    // low-entropy but non-periodic: many distinct dictionary entries
    val raw2 = Array.tabulate[Byte](120000)(i => ((i * i) % 17).toByte)
    assert(roundTrip(raw2).sameElements(raw2))
  }

  test("empty input round-trips") {
    assert(roundTrip(Array.emptyByteArray).isEmpty)
  }

  private def pbRoundTrip(raw: Array[Byte]): Array[Byte] =
    CogReader.packBitsDecode(TiffWriter.packBitsEncode(raw), raw.length)

  test("PackBits: random arrays, runs at every length, and 128-boundary chunks round-trip") {
    for (_ <- 0 until 100) {
      val n = rnd.nextInt(5000)
      val raw = new Array[Byte](n)
      rnd.nextBytes(raw)
      assert(pbRoundTrip(raw).sameElements(raw), s"random length $n")
    }
    for (n <- Seq(1, 2, 3, 127, 128, 129, 200, 10000)) {
      val run = Array.fill[Byte](n)(9)
      assert(pbRoundTrip(run).sameElements(run), s"run length $n")
      val lit = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      assert(pbRoundTrip(lit).sameElements(lit), s"literal length $n")
    }
  }
}
