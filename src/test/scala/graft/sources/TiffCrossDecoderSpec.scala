package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation check: the JDK's own TIFF ImageIO plugin (an
  * independent, libtiff-convention codebase) must decode every fixture
  * this suite's TiffWriter produces, pixel-identically. This closes the
  * "symmetric encoder/decoder bug" hole that same-codebase round-trip
  * tests cannot: if our LZW early-change pairing, PackBits framing, or
  * predictor differencing deviated from the real-world convention, the
  * JDK reader would disagree. */
class TiffCrossDecoderSpec extends AnyFunSuite {

  private def writeAndCross(name: String)(write: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("cross")
    val p = dir.resolve(s"$name.tif").toString
    write(p)
    val img = javax.imageio.ImageIO.read(new java.io.File(p))
    assert(img != null, s"JDK TIFF reader could not open $name")
    assert(img.getWidth == 512 && img.getHeight == 512)
    var bad = 0
    for (y <- 0 until 512; x <- 0 until 512) {
      val rgb = img.getRGB(x, y)
      if (((rgb >> 16) & 0xff) != x % 256 || ((rgb >> 8) & 0xff) != y % 256 ||
        (rgb & 0xff) != 7) bad += 1
    }
    assert(bad == 0, s"$name: $bad mismatching pixels vs the JDK decoder")
  }

  private def gradient = Seq(TiffWriter.Level(512, 512, (x, y) => (x % 256, y % 256, 7)))

  test("JDK TIFF reader agrees: raw") {
    writeAndCross("raw")(p => TiffWriter.write(p, gradient, tileSize = 128,
      originX = 0, originY = 0, resX = 1, resY = 1))
  }

  test("JDK TIFF reader agrees: deflate") {
    writeAndCross("deflate")(p => TiffWriter.write(p, gradient, tileSize = 128,
      originX = 0, originY = 0, resX = 1, resY = 1, deflate = true))
  }

  test("JDK TIFF reader agrees: LZW") {
    writeAndCross("lzw")(p => TiffWriter.write(p, gradient, tileSize = 128,
      originX = 0, originY = 0, resX = 1, resY = 1, lzw = true))
  }

  test("JDK TIFF reader agrees: LZW + predictor 2 (the GDAL-default combo)") {
    writeAndCross("lzwpred")(p => TiffWriter.write(p, gradient, tileSize = 128,
      originX = 0, originY = 0, resX = 1, resY = 1, lzw = true, predictor = 2))
  }

  test("JDK TIFF reader agrees: PackBits") {
    writeAndCross("packbits")(p => TiffWriter.write(p, gradient, tileSize = 128,
      originX = 0, originY = 0, resX = 1, resY = 1, packbits = true))
  }

  test("JDK TIFF reader agrees: striped deflate with a short final strip") {
    val dir = java.nio.file.Files.createTempDirectory("cross")
    val p = dir.resolve("shortstrip.tif").toString
    TiffWriter.write(p, Seq(TiffWriter.Level(512, 500, (x, y) => (x % 256, y % 256, 7))),
      tileSize = 128, originX = 0, originY = 0, resX = 1, resY = 1,
      deflate = true, striped = true)
    val img = javax.imageio.ImageIO.read(new java.io.File(p))
    assert(img != null && img.getHeight == 500)
    var bad = 0
    for (y <- 0 until 500; x <- 0 until 512) {
      val rgb = img.getRGB(x, y)
      if (((rgb >> 16) & 0xff) != x % 256 || ((rgb >> 8) & 0xff) != y % 256) bad += 1
    }
    assert(bad == 0, s"short-strip: $bad mismatching pixels")
  }
}
