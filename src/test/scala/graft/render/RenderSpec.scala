package graft.render

import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage

/** Golden tests for the driver-side render layer (R1-R4) against the
  * reference's palette and card shapes (`utils.py:131-138`, `result.py`). */
class RenderSpec extends AnyFunSuite {

  test("R4 class_color: background black, CartoColor cycle matches utils.py values") {
    assert(Render.classColor(0) == ((0, 0, 0)))
    // colors = [#DDCC77, #CC6677, #117733, #332288, #AA4499, #88CCEE]
    assert(Render.classColor(1) == ((0xCC, 0x66, 0x77)))
    assert(Render.classColor(2) == ((0x11, 0x77, 0x33)))
    assert(Render.classColor(5) == ((0x88, 0xCC, 0xEE)))
    assert(Render.classColor(6) == ((0xDD, 0xCC, 0x77))) // 6 % 6 = 0 -> cycles
    assert(Render.classColor(7) == Render.classColor(1))
  }

  test("toImage round-trips 3-band and 1-band byte layouts") {
    val rgb = Render.toImage(1, 2, 3, Array[Byte](10, 20, 30, 40, 50, 60))
    assert((rgb.getRGB(0, 0) & 0xffffff) == ((10 << 16) | (20 << 8) | 30))
    assert((rgb.getRGB(1, 0) & 0xffffff) == ((40 << 16) | (50 << 8) | 60))
    val grey = Render.toImage(1, 1, 1, Array[Byte](99))
    assert((grey.getRGB(0, 0) & 0xffffff) == ((99 << 16) | (99 << 8) | 99))
  }

  test("R2 drawBoxes: outline pixels take the class color, interior stays untouched") {
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    Render.drawBoxes(img, Seq((2, 3, 10, 12, 1)))
    val (r, g, b) = Render.classColor(1)
    val want = (r << 16) | (g << 8) | b
    // corners and edges of the rect are outlined
    assert((img.getRGB(2, 3) & 0xffffff) == want)
    assert((img.getRGB(10, 12) & 0xffffff) == want)
    assert((img.getRGB(6, 3) & 0xffffff) == want) // top edge
    assert((img.getRGB(2, 8) & 0xffffff) == want) // left edge
    // interior and exterior remain black (outline, not fill)
    assert((img.getRGB(6, 8) & 0xffffff) == 0)
    assert((img.getRGB(14, 14) & 0xffffff) == 0)
  }

  test("R3 renderSegmentation: each class index maps through the palette per pixel") {
    val label = new Array[Byte](256 * 256)
    label(0) = 2 // pixel (0,0) -> class 2
    label(256 + 1) = 1 // pixel (1,1) -> class 1
    val img = Render.renderSegmentation(label)
    def rgb(t: (Int, Int, Int)) = (t._1 << 16) | (t._2 << 8) | t._3
    assert((img.getRGB(0, 0) & 0xffffff) == rgb(Render.classColor(2)))
    assert((img.getRGB(1, 1) & 0xffffff) == rgb(Render.classColor(1)))
    assert((img.getRGB(5, 5) & 0xffffff) == 0) // background black
  }

  test("R1 classification card: Background row, class rows, image tag, tile span") {
    val html = Render.classificationHtml(Seq("Roads", "Buildings"), Seq(0, 1, 0),
      Some(new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)), tile = "Tile(1,2,3)")
    assert(html.contains("<td>Background</td><td>false</td>"))
    assert(html.contains("<td>Roads</td><td>true</td>"))
    assert(html.contains("<td>Buildings</td><td>false</td>"))
    assert(html.contains("data:image/jpeg;base64,"))
    assert(html.contains("<span>Tile(1,2,3)</span>"))
  }

  test("R2/R3 cards embed combined JPEGs and degrade without an image") {
    val od = Render.objectDetectionHtml(Seq((0, 0, 10, 10, 1)), None, tile = "t")
    assert(od.contains("data:image/jpeg;base64,") && od.contains("<span>t</span>"))
    val seg = Render.segmentationHtml(new Array[Byte](256 * 256), None)
    // label raster always renders, image is optional
    assert(seg.count(_ == '<') >= 3 && seg.contains("data:image/jpeg;base64,"))
  }
}
