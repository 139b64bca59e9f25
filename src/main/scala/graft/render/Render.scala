package graft.render

import java.awt.image.BufferedImage

/** Driver-side result rendering (SURVEY §2.5, R1-R4) — the notebook-facing
  * presentation layer of the reference (`result.py`), on `java.awt`.
  * Non-distributed by design: operates on collected rows. */
object Render {

  /** R4 — class_color (`utils.py:131-138`): CartoColor palette cycled,
    * class 0 = background = black. */
  private val palette: Array[(Int, Int, Int)] = Array(
    (0xDD, 0xCC, 0x77), (0xCC, 0x66, 0x77), (0x11, 0x77, 0x33),
    (0x33, 0x22, 0x88), (0xAA, 0x44, 0x99), (0x88, 0xCC, 0xEE))

  def classColor(c: Int): (Int, Int, Int) =
    if (c == 0) (0, 0, 0) else palette(c % palette.length)

  /** Interleaved bands-last bytes -> BufferedImage (1/3/4 bands). */
  def toImage(height: Int, width: Int, bands: Int, data: Array[Byte]): BufferedImage = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = (y * width + x) * bands
        val (r, g, b) =
          if (bands == 1) { val v = data(i) & 0xff; (v, v, v) }
          else ((data(i) & 0xff), (data(i + 1) & 0xff), (data(i + 2) & 0xff))
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** R2 — draw object-detection bboxes (xmin,ymin,xmax,ymax,cls) over an
    * image (`result.py:61-89`). */
  def drawBoxes(img: BufferedImage, boxes: Seq[(Int, Int, Int, Int, Int)]): BufferedImage = {
    val g = img.createGraphics()
    boxes.foreach { case (x0, y0, x1, y1, cls) =>
      val (r, gg, b) = classColor(cls)
      g.setColor(new java.awt.Color(r, gg, b))
      g.drawRect(x0, y0, math.max(0, x1 - x0), math.max(0, y1 - y0))
    }
    g.dispose()
    img
  }

  /** R3 — segmentation raster (class-index bytes, 256x256) -> RGB image
    * via the class palette (`result.py:104-128`). */
  def renderSegmentation(label: Array[Byte], size: Int = 256): BufferedImage = {
    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        val (r, g, b) = classColor(label(y * size + x) & 0xff)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  // ---- result cards (`result.py`'s `_repr_html_` equivalents) ----

  private val styleHelper = "display:inline-block;vertical-align:middle;margin-left:1em;"

  private def jpegB64(im: BufferedImage): String = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", out)
    java.util.Base64.getEncoder.encodeToString(out.toByteArray)
  }

  private def imgTag(im: BufferedImage): String =
    s"<img style=$styleHelper src='data:image/jpeg;base64,${jpegB64(im)}'/>"

  private def card(tile: String, inner: String): String =
    s"<div style='border-radius:5px;background-color:#eee;padding:2em;'><span>$tile</span>$inner</div>"

  /** R1 — classification card (`result.py:27-46`): Background + class
    * presence table plus the tile image as base64 JPEG. */
  def classificationHtml(classNames: Seq[String], label: Seq[Int],
      image: Option[BufferedImage], tile: String = ""): String = {
    val rows = ("Background" +: classNames).zipWithIndex.map { case (n, i) =>
      s"<tr><td>$n</td><td>${label(i) > 0}</td></tr>"
    }.mkString
    val table =
      s"<table style=$styleHelper><tr><th>Class</th><th>Value</th></tr>$rows</table>"
    card(tile, table + image.map(imgTag).getOrElse(""))
  }

  /** R2 — object-detection card (`result.py:81-89`): the tile image (or a
    * blank 256 canvas, `result.py:72-75`) with the class-colored bboxes
    * drawn over it, as one combined base64 JPEG. */
  def objectDetectionHtml(boxes: Seq[(Int, Int, Int, Int, Int)],
      image: Option[BufferedImage], tile: String = ""): String = {
    val canvas = image.getOrElse(new BufferedImage(256, 256, BufferedImage.TYPE_INT_RGB))
    card(tile, imgTag(drawBoxes(canvas, boxes)))
  }

  /** R3 — segmentation card (`result.py:110-128`): the palette-rendered
    * label raster next to the tile image, each a base64 JPEG. */
  def segmentationHtml(label: Array[Byte], image: Option[BufferedImage],
      tile: String = ""): String =
    card(tile, imgTag(renderSegmentation(label)) + image.map(imgTag).getOrElse(""))
}
