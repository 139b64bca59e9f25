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

  /** R1 — classification card: class name -> presence table as HTML plus a
    * base64 JPEG of the tile image (`result.py:27-46`). */
  def classificationHtml(classNames: Seq[String], label: Seq[Int],
      image: Option[BufferedImage]): String = {
    val rows = classNames.zipWithIndex.map { case (n, i) =>
      s"<tr><td>$n</td><td>${label(i + 1) > 0}</td></tr>"
    }.mkString
    val imgTag = image.map { im =>
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", out)
      val b64 = java.util.Base64.getEncoder.encodeToString(out.toByteArray)
      s"""<img src="data:image/jpeg;base64,$b64"/>"""
    }.getOrElse("")
    s"""<div><table><tr><th>class</th><th>present</th></tr>$rows</table>$imgTag</div>"""
  }
}
