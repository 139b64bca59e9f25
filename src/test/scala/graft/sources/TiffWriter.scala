package graft.sources

/** Minimal tiled-GeoTIFF writer for COG reader fixtures (test-only).
  * Little-endian classic TIFF, RGB uint8, tiled, optional deflate, web-
  * mercator georeferencing via ModelPixelScale/ModelTiepoint, optional
  * overview IFDs. */
object TiffWriter {

  final case class Level(width: Int, height: Int, pixel: (Int, Int) => (Int, Int, Int))

  def write(path: String, levels: Seq[Level], tileSize: Int = 128,
      originX: Double = 0, originY: Double = 0, resX: Double = 1, resY: Double = 1,
      deflate: Boolean = false): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    def pad(): Unit = while (bos.size() % 2 != 0) bos.write(0)
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { var i = 0; while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    def w64d(d: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { bos.write(((bits >> (8 * i)) & 0xff).toInt); i += 1 }
    }

    // header; first IFD offset patched later
    bos.write('I'); bos.write('I'); w16(42); w32(0)

    final case class PreparedLevel(tiles: Seq[Array[Byte]], tilesAcross: Int, lv: Level)
    val prepared = levels.map { lv =>
      val across = (lv.width + tileSize - 1) / tileSize
      val down = (lv.height + tileSize - 1) / tileSize
      val tiles = for (ty <- 0 until down; tx <- 0 until across) yield {
        val raw = new Array[Byte](tileSize * tileSize * 3)
        for (y <- 0 until tileSize; x <- 0 until tileSize) {
          val gx = tx * tileSize + x
          val gy = ty * tileSize + y
          val (r, g, b) = if (gx < lv.width && gy < lv.height) lv.pixel(gx, gy) else (0, 0, 0)
          val i = (y * tileSize + x) * 3
          raw(i) = r.toByte; raw(i + 1) = g.toByte; raw(i + 2) = b.toByte
        }
        if (deflate) {
          val d = new java.util.zip.Deflater()
          d.setInput(raw); d.finish()
          val buf = new Array[Byte](raw.length + 64)
          val n = d.deflate(buf)
          d.end()
          java.util.Arrays.copyOf(buf, n)
        } else raw
      }
      PreparedLevel(tiles, across, lv)
    }

    // write tile data first, remember offsets
    val tileOffsets = prepared.map { p =>
      p.tiles.map { t => pad(); val o = bos.size().toLong; bos.write(t); o }
    }

    // IFDs
    var ifdOffsets = List.empty[Long]
    prepared.zipWithIndex.foreach { case (p, li) =>
      // out-of-line arrays for this IFD
      pad()
      val bpsOff = bos.size().toLong; w16(8); w16(8); w16(8)
      pad()
      val toOff = bos.size().toLong; tileOffsets(li).foreach(w32)
      pad()
      val tcOff = bos.size().toLong; p.tiles.foreach(t => w32(t.length.toLong))
      pad()
      val scaleOff = bos.size().toLong
      w64d(resX * (levels.head.width.toDouble / p.lv.width)); w64d(resY * (levels.head.height.toDouble / p.lv.height)); w64d(0)
      pad()
      val tieOff = bos.size().toLong
      Seq(0.0, 0.0, 0.0, originX, originY, 0.0).foreach(w64d)

      pad()
      val ifdOff = bos.size().toLong
      ifdOffsets ::= ifdOff
      val nTiles = p.tiles.length
      final case class Tag(code: Int, typ: Int, count: Int, value: Long)
      val tags = Seq(
        Tag(256, 3, 1, p.lv.width.toLong), Tag(257, 3, 1, p.lv.height.toLong),
        Tag(258, 3, 3, bpsOff), Tag(259, 3, 1, if (deflate) 8L else 1L),
        Tag(262, 3, 1, 2L), Tag(277, 3, 1, 3L), Tag(284, 3, 1, 1L),
        Tag(322, 3, 1, tileSize.toLong), Tag(323, 3, 1, tileSize.toLong),
        Tag(324, 4, nTiles, if (nTiles == 1) tileOffsets(li).head else toOff),
        Tag(325, 4, nTiles, if (nTiles == 1) p.tiles.head.length.toLong else tcOff),
        Tag(33550, 12, 3, scaleOff), Tag(33922, 12, 6, tieOff))
      w16(tags.length)
      tags.foreach { t =>
        w16(t.code); w16(t.typ); w32(t.count.toLong)
        if (t.typ == 3 && t.count == 1) { w16(t.value.toInt); w16(0) } else w32(t.value)
      }
      w32(0) // next-IFD placeholder; chained below by patching
    }

    val bytes = bos.toByteArray
    def patch32(at: Int, v: Long): Unit = {
      var i = 0
      while (i < 4) { bytes(at + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    val offs = ifdOffsets.reverse
    patch32(4, offs.head)
    // chain IFDs: next-pointer sits after 2 + n*12 bytes of each IFD
    offs.zip(offs.tail :+ 0L).foreach { case (o, next) =>
      val n = (bytes(o.toInt) & 0xff) | ((bytes(o.toInt + 1) & 0xff) << 8)
      patch32(o.toInt + 2 + n * 12, next)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
  }
}
