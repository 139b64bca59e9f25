package graft.sources

/** Minimal tiled-GeoTIFF writer for COG reader fixtures (test-only).
  * Little-endian classic TIFF or BigTIFF, RGB uint8 or uint16, tiled,
  * chunky or planar (PlanarConfiguration 2), optional horizontal-
  * differencing predictor (tag 317), optional deflate or JPEG
  * (compression 7 + shared JPEGTables) compression, web-mercator
  * georeferencing via ModelPixelScale/ModelTiepoint, optional overview
  * IFDs. For bps=16 the `pixel` function returns 0-65535 band values. */
object TiffWriter {

  final case class Level(width: Int, height: Int, pixel: (Int, Int) => (Int, Int, Int))

  def write(path: String, levels: Seq[Level], tileSize: Int = 128,
      originX: Double = 0, originY: Double = 0, resX: Double = 1, resY: Double = 1,
      deflate: Boolean = false, bigtiff: Boolean = false,
      jpeg: Boolean = false, jpegSharedTables: Boolean = true,
      striped: Boolean = false,
      predictor: Int = 1, bps: Int = 8, planar: Boolean = false,
      lzw: Boolean = false, packbits: Boolean = false,
      samplesPerPixel: Int = 3, bigendian: Boolean = false,
      sampleFormat: Int = 1, zstd: Boolean = false, lzma: Boolean = false,
      epsg: Option[Int] = None, nodata: Option[Double] = None,
      lercTiles: Option[Seq[Array[Byte]]] = None, lercAdd: Int = 0,
      webpTiles: Option[Seq[Array[Byte]]] = None): Unit = {
    require(Seq(deflate, jpeg, lzw, packbits, zstd, lzma).count(identity) <= 1,
      "pick one compression")
    require(lercTiles.isEmpty ||
      (!deflate && !jpeg && !lzw && !packbits && !zstd && !lzma &&
        levels.size == 1 && !striped && !planar && predictor == 1),
      "LERC fixtures: pre-encoded blobs, single level, chunky, no predictor")
    require(webpTiles.isEmpty ||
      (!deflate && !jpeg && !lzw && !packbits && !zstd && !lzma && lercTiles.isEmpty &&
        levels.size == 1 && !striped && !planar && predictor == 1 && bps == 8),
      "WebP fixtures: pre-encoded blobs, single level, 8-bit chunky, no predictor")
    require(samplesPerPixel == 1 || samplesPerPixel == 3, "1 (gray) or 3 (RGB) samples")
    require(!jpeg || samplesPerPixel == 3, "jpeg fixtures are RGB")
    val spp0 = samplesPerPixel
    require(!(striped && jpeg), "striped fixtures are raw/deflate only")
    require(!jpeg || (predictor == 1 && bps == 8 && !planar),
      "jpeg fixtures are 8-bit chunky, no predictor")
    require(!(striped && planar), "striped fixtures are chunky-only")
    // float32 (sampleFormat 3): `pixel`'s channel values carry the raw
    // IEEE-754 bits (floatToIntBits) — store() writes them as 4-byte words
    require(bps == 8 || bps == 16 || (bps == 32 && sampleFormat == 3),
      "bps 8/16 (int) or 32 (float)")
    require(bps != 32 || (predictor != 2 && !jpeg), "float fixtures: predictor 1/3, no jpeg")
    require(predictor != 3 || bps == 32, "predictor 3 is float32-only")
    require(!(bigtiff && bigendian), "BE fixtures are classic-TIFF only (keeps the patching simple)")
    val bos = new java.io.ByteArrayOutputStream()
    def pad(): Unit = while (bos.size() % 2 != 0) bos.write(0)
    def wN(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) {
        val shift = if (bigendian) 8 * (n - 1 - i) else 8 * i
        bos.write(((v >> shift) & 0xff).toInt)
        i += 1
      }
    }
    def w16(v: Int): Unit = wN(v.toLong, 2)
    def w32(v: Long): Unit = wN(v, 4)
    def w64(v: Long): Unit = wN(v, 8)
    def w64d(d: Double): Unit = w64(java.lang.Double.doubleToLongBits(d))
    def wOff(v: Long): Unit = if (bigtiff) w64(v) else w32(v)

    // header; first IFD offset patched later
    val bom = if (bigendian) 'M' else 'I'
    if (bigtiff) { bos.write(bom); bos.write(bom); w16(43); w16(8); w16(0); w64(0) }
    else { bos.write(bom); bos.write(bom); w16(42); w32(0) }

    // shared JPEG tables captured from the first encoded tile
    var jpegTables: Option[Array[Byte]] = None

    final case class PreparedLevel(tiles: Seq[Array[Byte]], tilesAcross: Int, lv: Level)
    val prepared = levels.map { lv =>
      // striped: one full-width strip of `tileSize` rows per "tile"
      val chunkW = if (striped) lv.width else tileSize
      val across = if (striped) 1 else (lv.width + tileSize - 1) / tileSize
      val down = (lv.height + tileSize - 1) / tileSize
      // chunky sample values per chunk (0-255 or 0-65535). Edge TILES pad
      // to full size (spec); a short final STRIP holds only its real rows.
      val chunky: Seq[Array[Int]] = for (ty <- 0 until down; tx <- 0 until across) yield {
        val rows = if (striped) math.min(tileSize, lv.height - ty * tileSize) else tileSize
        val s = new Array[Int](chunkW * rows * spp0)
        for (y <- 0 until rows; x <- 0 until chunkW) {
          val gx = tx * chunkW + x
          val gy = ty * tileSize + y
          val (r, g, b) = if (gx < lv.width && gy < lv.height) lv.pixel(gx, gy) else (0, 0, 0)
          val i = (y * chunkW + x) * spp0
          s(i) = r // gray fixtures use the pixel fn's first channel
          if (spp0 == 3) { s(i + 1) = g; s(i + 2) = b }
        }
        s
      }
      // planar: split each chunky chunk into 3 plane chunks, PLANE-major
      // order (all plane-0 tiles, then plane-1, ...) per TIFF 6.0
      val sampleChunks: Seq[(Array[Int], Int)] =
        if (planar)
          for (p <- 0 until spp0; c <- chunky)
            yield (Array.tabulate(c.length / spp0)(i => c(i * spp0 + p)), 1)
        else chunky.map((_, spp0))
      def store(samples0: Array[Int], spp: Int): Array[Byte] = {
        val samples = samples0.clone()
        if (predictor == 2) { // horizontal differencing, right-to-left
          val rowSamples = chunkW * spp
          val mask = (1 << bps) - 1
          for (row <- 0 until samples.length / rowSamples) {
            val ro = row * rowSamples
            var i = rowSamples - 1
            while (i >= spp) {
              samples(ro + i) = (samples(ro + i) - samples(ro + i - spp)) & mask
              i -= 1
            }
          }
        }
        val raw = new Array[Byte](samples.length * (bps / 8))
        var i = 0
        if (bps == 8) while (i < samples.length) { raw(i) = samples(i).toByte; i += 1 }
        else if (bps == 16) while (i < samples.length) { // uint16 in the file's byte order
          val (lo, hi) = if (bigendian) (1, 0) else (0, 1)
          raw(2 * i + lo) = (samples(i) & 0xff).toByte
          raw(2 * i + hi) = ((samples(i) >> 8) & 0xff).toByte
          i += 1
        }
        else while (i < samples.length) { // float32: sample int IS the bits
          var j = 0
          while (j < 4) {
            val shift = if (bigendian) 8 * (3 - j) else 8 * j
            raw(4 * i + j) = ((samples(i) >> shift) & 0xff).toByte
            j += 1
          }
          i += 1
        }
        if (predictor == 3) { // TIFF TechNote 3: byte planes (MSB first) + delta
          val n = chunkW * spp // samples per row
          val rowBytes = n * 4
          val tmp = new Array[Byte](rowBytes)
          for (row <- 0 until raw.length / rowBytes) {
            val ro = row * rowBytes
            System.arraycopy(raw, ro, tmp, 0, rowBytes)
            for (s <- 0 until n; k <- 0 until 4) {
              val srcByte = if (bigendian) k else 3 - k // plane 0 = MSB
              raw(ro + k * n + s) = tmp(s * 4 + srcByte)
            }
            var i = rowBytes - 1
            while (i >= spp) { raw(ro + i) = (raw(ro + i) - raw(ro + i - spp)).toByte; i -= 1 }
          }
        }
        if (deflate) {
          val d = new java.util.zip.Deflater()
          d.setInput(raw); d.finish()
          val buf = new Array[Byte](raw.length + 64)
          val n = d.deflate(buf)
          d.end()
          java.util.Arrays.copyOf(buf, n)
        } else if (lzw) lzwEncode(raw)
        else if (zstd) com.github.luben.zstd.Zstd.compress(raw)
        else if (lzma) {
          // libtiff tif_lzma.c parity: each chunk is a standalone .xz
          // stream (LZMA2)
          val bo = new java.io.ByteArrayOutputStream()
          val xz = new org.tukaani.xz.XZOutputStream(bo,
            new org.tukaani.xz.LZMA2Options(6))
          xz.write(raw); xz.finish(); xz.close()
          bo.toByteArray
        }
        else if (packbits) packBitsEncode(raw)
        else if (jpeg) {
          val full = encodeJpeg(raw, tileSize, tileSize)
          if (!jpegSharedTables) full
          else {
            val (tables, image) = splitJpeg(full)
            jpegTables match {
              case Some(t) => require(t.sameElements(tables),
                "encoder emitted differing tables across tiles")
              case None => jpegTables = Some(tables)
            }
            image
          }
        } else raw
      }
      lercTiles match {
        case Some(blobs) =>
          // pre-encoded Lerc2 blobs, one per tile, optionally wrapped in
          // the libtiff lerc_deflate / lerc_zstd outer layer
          require(blobs.length == chunky.length,
            s"need ${chunky.length} LERC blobs, got ${blobs.length}")
          val wrapped = blobs.map { blob =>
            if (lercAdd == 1) {
              val d = new java.util.zip.Deflater()
              d.setInput(blob); d.finish()
              val buf = new Array[Byte](blob.length + 64)
              val n = d.deflate(buf)
              d.end()
              java.util.Arrays.copyOf(buf, n)
            } else if (lercAdd == 2) com.github.luben.zstd.Zstd.compress(blob)
            else blob
          }
          PreparedLevel(wrapped, across, lv)
        case None => webpTiles match {
          case Some(blobs) => // pre-encoded .webp files, one per tile
            require(blobs.length == chunky.length,
              s"need ${chunky.length} WebP blobs, got ${blobs.length}")
            PreparedLevel(blobs, across, lv)
          case None =>
            PreparedLevel(sampleChunks.map { case (s, spp) => store(s, spp) }, across, lv)
        }
      }
    }

    // write tile data first, remember offsets
    val tileOffsets = prepared.map { p =>
      p.tiles.map { t => pad(); val o = bos.size().toLong; bos.write(t); o }
    }

    // IFDs
    val entrySize = if (bigtiff) 20 else 12
    val countSize = if (bigtiff) 8 else 2
    var ifdOffsets = List.empty[Long]
    prepared.zipWithIndex.foreach { case (p, li) =>
      // out-of-line arrays for this IFD
      pad()
      val bpsOff = bos.size().toLong; (0 until spp0).foreach(_ => w16(bps))
      pad()
      val toOff = bos.size().toLong; tileOffsets(li).foreach(w32)
      pad()
      val tcOff = bos.size().toLong; p.tiles.foreach(t => w32(t.length.toLong))
      pad()
      val jtOff = bos.size().toLong; jpegTables.foreach(t => bos.write(t))
      pad()
      val scaleOff = bos.size().toLong
      w64d(resX * (levels.head.width.toDouble / p.lv.width)); w64d(resY * (levels.head.height.toDouble / p.lv.height)); w64d(0)
      pad()
      val tieOff = bos.size().toLong
      Seq(0.0, 0.0, 0.0, originX, originY, 0.0).foreach(w64d)
      // GeoKey directory (tag 34735): header + ModelType + CS-type key
      val geoShorts: Seq[Long] = epsg match {
        case Some(code) =>
          val geographic = code == 4326
          Seq(1L, 1L, 0L, 2L,
            1024L, 0L, 1L, if (geographic) 2L else 1L,
            if (geographic) 2048L else 3072L, 0L, 1L, code.toLong)
        case None => Nil
      }
      pad()
      val gkOff = bos.size().toLong
      geoShorts.foreach(v => w16(v.toInt))

      // GDAL_NODATA (42113): ASCII decimal, space-padded past the 8-byte
      // BigTIFF inline threshold (this writer only emits out-of-line
      // byte payloads for it)
      val ndBytes = nodata.map { v =>
        val s = if (v == v.toLong) v.toLong.toString else v.toString
        (s + " " * math.max(1, 9 - s.length)).getBytes("US-ASCII")
      }
      pad()
      val ndOff = bos.size().toLong
      ndBytes.foreach(bos.write)

      // LERC_PARAMETERS (50674): [lerc version, additional compression]
      pad()
      val lercOff = bos.size().toLong
      if (lercTiles.isDefined) { w32(4L); w32(lercAdd.toLong) }

      pad()
      val ifdOff = bos.size().toLong
      ifdOffsets ::= ifdOff
      val nTiles = p.tiles.length
      val comp =
        if (lercTiles.isDefined) 34887L
        else if (webpTiles.isDefined) 50001L
        else if (deflate) 8L else if (jpeg) 7L else if (lzw) 5L
        else if (zstd) 50000L else if (lzma) 34925L
        else if (packbits) 32773L else 1L
      val photometric = if (jpeg) 6L else if (spp0 == 1) 1L else 2L
      // `data` = the element values, inlined into the entry whenever they
      // fit (<= 4 bytes classic, <= 8 BigTIFF — required by spec, and what
      // the reader expects); `value` = the out-of-line offset fallback.
      final case class Tag(code: Int, typ: Int, count: Int, value: Long, data: Seq[Long] = Nil)
      val tags = Seq(
        Tag(256, 3, 1, 0, Seq(p.lv.width.toLong)), Tag(257, 3, 1, 0, Seq(p.lv.height.toLong)),
        Tag(258, 3, spp0, bpsOff, Seq.fill(spp0)(bps.toLong)), Tag(259, 3, 1, 0, Seq(comp)),
        Tag(262, 3, 1, 0, Seq(photometric)), Tag(277, 3, 1, 0, Seq(spp0.toLong)),
        Tag(284, 3, 1, 0, Seq(if (planar) 2L else 1L))) ++
        (if (predictor != 1) Seq(Tag(317, 3, 1, 0, Seq(predictor.toLong))) else Nil) ++
        (if (sampleFormat != 1) Seq(Tag(339, 3, 1, 0, Seq(sampleFormat.toLong))) else Nil) ++
        (if (striped) Seq(
          Tag(273, 4, nTiles, toOff, tileOffsets(li)),
          Tag(278, 3, 1, 0, Seq(tileSize.toLong)),
          Tag(279, 4, nTiles, tcOff, p.tiles.map(_.length.toLong)))
        else Seq(
          Tag(322, 3, 1, 0, Seq(tileSize.toLong)), Tag(323, 3, 1, 0, Seq(tileSize.toLong)),
          Tag(324, 4, nTiles, toOff, tileOffsets(li)),
          Tag(325, 4, nTiles, tcOff, p.tiles.map(_.length.toLong)))) ++
        jpegTables.map(t => Tag(347, 7, t.length, jtOff)).toSeq ++ Seq(
        Tag(33550, 12, 3, scaleOff), Tag(33922, 12, 6, tieOff)) ++
        (if (geoShorts.nonEmpty) Seq(Tag(34735, 3, geoShorts.length, gkOff)) else Nil) ++
        ndBytes.map(b => Tag(42113, 2, b.length, ndOff)).toSeq ++
        (if (lercTiles.isDefined) Seq(Tag(50674, 4, 2, lercOff)) else Nil)
      if (bigtiff) w64(tags.length.toLong) else w16(tags.length)
      val inlineMax = if (bigtiff) 8 else 4
      tags.foreach { t =>
        w16(t.code); w16(t.typ)
        if (bigtiff) w64(t.count.toLong) else w32(t.count.toLong)
        val tsize = t.typ match { case 3 => 2; case 4 => 4; case 7 => 1; case 12 => 8; case _ => 4 }
        if (t.data.nonEmpty && tsize * t.count <= inlineMax) {
          var written = 0
          t.data.foreach { v =>
            if (t.typ == 3) { w16(v.toInt); written += 2 } else { w32(v); written += 4 }
          }
          while (written < inlineMax) { bos.write(0); written += 1 }
        } else wOff(t.value)
      }
      wOff(0) // next-IFD placeholder; chained below by patching
    }

    val bytes = bos.toByteArray
    def patchOff(at: Int, v: Long): Unit = {
      val n = if (bigtiff) 8 else 4
      var i = 0
      while (i < n) {
        val shift = if (bigendian) 8 * (n - 1 - i) else 8 * i
        bytes(at + i) = ((v >> shift) & 0xff).toByte
        i += 1
      }
    }
    def entryCountAt(o: Int): Int =
      if (bigtiff) {
        var v = 0L; var i = 7
        while (i >= 0) { v = (v << 8) | (bytes(o + i) & 0xffL); i -= 1 }
        v.toInt
      } else if (bigendian) ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
      else (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val offs = ifdOffsets.reverse
    patchOff(if (bigtiff) 8 else 4, offs.head)
    // chain IFDs: next-pointer sits after countSize + n*entrySize of each IFD
    offs.zip(offs.tail :+ 0L).foreach { case (o, next) =>
      val n = entryCountAt(o.toInt)
      patchOff(o.toInt + countSize + n * entrySize, next)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
  }

  /** TIFF 6.0 §13 LZW encoder (MSB-first 9..12-bit codes, "early change":
    * width grows when the table size EXCEEDS (1<<width)-1, matching the
    * decoder that grows when ITS lagged table size EQUALS it — the
    * libtiff-compatible pairing). Clears at 4093 entries. */
  private[sources] def lzwEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code.toLong
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8
      }
    }
    val dict = new java.util.HashMap[Long, Integer]()
    var next = 258
    put(256) // initial ClearCode
    var prev = -1
    var i = 0
    while (i < raw.length) {
      val b = raw(i) & 0xff
      if (prev < 0) prev = b
      else {
        val key = (prev.toLong << 8) | b
        val e = dict.get(key)
        if (e != null) prev = e.intValue()
        else {
          put(prev)
          dict.put(key, Integer.valueOf(next))
          next += 1
          if (next > (1 << width) - 1 && width < 12) width += 1
          if (next == 4093) { put(256); dict.clear(); next = 258; width = 9 }
          prev = b
        }
      }
      i += 1
    }
    if (prev >= 0) put(prev)
    put(257) // EOI
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** TIFF 6.0 §9 PackBits encoder: repeat runs >= 3 become (1-len, byte),
    * everything else literal chunks of <= 128. */
  private[sources] def packBitsEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < raw.length) {
      var run = 1
      while (i + run < raw.length && run < 128 && raw(i + run) == raw(i)) run += 1
      if (run >= 3) {
        out.write(1 - run)
        out.write(raw(i))
        i += run
      } else {
        // extend the literal until a >= 3 repeat run starts (or 128 bytes)
        var j = i
        while (j < raw.length && j - i < 128 &&
          !(j + 2 < raw.length && raw(j) == raw(j + 1) && raw(j) == raw(j + 2))) j += 1
        if (j == i) j = i + 1
        out.write(j - i - 1)
        out.write(raw, i, j - i)
        i = j
      }
    }
    out.toByteArray
  }

  /** RGB bytes -> a full JFIF JPEG stream via ImageIO. */
  private def encodeJpeg(rgb: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      raster.setSample(x, y, 0, rgb(i) & 0xff)
      raster.setSample(x, y, 1, rgb(i + 1) & 0xff)
      raster.setSample(x, y, 2, rgb(i + 2) & 0xff)
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpeg", out), "no JPEG encoder")
    out.toByteArray
  }

  /** Split a full JPEG into (tables stream SOI..EOI, abbreviated image
    * stream SOI..EOI) — DQT/DHT segments go to tables, the rest (SOF,
    * SOS + entropy data) stays with the image, per the TIFF tag-347
    * convention. */
  private def splitJpeg(full: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val tables = new java.io.ByteArrayOutputStream()
    val image = new java.io.ByteArrayOutputStream()
    tables.write(0xff); tables.write(0xd8)
    image.write(0xff); image.write(0xd8)
    var i = 2
    var done = false
    while (!done) {
      require((full(i) & 0xff) == 0xff, s"bad JPEG marker at $i")
      val marker = full(i + 1) & 0xff
      if (marker == 0xd9) done = true // EOI with no scan (shouldn't happen)
      else if (marker == 0xda) { // SOS: header + entropy data to the end
        image.write(full, i, full.length - i)
        done = true
      } else {
        val len = ((full(i + 2) & 0xff) << 8) | (full(i + 3) & 0xff)
        val target = if (marker == 0xdb || marker == 0xc4) tables else image
        target.write(full, i, 2 + len)
        i += 2 + len
      }
    }
    tables.write(0xff); tables.write(0xd9)
    (tables.toByteArray, image.toByteArray)
  }
}
