package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def png(r: Int, g: Int, b: Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gr = img.createGraphics()
    gr.setColor(new java.awt.Color(r, g, b))
    gr.fillRect(0, 0, w, h)
    gr.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(36 + dataLen).putInt(0x45564157) // RIFF len WAVE
    bb.putInt(0x20746d66).putInt(16).putShort(1).putShort(1) // fmt, PCM, mono
    bb.putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.putInt(0x61746164).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("GIF and BMP decode through the same image path (ImageIO dispatch)") {
    def encoded(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(6, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 4).foreach(y => (0 until 6).foreach(x => img.setRGB(x, y, 0x336699)))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
      out.toByteArray
    }
    val df = Seq(("gif", encoded("gif")), ("bmp", encoded("bmp")))
      .toDF("fmt", "img")
    val metas = graft.multimodal.Multimodal.withImageMeta(df, "img")
      .select("fmt", "image_meta.width", "image_meta.height").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(metas == Map("gif" -> ((6, 4)), "bmp" -> ((6, 4))))
    // perceptual hash works on both — flat-color images hash identically
    val hashes = graft.multimodal.Multimodal.withImageAHash(df, "img")
      .select("ahash").collect().map(_.getLong(0))
    assert(hashes.distinct.length == 1)
  }

  test("real PNG decode: meta and mean channels via partitioned batch op") {
    val df = Seq((1L, png(200, 10, 30)), (2L, png(0, 0, 0)), (3L, Array.emptyByteArray))
      .toDF("id", "media")
    val out = Multimodal.withImageMeta(df, "media").orderBy("id").collect()
    val m1 = out(0).getStruct(out(0).fieldIndex("image_meta"))
    assert(m1.getInt(0) == 8 && m1.getInt(1) == 8)
    assert(math.abs(m1.getDouble(3) - 200.0) < 2.0) // jpeg-free exact-ish
    assert(out(2).isNullAt(out(2).fieldIndex("image_meta"))) // undecodable -> null
  }

  private def patternPng(left: java.awt.Color, right: java.awt.Color): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gr = img.createGraphics()
    gr.setColor(left); gr.fillRect(0, 0, 8, 16)
    gr.setColor(right); gr.fillRect(8, 0, 8, 16)
    gr.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("image embedding feeds similarity search: near-identical image ranks first") {
    import java.awt.Color
    val a = patternPng(new Color(200, 0, 0), new Color(0, 0, 200)) // query
    val a2 = patternPng(new Color(190, 10, 0), new Color(0, 10, 190)) // near-dup
    val b = patternPng(new Color(0, 200, 0), new Color(0, 200, 0)) // different
    val df = Seq((0L, a), (1L, a2), (2L, b)).toDF("id", "media")
    val emb = Multimodal.withImageEmbedding(df, "media")
    // embedding shape: grid^2 * 3 floats, non-null for decodable rows
    val e0 = emb.orderBy("id").collect()(0).getSeq[Float](2)
    assert(e0.length == 4 * 4 * 3)
    val top = graft.operators.Similarity.topKCosine(emb, "embedding", "id", 0L, 2)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(top.head == 1L, s"near-dup should rank first, got $top")
  }

  test("real resize round-trips through ImageIO") {
    val resized = Multimodal.resizeImage(png(50, 100, 150, 16, 16), 4, 4).get
    val meta = Multimodal.decodeImageMeta(resized).get
    assert(meta.width == 4 && meta.height == 4)
    assert(math.abs(meta.meanG - 100) < 3)
  }

  test("real WAV PCM16 parse: rate, samples, rms") {
    val sine = Array.tabulate(4410)(i => (math.sin(i * 0.1) * 16384).toShort)
    val m = Multimodal.decodeWavMeta(wav(44100, sine)).get
    assert(m.sampleRate == 44100 && m.channels == 1 && m.nSamples == 4410)
    assert(math.abs(m.rms - 0.5 / math.sqrt(2)) < 0.01)
    assert(Multimodal.decodeWavMeta("nope".getBytes).isEmpty)
  }

  test("frame sampling explodes deterministically without shuffle") {
    val df = Seq((1L, "videoA".getBytes), (2L, "videoB".getBytes)).toDF("id", "media")
    val out = Multimodal.explodeFrames(df, "media", 3)
    assert(out.count() == 6)
    val r = out.filter($"id" === 1L && $"frame_idx" === 0).collect()(0)
    val again = Multimodal.sampleFramesStub("videoA".getBytes, 1).head
    assert(r.getAs[Array[Byte]]("frame").sameElements(again))
    // flatMap within partitions: no exchange in the plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("aHash64: re-encoded/resized image hashes within a few bits, different image far") {
    import java.awt.Color
    val a = patternPng(new Color(230, 230, 230), new Color(20, 20, 20))
    // same pattern, slightly shifted colors -> near-identical hash
    val a2 = patternPng(new Color(215, 215, 215), new Color(35, 35, 35))
    val b = patternPng(new Color(20, 20, 20), new Color(230, 230, 230)) // inverted
    val Some(ha) = Multimodal.aHash64(a)
    val Some(ha2) = Multimodal.aHash64(a2)
    val Some(hb) = Multimodal.aHash64(b)
    // resize survives the lattice average
    val Some(resized) = Multimodal.resizeImage(a, 64, 64)
    val Some(har) = Multimodal.aHash64(resized)
    assert(java.lang.Long.bitCount(ha ^ ha2) <= 3)
    assert(java.lang.Long.bitCount(ha ^ har) <= 3)
    assert(java.lang.Long.bitCount(ha ^ hb) > 30) // inverted pattern flips bits
    assert(Multimodal.aHash64(Array.emptyByteArray).isEmpty)
  }

  test("image near-dup pipeline: withImageAHash + hammingNearDupPairs pairs only the dup") {
    import java.awt.Color
    val a = patternPng(new Color(230, 230, 230), new Color(20, 20, 20))
    val a2 = patternPng(new Color(215, 215, 215), new Color(35, 35, 35))
    val b = patternPng(new Color(20, 20, 20), new Color(230, 230, 230))
    val df = Seq((1L, a), (2L, a2), (3L, b), (4L, Array.emptyByteArray))
      .toDF("id", "media")
    val hashed = Multimodal.withImageAHash(df, "media")
    assert(hashed.filter($"id" === 4L).collect()(0).isNullAt(2)) // undecodable
    val pairs = graft.operators.Dedup.hammingNearDupPairs(
        hashed, "ahash", "id", hashBits = 64, numBands = 4, maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  // ---- AVI/MJPEG fixtures ----

  private def jpegFrame(r: Int, g: Int, b: Int, w: Int = 32, h: Int = 32): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gr = img.createGraphics()
    gr.setColor(new java.awt.Color(r, g, b))
    gr.fillRect(0, 0, w, h)
    gr.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 != 0) Array(0.toByte) else Array.emptyByteArray
    id.getBytes("ISO-8859-1") ++ le32(data.length) ++ data ++ pad
  }

  private def list(ltype: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", ltype.getBytes("ISO-8859-1") ++ children)

  /** Minimal spec-shaped AVI: hdrl (avih + strl(strh,strf)) + movi with
    * one '00dc' chunk per frame, optionally 'rec '-grouped. */
  private def mjpegAvi(frames: Seq[Array[Byte]], codec: String = "MJPG",
      recGroups: Boolean = false): Array[Byte] = {
    val strh = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("ISO-8859-1")).put(codec.getBytes("ISO-8859-1"))
    strh.putInt(0).putInt(0).putInt(0).putInt(1).putInt(25) // flags/prio/frames.. scale/rate
    val strf = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(32).putInt(32).putShort(1).putShort(24)
    strf.put(codec.getBytes("ISO-8859-1"))
    val avih = new Array[Byte](56)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val frameChunks = frames.map(f => chunk("00dc", f))
    val moviBody =
      if (recGroups) frameChunks.map(fc => list("rec ", fc)).fold(Array.emptyByteArray)(_ ++ _)
      else frameChunks.fold(Array.emptyByteArray)(_ ++ _)
    val movi = list("movi", moviBody)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le32(body.length) ++ body
  }

  test("AVI/MJPEG: real frame sampling decodes uniformly-strided JPEG frames") {
    // 10 frames, red ramp 0,25,..,225
    val avi = mjpegAvi((0 until 10).map(i => jpegFrame(25 * i, 0, 0)))
    val got = Multimodal.sampleFramesAvi(avi, 5)
    assert(got.length == 5)
    got.zipWithIndex.foreach { case (f, j) =>
      val m = Multimodal.decodeImageMeta(f).getOrElse(fail(s"frame $j not a decodable JPEG"))
      assert(m.width == 32 && m.height == 32)
      val want = 25 * (j * 10 / 5) // uniform stride: source frames 0,2,4,6,8
      assert(math.abs(m.meanR - want) < 8, s"frame $j meanR ${m.meanR} != ~$want")
    }
    // n beyond frame count returns every frame once
    assert(Multimodal.sampleFramesAvi(avi, 99).length == 10)
    // 'rec '-grouped interleave is walked too
    val rec = mjpegAvi((0 until 4).map(i => jpegFrame(0, 60 * i, 0)), recGroups = true)
    assert(Multimodal.sampleFramesAvi(rec, 4).length == 4)
  }

  test("AVI refusals are loud: non-MJPEG codec, frameless movi, non-AVI container") {
    val frames = Seq(jpegFrame(10, 10, 10))
    val h264 = intercept[java.io.IOException] {
      Multimodal.sampleFramesAvi(mjpegAvi(frames, codec = "H264"), 1)
    }
    assert(h264.getMessage.contains("codec"))
    val empty = intercept[java.io.IOException] {
      Multimodal.sampleFramesAvi(mjpegAvi(Nil), 1)
    }
    assert(empty.getMessage.contains("no video frames"))
    val notAvi = intercept[java.io.IOException] {
      Multimodal.sampleFrames("definitely not a video".getBytes, 1)
    }
    assert(notAvi.getMessage.contains("container"))
  }

  test("video near-dup pipeline end-to-end: AVI frames -> aHash -> hamming pairs") {
    import java.awt.Color
    def pattern(l: Color, r: Color): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gr = img.createGraphics()
      gr.setColor(l); gr.fillRect(0, 0, 16, 32)
      gr.setColor(r); gr.fillRect(16, 0, 16, 32)
      gr.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    // video 2 re-encodes video 1's scene slightly brighter; video 3 differs
    val v1 = mjpegAvi(Seq(pattern(new Color(230, 230, 230), new Color(20, 20, 20))))
    val v2 = mjpegAvi(Seq(pattern(new Color(218, 218, 218), new Color(32, 32, 32))))
    val v3 = mjpegAvi(Seq(pattern(new Color(20, 20, 20), new Color(230, 230, 230))))
    val df = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("id", "media")
    val frames = Multimodal.explodeFrames(df, "media", 1) // real path (AVI)
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
    val hashed = Multimodal.withImageAHash(frames, "frame")
      .withColumn("fid", $"id" * 10 + $"frame_idx")
    val pairs = graft.operators.Dedup.hammingNearDupPairs(
        hashed, "ahash", "fid", hashBits = 64, numBands = 4, maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((10L, 20L)), s"expected the near-dup videos' frames paired, got $pairs")
  }

  test("sniffContentType: each magic routes to its type, junk and null fall through") {
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> (Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A,
        0x0A) ++ "body".getBytes),
      2L -> (Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
        ++ "jfif".getBytes),
      3L -> "GIF89a-body".getBytes.toArray,
      4L -> "RIFFxxxxWAVE".getBytes.toArray,
      5L -> "%PDF-1.7 obj".getBytes.toArray,
      6L -> "plain text".getBytes.toArray,
      7L -> null,
      8L -> (Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes ++
        new Array[Byte](4)))
    val df = rows.toDF("id", "media")
    val out = Multimodal.sniffContentType(df, "media")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "png", 2L -> "jpeg", 3L -> "gif", 4L -> "riff",
      5L -> "pdf", 6L -> "unknown", 7L -> "missing", 8L -> "mp4"))
  }

  test("classifyMetadata: real chunk/marker walks find EXIF and text, flag corruption, skip standalones") {
    def chunk(t: String, data: Array[Byte]): Array[Byte] = {
      val len = data.length
      Array[Byte](((len >> 24) & 0xFF).toByte, ((len >> 16) & 0xFF).toByte,
        ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte) ++
        t.getBytes("ISO-8859-1") ++ data ++ Array[Byte](0, 0, 0, 0)
    }
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    val iend = chunk("IEND", Array.emptyByteArray)
    // PNG: eXIf chunk mid-chain, behind an innocuous IHDR-shaped chunk
    val pngExif = sig ++ chunk("IHDR", new Array[Byte](13)) ++
      chunk("eXIf", Array[Byte](1, 2)) ++ iend
    assert(Multimodal.classifyMetadata(pngExif) == (("png", true, "exif")))
    // PNG: tEXt only -> text; exif outranks text when both occur
    val pngText = sig ++ chunk("tEXt", "Author".getBytes) ++ iend
    assert(Multimodal.classifyMetadata(pngText) == (("png", true, "text")))
    val pngBoth = sig ++ chunk("tEXt", "x".getBytes) ++
      chunk("eXIf", Array[Byte](9)) ++ iend
    assert(Multimodal.classifyMetadata(pngBoth) == (("png", true, "exif")))
    // clean PNG
    assert(Multimodal.classifyMetadata(sig ++ iend) ==
      (("png", false, "none")))
    // truncated chain (no IEND): corrupt, not a silent "none"
    assert(Multimodal.classifyMetadata(
      sig ++ chunk("IHDR", new Array[Byte](13)).dropRight(6)) ==
      (("png", false, "corrupt")))
    // JPEG: APP1 must carry the Exif\0\0 prefix to count
    def jseg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, marker.toByte,
        (((payload.length + 2) >> 8) & 0xFF).toByte,
        ((payload.length + 2) & 0xFF).toByte) ++ payload
    val soi = Array(0xFF, 0xD8).map(_.toByte)
    val sos = Array(0xFF, 0xDA).map(_.toByte)
    val exifSeg = jseg(0xE1, "Exif\u0000\u0000ab".getBytes("ISO-8859-1"))
    assert(Multimodal.classifyMetadata(soi ++ exifSeg ++ sos) ==
      (("jpeg", true, "exif")))
    val xmpSeg = jseg(0xE1, "http://ns.adobe.com".getBytes)
    assert(Multimodal.classifyMetadata(soi ++ xmpSeg ++ sos) ==
      (("jpeg", false, "none")))
    // COM segment -> text; standalone RST marker is stepped over
    val rst = Array(0xFF.toByte, 0xD0.toByte)
    val com = jseg(0xFE, "hello".getBytes)
    assert(Multimodal.classifyMetadata(soi ++ rst ++ com ++ sos) ==
      (("jpeg", true, "text")))
    // truncated segment header -> corrupt
    assert(Multimodal.classifyMetadata(
      soi ++ Array(0xFF.toByte, 0xE1.toByte)) ==
      (("jpeg", false, "corrupt")))
    // non-media passes through untouched
    assert(Multimodal.classifyMetadata("plain".getBytes) ==
      (("unknown", false, "none")))
    // JPEG fill bytes: runs of 0xFF before a marker are padding (ITU
    // T.81 B.1.1.2), not part of the marker itself
    val fill = Array(0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    assert(Multimodal.classifyMetadata(soi ++ fill ++ com ++ sos) ==
      (("jpeg", true, "text")))
  }

  test("classifyMetadata: WebP RIFF chunks and GIF extensions") {
    def rchunk(cc: String, data: Array[Byte]): Array[Byte] = {
      val len = data.length
      cc.getBytes("ISO-8859-1") ++
        Array[Byte]((len & 0xFF).toByte, ((len >> 8) & 0xFF).toByte,
          ((len >> 16) & 0xFF).toByte, ((len >> 24) & 0xFF).toByte) ++
        data ++
        (if ((len & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
    }
    def webp(chunks: Array[Byte]*): Array[Byte] = {
      val body = "WEBP".getBytes("ISO-8859-1") ++ chunks.flatten
      val sz = body.length
      "RIFF".getBytes("ISO-8859-1") ++
        Array[Byte]((sz & 0xFF).toByte, ((sz >> 8) & 0xFF).toByte,
          ((sz >> 16) & 0xFF).toByte, ((sz >> 24) & 0xFF).toByte) ++ body
    }
    val vp8l = rchunk("VP8L", Array[Byte](0x2F, 0, 0, 0, 0)) // odd: pads
    assert(Multimodal.classifyMetadata(
      webp(vp8l, rchunk("EXIF", Array[Byte](1, 2, 3, 4)))) ==
      (("webp", true, "exif")))
    assert(Multimodal.classifyMetadata(
      webp(vp8l, rchunk("XMP ", "<x/>".getBytes))) ==
      (("webp", true, "xmp")))
    // exif outranks xmp when both ride the container
    assert(Multimodal.classifyMetadata(
      webp(rchunk("XMP ", "<x/>".getBytes),
        rchunk("EXIF", Array[Byte](9, 9)))) == (("webp", true, "exif")))
    assert(Multimodal.classifyMetadata(webp(vp8l)) ==
      (("webp", false, "none")))
    // declared size beyond the buffer with no metadata seen: corrupt,
    // not a silent "none"
    assert(Multimodal.classifyMetadata(webp(vp8l).dropRight(3)) ==
      (("webp", false, "corrupt")))
    // non-WebP RIFF (WAV/AVI) is recognized but not walked
    assert(Multimodal.classifyMetadata("RIFFxxxxWAVEfmt ".getBytes) ==
      (("riff", false, "none")))

    val gifHdr = "GIF89a".getBytes("ISO-8859-1") ++
      Array[Byte](1, 0, 1, 0, 0, 0, 0)
    val trailer = Array[Byte](0x3B)
    assert(Multimodal.classifyMetadata(gifHdr ++ trailer) ==
      (("gif", false, "none")))
    val comment = Array[Byte](0x21, 0xFE.toByte, 5) ++
      "hello".getBytes ++ Array[Byte](0)
    assert(Multimodal.classifyMetadata(gifHdr ++ comment ++ trailer) ==
      (("gif", true, "text")))
    val xmpExt = Array[Byte](0x21, 0xFF.toByte, 11) ++
      "XMP DataXMP".getBytes("ISO-8859-1") ++ Array[Byte](4) ++
      "<x/>".getBytes ++ Array[Byte](0)
    assert(Multimodal.classifyMetadata(gifHdr ++ xmpExt ++ trailer) ==
      (("gif", true, "xmp")))
    // a NON-XMP application extension (e.g. NETSCAPE2.0) is stepped over
    val netscape = Array[Byte](0x21, 0xFF.toByte, 11) ++
      "NETSCAPE2.0".getBytes("ISO-8859-1") ++
      Array[Byte](3, 1, 0, 0, 0)
    assert(Multimodal.classifyMetadata(
      gifHdr ++ netscape ++ comment ++ trailer) == (("gif", true, "text")))
    // global color table is skipped, not misread as a block
    val gctHdr = "GIF89a".getBytes("ISO-8859-1") ++
      Array[Byte](1, 0, 1, 0, 0x80.toByte, 0, 0) ++
      new Array[Byte](3 * 2) // packed size bits 0 -> 2 entries
    assert(Multimodal.classifyMetadata(gctHdr ++ comment ++ trailer) ==
      (("gif", true, "text")))
    // image descriptor with local color table + LZW sub-blocks skipped
    val imgDesc = Array[Byte](0x2C, 0, 0, 0, 0, 1, 0, 1, 0,
        0x80.toByte) ++ new Array[Byte](3 * 2) ++
      Array[Byte](2) ++ Array[Byte](2) ++ Array[Byte](0x4C, 0x01) ++
      Array[Byte](0)
    assert(Multimodal.classifyMetadata(
      gifHdr ++ imgDesc ++ comment ++ trailer) == (("gif", true, "text")))
    // truncated stream (no trailer, nothing seen): corrupt
    assert(Multimodal.classifyMetadata(gifHdr) == (("gif", false, "corrupt")))
  }
  test("classifyMetadata: ID3v2 frame walks (v2.2/v2.3/v2.4), priv > binary > text") {
    def syncsafe(n: Int): Array[Byte] = Array(
      ((n >> 21) & 0x7F).toByte, ((n >> 14) & 0x7F).toByte,
      ((n >> 7) & 0x7F).toByte, (n & 0x7F).toByte)
    def f3(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("ISO-8859-1") ++ Array[Byte](0, 0,
        ((data.length >> 8) & 0xFF).toByte, (data.length & 0xFF).toByte,
        0, 0) ++ data
    def f4(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("ISO-8859-1") ++ syncsafe(data.length) ++
        Array[Byte](0, 0) ++ data
    def tag(ver: Int, flags: Int, frames: Array[Byte]*): Array[Byte] = {
      val body = frames.flatten.toArray
      "ID3".getBytes("ISO-8859-1") ++
        Array[Byte](ver.toByte, 0, flags.toByte) ++
        syncsafe(body.length) ++ body
    }
    // v2.3: PRIV outranks COMM outranks none
    assert(Multimodal.classifyMetadata(
      tag(3, 0, f3("PRIV", "owner".getBytes), f3("COMM", "c".getBytes))) ==
      (("mp3", true, "priv")))
    assert(Multimodal.classifyMetadata(tag(3, 0, f3("COMM", "c".getBytes))) ==
      (("mp3", true, "text")))
    assert(Multimodal.classifyMetadata(tag(3, 0, f3("TIT2", "t".getBytes))) ==
      (("mp3", true, "text")))
    assert(Multimodal.classifyMetadata(
      tag(3, 0, f3("APIC", Array[Byte](1, 2, 3)))) ==
      (("mp3", true, "binary")))
    assert(Multimodal.classifyMetadata(tag(3, 0)) == (("mp3", false, "none")))
    // v2.4 syncsafe frame sizes
    assert(Multimodal.classifyMetadata(tag(4, 0, f4("PRIV", "o".getBytes))) ==
      (("mp3", true, "priv")))
    // v2.3 extended header (flag 0x40): 4-byte size EXCLUDING itself,
    // then the frame chain
    val ext = Array[Byte](0, 0, 0, 6, 0, 0, 0, 0, 0, 0) // 6 bytes follow
    val bodyE = ext ++ f3("COMM", "c".getBytes)
    val tagE = "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](3, 0, 0x40.toByte) ++ syncsafe(bodyE.length) ++ bodyE
    assert(Multimodal.classifyMetadata(tagE) == (("mp3", true, "text")))
    // padding byte (0x00) cleanly ends the chain
    val padded = tag(3, 0, f3("COMM", "c".getBytes) ++ Array[Byte](0, 0, 0))
    assert(Multimodal.classifyMetadata(padded) == (("mp3", true, "text")))
    // v2.2: 3-char ids, 3-byte sizes
    val com22 = "COM".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 1, 9)
    val v22 = "ID3".getBytes("ISO-8859-1") ++ Array[Byte](2, 0, 0) ++
      syncsafe(com22.length) ++ com22
    assert(Multimodal.classifyMetadata(v22) == (("mp3", true, "text")))
    // non-syncsafe header size byte: corrupt
    val bad = "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](3, 0, 0, 0x80.toByte, 0, 0, 0)
    assert(Multimodal.classifyMetadata(bad) == (("mp3", false, "corrupt")))
    // frame size overrunning the declared tag: corrupt, nothing claimed
    val overrun = tag(3, 0).dropRight(0) ++ f3("COMM", "c".getBytes)
    // (tag declares size 0 but bytes follow: the walk stops at the
    // declared end and reports the clean empty tag)
    assert(Multimodal.classifyMetadata(overrun) == (("mp3", false, "none")))
    val truncated = tag(3, 0, f3("COMM", new Array[Byte](200))).take(20)
    assert(Multimodal.classifyMetadata(truncated) == (("mp3", false, "corrupt")))
  }
  test("classifyMetadata: WebP/GIF metadata AFTER a >64 KiB image payload is found") {
    // the WebP extended format puts EXIF/XMP chunks after the image
    // data, and GIF comments may trail image blocks — a header-cap walk
    // would misreport these real shapes as corrupt
    def rchunk(cc: String, data: Array[Byte]): Array[Byte] = {
      val len = data.length
      cc.getBytes("ISO-8859-1") ++
        Array[Byte]((len & 0xFF).toByte, ((len >> 8) & 0xFF).toByte,
          ((len >> 16) & 0xFF).toByte, ((len >> 24) & 0xFF).toByte) ++
        data ++
        (if ((len & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
    }
    val bigPixels = rchunk("VP8L", Array[Byte](0x2F) ++
      new Array[Byte](100000))
    val body = "WEBP".getBytes("ISO-8859-1") ++ bigPixels ++
      rchunk("EXIF", Array[Byte](1, 2, 3, 4))
    val sz = body.length
    val bigWebp = "RIFF".getBytes("ISO-8859-1") ++
      Array[Byte]((sz & 0xFF).toByte, ((sz >> 8) & 0xFF).toByte,
        ((sz >> 16) & 0xFF).toByte, ((sz >> 24) & 0xFF).toByte) ++ body
    assert(Multimodal.classifyMetadata(bigWebp) == (("webp", true, "exif")))
    // same shape, no trailing metadata: clean none (the declared end is
    // reached past the old cap)
    val body2 = "WEBP".getBytes("ISO-8859-1") ++ bigPixels
    val sz2 = body2.length
    val bigClean = "RIFF".getBytes("ISO-8859-1") ++
      Array[Byte]((sz2 & 0xFF).toByte, ((sz2 >> 8) & 0xFF).toByte,
        ((sz2 >> 16) & 0xFF).toByte, ((sz2 >> 24) & 0xFF).toByte) ++ body2
    assert(Multimodal.classifyMetadata(bigClean) == (("webp", false, "none")))

    // GIF: comment extension after >64 KiB of LZW image sub-blocks
    val gifHdr = "GIF89a".getBytes("ISO-8859-1") ++
      Array[Byte](1, 0, 1, 0, 0, 0, 0)
    val lzwChain = Array[Byte](2) ++ // min code size
      Array.fill(300)(Array[Byte](0xFF.toByte) ++
        new Array[Byte](255)).flatten ++ Array[Byte](0)
    val imgDesc = Array[Byte](0x2C, 0, 0, 0, 0, 1, 0, 1, 0, 0) ++ lzwChain
    val comment = Array[Byte](0x21, 0xFE.toByte, 5) ++
      "hello".getBytes ++ Array[Byte](0)
    val bigGif = gifHdr ++ imgDesc ++ comment ++ Array[Byte](0x3B)
    assert(bigGif.length > 65536)
    assert(Multimodal.classifyMetadata(bigGif) == (("gif", true, "text")))
    val bigGifClean = gifHdr ++ imgDesc ++ Array[Byte](0x3B)
    assert(Multimodal.classifyMetadata(bigGifClean) ==
      (("gif", false, "none")))
  }
  test("classifyMetadata: ID3v2.3 tag-level unsynchronisation is stripped before the walk") {
    def syncsafe(n: Int): Array[Byte] = Array(
      ((n >> 21) & 0x7F).toByte, ((n >> 14) & 0x7F).toByte,
      ((n >> 7) & 0x7F).toByte, (n & 0x7F).toByte)
    def f3(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("ISO-8859-1") ++ Array[Byte](0, 0,
        ((data.length >> 8) & 0xFF).toByte, (data.length & 0xFF).toByte,
        0, 0) ++ data
    // v2.3 unsynchronisation: 0x00 stuffed after every 0xFF across the
    // WHOLE assembled tag; stored frame sizes describe the PRE-stuffing
    // data, so a raw-offset walk over the stuffed bytes misparses
    def stuff(raw: Array[Byte]): Array[Byte] =
      raw.flatMap(x => if ((x & 0xFF) == 0xFF) Array[Byte](x, 0)
        else Array[Byte](x))
    // PRIV data of 255 bytes: the frame-size field itself carries an
    // 0xFF byte, so stuffing shifts every subsequent offset — the
    // adversarial case for a non-stripping walk
    val raw = f3("PRIV", new Array[Byte](255)) ++
      f3("COMM", Array[Byte](0xFF.toByte, 1, 2))
    val stuffed = stuff(raw)
    assert(stuffed.length > raw.length) // stuffing actually happened
    val unsyncTag = "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](3, 0, 0x80.toByte) ++ syncsafe(stuffed.length) ++ stuffed
    assert(Multimodal.classifyMetadata(unsyncTag) == (("mp3", true, "priv")))
    // same frames, no unsync: identical verdict
    val plainTag = "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](3, 0, 0) ++ syncsafe(raw.length) ++ raw
    assert(Multimodal.classifyMetadata(plainTag) == (("mp3", true, "priv")))
    // v2.4 tag-level unsync flag: frame sizes are STORED (post-stuffing)
    // sizes with syncsafe headers, so the raw walk stays offset-correct
    def f4(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("ISO-8859-1") ++ syncsafe(data.length) ++
        Array[Byte](0, 0x02) ++ data // per-frame unsync flag set
    val d4 = stuff(Array[Byte](0xFF.toByte, 7)) // stored = stuffed bytes
    val v4 = "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](4, 0, 0x80.toByte) ++
      syncsafe(f4("PRIV", d4).length) ++ f4("PRIV", d4)
    assert(Multimodal.classifyMetadata(v4) == (("mp3", true, "priv")))
    // truncated unsync tag (declared size past the buffer): corrupt,
    // nothing claimed
    val cut = unsyncTag.take(unsyncTag.length - 40)
    assert(Multimodal.classifyMetadata(cut)._1 == "mp3")
  }
  test("classifyMetadata: MP4/ISO-BMFF box walk — gps/xmp/ilst, largesize, size-0, truncation") {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val sz = payload.length + 8
      Array[Byte](((sz >> 24) & 0xFF).toByte, ((sz >> 16) & 0xFF).toByte,
        ((sz >> 8) & 0xFF).toByte, (sz & 0xFF).toByte) ++
        typ.getBytes("ISO-8859-1") ++ payload
    }
    val ftyp = box("ftyp", "isomxxxxisom".getBytes("ISO-8859-1"))
    val mdat = box("mdat", new Array[Byte](50))
    val mvhd = box("mvhd", new Array[Byte](100))
    val cxyz = box("\u00A9xyz",
      Array[Byte](0, 4, 0x15, 0xC7.toByte) ++ "+1-2".getBytes)
    // GPS under moov/udta, moov AFTER mdat (non-faststart)
    assert(Multimodal.classifyMetadata(
      ftyp ++ mdat ++ box("moov", mvhd ++ box("udta", cxyz))) ==
      (("mp4", true, "gps")))
    // loci (3GPP) is gps too
    assert(Multimodal.classifyMetadata(
      ftyp ++ box("moov", box("udta", box("loci", new Array[Byte](12))))) ==
      (("mp4", true, "gps")))
    // XMP uuid at top level
    val xmpUuid = Array(0xBE, 0x7A, 0xCF, 0xCB, 0x97, 0xA9, 0x42, 0xE8,
      0x9C, 0x71, 0x99, 0x94, 0x91, 0xE3, 0xAF, 0xAC).map(_.toByte)
    assert(Multimodal.classifyMetadata(
      ftyp ++ box("uuid", xmpUuid ++ "<x/>".getBytes) ++
        box("moov", mvhd)) == (("mp4", true, "xmp")))
    // a NON-XMP uuid box is stepped over, not claimed
    assert(Multimodal.classifyMetadata(
      ftyp ++ box("uuid", new Array[Byte](24)) ++ box("moov", mvhd)) ==
      (("mp4", false, "none")))
    // ilst under moov/udta/meta (meta = FULL box, 4 version bytes)
    val meta = box("meta", Array[Byte](0, 0, 0, 0) ++
      box("hdlr", new Array[Byte](24)) ++
      box("ilst", box("\u00A9nam", box("data", "t".getBytes))))
    assert(Multimodal.classifyMetadata(
      ftyp ++ box("moov", mvhd ++ box("udta", meta))) ==
      (("mp4", true, "text")))
    // gps outranks text when both present
    assert(Multimodal.classifyMetadata(
      ftyp ++ box("moov", box("udta", meta ++ cxyz))) ==
      (("mp4", true, "gps")))
    // clean no-metadata file walks to the exact end: none
    assert(Multimodal.classifyMetadata(
      ftyp ++ box("free", new Array[Byte](8)) ++ mdat ++
        box("moov", mvhd)) == (("mp4", false, "none")))
    // size = 1: 64-bit largesize header
    val largePayload = new Array[Byte](30)
    val largeMdat = Array[Byte](0, 0, 0, 1) ++
      "mdat".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, (16 + largePayload.length).toByte) ++
      largePayload
    assert(Multimodal.classifyMetadata(
      ftyp ++ largeMdat ++ box("moov", box("udta", cxyz))) ==
      (("mp4", true, "gps")))
    // size = 0: box runs to the end of the file — clean exit
    val lastBox = Array[Byte](0, 0, 0, 0) ++
      "mdat".getBytes("ISO-8859-1") ++ new Array[Byte](17)
    assert(Multimodal.classifyMetadata(ftyp ++ lastBox) ==
      (("mp4", false, "none")))
    // moov size overruns the buffer with nothing seen: corrupt
    val trunc = (ftyp ++ mdat ++
      box("moov", mvhd ++ new Array[Byte](64))).dropRight(64)
    assert(Multimodal.classifyMetadata(trunc) == (("mp4", false, "corrupt")))
    // truncation AFTER the metadata was seen still reports what it saw
    val seenThenCut = ftyp ++ box("moov",
      box("udta", cxyz) ++ new Array[Byte](64)).dropRight(40)
    assert(Multimodal.classifyMetadata(seenThenCut) == (("mp4", true, "gps")))
    // undersized box (size < 8): corrupt
    assert(Multimodal.classifyMetadata(
      ftyp ++ Array[Byte](0, 0, 0, 5) ++ "mdat".getBytes) ==
      (("mp4", false, "corrupt")))
  }
  test("classifyMetadata: FLAC block chain and OGG VorbisComment packets") {
    def le32(n: Int): Array[Byte] = Array((n & 0xFF).toByte,
      ((n >> 8) & 0xFF).toByte, ((n >> 16) & 0xFF).toByte,
      ((n >> 24) & 0xFF).toByte)
    def blk(t: Int, last: Boolean, data: Array[Byte]): Array[Byte] =
      Array[Byte]((((if (last) 0x80 else 0) | t) & 0xFF).toByte,
        ((data.length >> 16) & 0xFF).toByte,
        ((data.length >> 8) & 0xFF).toByte, (data.length & 0xFF).toByte) ++
        data
    def vc(comments: Seq[String]): Array[Byte] = {
      val vendor = "v".getBytes
      le32(vendor.length) ++ vendor ++ le32(comments.length) ++
        comments.flatMap(c => le32(c.length).toSeq ++ c.getBytes.toSeq)
    }
    val si = blk(0, last = false, new Array[Byte](34))
    val fl = "fLaC".getBytes
    assert(Multimodal.classifyMetadata(
      fl ++ si ++ blk(4, last = true, vc(Seq("A=1")))) ==
      (("flac", true, "text")))
    // empty comment LIST is clean (count parsed, not presence-sniffed)
    assert(Multimodal.classifyMetadata(
      fl ++ si ++ blk(4, last = true, vc(Seq.empty))) ==
      (("flac", false, "none")))
    // PICTURE/APPLICATION are binary; binary outranks text
    assert(Multimodal.classifyMetadata(
      fl ++ si ++ blk(6, last = true, new Array[Byte](9))) ==
      (("flac", true, "binary")))
    assert(Multimodal.classifyMetadata(
      fl ++ blk(2, last = false, new Array[Byte](6)) ++
        blk(4, last = true, vc(Seq("A=1")))) == (("flac", true, "binary")))
    assert(Multimodal.classifyMetadata(
      fl ++ blk(0, last = true, new Array[Byte](34))) ==
      (("flac", false, "none")))
    // no last-block flag before the buffer ends: corrupt
    assert(Multimodal.classifyMetadata(fl ++ si) ==
      (("flac", false, "corrupt")))
    // forbidden block type 127: corrupt
    assert(Multimodal.classifyMetadata(
      fl ++ blk(127, last = true, Array.emptyByteArray)) ==
      (("flac", false, "corrupt")))
    // comment count field beyond the declared block: corrupt, not guessed
    assert(Multimodal.classifyMetadata(
      fl ++ si ++ blk(4, last = true, le32(900) ++ "v".getBytes)) ==
      (("flac", false, "corrupt")))

    def page(ht: Int, payload: Array[Byte]): Array[Byte] = {
      val nFull = payload.length / 255
      val rem = payload.length % 255
      val segs = Array.fill[Byte](nFull)(0xFF.toByte) :+ rem.toByte
      "OggS".getBytes ++ Array[Byte](0, ht.toByte) ++
        new Array[Byte](8) ++ le32(1) ++ le32(0) ++ le32(0) ++
        Array[Byte](segs.length.toByte) ++ segs ++ payload
    }
    val ident = Array[Byte](1) ++ "vorbis".getBytes ++ new Array[Byte](23)
    def cp(comments: Seq[String]): Array[Byte] =
      Array[Byte](3) ++ "vorbis".getBytes ++ vc(comments)
    assert(Multimodal.classifyMetadata(
      page(2, ident) ++ page(0, cp(Seq("T=1"))) ++
        page(4, new Array[Byte](9))) == (("ogg", true, "text")))
    assert(Multimodal.classifyMetadata(
      page(2, ident) ++ page(0, cp(Seq.empty)) ++
        page(4, new Array[Byte](9))) == (("ogg", false, "none")))
    // OpusTags carries the same vendor+count structure
    val opusTags = "OpusTags".getBytes ++ vc(Seq("T=1"))
    assert(Multimodal.classifyMetadata(
      page(2, Array[Byte](1) ++ "opusHead47".getBytes) ++
        page(0, opusTags)) == (("ogg", true, "text")))
    // whole file walked, no comment packet anywhere: none
    assert(Multimodal.classifyMetadata(
      page(2, ident) ++ page(4, new Array[Byte](9))) ==
      (("ogg", false, "none")))
    // a page cut mid-payload with no verdict yet: corrupt
    assert(Multimodal.classifyMetadata(
      (page(2, ident) ++ page(0, cp(Seq("T=1")))).dropRight(5)) ==
      (("ogg", false, "corrupt")))
    // bad page version byte: corrupt
    val badVer = page(2, ident)
    badVer(4) = 9
    assert(Multimodal.classifyMetadata(badVer) == (("ogg", false, "corrupt")))
    // comment count spanning out of its page: corrupt, not guessed
    assert(Multimodal.classifyMetadata(
      page(2, ident) ++ page(0, Array[Byte](3) ++ "vorbis".getBytes ++
        le32(900) ++ "v".getBytes)) == (("ogg", false, "corrupt")))
  }
  test("classifyMetadata: ZIP central directory — OOXML/ODF metadata parts by name") {
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 24) & 0xFF).toByte)
    def zipOf(names: Seq[String], comment: Int = 0): Array[Byte] = {
      var locals = Array.emptyByteArray
      var centrals = Array.emptyByteArray
      for (name <- names) {
        val nb = name.getBytes("ISO-8859-1")
        val off = locals.length
        locals = locals ++ Array[Byte](0x50, 0x4B, 3, 4) ++ le16(20) ++
          le16(0) ++ le16(0) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(0) ++
          le32(0) ++ le16(nb.length) ++ le16(0) ++ nb
        centrals = centrals ++ Array[Byte](0x50, 0x4B, 1, 2) ++ le16(20) ++
          le16(20) ++ le16(0) ++ le16(0) ++ le16(0) ++ le16(0) ++ le32(0) ++
          le32(0) ++ le32(0) ++ le16(nb.length) ++ le16(0) ++ le16(0) ++
          le16(0) ++ le16(0) ++ le32(0) ++ le32(off) ++ nb
      }
      locals ++ centrals ++ (Array[Byte](0x50, 0x4B, 5, 6) ++ le16(0) ++
        le16(0) ++ le16(names.size) ++ le16(names.size) ++
        le32(centrals.length) ++ le32(locals.length) ++ le16(comment)) ++
        new Array[Byte](comment)
    }
    assert(Multimodal.classifyMetadata(
      zipOf(Seq("[Content_Types].xml", "docProps/core.xml"))) ==
      (("zip", true, "text")))
    assert(Multimodal.classifyMetadata(
      zipOf(Seq("mimetype", "meta.xml"))) == (("zip", true, "text")))
    assert(Multimodal.classifyMetadata(
      zipOf(Seq("data.bin", "word/document.xml"))) ==
      (("zip", false, "none")))
    // a trailing archive comment shifts the EOCD off the tail — the
    // backward scan must still find it
    assert(Multimodal.classifyMetadata(
      zipOf(Seq("docProps/core.xml"), comment = 300)) ==
      (("zip", true, "text")))
    // name-prefix near-miss must not match (core.xml elsewhere)
    assert(Multimodal.classifyMetadata(
      zipOf(Seq("other/docProps/core.xml.bak"))) == (("zip", false, "none")))
    // EOCD naming an absent central directory: corrupt
    val good = zipOf(Seq("x"))
    val noCentral = good.take(31) ++ good.takeRight(22)
    assert(Multimodal.classifyMetadata(noCentral) ==
      (("zip", false, "corrupt")))
    // no EOCD at all (streamed/truncated zip): corrupt
    assert(Multimodal.classifyMetadata(good.dropRight(22) ++
      new Array[Byte](4)) == (("zip", false, "corrupt")))
    // ZIP64 sentinel count: honestly refused as corrupt, not mis-walked
    val z64 = good.clone()
    z64(good.length - 12) = 0xFF.toByte
    z64(good.length - 11) = 0xFF.toByte
    assert(Multimodal.classifyMetadata(z64) == (("zip", false, "corrupt")))
  }
  test("classifyMetadata: PDF trailer /Info, xref-stream dict, XMP packet, /Prev chain") {
    val hdr = "%PDF-1.4\n1 0 obj << /Type /Catalog >> endobj\n"
    def classic(trailer: String, body: String = hdr): Array[Byte] =
      (body + "xref\n0 1\n0000000000 65535 f \ntrailer\n" + trailer +
        "\nstartxref\n" + body.length + "\n%%EOF").getBytes("ISO-8859-1")
    assert(Multimodal.classifyMetadata(
      classic("<< /Size 1 /Root 1 0 R /Info 2 0 R >>")) ==
      (("pdf", true, "text")))
    assert(Multimodal.classifyMetadata(
      classic("<< /Size 1 /Root 1 0 R >>")) == (("pdf", false, "none")))
    // name boundary: /Information must NOT match /Info
    assert(Multimodal.classifyMetadata(
      classic("<< /Size 1 /Information 2 0 R >>")) ==
      (("pdf", false, "none")))
    // nested dict inside the trailer is balanced over, not mistaken
    assert(Multimodal.classifyMetadata(
      classic("<< /Size 1 /Enc << /V 2 >> /Info 2 0 R >>")) ==
      (("pdf", true, "text")))
    // 1.5+ xref STREAM: trailer keys in the stream object's dict
    val b15 = "%PDF-1.5\n1 0 obj << /X 1 >> endobj\n"
    val xs = (b15 + "5 0 obj\n<< /Type /XRef /Size 6 /Info 2 0 R >>\n" +
      "stream\nxx\nendstream\nendobj\nstartxref\n" + b15.length +
      "\n%%EOF").getBytes("ISO-8859-1")
    assert(Multimodal.classifyMetadata(xs) == (("pdf", true, "text")))
    // XMP packet marker outranks /Info (xmp > text, the GIF convention)
    val xmpBody = hdr +
      "2 0 obj\nstream\n<?xpacket begin=\"\" id=\"X\"?><x/>" +
      "<?xpacket end=\"w\"?>\nendstream endobj\n"
    assert(Multimodal.classifyMetadata(
      classic("<< /Size 1 /Info 2 0 R >>", xmpBody)) ==
      (("pdf", true, "xmp")))
    // incremental update: /Info only in the PREVIOUS trailer (via /Prev)
    val first = hdr + "xref\n0 1\n0000000000 65535 f \ntrailer\n" +
      "<< /Size 1 /Info 2 0 R >>\n"
    val second = first + "xref\n0 1\n0000000000 65535 f \ntrailer\n" +
      s"<< /Size 1 /Prev ${hdr.length} >>\nstartxref\n" + first.length +
      "\n%%EOF"
    assert(Multimodal.classifyMetadata(second.getBytes("ISO-8859-1")) ==
      (("pdf", true, "text")))
    // startxref pointing past EOF: corrupt
    assert(Multimodal.classifyMetadata(
      (hdr + "startxref\n99999\n%%EOF").getBytes("ISO-8859-1")) ==
      (("pdf", false, "corrupt")))
    // no startxref at all: corrupt (a PDF without a trailer is broken)
    assert(Multimodal.classifyMetadata(
      (hdr + "%%EOF").getBytes("ISO-8859-1")) == (("pdf", false, "corrupt")))
    // unterminated trailer dict: corrupt
    assert(Multimodal.classifyMetadata(
      classic("<< /Size 1 /Root 1 0 R").dropRight(0)) ==
      (("pdf", false, "corrupt")))
  }
  test("classifyMetadata: TIFF IFD chains — LE/BE, BigTIFF, multi-IFD, cycles, truncation") {
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 24) & 0xFF).toByte)
    def be16(v: Int) = Array[Byte](((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def tiffLE(tags: Seq[Int], next: Int = 0): Array[Byte] =
      "II".getBytes ++ le16(42) ++ le32(8) ++ le16(tags.size) ++
        tags.sorted.flatMap(t => le16(t) ++ le16(4) ++ le32(1) ++ le32(0)) ++
        le32(next)
    def tiffBE(tags: Seq[Int]): Array[Byte] =
      "MM".getBytes ++ be16(42) ++ be32(8) ++ be16(tags.size) ++
        tags.sorted.flatMap(t => be16(t) ++ be16(4) ++ be32(1) ++ be32(0)) ++
        be32(0)
    assert(Multimodal.classifyMetadata(tiffLE(Seq(256, 34853))) ==
      (("tiff", true, "gps")))
    assert(Multimodal.classifyMetadata(tiffBE(Seq(256, 34665))) ==
      (("tiff", true, "exif")))
    assert(Multimodal.classifyMetadata(tiffLE(Seq(700))) ==
      (("tiff", true, "xmp")))
    assert(Multimodal.classifyMetadata(tiffBE(Seq(270))) ==
      (("tiff", true, "text")))
    assert(Multimodal.classifyMetadata(tiffLE(Seq(256, 257))) ==
      (("tiff", false, "none")))
    // gps outranks exif outranks xmp outranks text
    assert(Multimodal.classifyMetadata(
      tiffLE(Seq(270, 700, 34665, 34853))) == (("tiff", true, "gps")))
    // second IFD in the chain carries the GPS tag (the COG-overviews
    // layout: metadata can sit on ANY IFD)
    val first = tiffLE(Seq(256), next = 0)
    val chained = "II".getBytes ++ le16(42) ++ le32(8) ++ le16(1) ++
      (le16(256) ++ le16(4) ++ le32(1) ++ le32(0)) ++
      le32(8 + 2 + 12 + 4) ++ // next IFD right after this one
      le16(1) ++ (le16(34853) ++ le16(4) ++ le32(1) ++ le32(0)) ++ le32(0)
    assert(first.length == 8 + 2 + 12 + 4) // layout sanity
    assert(Multimodal.classifyMetadata(chained) == (("tiff", true, "gps")))
    // IFD chain cycle: corrupt, never an infinite walk
    val cyclic = "II".getBytes ++ le16(42) ++ le32(8) ++ le16(1) ++
      (le16(256) ++ le16(4) ++ le32(1) ++ le32(0)) ++ le32(8) // next = self
    assert(Multimodal.classifyMetadata(cyclic) == (("tiff", false, "corrupt")))
    // IFD offset beyond the buffer: corrupt
    assert(Multimodal.classifyMetadata(
      "II".getBytes ++ le16(42) ++ le32(4096) ++ le16(0)) ==
      (("tiff", false, "corrupt")))
    // entry table truncated mid-IFD: corrupt
    assert(Multimodal.classifyMetadata(tiffLE(Seq(256, 34853)).dropRight(9)) ==
      (("tiff", false, "corrupt")))
    // BigTIFF (version 43, 8-byte offsets): LE with a GPS tag
    def le64(v: Long) = (0 until 8).map(i => ((v >> (8 * i)) & 0xFF).toByte)
      .toArray
    val bigT = "II".getBytes ++ le16(43) ++ le16(8) ++ le16(0) ++ le64(16L) ++
      le64(1L) ++ (le16(34853) ++ le16(4) ++ le64(1L) ++ le64(0L)) ++ le64(0L)
    assert(Multimodal.classifyMetadata(bigT) == (("tiff", true, "gps")))
    // BigTIFF with a bad offset-size field: corrupt
    val badBig = "II".getBytes ++ le16(43) ++ le16(4) ++ le16(0) ++ le64(16L)
    assert(Multimodal.classifyMetadata(badBig) == (("tiff", false, "corrupt")))
  }
}
