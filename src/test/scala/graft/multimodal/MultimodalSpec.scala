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
}
