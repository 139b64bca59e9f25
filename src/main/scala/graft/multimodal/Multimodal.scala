package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (builder contract):
  * image/audio/video as opaque `binary` columns with typed metadata, and
  * per-partition batch decode / feature-extract / resize / frame-sample
  * operators.
  *
  * Spark-side plumbing (schema, partitioning, batch shape) is real and
  * tested. Codec coverage in this container: PNG/JPEG decode + resize are
  * REAL (javax.imageio + Graphics2D); WAV/PCM16 audio parsing is REAL
  * (plain header parse); compressed audio/video decode is STUBBED with a
  * deterministic md5-derived fake (no codec libs in the container) behind
  * the same API, so swapping in a real codec changes one function.
  */
object Multimodal {

  final case class ImageMeta(width: Int, height: Int, bands: Int,
      meanR: Double, meanG: Double, meanB: Double)
  final case class AudioMeta(sampleRate: Int, channels: Int, nSamples: Long,
      rms: Double)

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("bands", IntegerType), StructField("meanR", DoubleType),
    StructField("meanG", DoubleType), StructField("meanB", DoubleType)))

  // ---- image ----

  /** REAL decode for PNG/JPEG bytes; null on undecodable input. */
  def decodeImageMeta(bytes: Array[Byte]): Option[ImageMeta] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        var (sr, sg, sb) = (0L, 0L, 0L)
        val w = img.getWidth
        val h = img.getHeight
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        Some(ImageMeta(w, h, img.getColorModel.getNumComponents,
          sr / n, sg / n, sb / n))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL resize: decode -> bilinear scale -> PNG bytes; null if undecodable. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Adds an `image_meta` struct column decoded per partition-batch from a
    * binary column. Null-safe: undecodable rows get null meta. */
  def withImageMeta(df: DataFrame, binaryCol: String, out: String = "image_meta"): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(out, imageMetaSchema, nullable = true)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val meta = Option(r.getAs[Array[Byte]](binaryCol)).flatMap(decodeImageMeta)
          .map(m => Row(m.width, m.height, m.bands, m.meanR, m.meanG, m.meanB)).orNull
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** REAL patch-mean image embedding: decode, partition the image into a
    * `grid`×`grid` cell lattice, average RGB per cell → float vector of
    * length grid²·3. The classic codec-only baseline embedding — feeds
    * straight into [[graft.operators.Similarity]] (cosine top-k, blocked
    * near-dup, LSH, IVF) for image-dedup pipelines. */
  def imageEmbedding(bytes: Array[Byte], grid: Int = 4): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](grid * grid * 3)
        val counts = new Array[Long](grid * grid)
        var y = 0
        while (y < h) {
          val cy = math.min(grid - 1, y * grid / h)
          var x = 0
          while (x < w) {
            val cx = math.min(grid - 1, x * grid / w)
            val cell = cy * grid + cx
            val p = img.getRGB(x, y)
            sums(cell * 3) += (p >> 16) & 0xff
            sums(cell * 3 + 1) += (p >> 8) & 0xff
            sums(cell * 3 + 2) += p & 0xff
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        val out = new Array[Float](grid * grid * 3)
        var c = 0
        while (c < grid * grid) {
          val n = math.max(1L, counts(c)).toDouble
          out(c * 3) = (sums(c * 3) / n).toFloat
          out(c * 3 + 1) = (sums(c * 3 + 1) / n).toFloat
          out(c * 3 + 2) = (sums(c * 3 + 2) / n).toFloat
          c += 1
        }
        Some(out)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Adds an `embedding: array<float>` column (patch-mean, see
    * [[imageEmbedding]]) decoded per partition-batch — the binary-column →
    * embedding-column step of an image near-dup pipeline. */
  def withImageEmbedding(df: DataFrame, binaryCol: String,
      out: String = "embedding", grid: Int = 4): DataFrame = {
    val schema = df.schema.add(out, ArrayType(FloatType), nullable = true)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val emb = Option(r.getAs[Array[Byte]](binaryCol))
          .flatMap(b => imageEmbedding(b, grid)).map(_.toSeq).orNull
        Row.fromSeq(r.toSeq :+ emb)
      }
    }(enc)
  }

  /** REAL 64-bit average-hash (aHash) perceptual image fingerprint:
    * decode, average grayscale per cell of an 8x8 lattice, one bit per
    * cell = cell-mean > image-mean. Robust to resizing/re-encoding (the
    * lattice averages survive), so near-identical images land within a
    * few bits — pair them with [[graft.operators.Dedup.hammingNearDupPairs]]. */
  def aHash64(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](64)
        val counts = new Array[Long](64)
        var y = 0
        while (y < h) {
          val cy = math.min(7, y * 8 / h)
          var x = 0
          while (x < w) {
            val cx = math.min(7, x * 8 / w)
            val p = img.getRGB(x, y)
            // integer luma (BT.601 weights scaled by 1000) — deterministic
            val gray = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114)
            sums(cy * 8 + cx) += gray
            counts(cy * 8 + cx) += 1
            x += 1
          }
          y += 1
        }
        var total = 0.0
        val means = Array.tabulate(64)(c => sums(c).toDouble / math.max(1L, counts(c)))
        means.foreach(total += _)
        val mean = total / 64
        var bits = 0L
        var c = 0
        while (c < 64) {
          if (means(c) > mean) bits |= (1L << c)
          c += 1
        }
        Some(bits)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Adds an `ahash: bigint` perceptual-hash column decoded per
    * partition-batch (null for undecodable rows) — the image analogue of
    * [[graft.operators.Text.simhash16]]'s text fingerprint. */
  def withImageAHash(df: DataFrame, binaryCol: String, out: String = "ahash"): DataFrame = {
    val schema = df.schema.add(out, LongType, nullable = true)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val hsh = Option(r.getAs[Array[Byte]](binaryCol)).flatMap(aHash64)
          .map(java.lang.Long.valueOf).orNull
        Row.fromSeq(r.toSeq :+ hsh)
      }
    }(enc)
  }

  // ---- audio ----

  /** REAL WAV/PCM16 parse (RIFF header + fmt + data chunks). */
  def decodeWavMeta(bytes: Array[Byte]): Option[AudioMeta] = {
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (bytes.length < 44 || bb.getInt(0) != 0x46464952 /* RIFF */ ) return None
      var pos = 12
      var rate = 0
      var channels = 0
      var bits = 0
      var dataOff = -1
      var dataLen = 0
      while (pos + 8 <= bytes.length) {
        val id = bb.getInt(pos)
        val len = bb.getInt(pos + 4)
        if (len < 0) return None // malformed chunk length: don't loop
        if (id == 0x20746d66) { // "fmt "
          channels = bb.getShort(pos + 10).toInt
          rate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22).toInt
        } else if (id == 0x61746164) { // "data"
          dataOff = pos + 8
          dataLen = math.min(len, bytes.length - dataOff)
        }
        pos += 8 + len + (len & 1)
      }
      if (rate == 0 || dataOff < 0 || bits != 16) return None
      val n = dataLen / 2
      var sum2 = 0.0
      var i = 0
      while (i < n) {
        val s = bb.getShort(dataOff + 2 * i).toDouble / 32768.0
        sum2 += s * s
        i += 1
      }
      Some(AudioMeta(rate, channels, n.toLong / math.max(1, channels),
        math.sqrt(sum2 / math.max(1, n))))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---- video (STUB) ----

  /** STUB — no video codecs in this container. Deterministic fake frame
    * sampler: emits `n` pseudo-frames whose bytes derive from md5(media ||
    * frameIdx); shape/partitioning/API match what a real decoder (e.g.
    * jcodec) would return, so only this function changes when one exists. */
  def sampleFramesStub(media: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { i =>
      md.reset()
      md.update(media)
      md.update(i.toByte)
      md.digest()
    }
  }

  /** Explode a video binary column into (row, frame_idx, frame) rows —
    * the distributed frame-sampling shape (flatMap preserves partitioning;
    * no shuffle). */
  def explodeFrames(df: DataFrame, binaryCol: String, nFrames: Int): DataFrame = {
    val schema = df.schema
      .add("frame_idx", IntegerType).add("frame", BinaryType)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val media = r.getAs[Array[Byte]](binaryCol)
        sampleFramesStub(media, nFrames).zipWithIndex.map { case (frame, i) =>
          Row.fromSeq(r.toSeq :+ i :+ frame)
        }
      }
    }(enc)
  }
}
