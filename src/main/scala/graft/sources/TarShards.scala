package graft.sources

import java.io.{DataInputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WebDataset-style tar-shard source/sink — the de-facto format for
  * shipping large multimodal training corpora (LAION et al.): a corpus is
  * thousands of `shard-%06d.tar` files, each tar holds samples as groups
  * of adjacently-stored files sharing a basename key
  * (`00001.jpg` + `00001.json` + `00001.cls` = one sample; the extension
  * is everything after the FIRST dot, so `00001.seg.png` keys as `00001`
  * with ext `seg.png`).
  *
  * Pure-JVM ustar/POSIX parse from the public tar spec (512-byte headers,
  * octal size field, `prefix` field for long paths, GNU 'L' long-name
  * extension); no external library.
  *
  * Scale shape: one Spark task per shard (`binaryFiles` keeps each tar a
  * single split — tars have no internal sync markers, and WebDataset
  * sizes shards to ~100 MB-1 GB precisely so the shard IS the unit of
  * parallelism); entries stream through a bounded reader so a task never
  * holds more than one sample's files in memory, not the whole tar. The
  * output is the engine's standard multimodal shape — opaque binary
  * columns + typed metadata — feeding [[graft.multimodal.Multimodal]]
  * decode/resize/aHash/embedding unchanged.
  *
  * Reference parity note: the reference's data plane is tile imagery over
  * HTTP (TileSources); tar shards are the equivalent bulk-ingest path for
  * the LLM-pipeline surface (builder contract: multimodal columns at
  * 100 TB).
  */
object TarShards {

  /** One file inside a tar. */
  final case class TarEntry(name: String, bytes: Array[Byte])

  val sampleSchema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("files", MapType(StringType, BinaryType,
      valueContainsNull = false), nullable = false)))

  // ---------------------------------------------------------------- read

  /** Lazily parse tar entries from a stream (regular files only).
    * Stops at the terminating zero block or EOF; `maxEntryBytes` guards a
    * corrupt size field from OOMing an executor (tar sizes are
    * attacker-controlled input at ingest time). */
  def entries(in: InputStream,
      maxEntryBytes: Long = 1L << 30): Iterator[TarEntry] = {
    val din = new DataInputStream(in)
    var pendingLongName: Option[String] = None
    def readBlock(buf: Array[Byte]): Boolean =
      try { din.readFully(buf, 0, 512); true } catch { case _: EOFException => false }

    new Iterator[TarEntry] {
      private var nextEntry: TarEntry = _
      private var done = false
      private def octal(buf: Array[Byte], off: Int, len: Int): Long = {
        var v = 0L
        var i = off
        val end = off + len
        while (i < end) {
          val c = buf(i)
          if (c >= '0' && c <= '7') v = (v << 3) + (c - '0')
          i += 1
        }
        v
      }
      private def str(buf: Array[Byte], off: Int, len: Int): String = {
        var end = off
        val max = off + len
        while (end < max && buf(end) != 0) end += 1
        new String(buf, off, end - off, UTF_8)
      }
      private def advance(): Unit = {
        val hdr = new Array[Byte](512)
        nextEntry = null
        while (nextEntry == null && !done) {
          if (!readBlock(hdr) || hdr.forall(_ == 0)) { done = true; return }
          val size = octal(hdr, 124, 12)
          // the Int.MaxValue clamp keeps size.toInt below from going
          // negative if a caller raises maxEntryBytes past 2 GiB
          if (size < 0 || size > maxEntryBytes || size > Int.MaxValue)
            throw new java.io.IOException(s"tar entry size out of bounds: $size")
          val typeflag = hdr(156)
          val padded = ((size + 511) / 512) * 512
          if (typeflag == 'L') { // GNU long name: payload is the real name
            val nb = new Array[Byte](size.toInt)
            din.readFully(nb)
            din.skipNBytes(padded - size)
            var end = 0
            while (end < nb.length && nb(end) != 0) end += 1
            pendingLongName = Some(new String(nb, 0, end, UTF_8))
          } else if (typeflag == '0' || typeflag == 0) { // regular file
            val name = pendingLongName.getOrElse {
              val prefix = if (hdr(257) == 'u') str(hdr, 345, 155) else ""
              val base = str(hdr, 0, 100)
              if (prefix.isEmpty) base else s"$prefix/$base"
            }
            pendingLongName = None
            val data = new Array[Byte](size.toInt)
            din.readFully(data)
            din.skipNBytes(padded - size)
            nextEntry = TarEntry(name, data)
          } else { // dir/link/pax header: skip payload
            pendingLongName = None
            din.skipNBytes(padded)
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextEntry != null
      override def next(): TarEntry = {
        val e = nextEntry
        advance()
        e
      }
    }
  }

  /** WebDataset grouping: split each entry path into (key, ext) at the
    * first dot of the basename; adjacent entries with the same key form
    * one sample. Non-adjacent repeats of a key become separate samples
    * (the WebDataset contract — writers keep sample files together). */
  def groupSamples(es: Iterator[TarEntry]): Iterator[(String, Map[String, Array[Byte]])] =
    new Iterator[(String, Map[String, Array[Byte]])] {
      private val it = es.buffered
      override def hasNext: Boolean = it.hasNext
      override def next(): (String, Map[String, Array[Byte]]) = {
        val first = it.next()
        val (key, ext) = splitKey(first.name)
        var files = Map(ext -> first.bytes)
        while (it.hasNext && splitKey(it.head.name)._1 == key) {
          val e = it.next()
          files += (splitKey(e.name)._2 -> e.bytes)
        }
        key -> files
      }
    }

  /** "dir/00001.seg.png" -> ("dir/00001", "seg.png"); no dot -> ext "". */
  def splitKey(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
  }

  /** Read tar shards into (shard, key, files: map<ext, binary>) — one
    * task per shard, entries streamed (never the whole tar in memory).
    * `glob` is anything Hadoop accepts: a dir, a glob, a comma list. */
  def samples(spark: SparkSession, glob: String,
      maxEntryBytes: Long = 1L << 30): DataFrame = {
    val rows = spark.sparkContext
      .binaryFiles(glob)
      .flatMap { case (path, pds) =>
        val in = pds.open()
        // the drain-close below frees the handle as soon as the shard is
        // exhausted, but partial consumption (limit/take, downstream early
        // exit, task failure mid-shard) never reaches it — the completion
        // listener closes on EVERY task exit path
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            // best-effort cleanup: some Hadoop FS streams throw runtime
            // exceptions (not IOException) on double-close — never fail
            // an otherwise-successful task at completion
            try in.close()
            catch { case scala.util.control.NonFatal(_) => () }
          })
        val it = groupSamples(entries(in, maxEntryBytes))
          .map { case (key, files) => Row(path, key, files) }
        // close the FS handle the moment the shard is drained — a task
        // listing many shards must not accumulate open streams
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) in.close()
            h
          }
          override def next(): Row = it.next()
        }
      }
    spark.createDataFrame(rows, sampleSchema)
  }

  // --------------------------------------------------------------- write

  /** Write entries as a ustar tar (0644 regular files, zero mtime for
    * deterministic bytes, two terminating zero blocks). Names longer than
    * 100 bytes use the ustar prefix field (up to 155+100). */
  def writeTar(out: OutputStream, es: Iterator[(String, Array[Byte])]): Unit = {
    es.foreach { case (name, bytes) =>
      out.write(header(name, bytes.length.toLong))
      out.write(bytes)
      val pad = ((bytes.length + 511) / 512) * 512 - bytes.length
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
  }

  private def header(name: String, size: Long): Array[Byte] = {
    val nb = name.getBytes(UTF_8)
    val (prefix, base) =
      if (nb.length <= 100) (Array.emptyByteArray, nb)
      else {
        val cut = name.lastIndexOf('/', name.length - 1)
        require(cut > 0 && name.length - cut - 1 <= 100 && cut <= 155,
          s"tar name too long for ustar: $name")
        (name.substring(0, cut).getBytes(UTF_8),
          name.substring(cut + 1).getBytes(UTF_8))
      }
    val h = new Array[Byte](512)
    System.arraycopy(base, 0, h, 0, base.length)
    putOctal(h, 100, 8, 0x1a4) // mode 0644
    putOctal(h, 108, 8, 0) //     uid
    putOctal(h, 116, 8, 0) //     gid
    putOctal(h, 124, 12, size)
    putOctal(h, 136, 12, 0) //    mtime: deterministic shard bytes
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum spaces
    h(156) = '0' //               regular file
    System.arraycopy("ustar".getBytes(US_ASCII), 0, h, 257, 5)
    h(263) = '0'; h(264) = '0' // version "00"
    System.arraycopy(prefix, 0, h, 345, prefix.length)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xFF; i += 1 }
    putOctal(h, 148, 7, sum)
    h(155) = 0
    h
  }

  private[sources] def putOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    val s = java.lang.Long.toOctalString(v)
    // a value wider than the field (a >= 8 GiB file in the 12-byte size
    // field) must fail loudly — silent truncation writes a corrupt header
    require(s.length <= len - 1,
      s"value $v overflows a $len-byte tar octal field")
    val digits = ("0" * (len - 1 - s.length)) + s
    System.arraycopy(digits.getBytes(US_ASCII), 0, h, off, len - 1)
    h(off + len - 1) = 0
  }

  /** [[writeShards]] with byte-targeted bin packing: samples are packed
    * into shards of ~`targetBytes` of ON-TAR size (512-byte header +
    * 512-padded payload per file), in key order. The prefix-sum bin
    * assignment runs on the (key, size) PROJECTION — ~16 bytes per
    * sample, metadata scale, never the binaries (the [[
    * graft.operators.Text.packSequences]] discipline); the binaries then
    * shuffle exactly once, to their bin. A single sample larger than
    * `targetBytes` gets its own shard rather than failing. */
  def writeShardsBySize(df: DataFrame, keyCol: String, filesCol: String,
      dir: String, targetBytes: Long): Seq[String] = {
    require(targetBytes >= 1024, "targetBytes must be >= 1024")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sized = df.select(col(keyCol).as("__k"), col(filesCol).as("__f"))
      .withColumn("__sz",
        aggregate(map_values(col("__f")), lit(0L), (acc, b) =>
          acc + lit(512L) +
            (floor((length(b) + lit(511L)) / lit(512L)) * lit(512L)).cast("long")))
    // running total over key order on the metadata projection; the
    // single-partition window holds (key, size) pairs only. A duplicate
    // key would multiply rows through the __k join below (silently
    // duplicating samples in the written shards) — the lag probe rides
    // the same sort and fails loudly instead.
    val meta = sized.select(col("__k"), col("__sz"))
      .withColumn("__cum", sum("__sz").over(
        Window.orderBy("__k").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__bin", when(
        lag("__k", 1).over(Window.orderBy("__k")) === col("__k"),
        raise_error(concat(lit("writeShardsBySize: duplicate sample key "),
          col("__k"))).cast("long"))
        .otherwise(floor((col("__cum") - col("__sz")) / lit(targetBytes)).cast("long")))
      .select(col("__k"), col("__bin"))
    val nBins = 1 + meta.agg(max("__bin")).head().getLong(0).toInt
    val binned = sized.join(meta.hint("shuffle_hash"), "__k")
      .repartitionByRange(nBins, col("__bin"))
      .sortWithinPartitions("__k")
      .select(col("__k").as(keyCol), col("__f").as(filesCol))
    writeShards(binned, keyCol, filesCol, dir)
  }

  /** Write a DataFrame of (key, files: map<ext, binary>) rows as one tar
    * per partition under `dir` (`part-%05d.tar`) — the sink face:
    * `df.repartition(n)` chooses the shard count/size upstream. Returns
    * the shard paths. Driver-free: each task writes its own shard via the
    * Hadoop FS API (works on any scheme Spark can reach). */
  def writeShards(df: DataFrame, keyCol: String, filesCol: String,
      dir: String): Seq[String] = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    df.select(keyCol, filesCol).rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.tar")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(path, true)
        try {
          writeTar(out, rows.flatMap { r =>
            val key = r.getString(0)
            r.getMap[String, Array[Byte]](1).toSeq.sortBy(_._1).iterator
              .map { case (ext, bytes) =>
                (if (ext.isEmpty) key else s"$key.$ext") -> bytes }
          })
        } finally out.close()
        Iterator.single(path.toString)
      }
    }.collect().toSeq.sorted
  }
}
