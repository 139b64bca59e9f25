package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, EOFException,
  InputStream, OutputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) source/sink — the container format of
  * crawled web corpora (Common Crawl ships petabytes of `.warc.gz`): a
  * file is a sequence of records, each a `WARC/1.x` version line,
  * `Name: value` header lines (CRLF, with RFC-style leading-whitespace
  * continuation), a blank line, exactly `Content-Length` payload bytes,
  * and a CRLF CRLF record separator. A `.warc.gz` compresses EACH RECORD
  * AS ITS OWN GZIP MEMBER (spec annex — that is what makes per-record
  * random access and splittable processing possible; a whole-file gzip
  * is a spec violation this writer never produces).
  *
  * Pure-JVM from-spec parse; no external library. Reference parity note:
  * the reference's data plane is tile imagery over HTTP (TileSources);
  * WARC is the equivalent bulk-ingest path for crawled-text pipelines
  * (builder contract: the 100 TB training-data surface — the [[TarShards]]
  * precedent for multimodal shards).
  *
  * Scale shape: one Spark task per WARC file (`binaryFiles` — the shard
  * is the parallelism unit, exactly the Common Crawl layout of ~1 GB
  * files); records stream through a bounded reader (`maxPayloadBytes`
  * guards a corrupt/hostile Content-Length from OOMing an executor), so
  * a task holds one record's payload at a time, never the file.
  */
object Warc {

  final case class WarcRecord(warcType: String, targetUri: String,
    recordId: String, date: String, contentType: String,
    payload: Array[Byte])

  val recordSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("uri", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = false)))

  // ---------------------------------------------------------------- read

  /** Lazily parse WARC records from a stream. Loud on malformation (a
    * bad version line or unparseable Content-Length is an ingest bug,
    * not a row to drop silently); EOF between records ends the
    * iterator. Gzip is the CALLER's concern ([[read]] sniffs it). */
  def records(in: InputStream,
      maxPayloadBytes: Long = 1L << 30): Iterator[WarcRecord] = {
    val din = new DataInputStream(in)
    // reads one CRLF-terminated line as ISO-8859-1 (headers are ASCII by
    // spec; 8859-1 keeps stray bytes inspectable); None at EOF
    def readLine(): Option[String] = {
      val buf = new ByteArrayOutputStream(96)
      var c = din.read()
      if (c < 0) return None
      while (c >= 0 && c != '\n') { buf.write(c); c = din.read() }
      val b = buf.toByteArray
      val n = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1
        else b.length
      Some(new String(b, 0, n, ISO_8859_1))
    }
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false
      private def advance(): Unit = {
        nextRec = null
        // skip inter-record blank lines, then expect a version line
        var line: Option[String] = readLine()
        while (line.contains("")) line = readLine()
        line match {
          case None => done = true
          case Some(v) if v.startsWith("WARC/") =>
            var headers = List.empty[(String, String)]
            var l = readLine().getOrElse(
              throw new java.io.IOException("WARC: EOF inside header block"))
            while (l.nonEmpty) {
              if (l.head == ' ' || l.head == '\t') {
                // continuation line: append to the previous header value
                headers match {
                  case (k, hv) :: tail =>
                    headers = (k, hv + " " + l.trim) :: tail
                  case Nil => throw new java.io.IOException(
                    "WARC: continuation line before any header")
                }
              } else {
                val i = l.indexOf(':')
                if (i <= 0) throw new java.io.IOException(
                  s"WARC: malformed header line '${l.take(80)}'")
                headers = (l.substring(0, i).trim.toLowerCase,
                  l.substring(i + 1).trim) :: headers
              }
              l = readLine().getOrElse(throw new java.io.IOException(
                "WARC: EOF inside header block"))
            }
            val h = headers.toMap
            val len = h.getOrElse("content-length", throw new
                java.io.IOException("WARC: record without Content-Length"))
              .toLongOption.getOrElse(throw new java.io.IOException(
                "WARC: unparseable Content-Length"))
            if (len < 0 || len > maxPayloadBytes || len > Int.MaxValue)
              throw new java.io.IOException(
                s"WARC: Content-Length out of bounds: $len")
            val payload = new Array[Byte](len.toInt)
            try din.readFully(payload)
            catch { case _: EOFException => throw new java.io.IOException(
              "WARC: EOF inside payload (truncated record)") }
            nextRec = WarcRecord(h.getOrElse("warc-type", ""),
              h.getOrElse("warc-target-uri", null),
              h.getOrElse("warc-record-id", null),
              h.getOrElse("warc-date", null),
              h.getOrElse("content-type", null), payload)
          case Some(junk) => throw new java.io.IOException(
            s"WARC: expected version line, got '${junk.take(80)}'")
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec
        advance()
        r
      }
    }
  }

  /** Read WARC files into rows — one task per file, records streamed.
    * `.gz` inputs are sniffed by the 1F 8B magic (Java's GZIPInputStream
    * walks concatenated members, which is exactly the per-record-member
    * layout the spec mandates and [[write]] produces). `glob` is
    * anything Hadoop accepts. */
  def read(spark: SparkSession, glob: String,
      maxPayloadBytes: Long = 1L << 30): DataFrame = {
    val rows = spark.sparkContext
      .binaryFiles(glob)
      .flatMap { case (path, pds) =>
        val raw = pds.open()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try raw.close()
            catch { case scala.util.control.NonFatal(_) => () }
          })
        val head = new java.io.PushbackInputStream(raw, 2)
        val b0 = head.read()
        val b1 = head.read()
        if (b1 >= 0) head.unread(b1)
        if (b0 >= 0) head.unread(b0)
        val in: InputStream =
          if (b0 == 0x1F && b1 == 0x8B) new GZIPInputStream(head)
          else head
        val it = records(in, maxPayloadBytes).map { r =>
          Row(path, r.warcType, r.targetUri, r.recordId, r.date,
            r.contentType, r.payload)
        }
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) raw.close()
            h
          }
          override def next(): Row = it.next()
        }
      }
    spark.createDataFrame(rows, recordSchema)
  }

  // --------------------------------------------------------------- write

  /** Serialize one record (version line, headers, payload, separator).
    * `date` is caller-supplied: a DETERMINISTIC constant makes shard
    * bytes reproducible for content-addressed storage and round-trip
    * oracles (real crawlers stamp fetch time; that is a column, not a
    * hidden clock read). */
  def writeRecord(out: OutputStream, warcType: String, uri: String,
      recordId: String, date: String, payload: Array[Byte]): Unit = {
    val hdr = new StringBuilder(256)
    hdr.append("WARC/1.0\r\n")
    hdr.append("WARC-Type: ").append(warcType).append("\r\n")
    if (uri != null) hdr.append("WARC-Target-URI: ").append(uri).append("\r\n")
    hdr.append("WARC-Record-ID: ").append(recordId).append("\r\n")
    hdr.append("WARC-Date: ").append(date).append("\r\n")
    hdr.append("Content-Type: application/octet-stream\r\n")
    hdr.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    out.write(hdr.toString.getBytes(UTF_8))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(UTF_8))
  }

  /** Write a DataFrame of (uri, payload) rows as one WARC per partition
    * under `dir` (`part-%05d.warc[.gz]`) — `df.repartition(n)` chooses
    * the shard count upstream (the [[TarShards.writeShards]] face).
    * Record ids are deterministic urn:md5 of the uri; dates are the
    * fixed epoch constant (see [[writeRecord]]). With `gzip = true`
    * every record is its own gzip member, per spec. Driver-free: each
    * task writes its own file via the Hadoop FS API. Returns paths. */
  def write(df: DataFrame, uriCol: String, payloadCol: String,
      dir: String, gzip: Boolean = false): Seq[String] = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    df.select(uriCol, payloadCol).rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val ext = if (gzip) "warc.gz" else "warc"
        val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.$ext")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(path, true)
        try {
          rows.foreach { r =>
            val uri = r.getString(0)
            val payload = r.get(1).asInstanceOf[Array[Byte]]
            val md = java.security.MessageDigest.getInstance("MD5")
              .digest(uri.getBytes(UTF_8))
              .map(b => f"$b%02x").mkString
            if (gzip) {
              val buf = new ByteArrayOutputStream(payload.length + 256)
              val gz = new GZIPOutputStream(buf)
              writeRecord(gz, "resource", uri, s"<urn:md5:$md>",
                "2000-01-01T00:00:00Z", payload)
              gz.finish()
              gz.close()
              out.write(buf.toByteArray)
            } else {
              writeRecord(out, "resource", uri, s"<urn:md5:$md>",
                "2000-01-01T00:00:00Z", payload)
            }
          }
        } finally out.close()
        Iterator.single(path.toString)
      }
    }.collect().toSeq.sorted
  }
}
