package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) source/sink: round-trip fidelity, per-record gzip
  * members, header edge cases (continuation lines, case-insensitivity),
  * and LOUD failure on the malformations a crawled corpus will contain
  * (truncated payloads, bad version lines, hostile Content-Length). */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def recordBytes(uri: String, payload: Array[Byte]): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    Warc.writeRecord(buf, "resource", uri, "<urn:x:1>",
      "2000-01-01T00:00:00Z", payload)
    buf.toByteArray
  }

  test("records: parse own writer output, payload byte-exact, headers mapped") {
    val p1 = "hello warc".getBytes(UTF_8)
    val p2 = Array[Byte](0, 1, 2, -1, 13, 10, 13, 10, 42) // CRLFs INSIDE payload
    val bytes = recordBytes("u://a", p1) ++ recordBytes("u://b", p2)
    val rs = Warc.records(new ByteArrayInputStream(bytes)).toList
    assert(rs.map(_.targetUri) == List("u://a", "u://b"))
    assert(rs.head.warcType == "resource")
    assert(rs.head.recordId == "<urn:x:1>")
    assert(rs.head.date == "2000-01-01T00:00:00Z")
    assert(rs(1).payload.sameElements(p2),
      "Content-Length must bound the payload; embedded CRLF CRLF must not")
  }

  test("records: header continuation lines and case-insensitive names") {
    val hdr = "WARC/1.1\r\nWARC-TYPE: response\r\n" +
      "warc-target-uri: u://long\r\n\tcontinued\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n"
    val r = Warc.records(
      new ByteArrayInputStream(hdr.getBytes(UTF_8))).toList
    assert(r.size == 1)
    assert(r.head.warcType == "response")
    assert(r.head.targetUri == "u://long continued")
    assert(new String(r.head.payload, UTF_8) == "ok")
  }

  test("records: malformations fail loudly, never a silent drop") {
    def boom(bytes: Array[Byte]): Unit =
      intercept[java.io.IOException](
        Warc.records(new ByteArrayInputStream(bytes)).toList)
    boom("HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8)) // not a WARC version
    boom("WARC/1.0\r\nWARC-Type: x\r\n\r\n".getBytes(UTF_8)) // no length
    boom(("WARC/1.0\r\nContent-Length: 99\r\n\r\nshort"
      ).getBytes(UTF_8)) // truncated payload
    boom(("WARC/1.0\r\nContent-Length: nope\r\n\r\n").getBytes(UTF_8))
    // hostile Content-Length: bounded by maxPayloadBytes, loud
    val big = "WARC/1.0\r\nContent-Length: 9999999999\r\n\r\n".getBytes(UTF_8)
    intercept[java.io.IOException](
      Warc.records(new ByteArrayInputStream(big), maxPayloadBytes = 1024)
        .toList)
  }

  test("write/read round trip: plain and gzip, one file per partition") {
    val rows = (0 until 40)
      .map(i => (f"https://x/$i%04d", s"payload-$i".getBytes(UTF_8)))
    val df = rows.toDF("uri", "payload").repartition(3)
    for (gz <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory("warc_spec").toString
      val paths = Warc.write(df, "uri", "payload", dir, gzip = gz)
      assert(paths.size == 3)
      assert(paths.forall(_.endsWith(if (gz) ".warc.gz" else ".warc")))
      val back = Warc.read(spark, s"$dir/*.warc*")
        .select($"uri", $"payload").as[(String, Array[Byte])]
        .collect().map { case (u, p) => (u, new String(p, UTF_8)) }.sorted
      assert(back.toSeq == rows.map { case (u, p) =>
        (u, new String(p, UTF_8)) }.sorted)
      // record ids are deterministic (urn:md5 of the uri)
      val ids = Warc.read(spark, s"$dir/*.warc*")
        .select($"record_id").as[String].collect()
      assert(ids.forall(_.startsWith("<urn:md5:")))
    }
  }

  test("gzip output is per-record members (spec): each member one record") {
    val df = Seq(("u://1", "a".getBytes(UTF_8)), ("u://2", "b".getBytes(UTF_8)))
      .toDF("uri", "payload").repartition(1)
    val dir = java.nio.file.Files.createTempDirectory("warc_gz").toString
    val Seq(path) = Warc.write(df, "uri", "payload", dir, gzip = true)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path.stripPrefix("file:")))
    // two members = two gzip magics (1F 8B 08 at member starts)
    val magics = bytes.sliding(3).count(w =>
      (w(0) & 0xFF) == 0x1F && (w(1) & 0xFF) == 0x8B && w(2) == 8)
    assert(magics == 2, s"expected 2 gzip members, found $magics")
    // and a mid-file member boundary is a clean record boundary: decoding
    // from the second magic yields exactly the second record
    val second = bytes.zipWithIndex.drop(1).find { case (_, i) =>
      i + 2 < bytes.length && (bytes(i) & 0xFF) == 0x1F &&
        (bytes(i + 1) & 0xFF) == 0x8B && bytes(i + 2) == 8 }.get._2
    val tail = Warc.records(new java.util.zip.GZIPInputStream(
      new ByteArrayInputStream(bytes.drop(second)))).toList
    assert(tail.map(_.targetUri) == List("u://2"))
  }
}
