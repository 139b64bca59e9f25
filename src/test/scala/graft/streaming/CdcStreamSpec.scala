package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity of the streaming CDC upsert with the batch applyChangelog:
  * identical final tables over the same changelog, run as one batch, as
  * a 3-micro-batch replay seeded with a snapshot, and under late /
  * same-sequence-tie records. */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  // changelog: inserts, updates, a delete, a same-seq U/D tie (key 4 —
  // the delete must win), and a key only ever deleted (key 6)
  private val delta = Seq(
    (1L, "I", 1L, "a1"), (1L, "U", 5L, "a2"),
    (2L, "I", 2L, "b1"),
    (3L, "I", 3L, "c1"), (3L, "D", 7L, null),
    (4L, "I", 4L, "d1"), (4L, "U", 9L, "d2"), (4L, "D", 9L, null),
    (5L, "U", 6L, "e2"), // update to a snapshot-only key
    (6L, "D", 8L, null)
  ).toDF("key", "op", "seq", "payload")

  // snapshot: keys 5 (updated), 6 (deleted), 7 (untouched pass-through)
  private val snapshot =
    Seq((5L, "e1"), (6L, "f1"), (7L, "g1")).toDF("key", "payload")

  private def batchExpected = graft.operators.Cdc.applyChangelog(
      snapshot, delta, Seq("key"), "seq", "op")
    .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("batch face: materialized change stream equals applyChangelog") {
    val changes = CdcStream.applyChangelogStream(
      delta, "key", "op", "seq", "payload", Some(snapshot)).toDF
    val got = CdcStream.materialize(changes, Some(snapshot))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == batchExpected, s"got $got expected $batchExpected")
    // sanity on the fixture: tie resolved to delete, pass-through kept
    assert(!got.exists(_._1 == 4L) && got.contains((7L, "g1")) &&
      got.contains((5L, "e2")) && got.contains((1L, "a2")))
  }

  test("3-micro-batch replay with snapshot initial state equals applyChangelog") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = delta.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._3)
    val mem = MemoryStream[(Long, String, Long, String)]
    val q = CdcStream.applyChangelogStream(
        mem.toDF.toDF("key", "op", "seq", "payload"),
        "key", "op", "seq", "payload", Some(snapshot))
      .writeStream.outputMode("append").format("memory")
      .queryName("cdc_stream").start()
    rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { c =>
      mem.addData(c.toSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val got = CdcStream.materialize(spark.table("cdc_stream"), Some(snapshot))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == batchExpected, s"got $got expected $batchExpected")
  }

  test("late records lose to the installed winner; same-seq delete wins across batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String, Long, String)]
    val q = CdcStream.applyChangelogStream(
        mem.toDF.toDF("key", "op", "seq", "payload"),
        "key", "op", "seq", "payload")
      .writeStream.outputMode("append").format("memory")
      .queryName("cdc_late").start()
    def feed(rows: (Long, String, Long, String)*): Unit = {
      mem.addData(rows: _*); q.processAllAvailable()
    }
    feed((1L, "U", 10L, "v10"))
    feed((1L, "U", 5L, "v5"))   // late: older than the winner -> dropped
    feed((1L, "D", 10L, null))  // same seq as winner, delete -> wins
    q.stop()
    val changes = spark.table("cdc_late")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3))).toSeq
    assert(changes == Seq(("U", 10L, "v10"), ("D", 10L, null)),
      s"expected exactly install + tombstone, got $changes")
    assert(CdcStream.materialize(spark.table("cdc_late")).isEmpty)
  }
}
