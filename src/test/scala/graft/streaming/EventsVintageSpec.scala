package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The round-7 break class, pinned as a named spec: the driver has shipped
  * `events.ts` under two different parquet physical types across testdata
  * vintages — int64 nanos (read as LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`) and native micros
  * TIMESTAMP_NTZ. [[EventStream.tsNanos]] must canonicalize BOTH to the
  * same long-epoch-nanos column, from on-disk parquet fixtures (not just
  * in-memory frames), and downstream `ts div …` plans must analyze on
  * both. If a third vintage ever appears, this spec fails by name instead
  * of 19 oracle queries failing at the driver gate. */
class EventsVintageSpec extends SparkSpec {

  // one event at 2024-01-02T03:04:05.678901 UTC and one an hour later
  private val microsUtc = Seq(1704164645678901L, 1704168245678901L)

  private def writeFixtures(): (String, String) = {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("events_vintage").toString
    val longDir = s"$base/long_nanos"
    val ntzDir = s"$base/micros_ntz"
    // vintage A: ts already long epoch nanos (what int64-nanos parquet
    // reads as under nanosAsLong)
    microsUtc.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L, "view", 1.0) }
      .toDF("user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(longDir)
    // vintage B: ts native micros TIMESTAMP_NTZ (the r7+ driver encoding)
    microsUtc.zipWithIndex
      .map { case (us, i) => (i.toLong, us, "view", 1.0) }
      .toDF("user_id", "us", "event_type", "value")
      .select(col("user_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("event_type"), col("value"))
      .write.mode("overwrite").parquet(ntzDir)
    (longDir, ntzDir)
  }

  test("tsNanos canonicalizes long-nanos and micros-NTZ parquet identically") {
    val (longDir, ntzDir) = writeFixtures()
    val a = spark.read.parquet(longDir)
    val b = spark.read.parquet(ntzDir)
    // the fixtures really are different physical vintages
    assert(a.schema("ts").dataType == LongType)
    assert(b.schema("ts").dataType == TimestampNTZType)
    val ca = EventStream.tsNanos(a)
    val cb = EventStream.tsNanos(b)
    assert(ca.schema("ts").dataType == LongType)
    assert(cb.schema("ts").dataType == LongType)
    val va = ca.orderBy("user_id").select("user_id", "ts").collect().toSeq
    val vb = cb.orderBy("user_id").select("user_id", "ts").collect().toSeq
    assert(va == vb)
    assert(va.map(_.getLong(1)) == microsUtc.map(_ * 1000L))
  }

  test("q24-shaped ts-div plan analyzes and agrees on both vintages") {
    val (longDir, ntzDir) = writeFixtures()
    def gapFill(dir: String) = {
      val ev = EventStream.tsNanos(spark.read.parquet(dir))
        .withColumn("bkt", expr("ts div 3600000000000"))
      val per = ev.groupBy("user_id", "bkt").agg(count(lit(1)).as("n"))
      val span = ev.groupBy("user_id")
        .agg(min("bkt").as("b0"), max("bkt").as("b1"))
      span.select(col("user_id"),
          explode(sequence(col("b0"), col("b1"))).as("bkt"))
        .join(per, Seq("user_id", "bkt"), "left")
        .na.fill(0L, Seq("n"))
        .orderBy("user_id", "bkt")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    val ra = gapFill(longDir)
    val rb = gapFill(ntzDir)
    assert(ra == rb)
    assert(ra.nonEmpty && ra.forall(_._3 == 1L))
  }

  test("qa01-shaped windowed aggregation agrees on both vintages") {
    val (longDir, ntzDir) = writeFixtures()
    def counts(dir: String) =
      EventStream.tumblingCounts(spark.read.parquet(dir))
        .orderBy("wstart", "event_type")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
          r.getLong(2))).toSeq
    val ra = counts(longDir)
    val rb = counts(ntzDir)
    assert(ra == rb)
    assert(ra.size == 2) // two events an hour apart -> two windows
  }
}
