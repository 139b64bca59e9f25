package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkSpec {

  private def events = spark.read.parquet(s"${sf()}/events.parquet")

  test("streaming tumbling counts equal the batch plan") {
    val streamed = EventStream.runStreamingCounts(spark, sf(), "stream_counts")
      .orderBy("wstart", "event_type").collect()
    val batch = EventStream.tumblingCounts(events)
      .orderBy("wstart", "event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("sessionization: sessions respect the inactivity gap and cover all events") {
    val sessions = EventStream.sessionize(events, gapMinutes = 30).collect()
    val nEvents = events.count()
    assert(sessions.map(_.nEvents.toLong).sum == nEvents)
    // sessions of one user never overlap and are gap-separated
    sessions.groupBy(_.user_id).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.startMicros)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.startMicros - a.endMicros > 30L * 60 * 1000000)
        case _ =>
      }
    }
    // spot-check one user against a direct computation
    val u = sessions.map(_.user_id).head
    val times = events.filter(col("user_id") === u)
      .select((col("ts") / 1000).cast("long")).collect().map(_.getLong(0)).sorted
    var expected = 1
    times.sliding(2).foreach {
      case Array(a, b) => if (b - a > 30L * 60 * 1000000) expected += 1
      case _ =>
    }
    assert(sessions.count(_.user_id == u) == expected)
  }
}
