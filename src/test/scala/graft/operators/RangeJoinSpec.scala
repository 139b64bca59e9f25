package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("intervalOverlapJoin: exactly the overlapping pairs, each emitted once") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 0L, 100L), (2L, 200L, 300L), (3L, 50L, 250L))
      .toDF("aid", "sa", "ea")
    val b = Seq((10L, 90L, 110L), (11L, 400L, 500L), (12L, 0L, 1000L))
      .toDF("bid", "sb", "eb")
    val out = RangeJoin.intervalOverlapJoin(a, b, "sa", "ea", "sb", "eb",
        binSize = 64)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute-force reference
    val want = for {
      (aid, sa, ea) <- Seq((1L, 0L, 100L), (2L, 200L, 300L), (3L, 50L, 250L))
      (bid, sb, eb) <- Seq((10L, 90L, 110L), (11L, 400L, 500L), (12L, 0L, 1000L))
      if sa <= eb && sb <= ea
    } yield (aid, bid)
    assert(out.sorted.toSeq == want.sorted) // no duplicates despite multi-bin spans
    // bin-size invariance: a much smaller bin (more replication, more
    // shared bins per pair) must yield the identical pair set
    val tiny = RangeJoin.intervalOverlapJoin(a, b, "sa", "ea", "sb", "eb",
        binSize = 7)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tiny.sorted.toSeq == want.sorted)
    // touching endpoints count (closed intervals)
    val touch = RangeJoin.intervalOverlapJoin(
      Seq((1L, 0L, 10L)).toDF("aid", "sa", "ea"),
      Seq((2L, 10L, 20L)).toDF("bid", "sb", "eb"), "sa", "ea", "sb", "eb", 8)
    assert(touch.count() == 1)
  }
}
