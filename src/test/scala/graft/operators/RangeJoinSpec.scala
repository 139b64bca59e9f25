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

  test("intervalUnionLength: overlap, nesting, touching and gaps on the hand timeline; keys are independent") {
    val s = spark
    import s.implicits._
    val iv = Seq(
      // key 1: [0,10] + [5,20] overlap, [20,30] touches, [40,50] gapped
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 30L), (1L, 40L, 50L),
      // key 2: nested interval adds nothing
      (2L, 0L, 100L), (2L, 10L, 20L),
      // key 3: zero-length interval covers nothing but counts
      (3L, 7L, 7L)
    ).toDF("k", "st", "en")
    val out = graft.operators.RangeJoin
      .intervalUnionLength(iv, "k", "st", "en")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((4L, 45L, 40L, 50L))) // raw 45, union 30+10, span 50
    assert(out(2L) == ((2L, 110L, 100L, 100L)))
    assert(out(3L) == ((1L, 0L, 0L, 0L)))
  }
}
