package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of join picks the latest right row at or before left time") {
    val left = Seq((1, 10L, "a"), (1, 20L, "b"), (1, 5L, "c"), (2, 10L, "d"))
      .toDF("k", "t", "payload")
    val right = Seq((1, 10L, 100.0), (1, 15L, 150.0), (2, 11L, 999.0))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.asofBackward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t").collect()
      .map(r => (r.getInt(0), r.getLong(1), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1, 5L, null), // before any right row
      (1, 10L, 100.0), // exact tie: right row visible
      (1, 20L, 150.0), // latest preceding
      (2, 10L, null))) // right row is later
  }

  test("matched row's NULLs are preserved; multi-value columns come from the SAME right row") {
    // right row at t=15 has v = NULL but tag = "y": an as-of match at t>=15
    // must return (NULL, "y") — not stitch v=100.0 from the older row.
    val left = Seq((1, 20L)).toDF("k", "t")
    val right = Seq(
      (1, 10L, Option(100.0), "x"),
      (1, 15L, Option.empty[Double], "y"))
      .toDF("k", "rt", "v", "tag")
    val out = AsOfJoin.asofBackward(left, right, Seq("k"), "t", "rt", Seq("v", "tag"))
      .collect().head
    assert(out.isNullAt(out.fieldIndex("asof_v")), "NULL inside the matched row must survive")
    assert(out.getAs[String]("asof_tag") == "y")
  }

  test("tolerance: a too-old most-recent match nulls out as a unit") {
    val s = spark
    import s.implicits._
    val left = Seq((1, 100L), (1, 300L)).toDF("k", "t")
    val right = Seq((1, 95L, 1.0, "a"), (1, 110L, 2.0, "b")).toDF("k", "rt", "v", "tag")
    val out = AsOfJoin.asofBackward(left, right, Seq("k"), "t", "rt",
        Seq("v", "tag"), tolerance = Some(50L))
      .orderBy("t").collect()
    // t=100: match rt=95, age 5 <= 50 -> kept
    assert(out(0).getDouble(out(0).fieldIndex("asof_v")) == 1.0)
    // t=300: most recent is rt=110, age 190 > 50 -> BOTH values null
    assert(out(1).isNullAt(out(1).fieldIndex("asof_v")))
    assert(out(1).isNullAt(out(1).fieldIndex("asof_tag")))
  }

  test("forward as-of join picks the earliest right row at or after left time") {
    val s = spark
    import s.implicits._
    val left = Seq((1, 10L, "a"), (1, 20L, "b"), (1, 16L, "c"), (2, 12L, "d"))
      .toDF("k", "t", "payload")
    val right = Seq((1, 10L, 100.0), (1, 15L, 150.0), (2, 11L, 999.0))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.asofForward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t").collect()
      .map(r => (r.getInt(0), r.getLong(1), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1, 10L, 100.0), // exact tie: right row at the same time counts
      (1, 16L, null), //  nothing at or after 16
      (1, 20L, null), //  nothing at or after 20
      (2, 12L, null))) // right row is earlier
    // tolerance: a match farther ahead than tol nulls out as a unit
    val tol = AsOfJoin.asofForward(
        Seq((1, 8L)).toDF("k", "t"), right, Seq("k"), "t", "rt", Seq("v"),
        tolerance = Some(1L))
      .collect().head
    assert(tol.isNullAt(tol.fieldIndex("asof_v"))) // rt=10 is 2 > 1 ahead
  }
}
