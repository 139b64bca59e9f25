package graft.operators

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val snapshot = Seq(
    (1L, "old-a", 10), (2L, "old-b", 20), (3L, "old-c", 30))
    .toDF("k", "name", "v")

  test("applyChangelog: latest wins, deletes drop, inserts appear, untouched pass through") {
    val delta = Seq(
      (1L, 5L, "U", "mid-a", 11), //  superseded update
      (1L, 9L, "U", "new-a", 12), //  the winning update
      (2L, 7L, "D", null, 0), //      delete key 2
      (4L, 3L, "I", "ins-d", 40) //   brand-new key
    ).toDF("k", "seq", "op", "name", "v")
    val out = Cdc.applyChangelog(snapshot, delta, Seq("k"), "seq", "op")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out == Map(
      1L -> ("new-a", 12), //  latest update applied
      3L -> ("old-c", 30), //  untouched snapshot row
      4L -> ("ins-d", 40))) // insert; key 2 deleted
  }

  test("applyChangelog: a delete tied with an update at the same seq does not resurrect") {
    val delta = Seq(
      (1L, 9L, "U", "zombie", 99),
      (1L, 9L, "D", null, 0)).toDF("k", "seq", "op", "name", "v")
    val out = Cdc.applyChangelog(snapshot, delta, Seq("k"), "seq", "op")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 3L)) // key 1 gone, not zombied
  }

  test("scd2History: intervals chain, delete closes without opening, last row is current") {
    val delta = Seq(
      (1L, 10L, "U", "v1"), (1L, 20L, "U", "v2"), (1L, 30L, "D", null),
      (2L, 15L, "U", "w1")).toDF("k", "seq", "op", "name")
    val out = Cdc.scd2History(delta, Seq("k"), "seq", "op")
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("name"),
        r.getAs[Long]("valid_from"),
        if (r.isNullAt(r.fieldIndex("valid_to"))) -1L else r.getAs[Long]("valid_to"),
        r.getAs[Boolean]("is_current")))
    assert(out.toSeq == Seq(
      (1L, "v1", 10L, 20L, false),
      (1L, "v2", 20L, 30L, false), // closed BY the delete, no row for it
      (2L, "w1", 15L, -1L, true)))
  }

  test("snapshotDiff: I/U/D classification, unchanged rows silent, null-safe compare") {
    val before = Seq((1L, "a", 10), (2L, "b", 20), (3L, null: String, 30))
      .toDF("k", "name", "v")
    val after = Seq(
      (1L, "a", 10), //      unchanged -> no row
      (2L, "b2", 20), //     value changed -> U
      (3L, "now", 30), //    null -> value is a change -> U (null-safe)
      (4L, "new", 40)) //    only in after -> I
      .toDF("k", "name", "v") // key 2..: key absent from after -> D... key set: before {1,2,3}, after {1,2,3,4}
    val out = Cdc.snapshotDiff(before, after, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(out == Set(
      (2L, "U", "b2", 20),
      (3L, "U", "now", 30),
      (4L, "I", "new", 40)))
    // D carries the BEFORE image
    val out2 = Cdc.snapshotDiff(after, before, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out2.contains((4L, "D", "new")))
  }

  test("snapshotDiff roundtrip: applying the diff to `before` reproduces `after` exactly") {
    val before = Seq((1L, "a", 10), (2L, "b", 20), (5L, "e", 50))
      .toDF("k", "name", "v")
    val after = Seq((1L, "a", 10), (2L, "B", 21), (6L, "f", 60))
      .toDF("k", "name", "v")
    val delta = Cdc.snapshotDiff(before, after, Seq("k"))
      .withColumn("seq", org.apache.spark.sql.functions.lit(1L))
    val rebuilt = Cdc.applyChangelog(before, delta, Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(rebuilt == after.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet)
  }

  test("mergeAggDeltas: merged rollup equals full recompute; delta-only and base-only keys survive") {
    val s = spark
    import s.implicits._
    val all = Seq((1L, 10.5), (1L, 2.25), (2L, 3.0), (3L, 7.75))
      .toDF("k", "value")
    val base = all.filter($"k" <= 2 && $"value" > 3.0) // rows (1,10.5)
      .groupBy("k").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          $"value".cast("decimal(30,2)")).as("sum_value"))
    val delta = all.exceptAll(all.filter($"k" <= 2 && $"value" > 3.0))
    val merged = Cdc.mergeAggDeltas(base, delta, "k", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue)).toMap
    assert(merged(1L) == ((2L, 12.75)))
    assert(merged(2L) == ((1L, 3.0)))  // delta-only key
    assert(merged(3L) == ((1L, 7.75))) // delta-only key
    // empty delta: the base comes back unchanged
    val same = Cdc.mergeAggDeltas(base, delta.limit(0), "k", "value")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(same == Map(1L -> 1L))
  }

  test("compactChangelog: net op per key; I..D annihilates; replay equivalence") {
    val s = spark
    import s.implicits._
    val delta = Seq(
      (1L, 1L, 10.0, "I"), (1L, 2L, 11.0, "U"),  // I..U -> I(latest)
      (2L, 1L, 20.0, "U"), (2L, 2L, 21.0, "U"),  // U..U -> U(latest)
      (3L, 1L, 30.0, "I"), (3L, 2L, 0.0, "D"),   // I..D -> nothing
      (4L, 1L, 40.0, "U"), (4L, 2L, 0.0, "D")    // U..D -> D
    ).toDF("k", "seq", "value", "op")
    val c = Cdc.compactChangelog(delta, Seq("k"), "seq", "op")
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getDouble(3)))
      .toMap
    assert(c == Map(1L -> (("I", 11.0)), 2L -> (("U", 21.0)),
      4L -> (("D", 0.0))))
    // replay equivalence on a consistent snapshot (keys 2 and 4 exist)
    val snap = Seq((2L, 2.0), (4L, 4.0)).toDF("k", "value")
    def applied(d: org.apache.spark.sql.DataFrame) =
      Cdc.applyChangelog(snap, d, Seq("k"), "seq", "op")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(applied(Cdc.compactChangelog(delta, Seq("k"), "seq", "op")) ==
      applied(delta))
  }

  test("pitEnrich: fact takes the version valid AT its time; gaps and pre-history null") {
    val s = spark
    import s.implicits._
    // key 1: v=10 on [100, 200), v=20 on [200, 300), DELETED at 300,
    // v=30 from 400 (open)
    val delta = Seq(
      (1L, 100L, 10.0, "U"), (1L, 200L, 20.0, "U"),
      (1L, 300L, 0.0, "D"), (1L, 400L, 30.0, "U")
    ).toDF("k", "seq", "value", "op")
    val dims = Cdc.scd2History(delta, Seq("k"), "seq", "op")
    val facts = Seq(
      (1L, 1L, 50L),   // before history: null
      (2L, 1L, 150L),  // v=10
      (3L, 1L, 200L),  // boundary: the NEW version, v=20
      (4L, 1L, 350L),  // deleted gap: null
      (5L, 1L, 999L),  // open current: v=30
      (6L, 2L, 100L)   // unknown key: null, row kept
    ).toDF("fid", "k", "t")
    val out = Cdc.pitEnrich(facts, dims, Seq("k"), "fid", "t")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(r.fieldIndex("dim_value"))).map(_.asInstanceOf[Double]))
      .toMap
    assert(out == Map(1L -> None, 2L -> Some(10.0), 3L -> Some(20.0),
      4L -> None, 5L -> Some(30.0), 6L -> None))
  }

  test("snapshotAsOf: time travel — latest op at the point wins, later ops invisible, D erases") {
    val s = spark
    import s.implicits._
    val log = Seq(
      (1L, 100L, 10.0, "I"), (1L, 200L, 20.0, "U"), (1L, 400L, 30.0, "U"),
      (2L, 150L, 5.0, "I"), (2L, 250L, 0.0, "D"),
      (3L, 350L, 7.0, "I")
    ).toDF("k", "seq", "value", "op")
    def asOf(t: Long) = graft.operators.Cdc
      .snapshotAsOf(log, Seq("k"), "seq", "op", t)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // at 299: key1 has v=20 (seq 400 invisible), key2 deleted, key3 not yet
    assert(asOf(299L) == Map(1L -> 20.0))
    // at 199: key1 v=10, key2 v=5
    assert(asOf(199L) == Map(1L -> 10.0, 2L -> 5.0))
    // at the end: key1 v=30, key3 v=7, key2 stays erased
    assert(asOf(999L) == Map(1L -> 30.0, 3L -> 7.0))
    // delete tied at the same seq as an update does not resurrect
    val tied = log.unionAll(
      Seq((3L, 350L, 0.0, "D")).toDF("k", "seq", "value", "op"))
    assert(graft.operators.Cdc.snapshotAsOf(tied, Seq("k"), "seq", "op", 999L)
      .filter($"k" === 3L).count() == 0L)
  }
  test("changelogStats: per-op volume, key breadth, hottest key") {
    val s = spark
    import s.implicits._
    val log = Seq(
      (1L, "U"), (1L, "U"), (1L, "U"), (2L, "U"),
      (1L, "I"), (3L, "I"),
      (2L, "D")
    ).toDF("k", "op")
    val out = graft.operators.Cdc.changelogStats(log, Seq("k"), "op")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map("U" -> ((4L, 2L, 3L)), "I" -> ((2L, 2L, 1L)),
      "D" -> ((1L, 1L, 1L))))
  }

  test("mergeConflicts: a_only / b_only / agree / conflict classification") {
    val s = spark
    import s.implicits._
    val logA = Seq(
      (1L, 10L, 1.0, "U"),               // agree with B
      (2L, 10L, 2.0, "U"),               // conflict: B has 2.5
      (3L, 10L, 3.0, "U"),               // a_only
      (5L, 10L, 5.0, "U"), (5L, 20L, 0.0, "D") // latest D vs B's U -> conflict
    ).toDF("k", "seq", "value", "op")
    val logB = Seq(
      (1L, 99L, 1.0, "U"),
      (2L, 99L, 2.5, "U"),
      (4L, 99L, 4.0, "I"),               // b_only
      (5L, 99L, 5.5, "U")
    ).toDF("k", "seq", "value", "op")
    val out = graft.operators.Cdc.mergeConflicts(logA, logB,
        Seq("k"), "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "agree", 2L -> "conflict", 3L -> "a_only",
      4L -> "b_only", 5L -> "conflict"))
  }

  test("bitemporalAsOf: a late correction is visible only past its commit; deletes honor the tx horizon") {
    val log = Seq(
      (1L, 10L, 1L, 1.0, "I"),
      (1L, 20L, 2L, 2.0, "U"),
      (1L, 15L, 5L, 9.0, "U"), // late correction: low valid, high tx
      (2L, 5L, 1L, 7.0, "I"),
      (2L, 12L, 3L, 0.0, "D")
    ).toDF("k", "vt", "tx", "value", "op")
    def read(v: Long, t: Long): Map[Long, Double] =
      Cdc.bitemporalAsOf(log, Seq("k"), "vt", "tx", "op", v, t)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // same valid horizon 18, different knowledge horizons:
    assert(read(18L, 3L).get(1L).contains(1.0)) // correction not yet known
    assert(read(18L, 5L).get(1L).contains(9.0)) // correction now visible
    // the correction does NOT override a later effective state
    assert(read(25L, 5L).get(1L).contains(2.0))
    // key 2's delete commits at tx 3: known -> gone, not yet -> present
    assert(!read(18L, 5L).contains(2L))
    assert(read(18L, 2L).get(2L).contains(7.0))
  }

  test("timeTravelDiff: added/removed/changed between horizons, unchanged and NULL-stable keys suppressed") {
    val log = Seq(
      (1L, 1L, Some(10.0), "I"),                            // unchanged
      (2L, 1L, Some(1.0), "I"), (2L, 5L, Some(2.0), "U"),   // changed
      (3L, 5L, Some(3.0), "I"),                             // added
      (4L, 1L, Some(4.0), "I"), (4L, 6L, Some(0.0), "D"),   // removed
      (5L, 2L, None, "I"), (5L, 7L, Some(5.0), "U"),        // null -> 5
      (6L, 9L, Some(9.0), "I"),                             // added at edge
      (7L, 3L, None, "I")                                   // NULL == NULL
    ).toDF("k", "seq", "value", "op")
    val out = Cdc.timeTravelDiff(log, Seq("k"), "seq", "op", 4L, 9L)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out == Map(
      2L -> (("changed", Some(1.0), Some(2.0))),
      3L -> (("added", None, Some(3.0))),
      4L -> (("removed", Some(4.0), None)),
      5L -> (("changed", None, Some(5.0))),
      6L -> (("added", None, Some(9.0)))))
    // keys 1 (identical) and 7 (NULL at both horizons) must not appear
    assert(!out.contains(1L) && !out.contains(7L))
  }

}
