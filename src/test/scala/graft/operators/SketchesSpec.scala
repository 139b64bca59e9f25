package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("kmvDistinct is exact below k and within KMV error above k") {
    val s = spark
    import s.implicits._
    // group "small": 40 distinct values < k=64 -> exact
    // group "big": 5000 distinct values -> estimate within ~4/sqrt(k)
    val rows = (0 until 40).map(i => ("small", s"v$i")) ++
      (0 until 5000).flatMap(i => Seq(("big", s"w$i"), ("big", s"w$i"))) // dups collapse
    val out = Sketches.kmvDistinct(rows.toDF("grp", "v"), "v", "grp", k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("small") == ((40L, 40.0)))
    val (exact, est) = out("big")
    assert(exact == 5000L)
    val relErr = math.abs(est - exact) / exact
    assert(relErr < 4.0 / math.sqrt(64), s"est $est vs $exact (relErr $relErr)")
  }

  test("kmvDistinct is deterministic across runs and partitionings") {
    val s = spark
    import s.implicits._
    val df = (0 until 1000).map(i => ("g", s"x${i % 700}")).toDF("grp", "v")
    val a = Sketches.kmvDistinct(df, "v", "grp", k = 32).collect()(0).getDouble(2)
    val b = Sketches.kmvDistinct(df.repartition(13), "v", "grp", k = 32)
      .collect()(0).getDouble(2)
    assert(a == b) // md5 order is data-defined, not partition-defined
  }

  test("cmsHeavyHitters matches an independent in-JVM sketch replay exactly") {
    val s = spark
    import s.implicits._
    val (depth, width) = (3, 16) // tiny width so collisions actually happen
    // zipf-ish: value i appears (50 - i) times
    val values = (0 until 40).flatMap(i => Seq.fill(50 - i)(s"v$i"))
    val df = values.toDF("x")
    // reference model: plain Scala collections + MessageDigest
    def bucket(i: Int, v: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"c${i}_$v".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(13)
      (java.lang.Long.parseLong(hex, 16) % width).toInt
    }
    val counters = scala.collection.mutable.Map.empty[(Int, Int), Long]
    for (v <- values; i <- 0 until depth)
      counters((i, bucket(i, v))) = counters.getOrElse((i, bucket(i, v)), 0L) + 1
    val expected = values.distinct.map { v =>
      v -> (0 until depth).map(i => counters((i, bucket(i, v)))).min
    }.toMap
    val exact = values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = Sketches.cmsHeavyHitters(df, "x", depth = depth, width = width,
        minEst = 1L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == expected.keySet)
    for ((v, (ex, est)) <- out) {
      assert(ex == exact(v), s"exact($v)")
      assert(est == expected(v), s"est($v)")
      assert(est >= ex, s"CMS must never under-count ($v)")
    }
    // thresholding keeps only rows whose ESTIMATE clears the bar
    val thr = Sketches.cmsHeavyHitters(df, "x", depth = depth, width = width,
        minEst = 40L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(thr == expected.filter(_._2 >= 40L))
    assert(thr.nonEmpty && thr.size < expected.size)
  }

  test("cmsHeavyHitters is partition-invariant") {
    val s = spark
    import s.implicits._
    val df = (0 until 500).map(i => s"k${i % 37}").toDF("x")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.cmsHeavyHitters(d, "x", depth = 2, width = 8, minEst = 1L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(df) == run(df.repartition(11)))
  }

  test("sampleQuantiles: k >= n degenerates to exact nearest-rank quantiles") {
    val s = spark
    import s.implicits._
    // 100 distinct values 1..100 — with k >= n the "sample" is the data,
    // so q maps to exactly the ceil(q*100)-th smallest value
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Sketches.sampleQuantiles(df, "v", "id",
        Seq(0.01, 0.25, 0.5, 1.0), k = 1000)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out == Map(0.01 -> 1.0, 0.25 -> 25.0, 0.5 -> 50.0, 1.0 -> 100.0))
  }

  test("sampleQuantiles is deterministic across partitionings and approximates the true median") {
    val s = spark
    import s.implicits._
    val df = (0 until 20000).map(i => (i.toLong, (i % 1000).toDouble)).toDF("id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.sampleQuantiles(d, "v", "id", Seq(0.5), k = 512)
        .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSet
    val a = run(df)
    assert(a == run(df.repartition(17)), "md5 sample must be partition-independent")
    // true median of (i % 1000) over 20k rows is ~499.5; sample error
    // bound ~1000/sqrt(512) ≈ 44 in value terms — assert a loose 3x band
    val med = a.head._2
    assert(math.abs(med - 499.5) < 132, s"median estimate $med too far off")
    assert(a.head._3 == 512L)
  }

  test("prioritySample: deterministic, partition-invariant, weight-sensitive") {
    val s = spark
    import s.implicits._
    val df = (1L to 200L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.prioritySample(d, "id", "w", k = 20)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val a = run(df)
    assert(a.size == 20)
    assert(a == run(df.repartition(13)))           // pure function of the set
    // priority math: u div weight exactly, and boosting every weight 100x
    // can only LOWER each row's priority -> the min-k threshold drops
    val boosted = Sketches.prioritySample(
        df.withColumn("w", col("w") * 100), "id", "w", k = 20)
      .agg(org.apache.spark.sql.functions.max("priority")).head().getLong(0)
    assert(boosted <= a.map(_._3).max)
  }

  test("prioritySample: k beyond the corpus returns every row; zero weight guarded") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0L), (2L, 5L), (3L, 5L)).toDF("id", "w")
    val out = Sketches.prioritySample(df, "id", "w", k = 10).collect()
    assert(out.length == 3)
    // weight 0 treated as 1: priority equals the raw 52-bit hash value
    val r1 = out.find(_.getString(0) == "1").get
    assert(r1.getLong(2) >= 0L)
  }

  test("crossGroupJaccard: identical groups estimate 1, disjoint estimate 0, k caps the summary") {
    val s = spark
    import s.implicits._
    val df = ((1L to 50L).map(v => ("a", v)) ++ (1L to 50L).map(v => ("b", v)) ++
      (100L to 149L).map(v => ("c", v))).toDF("g", "v")
    val out = Sketches.crossGroupJaccard(df, "g", "v", k = 32)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a == b: every merged hash is in both
    assert(out(("a", "b")) == ((32L, 32L, 1000000L)))
    // a and c disjoint: zero intersection
    assert(out(("a", "c"))._2 == 0L && out(("a", "c"))._3 == 0L)
    assert(out(("b", "c"))._2 == 0L)
    // kk capped at k even though the union has 100 distinct values
    assert(out(("a", "c"))._1 == 32L)
    // small sets: kk = union size when below k
    val tiny = Seq(("x", 1L), ("x", 2L), ("y", 2L), ("y", 3L)).toDF("g", "v")
    val t = Sketches.crossGroupJaccard(tiny, "g", "v", k = 32).head()
    assert(t.getLong(2) == 3L && t.getLong(3) == 1L && t.getLong(4) == 333333L)
  }

  test("negativeSamples: seen items excluded, k caps per user, draw is deterministic") {
    val s = spark
    import s.implicits._
    val inter = Seq((1L, 10L), (1L, 11L), (2L, 12L)).toDF("u", "it")
    val catalog = (10L to 19L).toDF("item")
    val out = Sketches.negativeSamples(inter, "u", "it", catalog, "item", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every user gets exactly k rows, none of them seen
    assert(out.count(_._1 == 1L) == 3 && out.count(_._1 == 2L) == 3)
    assert(!out.contains((1L, 10L, 1)) && !out.exists(r =>
      r._1 == 1L && (r._2 == 10L || r._2 == 11L)))
    assert(!out.exists(r => r._1 == 2L && r._2 == 12L))
    // rerun reproduces the identical draw
    val again = Sketches.negativeSamples(inter, "u", "it", catalog, "item", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.sortBy(x => (x._1, x._3)).sameElements(
      again.sortBy(x => (x._1, x._3))))
  }

  test("kmvMergeRollup: merged fine summaries equal the single-pass sketch digit-for-digit") {
    val s = spark
    import s.implicits._
    // 300 values per group spread over 3 parts (overlapping values)
    val rows = (1L to 300L).map(i => ("g1", i % 3, i)) ++
      (1L to 50L).map(i => ("g2", i % 2, i))
    val df = rows.toDF("grp", "part", "v")
    val merged = Sketches.kmvMergeRollup(df, "v", "part", "grp", k = 32)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    val direct = Sketches.kmvDistinct(df, "v", "grp", k = 32)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(merged("g1")._2 == direct("g1"))
    assert(merged("g1")._1 == 3L && merged("g2")._1 == 2L)
    // below k the estimate is exact
    assert(merged("g2")._2 == 32.0 || merged("g2")._2 == direct("g2"))
    assert(direct("g2") == merged("g2")._2)
  }

  test("cmsTopKRecall: a wide collision-free sketch ranks top-k perfectly") {
    val s = spark
    import s.implicits._
    // skewed counts over few values; wide sketch -> no collisions ->
    // estimates equal exact -> recall 1.0
    val df = (1 to 10).flatMap(v => Seq.fill(v * 3)(v.toString)).toDF("v")
    val r = Sketches.cmsTopKRecall(df, "v", k = 5, depth = 3, width = 4096)
      .head()
    assert(r.getAs[Long]("k") == 5L)
    assert(r.getAs[Long]("hits") == 5L)
    assert(r.getAs[Long]("recall_ppm") == 1000000L)
    // fewer distinct values than k: k reports the actual set size
    val tiny = (1 to 3).map(_.toString).toDF("v")
    assert(Sketches.cmsTopKRecall(tiny, "v", k = 10).head()
      .getAs[Long]("k") == 3L)
  }

  test("quantileRollup: merged per-part sketches equal the direct global sample") {
    val s = spark
    import s.implicits._
    val df = (1L to 300L).map(i => (i, (i % 3).toString, i.toDouble))
      .toDF("id", "part", "v")
    val rolled = Sketches.quantileRollup(df, "v", "id", "part",
        Seq(0.5, 0.9), k = 64)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // direct global sample via sampleQuantiles (same hash prefix "sq_")
    val direct = Sketches.sampleQuantiles(df, "v", "id", Seq(0.5, 0.9), k = 64)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(rolled == direct)
    // n_parts reported
    val np = Sketches.quantileRollup(df, "v", "id", "part", Seq(0.5), 64)
      .head().getAs[Long]("n_parts")
    assert(np == 3L)
  }

  test("sampleAccuracy: full rate is exact; partial rate scales up deterministically") {
    val s = spark
    import s.implicits._
    val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "grp")
    val full = Sketches.sampleAccuracy(df, "id", "grp", ratePpm = 1000000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3),
        r.getLong(4))).toMap
    assert(full("even") == ((500L, 500L, 0L))) // rate 1.0: est == exact
    assert(full("odd") == ((500L, 500L, 0L)))
    val part = Sketches.sampleAccuracy(df, "id", "grp", ratePpm = 200000L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // est = sample * 5; rerun identical
    part.foreach { case (_, (sn, est)) => assert(est == sn * 5L) }
    val again = Sketches.sampleAccuracy(df, "id", "grp", ratePpm = 200000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(again == part.map { case (k, v) => k -> v._1 })
  }

  test("bloomFpr: members always hit; tiny m forces measurable false positives") {
    val s = spark
    import s.implicits._
    val members = (1L to 50L).toDF("pk")
    val probes = (1000L to 1199L).toDF("pk")
    val r = Sketches.bloomFpr(members, probes, "pk", m = 64, k = 3).head()
    assert(r.getAs[Long]("m") == 64L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_members") == 50L)
    assert(r.getAs[Long]("n_probes") == 200L)
    val bits = r.getAs[Long]("n_set_bits")
    assert(bits > 0L && bits <= 64L * 3)
    val fp = r.getAs[Long]("n_false_pos")
    assert(fp >= 0L && fp <= 200L)
    assert(r.getAs[Long]("fpr_ppm") == fp * 1000000L / 200L)
    // sanity: every member probes positive (no false negatives by construction)
    val selfProbe = Sketches.bloomFpr(members, members, "pk", m = 64, k = 3)
      .head()
    assert(selfProbe.getAs[Long]("n_false_pos") == 50L)
  }

  test("neymanAllocation: budget sums exactly; noisy strata out-earn constant ones") {
    val s = spark
    import s.implicits._
    val df = (
      (1 to 100).map(i => ("flat", 500L)) ++           // sd = 0
      (1 to 100).map(i => ("wild", (i * 100).toLong))  // large sd
    ).toDF("grp", "x")
    val out = Sketches.neymanAllocation(df, "grp", $"x", budget = 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("flat")._2 == 0L) // constant stratum: sd 0
    assert(out("wild")._2 > 0L)
    assert(out.values.map(_._3).sum == 100L) // exact apportionment
    assert(out("wild")._3 > out("flat")._3)
  }

  test("amsF2: exact moments are exact; estimate is deterministic and in range") {
    val s = spark
    import s.implicits._
    // freqs 1,2,3 -> n_rows 6, distinct 3, F2 = 1+4+9 = 14
    val tiny = (Seq("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c")).toDF("v")
    val r = Sketches.amsF2(tiny, "v").head()
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_distinct") == 3L)
    assert(r.getAs[Long]("f2_exact") == 14L)
    // 500 uniform values x 4 copies: F2 = 500 * 16 = 8000. AMS with
    // width=16, depth=5 medians should land within a few x of exact.
    val uni = (0 until 500).flatMap(i => Seq.fill(4)(s"u$i")).toDF("v")
    val u = Sketches.amsF2(uni, "v", depth = 5, width = 16).head()
    assert(u.getAs[Long]("f2_exact") == 8000L)
    val est = u.getAs[Long]("f2_est")
    assert(est > 2000L && est < 32000L, s"estimate wildly off: $est")
    // deterministic under repartitioning (the KMV discipline)
    val u2 = Sketches.amsF2(uni.repartition(11), "v", depth = 5, width = 16)
      .head().getAs[Long]("f2_est")
    assert(u2 == est)
  }

  test("htStratifiedTotal: a census stratum expands exactly; the HT identity holds per stratum") {
    val s = spark
    import s.implicits._
    val df = (1 to 200).map { i =>
      (i.toLong, if (i % 2 == 0) "big" else "rare", (i % 7) + 0.25)
    }.toDF("id", "stratum", "value")
    val out = Sketches.htStratifiedTotal(df, "id", "stratum", "value",
        Map("rare" -> 1000000L), defaultRatePpm = 200000L)
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    val rare = out("rare")
    assert(rare.getAs[Long]("n_sampled") == rare.getAs[Long]("n"))
    assert(rare.getAs[Long]("ht_cents") == rare.getAs[Long]("exact_cents"))
    assert(rare.getAs[Long]("err_ppm") == 0L)
    val big = out("big")
    assert(big.getAs[Long]("n_sampled") <= big.getAs[Long]("n"))
    // determinism under repartitioning (the md5-coin discipline)
    val again = Sketches.htStratifiedTotal(df.repartition(13), "id",
        "stratum", "value", Map("rare" -> 1000000L), 200000L)
      .collect().map(r => r.getAs[String]("stratum") ->
        r.getAs[Long]("ht_cents")).toMap
    assert(again("big") == big.getAs[Long]("ht_cents"))
    assert(again("rare") == rare.getAs[Long]("ht_cents"))
  }

  test("prioritySample: k rows, deterministic, weight-dominant keys win, degenerate weights excluded") {
    val s = spark
    import s.implicits._
    val df = ((1L to 200L).map(i => (i, Some(10L))) ++ Seq(
      (900L, Some(1000000000000L)), // priority ~ fold/1e12: certain pick
      (901L, Some(0L)), (902L, Some(-5L)), (903L, None) // excluded
    )).toDF("k", "w")
    val out = Sketches.prioritySample(df, col("k"), col("w"), k = 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 50)
    assert(out.map(_._1).contains("900")) // the heavy row is drawn
    assert(!out.map(_._1).exists(Set("901", "902", "903"))) // degenerate out
    // sorted by (priority, key), priorities reproduce h div w exactly
    assert(out.map(t => (t._3, t._1)).toSeq ==
      out.map(t => (t._3, t._1)).sortBy(identity).toSeq)
    val verify = df.filter(col("w").isNotNull && col("w") > 0)
      .select(col("k").cast("string").as("key"),
        expr("cast(conv(substring(md5(concat('ps:', cast(k as string))), " +
          "1, 13), 16, 10) as bigint) div w").as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (key, _, pri) => assert(verify(key) == pri) }
    // zero RNG: a rerun returns the identical sample
    val again = Sketches.prioritySample(df, col("k"), col("w"), k = 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
  }

}
