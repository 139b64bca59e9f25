package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, length}

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("audit: every rule class counts its violations; clean data reports zero") {
    val df = Seq(
      (Some(1L), 5.0, "A", "k1"),
      (None, -2.0, "X", "k1"), //  null id, negative, out of set, dup key
      (Some(3L), 0.0, "N", "k2"),
      (Some(4L), 1.0, "A", "k1") // third occurrence of k1
    ).toDF("id", "qty", "flag", "k")
    val out = Quality.audit(df,
        notNull = Seq("id"), nonNegative = Seq("qty"),
        inSet = Map("flag" -> Seq("A", "N", "R")),
        unique = Seq(Seq("k")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("not_null", "id")) == ((1L, 4L)))
    assert(out(("non_negative", "qty")) == ((1L, 4L)))
    assert(out(("in_set", "flag")) == ((1L, 4L)))
    assert(out(("unique", "k")) == ((2L, 4L))) // k1 x3 -> 2 violations
    // clean table: all zeros
    val clean = Quality.audit(
        Seq((1L, 1.0)).toDF("id", "qty"),
        notNull = Seq("id"), nonNegative = Seq("qty"))
      .collect().map(_.getLong(2)).toSeq
    assert(clean == Seq(0L, 0L))
  }

  test("audit: bounds and regex rules; nulls are not bounds/regex violations") {
    val df = Seq(
      (Some(50.0), Some("1-URGENT")),
      (Some(150.0), Some("9-BROKEN")), // out of bounds, bad format
      (None, None) //                     nulls: not_null's job, not these rules'
    ).toDF("price", "prio")
    val out = Quality.audit(df,
        bounds = Map("price" -> (0.0, 100.0)),
        matches = Map("prio" -> "^[1-5]-"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out("bounds") == ((1L, 3L)))
    assert(out("regex") == ((1L, 3L)))
  }

  test("audit: empty input reports zero violations; zero rules -> empty result") {
    val empty = Seq.empty[(Long, Double, String)].toDF("id", "qty", "k")
    val out = Quality.audit(empty,
        notNull = Seq("id"), nonNegative = Seq("qty"),
        bounds = Map("qty" -> (0.0, 10.0)), matches = Map("k" -> "^a"),
        unique = Seq(Seq("k")))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(out.length == 5 && out.forall(_ == ((0L, 0L))))
    // no rules: an empty, correctly-typed report — not a crash
    val none = Quality.audit(Seq((1L, 1.0, "a")).toDF("id", "qty", "k"))
    assert(none.columns.toSeq == Seq("rule", "target", "violations", "checked"))
    assert(none.count() == 0L)
  }

  test("refIntegrity counts orphan DISTINCT keys") {
    val child = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Quality.refIntegrity(child, "fk", parent, "pk").head()
    assert(r.getString(0) == "ref_integrity")
    assert(r.getLong(2) == 1L) // only key 3 is orphaned (distinct count)
    assert(r.getLong(3) == 3L) // 3 distinct child keys checked
  }

  test("profile: per-column rows with exact stats, nulls excluded from nonnull/distinct") {
    val s = spark
    import s.implicits._
    val df = Seq((1, Some(2.5)), (2, Some(7.5)), (3, None), (4, Some(2.5)))
      .toDF("a", "b")
    val out = Quality.profile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out("a") == ((4L, 4L, 4L, 1.0, 4.0)))
    assert(out("b") == ((4L, 3L, 2L, 2.5, 7.5))) // null dropped, dup collapsed
    intercept[IllegalArgumentException] { Quality.profile(df, Nil) }
  }

  test("histogram: bucket math, edge clamping, null skipping, totals reconcile") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(-5.0), Some(0.0), Some(9.9), Some(10.0), Some(25.0),
      Some(99.9), Some(100.0), Some(250.0), None).toDF("v")
    val out = Quality.histogram(df, "v", minVal = 0.0, maxVal = 100.0, nbins = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // -5 clamps to bucket 0; 0.0, 9.9 in 0; 10.0 in 1; 25 in 2;
    // 99.9 in 9; 100 and 250 clamp to 9; null skipped
    assert(out == Map(0L -> 3L, 1L -> 1L, 2L -> 1L, 9L -> 3L), s"$out")
    assert(out.values.sum == 8L) // everything but the null
  }

  test("distributionDrift: identical mixes score zero; a shifted mix scores on the moved values") {
    val s = spark
    import s.implicits._
    val a = Seq("en", "en", "en", "de").toDF("lang")
    val same = Quality.distributionDrift(a, a, "lang")
      .collect().map(r => r.getLong(5)).sum
    assert(same == 0L)
    val b = Seq("en", "de", "de", "fr").toDF("lang")
    val out = Quality.distributionDrift(a, b, "lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    // en: 750000 vs 250000 ppm; de: 250000 vs 500000; fr: 0 vs 250000
    assert(out.map(t => (t._1, t._4, t._5)).toSeq ==
      Seq(("de", 250000L, 500000L), ("en", 750000L, 250000L), ("fr", 0L, 250000L)))
    // contributions: en (500000^2/1000000)=250000, de (250000^2/750000)=83333,
    // fr (250000^2/250000)=250000
    assert(out.map(t => (t._1, t._6)).toMap ==
      Map("de" -> 83333L, "en" -> 250000L, "fr" -> 250000L))
  }

  test("jsonKeyProfile: key coverage, distinct/min/max of extracted text, null rows skipped") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Some("""{"uid": 7, "type": "click"}"""),
      Some("""{"uid": 9}"""),
      Some("""{"uid": 7, "flag": true}"""),
      None).toDF("j")
    val out = Quality.jsonKeyProfile(df, "j")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(out("uid") == ((3L, 2L, "7", "9")))
    assert(out("type") == ((1L, 1L, "click", "click")))
    assert(out("flag") == ((1L, 1L, "true", "true")))
    assert(out.size == 3)
  }

  test("keySkew: shares, HHI, and top-k ordering on a known distribution") {
    val s = spark
    import s.implicits._
    // 6 a, 3 b, 1 c -> n=10; shares 600000/300000/100000
    // HHI = (36+9+1)*1e6 div 100 = 460000
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val rows = Quality.keySkew(df, "k", topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      ("a", 6L, 600000L, 3L, 10L, 460000L),
      ("b", 3L, 300000L, 3L, 10L, 460000L)))
  }


  test("clusterAgreement: identical partitions score 10^6; a hand case checks the pair algebra") {
    val s = spark
    import s.implicits._
    val same = Seq((1, 1), (1, 1), (2, 2), (2, 2)).toDF("a", "b")
    assert(Quality.clusterAgreement(same, "a", "b")
      .head().getAs[Long]("rand_ppm") == 1000000L)
    // a = {1,1,2,2}, b = {1,2,1,2}: contingency all-1 cells, P=0, A=B=2
    // agree = 6 + 0 - 2 - 2 = 2 -> rand = 2/6 = 333333 ppm
    val cross = Seq((1, 1), (1, 2), (2, 1), (2, 2)).toDF("a", "b")
    val r = Quality.clusterAgreement(cross, "a", "b").head()
    assert(r.getAs[Long]("agree_pairs") == 2L)
    assert(r.getAs[Long]("rand_ppm") == 333333L)
  }

  test("kAnonymity: small groups counted, null QI values form their own group") {
    val s = spark
    import s.implicits._
    val df = Seq(("en", "web"), ("en", "web"), ("en", "web"),
      ("fr", "web")).toDF("lang", "src")
    val r = Quality.kAnonymity(df, Seq("lang", "src"), k = 3).head()
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("small_groups") == 1L)
    assert(r.getAs[Long]("rows_at_risk") == 1L)
    assert(r.getAs[Long]("min_group_size") == 1L)
    assert(r.getAs[Long]("risk_ppm") == 250000L)
    // a null QI value is a group, not an escape hatch
    val withNull = Seq((Some("en"), "a"), (None, "a"), (None, "a"))
      .toDF("lang", "src")
    val r2 = Quality.kAnonymity(withNull, Seq("lang", "src"), k = 2).head()
    assert(r2.getAs[Long]("n_groups") == 2L)
    assert(r2.getAs[Long]("rows_at_risk") == 1L) // only the lone "en" row
  }

  test("cohenKappa: hand contingency table; constant agreement hits the pe guard") {
    val s = spark
    import s.implicits._
    // cells: (x,x)=4 (y,y)=2 (x,y)=2 (y,x)=2 -> n=10 agree=6
    // marginals a: x6 y4, b: x6 y4 -> pe = 52/100; kappa = 0.08/0.48
    val df = (Seq.fill(4)(("x", "x")) ++ Seq.fill(2)(("y", "y")) ++
      Seq.fill(2)(("x", "y")) ++ Seq.fill(2)(("y", "x"))).toDF("a", "b")
    val r = Quality.cohenKappa(df, "a", "b").head()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("agree") == 6L)
    assert(r.getAs[Long]("po_ppm") == 600000L)
    assert(r.getAs[Long]("pe_ppm") == 520000L)
    assert(r.getAs[Long]("kappa_ppm") == 166666L)
    // both annotators constant and equal: po = pe = 1 -> guard reports 0
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Quality.cohenKappa(const, "a", "b")
      .head().getAs[Long]("kappa_ppm") == 0L)
  }

  test("benford: digit counts, sub-1 rows excluded, TVD halves the deviation sum") {
    val df = Seq(123.9, 1.5, 19.0, 250.0, 250.0, 0.5, -3.0, 901.2)
      .toDF("v") // digits: 1,1,1,2,2 (0.5 and -3 excluded), 9
    val rows = Quality.benford(df, "v").collect()
    assert(rows.length == 9)
    val byDigit = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(byDigit(1L)._1 == 3L && byDigit(2L)._1 == 2L && byDigit(9L)._1 == 1L)
    assert(byDigit(3L)._1 == 0L)
    assert(rows.head.getAs[Long]("n_checked") == 6L)
    // obs_ppm of digit 1 = 3*1e6 div 6
    assert(byDigit(1L)._2 == 500000L)
    // tvd = sum(dev) div 2, constant across rows
    val devSum = rows.map(_.getAs[Long]("dev_ppm")).sum
    assert(rows.map(_.getAs[Long]("tvd_ppm")).distinct.toSeq == Seq(devSum / 2))
  }

  test("fdViolations: holding FD reports zero; broken FD counts groups/rows; null dep is a value") {
    val df = Seq(
      (1L, "x", Some("u")), (1L, "x", Some("u")), // k=1 consistent
      (2L, "y", Some("u")), (2L, "z", Some("v")), // k=2: b has 2 values, c too
      (3L, "w", None), (3L, "w", Some("u"))       // k=3: c mixes NULL+value
    ).toDF("k", "b", "c")
    val out = Quality.fdViolations(df, Seq(
        (Seq("k"), "b"), (Seq("k"), "c"), (Seq("k", "b"), "c")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("k->b") == ((3L, 1L, 2L, 2L)))
    // k->c: groups 2 and 3 violate (2 rows each), worst has 2 values
    assert(out("k->c") == ((3L, 2L, 4L, 2L)))
    // (k,b)->c: group (2,y) ok, (2,z) ok, (3,w) mixes NULL+u -> 1 violation
    assert(out("k,b->c") == ((4L, 1L, 2L, 2L)))
  }

  test("heapsGrowth: new types charged to their first bucket; cumulative sums reconcile") {
    val s = spark
    import s.implicits._
    // ids 0..3 with nBuckets=2: ids 0,1 -> bucket 0; 2,3 -> bucket 1
    val docs = Seq(
      (0L, "a b"), (1L, "b c"),      // bucket 0: types a,b,c
      (2L, "a d"), (3L, "d d e")     // bucket 1: new types d,e
    ).toDF("doc_id", "txt")
    val out = Quality.heapsGrowth(docs, "txt", "doc_id", nBuckets = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out(0L) == ((2L, 4L, 3L, 3L, 4L)))
    assert(out(1L) == ((2L, 5L, 2L, 5L, 9L)))
  }

  test("giniConcentration: uniform counts -> 0; concentration raises toward 1; single key is 0") {
    val s = spark
    import s.implicits._
    val uniform = Seq("a", "a", "b", "b", "c", "c").toDF("k")
    assert(Quality.giniConcentration(uniform, "k")
      .head().getAs[Long]("gini_ppm") == 0L)
    // (1,1,1,7): ranks asc 1,2,3,4 -> rank_mass=1+2+3+28=34, n=4, total=10
    // G = (2*34 - 5*10)/(4*10) = 18/40 = 0.45
    val skew = (Seq.fill(7)("hot") ++ Seq("x", "y", "z")).toDF("k")
    val g = Quality.giniConcentration(skew, "k").head()
    assert(g.getAs[Long]("n_keys") == 4L && g.getAs[Long]("total") == 10L)
    assert(g.getAs[Long]("gini_ppm") == 450000L)
    assert(Quality.giniConcentration(Seq("only", "only").toDF("k"), "k")
      .head().getAs[Long]("gini_ppm") == 0L)
  }

  test("populationOutliers: hand moments, both sides flag, uniform flags nothing") {
    val s = spark
    import s.implicits._
    // counts: a=10, b=1, c=1, d=1, e=1, f=1 -> n=6, sx=15, sxx=105
    // dev(a) = 60-15 = 45, lhs = 2025; rhs(k=2) = 4*(630-225) = 1620 -> high
    val rows = (Seq.fill(10)("a") ++ Seq("b", "c", "d", "e", "f")).toDF("k")
    val out = Quality.populationOutliers(rows, "k", k = 2).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a"))
    assert(out.head.getLong(1) == 10L && out.head.getString(2) == "high")
    assert(out.head.getLong(3) == 2025L && out.head.getLong(4) == 1620L)
    // uniform population: nothing flags at any k
    val uni = Seq("x", "x", "y", "y", "z", "z").toDF("k")
    assert(Quality.populationOutliers(uni, "k", k = 1).count() == 0L)
    // low side: one near-dead key against heavy uniform mass
    val low = (Seq.fill(20)("p") ++ Seq.fill(20)("q") ++ Seq.fill(20)("r") ++
      Seq("dead")).toDF("k")
    val l = Quality.populationOutliers(low, "k", k = 1).collect()
    assert(l.exists(r => r.getString(0) == "dead" && r.getString(2) == "low"))
  }

  test("schemaDrift: a key rolling out mid-range lands in its first bucket with its name") {
    val s = spark
    import s.implicits._
    val rows = (0L until 10L).map { i =>
      val j = if (i >= 5) s"""{"a": 1, "b": $i}""" else s"""{"a": 1}"""
      (i, j)
    }.toDF("ord", "j")
    val out = Quality.schemaDrift(rows, "j", "ord", nBuckets = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    assert(out(0L) == ((2L, 1L, "a", 1L)))
    assert(out(2L) == ((2L, 1L, "b", 2L)))
    assert(out(4L) == ((2L, 0L, "", 2L)))
  }

  test("ksTest: disjoint supports hit D=1, identical slices 0, hand gap with tie rule") {
    val s = spark
    import s.implicits._
    val a = Seq(1L, 2L, 3L).toDF("v")
    val far = Seq(10L, 11L).toDF("v")
    val d1 = Quality.ksTest(a, far, "v").head()
    assert(d1.getAs[Long]("n_a") == 3L && d1.getAs[Long]("n_b") == 2L)
    assert(d1.getAs[Long]("d_ppm") == 1000000L)
    assert(d1.getAs[Long]("at_value") == 3L) // the gap first maxes at v=3
    assert(Quality.ksTest(a, a, "v").head().getAs[Long]("d_ppm") == 0L)
    // hand case: a = {1,2}, b = {2,3}: at v=1 gap |1*2-0*2|=2; at v=2
    // |2*2-1*2|=2; at v=3 0 -> D = 2/4 = 0.5, earliest at v=1
    val h = Quality.ksTest(Seq(1L, 2L).toDF("v"), Seq(2L, 3L).toDF("v"), "v")
      .head()
    assert(h.getAs[Long]("d_ppm") == 500000L && h.getAs[Long]("at_value") == 1L)
  }

  test("cramersV2: perfect association reads ~1e6; independence reads ~0; 1-category guard") {
    val s = spark
    import s.implicits._
    // perfect: b = a over 2x2 (4+4 rows)
    val perfect = (Seq.fill(4)(("x", "x")) ++ Seq.fill(4)(("y", "y")))
      .toDF("a", "b")
    val p = Quality.cramersV2(perfect, "a", "b").head()
    assert(p.getAs[Long]("v2_ppm") >= 999000L) // two-step div loses ulps only
    // independent 2x2 with equal cells: chi2 exactly 0
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")).toDF("a", "b")
    val i = Quality.cramersV2(ind, "a", "b").head()
    assert(i.getAs[Long]("chi2_scaled") == 0L && i.getAs[Long]("v2_ppm") == 0L)
    // single-category side: v2 reports 0 via the guard
    val one = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    assert(Quality.cramersV2(one, "a", "b").head().getAs[Long]("v2_ppm") == 0L)
  }

  test("equiDepthHistogram: below sampleK the bins are exact equal-frequency; totals reconcile") {
    val s = spark
    import s.implicits._
    // 100 rows 1..100, sample covers everything -> 4 bins of 25
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    val out = Quality.equiDepthHistogram(df, "v", "id", nbins = 4,
        sampleK = 256)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // edges at ranks 25/50/75 -> bins 24,25,25,26 (top bin keeps its edge)
    assert(out.values.map(_._1).sum == 100L)
    assert(out(0L) == ((24L, 1.0, 24.0)))
    assert(out(1L) == ((25L, 25.0, 49.0)))
    assert(out(3L) == ((26L, 75.0, 100.0)))
    // skewed data still spreads: one hot value + a tail
    val skew = ((1L to 50L).map(i => (i, 7.0)) ++
      (51L to 100L).map(i => (i, i.toDouble))).toDF("id", "v")
    val sk = Quality.equiDepthHistogram(skew, "v", "id", nbins = 4,
      sampleK = 256).collect()
    assert(sk.map(_.getLong(1)).sum == 100L && sk.length >= 2)
  }

  test("sequenceGaps: bucketed two-level scan equals the flat answer") {
    val s = spark
    import s.implicits._
    // keys 0..9, 12, 20..22, 40  (gaps: 10-11, 13-19, 23-39)
    val keys = ((0L to 9L) ++ Seq(12L) ++ (20L to 22L) ++ Seq(40L))
    val df = keys.toDF("k")
    // bucketSize 4 forces in-bucket AND cross-bucket (incl. empty-bucket
    // spanning) gap stitching
    val r = Quality.sequenceGaps(df, "k", bucketSize = 4).head()
    assert(r.getLong(0) == 15L) //       n_keys
    assert((r.getLong(1), r.getLong(2)) == ((0L, 40L)))
    assert(r.getLong(3) == 41L - 15L) // missing ids
    assert(r.getLong(4) == 3L) //        maximal gap runs
    assert(r.getLong(5) == 17L) //       23..39
    // degenerate: single key -> zero gaps, zero missing
    val one = Quality.sequenceGaps(Seq(7L).toDF("k"), "k", bucketSize = 4).head()
    assert(one.getLong(0) == 1L && one.getLong(3) == 0L &&
      one.getLong(4) == 0L && one.getLong(5) == 0L)
  }

  test("fanoutAudit: children per matched parent, childless parents, orphans excluded") {
    val s = spark
    import s.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    // parent 1 has 3 children, parent 2 has 1, parent 3 none;
    // child of parent 9 is an orphan (not counted as a child of the rel)
    val child = Seq(1L, 1L, 1L, 2L, 9L).toDF("fk")
    val r = Quality.fanoutAudit(parent, "pk", child, "fk", "p->c").head()
    assert(r.getAs[String]("rel") == "p->c")
    assert(r.getAs[Long]("n_parents") == 3L)
    assert(r.getAs[Long]("n_children") == 4L) // orphan excluded
    assert(r.getAs[Long]("childless_parents") == 1L)
    assert(r.getAs[Long]("avg_x100") == 200L) // 4 children / 2 matched
    assert(r.getAs[Long]("max_per_parent") == 3L)
  }

  test("supportCoverage: rows on unseen buckets counted; identical slices = full coverage") {
    val s = spark
    import s.implicits._
    val train = Seq(("a", 1L), ("a", 2L), ("b", 1L)).toDF("t", "vb")
    val test = Seq(("a", 1L), ("a", 1L), ("b", 9L), ("c", 1L))
      .toDF("t", "vb")
    val r = Quality.supportCoverage(train, test, Seq("t", "vb")).head()
    assert(r.getAs[Long]("n_test") == 4L)
    assert(r.getAs[Long]("n_covered") == 2L) // the two (a,1) rows
    assert(r.getAs[Long]("n_unseen") == 2L)
    assert(r.getAs[Long]("coverage_ppm") == 500000L)
    assert(r.getAs[Long]("n_train_buckets") == 3L)
    assert(r.getAs[Long]("n_test_buckets") == 3L)
    val full = Quality.supportCoverage(train, train, Seq("t", "vb")).head()
    assert(full.getAs[Long]("coverage_ppm") == 1000000L)
  }

  test("pseudonymAudit: tiny space forces collisions; huge space has none") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).toDF("k")
    val tiny = Quality.pseudonymAudit(df, "k", bits = 4).head()
    assert(tiny.getAs[Long]("space") == 16L)
    assert(tiny.getAs[Long]("n_keys") == 100L)
    assert(tiny.getAs[Long]("n_pseudonyms") <= 16L)
    assert(tiny.getAs[Long]("n_collisions") ==
      100L - tiny.getAs[Long]("n_pseudonyms"))
    val big = Quality.pseudonymAudit(df, "k", bits = 52).head()
    assert(big.getAs[Long]("n_collisions") == 0L)
    assert(big.getAs[Long]("max_bucket") == 1L)
  }

  test("featureAuc: perfect separation = 1.0, anti-separation = 0, all-tied = 0.5") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, length}
    // positives all have larger feature values: AUC = 1
    val sep = Seq((10L, 1L), (11L, 1L), (1L, 0L), (2L, 0L)).toDF("f", "y")
    assert(Quality.featureAuc(sep, "f", col("y") === 1L)
      .head().getAs[Long]("auc_ppm") == 1000000L)
    // inverted
    val inv = Seq((1L, 1L), (10L, 0L)).toDF("f", "y")
    assert(Quality.featureAuc(inv, "f", col("y") === 1L)
      .head().getAs[Long]("auc_ppm") == 0L)
    // one shared value: every pair tied -> exactly 1/2
    val tied = Seq((5L, 1L), (5L, 0L), (5L, 1L)).toDF("f", "y")
    val r = Quality.featureAuc(tied, "f", col("y") === 1L).head()
    assert(r.getAs[Long]("ties") == 2L && r.getAs[Long]("auc_ppm") == 500000L)
  }

  test("sentinelAudit: modal value, zero/negative counts, per column") {
    val s = spark
    import s.implicits._
    val df = Seq((0.0, 5.0), (0.0, -1.0), (0.0, 2.0), (1.5, 2.0))
      .toDF("a", "b")
    val out = Quality.sentinelAudit(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(out("a") == ((4L, 3L, 0L, "0.0", 3L, 750000L)))
    assert(out("b") == ((4L, 0L, 1L, "2.0", 2L, 500000L)))
  }

  test("targetEncode: rare categories shrink to the prior, popular ones keep their rate") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, length}
    // 100 rows of 'big' at 50% positive, 1 row of 'rare' at 100%
    val rows = (1 to 100).map(i => ("big", i % 2 == 0)) :+ (("rare", true))
    val df = rows.toDF("cat", "y")
    val out = Quality.targetEncode(df, "cat", col("y"), alpha = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val prior = 51L * 1000000L / 101L // 504950
    assert(out("big")._3 == prior && out("rare")._3 == prior)
    // big: (50e6 + 10*prior)/(110) ~ its own 500000
    assert(math.abs(out("big")._4 - 500000L) < 10000L)
    // rare: (1e6 + 10*prior)/11 -> pulled well below 1.0 toward the prior
    assert(out("rare")._4 == (1000000L + 10L * prior) / 11L)
    assert(out("rare")._4 < 600000L)
  }

  test("weightedPercentile: cumulative-weight crossing, ties collapse first") {
    val s = spark
    import s.implicits._
    // group g: values 1(w=1), 2(w=1+1 split across rows), 10(w=1):
    // total 4, median crossing at cumw >= 2 -> value 2
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 2.0, 1L),
      ("g", 10.0, 1L), ("h", 5.0, 100L), ("h", 99.0, 1L))
      .toDF("grp", "v", "wt")
    val out = Quality.weightedPercentile(df, "v", "wt", Seq("grp"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2))).toMap
    assert(out("g") == ((2.0, 4L)))
    assert(out("h") == ((5.0, 101L))) // heavy value dominates
    // p90: g crosses 3.6 at value 10
    val p90 = Quality.weightedPercentile(df, "v", "wt", Seq("grp"),
      pPpm = 900000L).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(p90("g") == 10.0)
  }

  test("keyCandidates: uniqueness per combo; nulls group as a value") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(1L), "a"), (Some(2L), "a"), (Some(3L), "b"),
      (None, "b"), (None, "b")
    ).toDF("id", "grp")
    val out = Quality.keyCandidates(df, Seq(Seq("id"), Seq("grp"),
        Seq("id", "grp")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    assert(out("id") == ((5L, 4L, 1L, 0L)))  // two NULL ids collide
    assert(out("grp") == ((5L, 2L, 3L, 0L)))
    assert(out("id,grp") == ((5L, 4L, 1L, 0L)))
  }

  test("corrMatrix: exact r2 for perfectly correlated / independent pairs") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L, 1L), (2L, 4L, -1L), (3L, 6L, 1L), (4L, 8L, -1L))
      .toDF("x", "y", "z")
    import org.apache.spark.sql.functions.{col, length}
    val out = Quality.corrMatrix(df, Seq(
        "x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(out(("x", "y")) == ((1000000L, 1L))) // y = 2x exactly
    assert(out(("x", "z"))._1 < 250000L) //        weak
    assert(out(("y", "z")) == out(("x", "z"))) //  same geometry
  }

  test("corrMatrix: a constant column yields NULL r2_ppm, not a silent 0") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "c")
    val r = Quality.corrMatrix(df, Seq("x" -> col("x"), "c" -> col("c")))
      .head()
    assert(r.isNullAt(r.fieldIndex("r2_ppm")))
  }

  test("reconcile: match, mismatch beyond tolerance, and no-detail headers split out") {
    val s = spark
    import s.implicits._
    val header = Seq(
      (1L, "A", 1000000L),  // reconciles exactly
      (2L, "A", 5000000L),  // details sum to 4_000_000 -> mismatch 1e6
      (3L, "B", 777L)       // no detail rows
    ).toDF("hk", "grp0", "total")
    val detail = Seq(
      (1L, 400000L), (1L, 600000L),
      (2L, 4000000L)
    ).toDF("dk", "amt")
    val out = Quality.reconcile(header, "hk", col("total"), "grp0",
        detail, "dk", col("amt"), tolMicros = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("A") == ((2L, 0L, 1L, 1000000L)))
    assert(out("B") == ((1L, 1L, 0L, 0L)))
  }

  test("supportCoverage: NULL bucket values do not collide with absent columns") {
    val s = spark
    import s.implicits._
    // train has bucket ("x", 1); test row (NULL, 1) must read UNSEEN —
    // concat_ws without the sentinel would collapse both keys to "1"...
    // here to ("x|1" vs "1") so craft the colliding shape directly:
    // train ("1", NULL) vs test (NULL, "1") — unsentineled both become "1"
    val train = Seq(("1", None: Option[String])).toDF("a", "b")
    val test0 = Seq((None: Option[String], "1")).toDF("a", "b")
    val r = Quality.supportCoverage(train, test0, Seq("a", "b")).head()
    assert(r.getAs[Long]("n_covered") == 0L)
    assert(r.getAs[Long]("n_unseen") == 1L)
  }
  test("contentChecksum: order/partitioning-invariant, value-sensitive, dup pairs caught") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "g", 10L), (2L, "g", 20L), (3L, "g", 30L))
      .toDF("id", "grp0", "v")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Quality.contentChecksum(df, "grp0", Seq(col("id"), col("v")))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    val base = sums(a)
    assert(sums(a.orderBy(col("id").desc).repartition(5)) == base)
    // one changed value flips the fingerprint
    val changed = sums(Seq((1L, "g", 10L), (2L, "g", 21L), (3L, "g", 30L))
      .toDF("id", "grp0", "v"))
    assert(changed._2 != base._2 || changed._3 != base._3)
    // an identical pair of extra rows: XOR cancels, count + sum_mod don't
    val dup = sums(a.unionAll(Seq((9L, "g", 90L), (9L, "g", 90L))
      .toDF("id", "grp0", "v")))
    assert(dup._2 == base._2) // the xor blind spot, by construction
    assert(dup._1 == base._1 + 2 && dup._3 != base._3)
  }

  test("completenessMatrix: per-slice null shares; a slice-dead column is visible") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("web", Some(1L), Some("x")), ("web", Some(2L), None),
      ("app", None, Some("y")), ("app", None, Some("z"))
    ).toDF("src", "uid", "tag")
    val out = Quality.completenessMatrix(df, "src", Seq("uid", "tag"))
      .collect().map(r => (r.getString(0), r.getString(2)) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    assert(out(("web", "uid")) == ((2L, 2L, 1000000L)))
    assert(out(("web", "tag")) == ((2L, 1L, 500000L)))
    assert(out(("app", "uid")) == ((2L, 0L, 0L))) // dead for this slice
    assert(out(("app", "tag")) == ((2L, 2L, 1000000L)))
  }

  test("jsonTypeInference: narrowest type wins; mixed keys fall back to varchar") {
    val s = spark
    import s.implicits._
    val df = Seq(
      """{"i": 5, "d": "1.25", "b": true, "m": 7}""",
      """{"i": -3, "d": "2e3", "b": false, "m": "oops"}"""
    ).toDF("j")
    val out = Quality.jsonTypeInference(df, "j")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5))).toMap
    assert(out("i") == ((2L, 2L, 2L, 0L, "bigint"))) // ints are doubles too
    assert(out("d") == ((2L, 0L, 2L, 0L, "double")))
    assert(out("b") == ((2L, 0L, 0L, 2L, "boolean")))
    assert(out("m") == ((2L, 1L, 1L, 0L, "varchar")))
  }

  test("hellingerGate: zero on identical slices, 1.0 on disjoint, NULL is its own bucket") {
    val s = spark
    import s.implicits._
    val a = Seq("x", "x", "y", "z").toDF("c")
    val same = Quality.hellingerGate(a, a, Seq("c" -> col("c"))).head()
    assert(same.getString(0) == "c")
    assert(same.getAs[Long]("n_buckets") == 3L)
    assert(same.getAs[Long]("h2_ppm") == 0L)
    // disjoint supports: H^2 = 1 exactly -> 1e6 ppm
    val b = Seq("p", "q").toDF("c")
    val dis = Quality.hellingerGate(a, b, Seq("c" -> col("c"))).head()
    assert(dis.getAs[Long]("n_buckets") == 5L)
    assert(dis.getAs[Long]("h2_ppm") == 1000000L)
    // a NULL bucket is distinct from the literal string "null"
    val withNull = Seq(Option.empty[String], None, Some("x")).toDF("c")
    val litNull = Seq(Some("null"), Some("null"), Some("x")).toDF("c")
    val nn = Quality.hellingerGate(withNull, litNull, Seq("c" -> col("c"))).head()
    assert(nn.getAs[Long]("n_buckets") == 3L)
    assert(nn.getAs[Long]("h2_ppm") > 500000L) // 2/3 of mass disagrees
    // multi-feature: one row per feature, in input order semantics by name
    val mf = Quality.hellingerGate(a, b,
      Seq("f1" -> col("c"), "f2" -> length(col("c"))))
      .collect().map(r => r.getString(0)).toSet
    assert(mf == Set("f1", "f2"))
  }

  test("simpsonsAudit: within-slice reversal is flagged, OVERALL row is appended") {
    val s = spark
    import s.implicits._
    // classic reversal: B beats A in BOTH slices, A wins the aggregate
    // because A's volume concentrates in the easy slice.
    val rows =
      Seq.fill(80)(("s1", true, true)) ++ Seq.fill(20)(("s1", true, false)) ++
      Seq.fill(9)(("s1", false, true)) ++ Seq.fill(1)(("s1", false, false)) ++
      Seq.fill(2)(("s2", true, true)) ++ Seq.fill(8)(("s2", true, false)) ++
      Seq.fill(30)(("s2", false, true)) ++ Seq.fill(70)(("s2", false, false))
    val df = rows.toDF("slice", "ga", "ok")
    val out = Quality.simpsonsAudit(df, col("slice"), col("ga"), col("ok"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getBoolean(8))).toMap
    assert(out.keySet == Set("s1", "s2", "OVERALL"))
    val (n1, s1, ra1, rb1, sg1, rev1) = out("s1")
    assert(n1 == 100L && s1 == 80L && ra1 == 800000L && rb1 == 900000L)
    assert(sg1 == -1L && rev1) // B wins the slice, A wins overall -> flagged
    assert(out("s2")._5 == -1L && out("s2")._6)
    val (na, sa, rao, rbo, sgo, revo) = out("OVERALL")
    assert(na == 110L && sa == 82L && rao > rbo && sgo == 1L && !revo)
  }

  test("krippendorffAlpha: perfect agreement is 1e6, the worked 2x2 case is 0, singletons drop") {
    val s = spark
    import s.implicits._
    val perfect = Seq(("u1", "x"), ("u1", "x"), ("u2", "y"), ("u2", "y"))
      .toDF("u", "c")
    val p = Quality.krippendorffAlpha(perfect, "u", "c").head()
    assert(p.getAs[Long]("alpha_ppm") == 1000000L)
    // hand case: (a,a) + (a,b): D_o/D_e works out to exactly 1 -> alpha 0
    val mixed = Seq(("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "b"))
      .toDF("u", "c")
    val m = Quality.krippendorffAlpha(mixed, "u", "c").head()
    assert(m.getAs[Long]("n_units") == 2L)
    assert(m.getAs[Long]("n_pairable") == 4L)
    assert(m.getAs[Long]("alpha_ppm") == 0L)
    // a single-rating unit contributes nothing pairable
    val withSingleton = mixed.unionAll(Seq(("u3", "z")).toDF("u", "c"))
    val w = Quality.krippendorffAlpha(withSingleton, "u", "c").head()
    assert(w.getAs[Long]("n_units") == 2L)
    assert(w.getAs[Long]("n_pairable") == 4L)
  }

  test("jackknifeCi: constant data collapses the interval, the mean stays inside it") {
    val s = spark
    import s.implicits._
    val const = (1 to 500).map(i => (i.toLong, 7000000L)).toDF("k", "v")
    val c = Quality.jackknifeCi(const, col("k"), col("v"), blocks = 16).head()
    assert(c.getAs[Long]("n") == 500L)
    assert(c.getAs[Long]("mean_micros") == 7000000L)
    assert(c.getAs[Long]("se_micros") == 0L)
    assert(c.getAs[Long]("ci_lo_micros") == 7000000L)
    assert(c.getAs[Long]("ci_hi_micros") == 7000000L)
    val varied = (1 to 2000).map(i => (i.toLong, (i % 100) * 1000000L))
      .toDF("k", "v")
    val v = Quality.jackknifeCi(varied, col("k"), col("v"), blocks = 32).head()
    val (lo, hi) = (v.getAs[Long]("ci_lo_micros"), v.getAs[Long]("ci_hi_micros"))
    assert(lo < hi)
    assert(v.getAs[Long]("mean_micros") >= lo &&
      v.getAs[Long]("mean_micros") <= hi)
    assert(v.getAs[Long]("se_micros") > 0L &&
      v.getAs[Long]("se_micros") < 5000000L) // ~ sd/sqrt(n) scale, not sd
  }

  test("rboTopkDrift: identical lists max out, disjoint lists zero out, top swaps cost more") {
    val s = spark
    import s.implicits._
    def corpus(keys: Seq[(String, Int)]) =
      keys.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")
    val a = corpus(Seq("x" -> 50, "y" -> 40, "z" -> 30, "w" -> 20, "v" -> 10))
    val same = Quality.rboTopkDrift(a, a, "k", k = 5).head()
    // identical lists: ov_d = d, term = 1e6 div 2^d (exact truncation)
    val maxRbo = (1 to 5).map(d => 1000000L >> d).sum
    assert(same.getAs[Long]("n_stay") == 5L)
    assert(same.getAs[Long]("n_entered") == 0L)
    assert(same.getAs[Long]("rbo_ppm") == maxRbo)
    val b = corpus(Seq("p" -> 50, "q" -> 40, "r" -> 30, "s" -> 20, "t" -> 10))
    val dis = Quality.rboTopkDrift(a, b, "k", k = 5).head()
    assert(dis.getAs[Long]("n_stay") == 0L)
    assert(dis.getAs[Long]("n_entered") == 5L &&
      dis.getAs[Long]("n_exited") == 5L)
    assert(dis.getAs[Long]("rbo_ppm") == 0L)
    // swapping ranks 1/2 hurts more than swapping 4/5 (top-weightedness)
    val swapTop = corpus(Seq("y" -> 50, "x" -> 40, "z" -> 30, "w" -> 20, "v" -> 10))
    val swapBot = corpus(Seq("x" -> 50, "y" -> 40, "z" -> 30, "v" -> 20, "w" -> 10))
    val st = Quality.rboTopkDrift(a, swapTop, "k", k = 5).head().getAs[Long]("rbo_ppm")
    val sb = Quality.rboTopkDrift(a, swapBot, "k", k = 5).head().getAs[Long]("rbo_ppm")
    assert(st < sb && sb < maxRbo)
  }

  test("lDiversity: constant-sensitive group flags weak, NULL is its own class") {
    val s = spark
    import s.implicits._
    val df = (
      Seq.fill(4)(("a", "x")) ++ // 4 rows, 1 distinct -> weak at l=3
        Seq(("b", "x"), ("b", "y"), ("b", "z")) ++ // 3 distinct -> ok
        Seq(("c", "x"), ("c", "x"), ("c", "y"), ("c", null)) // null counts
    ).toDF("grp", "sens")
    val r = Quality.lDiversity(df, Seq("grp"), "sens", l = 3).head()
    assert(r.getAs[Long]("n_rows") == 11L)
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("weak_groups") == 1L)
    assert(r.getAs[Long]("rows_at_risk") == 4L)
    assert(r.getAs[Long]("min_distinct") == 1L)
    // group a: top share 4/4 = 1.0
    assert(r.getAs[Long]("max_topshare_ppm") == 1000000L)
    // all-diverse input: zero weak groups, zero rows at risk
    val ok = Quality.lDiversity(
      df.filter(col("grp") =!= "a"), Seq("grp"), "sens", l = 3).head()
    assert(ok.getAs[Long]("weak_groups") == 0L &&
      ok.getAs[Long]("rows_at_risk") == 0L)
  }

  test("fkCandidates: full containment into a unique parent; zero-match pairs still appear") {
    val s = spark
    import s.implicits._
    val p = Seq(1L, 2L, 3L, 4L, 5L).toDF("k") // unique parent
    val c = Seq(1L, 1L, 2L).toDF("k") //          duplicated child, subset of p
    val x = Seq(9L, 10L).toDF("k") //             disjoint from both
    val out = Quality.fkCandidates(Seq(
        ("p", p, "k"), ("c", c, "k"), ("x", x, "k")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.size == 6) // every ordered pair, including zero-match ones
    // c into p: 2/2 distinct contained, p unique -> FK candidate
    assert(out(("c", "p")) == ((2L, 2L, 1000000L, 1L)))
    // p into c: 2/5 contained, c NOT unique (value 1 repeats)
    assert(out(("p", "c")) == ((5L, 2L, 400000L, 0L)))
    assert(out(("x", "p")) == ((2L, 0L, 0L, 1L)))
    assert(out(("x", "c")) == ((2L, 0L, 0L, 0L)))
  }

  test("tCloseness: global-mirroring group scores 0, skewed group scores high, NULL sensitive is its own class") {
    // global: x=3, y=3 (N=6, m=2). group a = (3x,1y), group b = (0x,2y)
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "y"), ("b", "y")
    ).toDF("grp", "sv")
    val r = Quality.tCloseness(df, Seq("grp"), "sv", tPpm = 300000L).head()
    // a: |d| cum = 6 -> emd = 6e6/(1*4*6) = 250000 (under t)
    // b: |d| cum = 6 -> emd = 6e6/(1*2*6) = 500000 (over t)
    assert(r.getAs[Long]("t_ppm") == 300000L)
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("weak_groups") == 1L)
    assert(r.getAs[Long]("rows_at_risk") == 2L)
    assert(r.getAs[Long]("max_emd_ppm") == 500000L)
    // a group identical to the global distribution scores exactly 0
    val same = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("grp", "sv")
    assert(Quality.tCloseness(same, Seq("grp"), "sv", 1L)
      .head().getAs[Long]("max_emd_ppm") == 0L)
    // NULL sensitive value is a distinct disclosure class, not merged
    val withNull = Seq(("a", Some("x")), ("a", None), ("b", Some("x")),
      ("b", Some("x"))).toDF("grp", "sv")
    assert(Quality.tCloseness(withNull, Seq("grp"), "sv", 100000L)
      .head().getAs[Long]("weak_groups") == 2L) // both diverge from 75/25
  }

  test("tCloseness: sensitive cardinality above maxValues fails loudly") {
    val df = (1 to 50).map(i => ("g", s"v$i")).toDF("grp", "sv")
    val e = intercept[IllegalArgumentException](
      Quality.tCloseness(df, Seq("grp"), "sv", 100000L, maxValues = 10))
    assert(e.getMessage.contains("maxValues"))
  }

  test("cronbachAlpha: duplicated item is perfectly consistent, cancelling items guard to NULL, hand case exact") {
    val s = spark
    import s.implicits._
    val dup = Seq((1L, 1L), (2L, 2L), (7L, 7L)).toDF("a", "b")
    val one = Quality.cronbachAlpha(dup,
      Seq("a" -> col("a"), "b" -> col("b"))).head()
    assert(one.getAs[Long]("k") == 2L && one.getAs[Long]("n") == 3L)
    assert(one.getAs[Long]("alpha_ppm") == 1000000L)
    // b = -a: the total is constant, variance 0 -> NULL, not a fake 0
    val cancel = Quality.cronbachAlpha(
      Seq((1L, -1L), (2L, -2L)).toDF("a", "b"),
      Seq("a" -> col("a"), "b" -> col("b"))).head()
    assert(cancel.isNullAt(cancel.fieldIndex("alpha_ppm")))
    // hand case: x=(1,2,3), y=(1,3,2) -> alpha = 2(1 - 12/18) = 2/3
    val hand = Quality.cronbachAlpha(
      Seq((1L, 1L), (2L, 3L), (3L, 2L)).toDF("a", "b"),
      Seq("a" -> col("a"), "b" -> col("b"))).head()
    assert(hand.getAs[Long]("alpha_ppm") == 666666L)
  }

  test("monotonicityAudit: dip against the trend counted, clean trend flagged monotone, flat is vacuously monotone") {
    val s = spark
    import s.implicits._
    def mk(rates: Seq[Int]): org.apache.spark.sql.DataFrame =
      rates.zipWithIndex.flatMap { case (pct, i) =>
        (1 to 100).map(j => (i.toLong + 1, j <= pct))
      }.toDF("f", "y")
    // rates 0%, 50%, 25%, 100% over buckets 1..4: up, down, up
    val dip = Quality.monotonicityAudit(mk(Seq(0, 50, 25, 100)),
      col("f"), col("y"), buckets = 4).head()
    assert(dip.getAs[Long]("n_buckets") == 4L)
    assert(dip.getAs[Long]("n_steps") == 3L)
    assert(dip.getAs[Long]("n_up") == 2L)
    assert(dip.getAs[Long]("n_down") == 1L)
    assert(dip.getAs[String]("dir") == "up")
    assert(dip.getAs[Long]("n_violations") == 1L)
    assert(!dip.getAs[Boolean]("monotone"))
    val clean = Quality.monotonicityAudit(mk(Seq(10, 20, 30, 40)),
      col("f"), col("y"), buckets = 4).head()
    assert(clean.getAs[Boolean]("monotone") &&
      clean.getAs[Long]("n_violations") == 0L)
    val flat = Quality.monotonicityAudit(mk(Seq(30, 30, 30)),
      col("f"), col("y"), buckets = 3).head()
    assert(flat.getAs[Boolean]("monotone") &&
      flat.getAs[Long]("n_up") == 0L && flat.getAs[Long]("n_down") == 0L)
  }

  test("bootstrapCi: constant data collapses the interval, the mean stays inside, replay is deterministic") {
    val s = spark
    import s.implicits._
    val const = (1 to 500).map(i => (i.toLong, 42000000L)).toDF("k", "v")
    val c = Quality.bootstrapCi(const, col("k"), col("v"),
      blocks = 16, resamples = 40).head()
    assert(c.getAs[Long]("n") == 500L)
    assert(c.getAs[Long]("mean_micros") == 42000000L)
    assert(c.getAs[Long]("ci_lo_micros") == 42000000L)
    assert(c.getAs[Long]("ci_hi_micros") == 42000000L)
    val varied = (1 to 2000).map(i => (i.toLong, (i % 100) * 1000000L))
      .toDF("k", "v")
    val v1 = Quality.bootstrapCi(varied, col("k"), col("v")).head()
    val (lo, hi) =
      (v1.getAs[Long]("ci_lo_micros"), v1.getAs[Long]("ci_hi_micros"))
    assert(lo < hi)
    assert(v1.getAs[Long]("mean_micros") >= lo &&
      v1.getAs[Long]("mean_micros") <= hi)
    // zero RNG: the same inputs give the same interval, run to run
    val v2 = Quality.bootstrapCi(varied, col("k"), col("v")).head()
    assert(v1 == v2)
  }

  test("spearmanMatrix: monotone = 1e6 regardless of shape or outliers, sign tracks direction, ties match the hand case") {
    val s = spark
    import s.implicits._
    // y = x^3 (nonlinear but monotone) and one huge outlier that stays
    // rank-consistent: Spearman maxes out where Pearson would not.
    val mono = (1L to 9L).map(x => (x, x * x * x, -x)) :+
      ((1000000L, 1000000000000000000L, -1000000L))
    val m = Quality.spearmanMatrix(mono.toDF("x", "y", "z"),
        Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("r2_ppm"), r.getAs[Long]("sgn"))).toMap
    assert(m(("x", "y")) == ((1000000L, 1L)))
    assert(m(("x", "z")) == ((1000000L, -1L)))
    assert(m(("y", "z")) == ((1000000L, -1L)))
    // hand case with ties: x=(1,1,2), y=(3,4,5) -> rho^2 = 0.75
    val tied = Seq((1L, 3L), (1L, 4L), (2L, 5L)).toDF("a", "b")
    val t = Quality.spearmanMatrix(tied,
      Seq("a" -> col("a"), "b" -> col("b"))).head()
    assert(t.getAs[Long]("r2_ppm") == 750000L)
    assert(t.getAs[Long]("sgn") == 1L)
  }

  test("mannWhitneyU: hand case, mid-rank ties, non-binary groupings yield zero rows") {
    val s = spark
    import s.implicits._
    // complete separation A={1,2,3} < B={4,5,6}: U_A = 0, U_B = n1*n2,
    // z = -9/sqrt(21) exactly (no ties)
    val sep = Seq(("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 4L), ("B", 5L), ("B", 6L)).toDF("g", "v")
    val r = Quality.mannWhitneyU(sep, col("g"), col("v")).head()
    assert(r.getAs[String]("g_a") == "A" && r.getAs[String]("g_b") == "B")
    assert(r.getAs[Long]("u2x_a") == 0L && r.getAs[Long]("u2x_b") == 18L)
    assert(r.getAs[Long]("tie_term") == 0L)
    assert(math.abs(r.getAs[Double]("z") - (-9.0 / math.sqrt(21.0))) < 1e-12)
    // mid-rank ties: A={1,1}, B={1,2} -> the three 1s share rank 2
    // (rank2 = 4), U_A = 1 (u2x = 2), tie_term = 3^3 - 3 = 24
    val tied = Seq(("A", 1L), ("A", 1L), ("B", 1L), ("B", 2L)).toDF("g", "v")
    val t2 = Quality.mannWhitneyU(tied, col("g"), col("v")).head()
    assert(t2.getAs[Long]("u2x_a") == 2L && t2.getAs[Long]("u2x_b") == 6L)
    assert(t2.getAs[Long]("tie_term") == 24L)
    // u2x_a + u2x_b = 2*n1*n2 always
    assert(t2.getAs[Long]("u2x_a") + t2.getAs[Long]("u2x_b") ==
      2 * t2.getAs[Long]("n_a") * t2.getAs[Long]("n_b"))
    // three groups or one group: zero rows, never a mispaired statistic
    val three = Seq(("A", 1L), ("B", 2L), ("C", 3L)).toDF("g", "v")
    assert(Quality.mannWhitneyU(three, col("g"), col("v")).count() == 0L)
    val one = Seq(("A", 1L), ("A", 2L)).toDF("g", "v")
    assert(Quality.mannWhitneyU(one, col("g"), col("v")).count() == 0L)
  }

  test("srmCheck: hand chi-square, zero-count arm counted, unweighted arm goes loud") {
    val s = spark
    import s.implicits._
    // 60/40 on an intended 1:1 split of 100: chi2 = (60-50)^2/50 +
    // (40-50)^2/50 = 4.0 exactly -> 4_000_000 ppm (df=1 critical value
    // at 5% is ~3.84 -> this IS an SRM)
    val df6040 = (Seq.fill(60)("A") ++ Seq.fill(40)("B")).toDF("arm")
    val r = Quality.srmCheck(df6040, col("arm"), Seq("A" -> 1L, "B" -> 1L))
      .head()
    assert(r.getAs[Long]("n_arms") == 2L && r.getAs[Long]("n_total") == 100L)
    assert(r.getAs[Long]("df") == 1L)
    assert(r.getAs[Long]("chi2_ppm") == 4000000L)
    // an arm with ZERO observed rows still enters the statistic
    val onlyA = Seq.fill(10)("A").toDF("arm")
    val z = Quality.srmCheck(onlyA, col("arm"), Seq("A" -> 1L, "B" -> 1L))
      .head()
    assert(z.getAs[Long]("chi2_ppm") == 10000000L) // 5.0 + 5.0
    // an OBSERVED arm missing from the intended allocation nulls the
    // statistic (loud), never silently drops
    val stray = (Seq.fill(5)("A") ++ Seq.fill(5)("B") ++ Seq.fill(2)("C"))
      .toDF("arm")
    val st = Quality.srmCheck(stray, col("arm"), Seq("A" -> 1L, "B" -> 1L))
      .head()
    assert(st.isNullAt(st.fieldIndex("chi2_ppm")))
    // perfectly balanced: chi2 = 0
    val bal = (Seq.fill(50)("A") ++ Seq.fill(50)("B")).toDF("arm")
    assert(Quality.srmCheck(bal, col("arm"), Seq("A" -> 1L, "B" -> 1L))
      .head().getAs[Long]("chi2_ppm") == 0L)
  }

  test("welchTTest: hand case (t = -3*sqrt(3/2), df = 4), non-binary groupings empty") {
    val s = spark
    import s.implicits._
    // A={1,2,3}, B={4,5,6}: equal variances 1, means 2 vs 5 ->
    // t = -3/sqrt(2/3), Welch-Satterthwaite df = 4 exactly
    val sep = Seq(("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 4L), ("B", 5L), ("B", 6L)).toDF("g", "v")
    val r = Quality.welchTTest(sep, col("g"), col("v")).head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("dd_a") == 6L && r.getAs[Long]("dd_b") == 6L)
    assert(math.abs(r.getAs[Double]("t") - (-3.0 / math.sqrt(2.0 / 3.0)))
      < 1e-12)
    assert(math.abs(r.getAs[Double]("df") - 4.0) < 1e-12)
    // singleton arm is excluded (variance undefined) -> one group left
    // -> zero rows; three groups -> zero rows
    val singleton = Seq(("A", 1L), ("A", 2L), ("B", 9L)).toDF("g", "v")
    assert(Quality.welchTTest(singleton, col("g"), col("v")).count() == 0L)
    val three = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L),
      ("C", 5L), ("C", 6L)).toDF("g", "v")
    assert(Quality.welchTTest(three, col("g"), col("v")).count() == 0L)
    // three RAW groups with a singleton arm: the viability filter must
    // NOT quietly leave a two-arm statistic over the survivors — the
    // exactly-two-groups contract counts groups BEFORE the n >= 2 filter
    val threeOneSingleton = Seq(("A", 1L), ("A", 2L), ("B", 3L),
      ("B", 4L), ("C", 5L)).toDF("g", "v")
    assert(Quality.welchTTest(threeOneSingleton, col("g"), col("v"))
      .count() == 0L)
  }
  test("kendallTauB: hand cases — perfect, inverted, tied grid, constant axis, empty") {
    val s = spark
    import s.implicits._
    def tau(rows: Seq[(Long, Long)]) =
      graft.operators.Quality.kendallTauB(rows.toDF("x", "y"),
        col("x"), col("y"))
    // perfect concordance: tau = +1 exactly
    val p = tau(Seq((1L, 1L), (2L, 2L), (3L, 3L))).head()
    assert(p.getAs[Long]("concordant") == 3L &&
      p.getAs[Long]("discordant") == 0L)
    assert(p.getAs[Long]("tau_b_ppm") == 1000000L)
    // perfect inversion: tau = -1 exactly
    val inv = tau(Seq((1L, 3L), (2L, 2L), (3L, 1L))).head()
    assert(inv.getAs[Long]("concordant") == 0L &&
      inv.getAs[Long]("discordant") == 3L)
    assert(inv.getAs[Long]("tau_b_ppm") == -1000000L)
    // fully-tied 2x2 grid: C = D = 1, tie terms 2/2, tau = 0
    val t22 = tau(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))).head()
    assert(t22.getAs[Long]("n_pairs") == 6L)
    assert(t22.getAs[Long]("tie_x") == 2L && t22.getAs[Long]("tie_y") == 2L)
    assert(t22.getAs[Long]("concordant") == 1L &&
      t22.getAs[Long]("discordant") == 1L)
    assert(t22.getAs[Long]("tau_b_ppm") == 0L)
    // hand mixed case: (1,1),(2,3),(3,2): C = 2 (12, 13), D = 1 (23)
    val m = tau(Seq((1L, 1L), (2L, 3L), (3L, 2L))).head()
    assert(m.getAs[Long]("concordant") == 2L &&
      m.getAs[Long]("discordant") == 1L)
    // tau = 1/3 -> 333333 ppm floored
    assert(m.getAs[Long]("tau_b_ppm") == 333333L)
    // a constant axis makes tau undefined: NULL, not NaN
    val const = tau(Seq((1L, 7L), (2L, 7L), (3L, 7L))).head()
    assert(const.isNullAt(const.fieldIndex("tau_b_ppm")))
    // empty input: zero rows (the grouped-SQL shape)
    assert(tau(Seq.empty).count() == 0L)
  }

  test("spearmanBucketed: bit-identical to raw when buckets cover the span; merge keeps monotone r2") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, 5L), (2L, 20L, 4L), (3L, 30L, 3L),
      (4L, 40L, 2L), (5L, 50L, 1L), (3L, 30L, 3L)).toDF("a", "b", "c")
    val cols = Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c"))
    // spans are 4/40/4; buckets = 64 >= span+1 makes the equi-width map
    // injective, so bucket ranks == value ranks and the matrices match
    // to the bit
    val raw = graft.operators.Quality.spearmanMatrix(df, cols)
      .orderBy("col_a", "col_b").collect().map(_.toSeq)
    val bkt = graft.operators.Quality.spearmanBucketed(df, cols, 64)
      .orderBy("col_a", "col_b").collect().map(_.toSeq)
    assert(raw.toSeq == bkt.toSeq)
    // aggressive merging (4 buckets over a wide strictly-monotone pair):
    // order survives bucketing, so rho stays +-1 exactly
    val wide = (1L to 100L).map(i => (i * 977L, 1000000L - i * 13L))
      .toDF("x", "y")
    val m = graft.operators.Quality.spearmanBucketed(wide,
        Seq("x" -> col("x"), "y" -> col("y")), buckets = 4).head()
    assert(m.getAs[Long]("r2_ppm") == 1000000L)
    assert(m.getAs[Long]("sgn") == -1L)
  }

  test("srmCheck/benfordAudit/madOutliers: empty input degenerates, no engine divergence") {
    val s = spark
    import s.implicits._
    val noArms = Seq.empty[String].toDF("arm")
    // zero observed rows: chi-square undefined -> chi2_ppm NULL (not a
    // division-by-zero NULL Spark happens to emit and DuckDB raises on)
    val sr = graft.operators.Quality.srmCheck(noArms, col("arm"),
      Seq("A" -> 1L, "B" -> 1L)).head()
    assert(sr.getAs[Long]("n_total") == 0L)
    assert(sr.isNullAt(sr.fieldIndex("chi2_ppm")))
    // all nine digits present with obs 0; every chi-square term NULL
    val noVals = Seq.empty[Long].toDF("x")
    val bf = graft.operators.Quality.benfordAudit(noVals, col("x")).collect()
    assert(bf.length == 9)
    assert(bf.forall(r => r.getAs[Long]("obs") == 0L &&
      r.isNullAt(r.fieldIndex("term_ppm"))))
    // zero rows, not one degenerate all-NULL row (the grouped-SQL shape)
    assert(graft.operators.Quality.madOutliers(noVals, col("x"), k = 3)
      .count() == 0L)
  }
  test("madOutliers: exact 2x/4x integers on a hand multiset; fence catches the corruption") {
    val sp = spark
    import sp.implicits._
    // values 1..7 plus a 1e9 corruption: median of 8 values = (4+5)/2
    // -> med2 = 9; deviations |x - 4.5| = 3.5,2.5,1.5,.5,.5,1.5,2.5,~1e9
    // -> dev2 = 7,5,3,1,1,3,5,big -> sorted 1,1,3,3,5,5,7,big ->
    // mad4 = 3+5 = 8 (MAD = 2.0); gate 2*dev2 > 3*8=24 flags ONLY the
    // corruption (2*7=14 < 24)
    val vals = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L) :+ 1000000000L).toDF("x")
    val r = Quality.madOutliers(vals, col("x"), k = 3).head()
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Long]("med2") == 9L)
    assert(r.getAs[Long]("mad4") == 8L)
    assert(r.getAs[Long]("n_outliers") == 1L)
    assert(r.getAs[Long]("outlier_ppm") == 125000L)
    // odd count, no outliers: median exact, MAD exact, zero flagged
    val clean = Seq(10L, 20L, 30L).toDF("x")
    val c = Quality.madOutliers(clean, col("x"), k = 3).head()
    assert(c.getAs[Long]("med2") == 40L) // 2 * 20
    assert(c.getAs[Long]("mad4") == 40L) // dev2 = 20,0,20 -> 2*20... median 20 -> 4*MAD = 40
    assert(c.getAs[Long]("n_outliers") == 0L)
  }

  test("benfordAudit: digits from a constructed corpus, zero-count digits present, ppm trees") {
    val sp = spark
    import sp.implicits._
    // 30 values with first digit 1, 10 with first digit 2; zeros and
    // negatives excluded
    val vals = (Seq.fill(30)(123L) ++ Seq.fill(10)(250L) ++
      Seq(0L, -5L)).toDF("x")
    val rows = Quality.benfordAudit(vals, col("x"))
      .orderBy("digit").collect()
    assert(rows.length == 9)
    val byD = rows.map(r => r.getAs[Long]("digit") ->
      (r.getAs[Long]("obs"), r.getAs[Long]("obs_ppm"))).toMap
    assert(byD(1L) == ((30L, 750000L)))
    assert(byD(2L) == ((10L, 250000L)))
    (3L to 9L).foreach(d => assert(byD(d)._1 == 0L, s"digit $d"))
    // expectation literals: digit 1 = floor(1e6*log10(2)) = 301029
    assert(rows(0).getAs[Long]("exp_ppm") == 301029L)
    assert(rows(8).getAs[Long]("exp_ppm") == 45757L)
    // a perfectly-Benford-ish corpus scores lower chi2 than an all-9s one
    val all9 = Seq.fill(40)(900L).toDF("x")
    val chi9 = Quality.benfordAudit(all9, col("x"))
      .agg(org.apache.spark.sql.functions.sum("term_ppm")).head().getLong(0)
    val chiMix = Quality.benfordAudit(vals, col("x"))
      .agg(org.apache.spark.sql.functions.sum("term_ppm")).head().getLong(0)
    assert(chi9 > chiMix)
  }
  test("fdAudit: held vs violated dependencies, NULL rhs is a value, exact counts") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "a", 10L), (1L, "a", 10L),      // key 1: one rhs (held)
      (2L, "b", 20L), (2L, "b", 21L),      // key 2: two rhs (violated)
      (3L, "c", 30L)
    ).toDF("k", "tag", "v")
    val r = Quality.fdAudit(df, Seq(
        ("k_to_tag", Seq(col("k")), col("tag")),
        ("k_to_v", Seq(col("k")), col("v"))))
      .orderBy("dep").collect()
    val m = r.map(x => x.getAs[String]("dep") ->
      (x.getAs[Long]("n_groups"), x.getAs[Long]("violating_groups"),
        x.getAs[Long]("max_rhs_per_lhs"), x.getAs[Long]("violation_ppm"))).toMap
    assert(m("k_to_tag") == ((3L, 0L, 1L, 0L)))
    assert(m("k_to_v") == ((3L, 1L, 2L, 333333L)))
    // NULL rhs splits a group: (4, null) vs (4, 1) IS a violation
    val withNull = Seq((4L, Some(1L)), (4L, None)).toDF("k", "v")
    val n = Quality.fdAudit(withNull, Seq(("d", Seq(col("k")), col("v"))))
      .head()
    assert(n.getAs[Long]("violating_groups") == 1L)
    assert(n.getAs[Long]("max_rhs_per_lhs") == 2L)
  }
  test("mannWhitneyU and welchTTest: all-identical values yield NULL statistics, not NaN/Inf") {
    val sp = spark
    import sp.implicits._
    val flat = Seq(("A", 5L), ("A", 5L), ("B", 5L), ("B", 5L)).toDF("g", "v")
    val mw = Quality.mannWhitneyU(flat, col("g"), col("v")).head()
    assert(mw.isNullAt(mw.fieldIndex("z")),
      "zero rank variance must NULL z, not NaN")
    val w = Quality.welchTTest(flat, col("g"), col("v")).head()
    assert(w.isNullAt(w.fieldIndex("t")) && w.isNullAt(w.fieldIndex("df")),
      "two constant arms must NULL t/df, not NaN")
    // one constant arm, one varying: Welch is still defined (vb > 0)
    val half = Seq(("A", 5L), ("A", 5L), ("B", 4L), ("B", 6L)).toDF("g", "v")
    val h = Quality.welchTTest(half, col("g"), col("v")).head()
    assert(!h.isNullAt(h.fieldIndex("t")))
  }
}
