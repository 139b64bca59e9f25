package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "blk", "the quick brown fox jumps over the lazy dog"),
      (2L, "blk", "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "blk", "the quick brown fox jumps over the sleepy dog"), // near dup
      (4L, "blk", "completely different text about spark engines here"),
      (5L, "other", "the quick brown fox jumps over the lazy dog") // other block
    ).toDF("doc_id", "source", "text")
  }

  test("exactGroups finds the identical pair with min-id keeper") {
    val g = Dedup.exactGroups(docs, "text", "doc_id").collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("n_copies") == 3) // ids 1, 2, 5 share text
    assert(g(0).getAs[Long]("keeper_id") == 1L)
  }

  test("minhashSignatures: identical docs get identical signatures") {
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id", 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (0 until 4).map(i => r.getAs[String](s"mh$i"))).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(4L))
  }

  test("lshCandidatePairs surfaces exact and near dups, not unrelated docs") {
    val pairs = Dedup.lshCandidatePairs(docs, "text", "doc_id")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L))) // identical -> all bands collide
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L }) // unrelated
    pairs.foreach { case (a, b) => assert(a < b) }
  }

  test("lshCandidatePairs: maxBucket cap drops degenerate buckets before pair expansion") {
    val s = spark
    import s.implicits._
    // 5 identical docs: every band bucket has all 5 -> k(k-1)/2 = 10 pairs
    val boiler = (1L to 5L).map(i => (i, "b", "same boilerplate text here")).toDF("doc_id", "source", "text")
    assert(Dedup.lshCandidatePairs(boiler, "text", "doc_id").count() == 10)
    // cap 4 < bucket size 5: the bucket is dropped entirely, no task-OOM row
    assert(Dedup.lshCandidatePairs(boiler, "text", "doc_id", maxBucket = 4).count() == 0)
  }

  test("tokenJaccardBlockSummary: analytic C(n,2) pairs, zero-overlap pairs included in avg, singleton blocks omitted") {
    val rows = Dedup.tokenJaccardBlockSummary(docs, "text", "doc_id", "source")
      .collect().map(r => r.getAs[String]("block") -> r).toMap
    // block "other" has a single doc -> no pairs -> no row (pairwise semantics)
    assert(!rows.contains("other"))
    val b = rows("blk") // docs 1,2,3,4 -> C(4,2) = 6 pairs
    assert(b.getAs[Long]("n_pairs") == 6L)
    assert(b.getAs[Double]("max_jacc") == 1.0) // (1,2) identical
    // overlap: (1,2)=1, (1,3)=(2,3)=7/9; (x,4) pairs are implicit zeros
    val expectedAvg = (1.0 + 7.0 / 9 + 7.0 / 9) / 6
    assert(math.abs(b.getAs[Double]("avg_jacc") - expectedAvg) < 1e-9)
    // and only the 3 overlapping pairs ever materialize
    assert(Dedup.tokenJaccardPairs(docs, "text", "doc_id", "source")
      .filter(col("block") === "blk").count() == 3)
  }

  test("duplicateClusters: chained pairs collapse to the min-id keeper, components stay separate") {
    val s = spark
    import s.implicits._
    // components: {1,2,3} via chain, {5,6}, and a 5-node chain {10..14}
    // (several propagation rounds needed — 14's label walks to 10)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("id_a", "id_b")
    val comp = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L))
  }

  test("duplicateClusters: driver endgame and pure contraction loop agree") {
    val s = spark
    import s.implicits._
    // long chains + a star + singleton pair: exercises multi-round
    // contraction when the endgame is disabled (driverFinishEdges = 0)
    val pairs = ((0L until 40L).map(i => (i, i + 1)) ++          // 41-chain
      (100L until 110L).map(i => (150L, i)) ++                   // star
      Seq((200L, 201L))).toDF("id_a", "id_b")
    def labels(thresh: Long) =
      Dedup.duplicateClusters(pairs, driverFinishEdges = thresh)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    val endgame = labels(500000L) // default: collected immediately
    val loop = labels(0L)         // forced full distributed contraction
    assert(endgame == loop, s"paths disagree: ${endgame.toSet.diff(loop.toSet).take(5)}")
    assert(endgame(40L) == 0L && endgame(150L) == 100L && endgame(201L) == 200L)
  }

  test("simhashNearDupPairs: identical docs pair at hamming 0, unrelated docs don't pair") {
    val pairs = Dedup.simhashNearDupPairs(docs, "text", "doc_id")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Int]("hd")).toMap
    assert(pairs((1L, 2L)) == 0) // identical text -> identical simhash
    assert(pairs((1L, 5L)) == 0) // simhash ignores the block column
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("bigramJaccardPairs: jacc 1.0 for identical docs, blocked by source") {
    val pairs = Dedup.bigramJaccardPairs(docs, "text", "doc_id", "source")
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jacc"))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    // near dup: 8 bigrams each, 6 shared ("the sleepy"/"sleepy dog" differ)
    assert(pairs((1L, 3L)) > 0.5 && pairs((1L, 3L)) < 1.0)
    // doc 5 is in another block: no cross-block pair with 1 or 2
    assert(!pairs.keySet.exists { case (a, b) => b == 5L || a == 5L })
  }

  test("crossCorpusContamination: flags shared trigrams, df cap drops boilerplate") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "unique alpha beta gamma delta epsilon"), // shares 2 trigrams w/ bench
      (2L, "totally different words in this row"),
      (3L, "unique alpha beta gamma other stuff")) // shares 1 trigram
      .toDF("doc_id", "text")
    val bench = Seq((100L, "unique alpha beta gamma delta zeta")).toDF("doc_id", "text")
    val hits = Dedup.crossCorpusContamination(corpus, bench, "text", "doc_id",
        n = 3, maxDf = 50, minShared = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bench_hits"), r.getAs[Long]("max_shared"))).toMap
    // doc 1 shares "unique alpha beta", "alpha beta gamma", "beta gamma delta"
    assert(hits(1L) == ((1L, 3L)))
    assert(!hits.contains(2L)) // nothing shared
    // doc 3 shares "unique alpha beta" + "alpha beta gamma" = exactly minShared
    assert(hits(3L) == ((1L, 2L)))
  }

  test("dropDuplicatesIncremental: corpus dups dropped, delta dups collapse, new rows survive") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "existing content here")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "existing content here"), // dup of corpus -> dropped
      (11L, "genuinely new content"), // new -> kept
      (12L, "genuinely new content"), // dup WITHIN delta -> min id 11 wins
      (13L, "another new row")) // new -> kept
      .toDF("doc_id", "text")
    val out = Dedup.dropDuplicatesIncremental(corpus, delta, "text", "doc_id")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out == Set(11L, 13L))
  }

  test("crossCorpusContamination: maxDf=1 drops every shared gram") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "common phrase here tail one"),
      (2L, "common phrase here tail two")).toDF("doc_id", "text")
    val bench = Seq((100L, "common phrase here tail three")).toDF("doc_id", "text")
    // "common phrase here" has corpus df 2 > 1 -> dropped before the join
    val out = Dedup.crossCorpusContamination(corpus, bench, "text", "doc_id",
      n = 3, maxDf = 1, minShared = 1).collect()
    // each doc still shares its df-1 grams ("phrase here tail" also df 2;
    // "here tail one"/"here tail two" are unique but unshared with bench)
    assert(out.isEmpty)
  }

  test("crossCorpusContaminationBloom: identical results to the exact operator, bloom filters map-side") {
    val s = spark
    import s.implicits._
    val corpus = (1L to 60L).map(i =>
      (i, s"common lead in tokens doc$i unique tail ${i % 7} ${i % 5} more words here")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "common lead in tokens doc3 unique tail 3 3 more words here"),
      (101L, "totally different benchmark content nothing shared at all")).toDF("doc_id", "text")
    val exact = Dedup.crossCorpusContamination(corpus, bench, "text", "doc_id",
      n = 3, maxDf = 50, minShared = 2).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloomed = Dedup.crossCorpusContaminationBloom(corpus, bench, "text", "doc_id",
      n = 3, maxDf = 50, minShared = 2).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty && bloomed == exact)
    // the bloom test sits in the plan before the corpus postings shuffle
    val plan = Dedup.crossCorpusContaminationBloom(corpus, bench, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("sharedWindowPairs: counts distinct shared n-token windows, cap drops boilerplate") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e tail one"), //     shares "a b c d e"... windows w/ 2
      (2L, "prefix a b c d e tail one"), // ...and "tail one" spans
      (3L, "x y z q r s t"), //           unrelated
      (4L, "a b c d e tail one")) //      identical to 1
      .toDF("doc_id", "text")
    val out = Dedup.sharedWindowPairs(docs, "text", "doc_id", n = 5)
      .collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")), r.getAs[Long]("shared")))
      .toMap
    // doc 1 has windows [abcde, bcde t, cde to, de ton(e)...]: 3 windows of 5
    // tokens: "a b c d e", "b c d e tail", "c d e tail one"; doc 2 contains
    // all of them (plus "prefix a b c d"); doc 4 is identical to doc 1
    assert(out((1L, 2L)) == 3L && out((1L, 4L)) == 3L && out((2L, 4L)) == 3L)
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L })
    // short docs (< n tokens) produce no windows, and a window shared by
    // more than maxBucket docs is dropped before pair expansion
    val shorty = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(Dedup.sharedWindowPairs(shorty, "text", "doc_id", n = 5).count() == 0)
    val boiler = (1L to 5L).map(i => (i, "same exact boiler plate text here"))
      .toDF("doc_id", "text")
    assert(Dedup.sharedWindowPairs(boiler, "text", "doc_id", n = 6,
      maxBucket = 4).count() == 0) // bucket of 5 > cap
    assert(Dedup.sharedWindowPairs(boiler, "text", "doc_id", n = 6,
      maxBucket = 5).count() == 10) // C(5,2) under the cap
  }

  test("overlapF1Pairs: hand-computed integer P/R/F1, containment asymmetry, zero overlap") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "a b c d"), //       4 distinct
      (2L, "c d e"), //         2 shared with 1
      (3L, "a b"), //           contained in 4
      (4L, "a b c d e f g h i j"), // superset of 3
      (5L, "x y z")) //         disjoint from 1
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.overlapF1Pairs(pairs, d, "text", "doc_id").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Long]("n_inter"), r.getAs[Long]("prec"), r.getAs[Long]("rec"),
          r.getAs[Long]("f1"))).toMap
    def f1(p: Long, r: Long) = if (p + r == 0) 0L else 2 * p * r / (p + r)
    // (1,2): inter {c,d}; prec = 2e6/4, rec = 2e6/3
    assert(out((1L, 2L)) == ((2L, 500000L, 666666L, f1(500000L, 666666L))))
    // (3,4): containment — perfect precision, low recall, F1 in between
    assert(out((3L, 4L)) == ((2L, 1000000L, 200000L, f1(1000000L, 200000L))))
    // (1,5): disjoint — all four metrics zero
    assert(out((1L, 5L)) == ((0L, 0L, 0L, 0L)))
  }

  test("editDistanceVerify: exact Levenshtein, ppm normalization, threshold") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "kitten"), (2L, "sitting"), (3L, "kitten"),
      (4L, "zzzzzzzzzz")).toDF("id", "tx")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val all = Dedup.editDistanceVerify(pairs, docs, "tx", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // kitten->sitting: the textbook 3; ppm = 3e6 div 7
    assert(all((1L, 2L)) == ((3L, 3000000L / 7)))
    assert(all((1L, 3L)) == ((0L, 0L)))          // identical
    assert(all((1L, 4L)) == ((10L, 1000000L)))   // disjoint, len 10 dominates
    // threshold keeps only the identical pair
    val kept = Dedup.editDistanceVerify(pairs, docs, "tx", "id", maxDistPpm = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((1L, 3L)))
  }


  test("fuzzyJoin: typo'd feed relinks through the block; oversized blocks dropped") {
    val s = spark
    import s.implicits._
    val master = Seq((1L, "acme corporation"), (2L, "globex inc"), (3L, "initech llc"))
      .toDF("id", "name").withColumn("blk", substring(col("name"), 1, 3))
    val feed = Seq((10L, "acme corporatio"), (20L, "globex imc"), (30L, "zzz unrelated"))
      .toDF("id", "name").withColumn("blk", substring(col("name"), 1, 3))
    val out = Dedup.fuzzyJoin(master, feed, "id", "name", "blk",
        "id", "name", "blk", maxDistPpm = 150000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // acme: 1 deletion of 16 = 62500 ppm; globex: 1 sub of 10 = 100000 ppm
    assert(out == Map((1L, 10L) -> 1L, (2L, 20L) -> 1L))
    // a block whose pair product exceeds maxBucket is dropped wholesale:
    // a second acme-feed row makes the acm block 1x2 > 1, so only globex links
    val feed2 = feed.unionAll(Seq((11L, "acme corp", "acm")).toDF("id", "name", "blk"))
    val capped = Dedup.fuzzyJoin(master, feed2, "id", "name", "blk",
        "id", "name", "blk", maxDistPpm = 150000L, maxBucket = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((2L, 20L)))
  }

  test("containmentPairs: excerpt-in-host found at full containment; low-overlap pairs filtered") {
    val s = spark
    import s.implicits._
    val host = (1 to 20).map(i => s"tok$i").mkString(" ")
    val excerpt = (3 to 12).map(i => s"tok$i").mkString(" ") // 10 tokens of host
    val other = (100 to 119).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, host), (2L, excerpt), (3L, other)).toDF("doc_id", "txt")
    val out = Dedup.containmentPairs(docs, "txt", "doc_id", n = 8,
        maxBucket = 1000, minContPpm = 800000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // only (host, excerpt) proposed and kept: excerpt fully contained
    assert(out.keySet == Set((1L, 2L)))
    assert(out((1L, 2L)) == ((20L, 10L, 10L, 500000L, 1000000L)))
    // raising the bar above the weaker direction still keeps it (max rule);
    // demanding BOTH directions full drops it
    val strict = Dedup.containmentPairs(docs, "txt", "doc_id", n = 8,
      maxBucket = 1000, minContPpm = 1000000L)
    assert(strict.count() == 1L) // cont_b = 1.0 clears the max-side bar
  }

  test("dedupSavings: non-first copies count as saved, per source") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "g", "same text", 9L), (2L, "g", "same text", 9L), // dup of 1
      (3L, "g", "unique", 6L),
      (4L, "h", "same text", 9L) // same content, other source: ALSO a dup
    ).toDF("doc_id", "src", "txt", "nc")
    val out = Dedup.dedupSavings(docs, "txt", "doc_id", "nc", "src")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out("g") == ((3L, 24L, 1L, 9L, 9L * 1000000L / 24L)))
    assert(out("h") == ((1L, 9L, 1L, 9L, 1000000L))) // keeper lives in g
  }

  test("thresholdSweep: monotone curve; thresholds with no pairs report zero") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "g", "a b c d"), (2L, "g", "a b c d"),   // jacc 1.0
      (3L, "g", "a b c x"), (4L, "g", "p q r s")    // (1,3)/(2,3) jacc 0.6
    ).toDF("doc_id", "src", "txt")
    val out = Dedup.thresholdSweep(docs, "txt", "doc_id", "src",
        thresholdsPpm = Seq(500000L, 900000L, 1000000L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(500000L) == ((3L, 3L))) // pairs (1,2),(1,3),(2,3); docs 1,2,3
    assert(out(900000L) == ((1L, 2L))) // only the exact dup
    assert(out(1000000L) == ((1L, 2L)))
    // monotone non-increasing in the threshold
    assert(out(500000L)._1 >= out(900000L)._1)
  }

  test("lshCalibration: identical docs are candidates AND truth; disjoint docs are neither") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a", "alpha beta gamma delta"),
      (2L, "a", "alpha beta gamma delta"), // exact dup of 1: truth + candidate
      (3L, "a", "zz yy xx ww"),            // disjoint: nothing
      (4L, "b", "alpha beta gamma delta")  // dup text, DIFFERENT block: excluded
    ).toDF("doc_id", "src", "txt")
    val r = Dedup.lshCalibration(docs, "txt", "doc_id", "src",
      thresholdPpm = 900000L).head()
    assert(r.getAs[Long]("n_truth") == 1L)     // only (1,2)
    assert(r.getAs[Long]("true_pos") == 1L)    // LSH must find exact dups
    assert(r.getAs[Long]("recall_ppm") == 1000000L)
    assert(r.getAs[Long]("n_candidates") >= 1L)
  }

  test("lshIncrementalPairs: equals the full recompute restricted to delta-touching pairs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta"), (4L, "epsilon zeta eta theta"),
      (5L, "iota kappa lambda mu"), (6L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" <= 4)
    val delta = docs.filter($"doc_id" > 4)
    val stored = Dedup.minhashSignatures(corpus, "text", "doc_id", 4)
    val inc = Dedup.lshIncrementalPairs(stored, delta, "text", "doc_id",
        numHashes = 4, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val deltaIds = Set(5L, 6L)
    val full = Dedup.lshCandidatePairs(docs, "text", "doc_id",
        numHashes = 4, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => deltaIds(p._1) || deltaIds(p._2))
    assert(inc == full)
    assert(inc.contains((1L, 6L))) // delta clone finds its corpus twins
    assert(!inc.contains((1L, 2L))) // corpus-internal pair NOT re-reported
  }

}
