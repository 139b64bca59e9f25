package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sketch operators.
  *
  * Spark's built-in sketches (`approx_count_distinct` = HLL++,
  * `approx_percentile`) are implementation-specific: no other engine
  * reproduces their estimates bit-for-bit, so they can never be
  * oracle-checked (qx01 is a rows-only gate by design). KMV ("k minimum
  * values", Bar-Yossef et al. 2002) is different: its estimate is a pure
  * function of the k lexicographically smallest md5 hashes of the distinct
  * values — any engine with md5 computes the identical estimate, so the
  * qx02 oracle hash-matches a DuckDB reimplementation of the same formula.
  */
object Sketches {

  /** Per-group KMV distinct-count estimate alongside the exact count:
    * (groupCol, exact_distinct, est_distinct). Estimate = (k-1) / U(k)
    * where U(k) is the k-th smallest hash mapped to [0,1) via its first 13
    * hex digits (52 bits — exact in BIGINT and DOUBLE alike); groups with
    * fewer than k distinct values report the exact cardinality (the sketch
    * IS exact below k).
    *
    * Scale shape: the distinct pass is a partial-aggregated shuffle; the
    * k-smallest selection is a per-group window sort (rank <= k) — never a
    * driver-side structure. At corpus scale the window input is the
    * distinct relation, the same cost class as the exact countDistinct it
    * estimates; the sketch's value is its O(k) mergeable summary (ship the
    * k hashes, not the values), which this plan preserves by discarding
    * everything but the k-th hash per group immediately after the rank. */
  def kmvDistinct(df: DataFrame, valueCol: String, groupCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "k >= 2")
    val dist = df.select(col(groupCol).as("grp"),
      md5(col(valueCol).cast("string")).as("h")).distinct()
    val w = Window.partitionBy("grp").orderBy("h")
    // first 13 hex digits as an exact 52-bit integer — string order on
    // the full hash equals numeric order on any shared prefix; conv() is
    // the codegen'd built-in (the interpreted HOF fold it replaces only
    // ever ran on <= k rows per group, but consistency with
    // cmsHeavyHitters keeps one idiom)
    val hashInt = conv(substring(col("h"), 1, 13), 16, 10).cast("long")
    val sketch = dist.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .withColumn("hi", hashInt)
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"), max("hi").as("hk"))
      .select(col("grp"),
        when(col("cnt") < k, col("cnt").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4503599627370496.0) / // 16^13
            col("hk").cast("double")).as("est_distinct"))
    val exact = df.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(valueCol)).as("exact_distinct"))
    exact.join(sketch, "grp")
      .select(col("grp").as(groupCol), col("exact_distinct"), col("est_distinct"))
  }

  /** The KMV estimate from an already-sorted bottom-k distinct hash list
    * — the single source of the formula shared by [[kmvDistinct]]'s SQL
    * form and the streaming windowed sketch
    * ([[graft.streaming.EventStream.kmvDistinctWindowed]]): below k the
    * sketch is exact; at k, estimate = (k−1) · 16¹³ / int(first 13 hex
    * of the k-th smallest hash). */
  private[graft] def kmvEstimateFromSorted(hashes: Seq[String], k: Int): Double =
    if (hashes.size < k) hashes.size.toDouble
    else {
      val hk = hashes(k - 1).take(13)
        .foldLeft(0L)((acc, c) => acc * 16 + "0123456789abcdef".indexOf(c))
      (k - 1).toDouble * 4503599627370496.0 / hk.toDouble
    }

  /** KMV set-operation estimates for two value sets — one row:
    * (union_exact, union_est, inter_exact, inter_est, jaccard_est).
    * The union sketch is the bottom-k of the MERGED hash sets (KMV
    * sketches are trivially mergeable — the whole point at scale: ship
    * two k-hash summaries, not the sets); Jaccard is estimated as the
    * fraction of the union's bottom-k present in BOTH sides (Bar-Yossef
    * et al.'s coordinated-sample argument), and the intersection estimate
    * is `jaccard_est * union_est`. Everything is a pure function of md5
    * hashes, so the oracle reproduces every digit. The bottom-k selection
    * is a TakeOrdered (no global sort materializes); exact counts ride
    * the same distinct relation. */
  def kmvSetOps(a: DataFrame, b: DataFrame, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "k >= 2")
    def hashes(df: DataFrame, tag: String) =
      df.select(md5(col(valueCol).cast("string")).as("h")).distinct()
        .withColumn("inA", lit(if (tag == "a") 1 else 0))
        .withColumn("inB", lit(if (tag == "b") 1 else 0))
    val merged = hashes(a, "a").unionAll(hashes(b, "b"))
      .groupBy("h").agg(max("inA").as("inA"), max("inB").as("inB"))
    val hashInt = expr(
      """aggregate(sequence(1, 13), CAST(0 AS BIGINT), (acc, j) ->
        |  acc * 16 + CAST(instr('0123456789abcdef',
        |    substring(h, CAST(j AS INT), 1)) - 1 AS BIGINT))""".stripMargin)
    val bottom = merged.orderBy("h").limit(k).withColumn("hi", hashInt)
    val est = bottom.agg(
      count(lit(1)).as("cnt"), max("hi").as("hk"),
      sum(col("inA") * col("inB")).as("nboth"))
      .select(
        when(col("cnt") < k, col("cnt").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4503599627370496.0) /
            col("hk").cast("double")).as("union_est"),
        (col("nboth").cast("double") / col("cnt")).as("jaccard_est"))
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
    val exact = merged.agg(
      count(lit(1)).as("union_exact"),
      sum(col("inA") * col("inB")).as("inter_exact"))
    exact.crossJoin(est)
      .select(col("union_exact"), col("union_est"),
        col("inter_exact"), col("inter_est"), col("jaccard_est"))
  }

  /** Deterministic-sample approximate quantiles: nearest-rank quantiles
    * of the k rows with the smallest `md5('sq_' || id)` — a uniform
    * sample that is a PURE FUNCTION of the id set, so any engine with
    * md5 draws the identical sample and lands on the identical quantile
    * values (unlike `approx_percentile`/GK/KLL, whose summaries are
    * implementation- and merge-order-specific; qx01 lesson). Returns one
    * row per requested quantile: (q, value, sample_n).
    *
    * Estimator: order the sample by (value, hash) — the hash tiebreak
    * makes duplicate values deterministic — and take the nearest-rank
    * element `max(1, ceil(q·n))`. Standard sample-quantile error:
    * ±O(1/√k) in rank, distribution-free (Serfling 1980 §2.3).
    *
    * Scale shape: the bottom-k selection is a TakeOrdered (per-partition
    * top-k + a k-row merge — no full shuffle sort, no driver loop); the
    * quantile extraction is a window over the k-row sample. The sample
    * is an O(k) mergeable summary: ship each partition's k smallest
    * (hash, value) pairs and re-merge. */
  def sampleQuantiles(df: DataFrame, valueCol: String, idCol: String,
      quantiles: Seq[Double], k: Int = 1024): DataFrame = {
    require(k >= 2, s"k >= 2: $k")
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles in (0,1]: $quantiles")
    val sample = df.select(
        md5(concat(lit("sq_"), col(idCol).cast("string"))).as("h"),
        col(valueCol).as("v"))
      .orderBy("h").limit(k)
    val ranked = sample
      .withColumn("rn", row_number().over(Window.orderBy(col("v"), col("h"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
    ranked
      .select(col("rn"), col("v"), col("n"),
        explode(array(quantiles.map(q => lit(q).cast("double")): _*)).as("q"))
      .filter(col("rn") === greatest(lit(1L), ceil(col("q") * col("n"))))
      .select(col("q"), col("v").as("value"), col("n").as("sample_n"))
      .orderBy("q")
  }

  /** Count-Min-Sketch heavy hitters (Cormode & Muthukrishnan 2005) with
    * the exact counts alongside: (value, exact_count, cms_est) for every
    * value whose CMS estimate is >= `minEst`. Row i of the sketch buckets
    * a value by the 52-bit prefix integer of `md5('c<i>_' || value)` mod
    * `width`; the estimate is the MIN of the value's d bucket counts.
    * CMS never under-counts (est >= exact always), so thresholding on the
    * estimate has no false negatives — the standard heavy-hitter
    * guarantee. Like [[kmvDistinct]], the sketch is a pure function of
    * md5, so a DuckDB replay matches every digit (qx06).
    *
    * Scale shape: ONE corpus scan partial-aggregates to the per-value
    * exact counts; every hash after that runs over the (small) distinct
    * value table only. Bucket counters are the SUM of exact counts per
    * (row, bucket) — identical to counting raw rows, without re-hashing
    * the corpus — and cap at d·width rows: THE sketch, O(d·width)
    * regardless of input cardinality, mergeable by addition across any
    * partitioning. The probe joins the same per-value bucket frame
    * against the broadcast counter table (Catalyst's ReuseExchange
    * dedupes the shared distinct-aggregate subtree). The 52-bit hex
    * prefix is `conv(substring(md5,1,13),16,10)` — codegen'd built-ins,
    * not an interpreted higher-order fold (the r7 hot-path weakness);
    * same digits, so the DuckDB oracle is unchanged. */
  def cmsHeavyHitters(df: DataFrame, valueCol: String, depth: Int = 3,
      width: Int = 512, minEst: Long = 1L): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth out of range: $depth")
    require(width >= 2 && width <= (1 << 20), s"width out of range: $width")
    val rows = df.select(col(valueCol).cast("string").as("v"))
    // row i bucket: 52-bit prefix of md5('c<i>_' || v), mod width
    def bucket(i: Int) =
      conv(substring(md5(concat(lit(s"c${i}_"), col("v"))), 1, 13), 16, 10)
        .cast("long") % width
    val exact = rows.groupBy("v").agg(count(lit(1)).as("exact_count"))
    val vb = exact.select(col("v"), col("exact_count"),
        posexplode(array((0 until depth).map(bucket): _*)))
      .select(col("v"), col("exact_count"), col("pos").as("i"), col("col").as("b"))
    val counters = vb.groupBy("i", "b").agg(sum("exact_count").as("c"))
    vb.join(broadcast(counters), Seq("i", "b"))
      .groupBy("v").agg(max("exact_count").as("exact_count"),
        min("c").as("cms_est"))
      .filter(col("cms_est") >= minEst)
      .select(col("v").as(valueCol), col("exact_count"), col("cms_est"))
  }

  /** Deterministic weighted priority sample of `k` rows — the
    * engine-portable cousin of weighted reservoir sampling (Efraimidis &
    * Spirtes A-Res, with the random key replaced by a hash): each row's
    * uniform draw is the 52-bit prefix integer of `md5('ps_' || id)`,
    * its priority is `u div max(weight, 1)`, and the sample is the k
    * LOWEST priorities (ties by id). Doubling a row's weight halves its
    * priority — heavier rows win proportionally more often — while the
    * sample stays a pure function of the (id, weight) set: reruns,
    * repartitions, and a DuckDB replay draw the IDENTICAL rows, which no
    * rand()-based sampler survives. Integer div, not a real power-law
    * transform: this is the documented deterministic variant, not exact
    * A-Res distribution. Returns (id, weight, priority).
    *
    * Scale shape: per-row hash arithmetic (codegen'd `conv(md5)`
    * built-ins) + a TakeOrdered bottom-k (per-partition heaps, k-row
    * merge) — no full sort, no shuffle of the corpus, O(k) result. The
    * summary is mergeable: the bottom-k of a union is the bottom-k of
    * the concatenated bottom-k's. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    df.select(col(idCol).cast("string").as("id"),
        col(weightCol).cast("long").as("weight"))
      .withColumn("u",
        conv(substring(md5(concat(lit("ps_"), col("id"))), 1, 13), 16, 10)
          .cast("long"))
      .withColumn("priority", expr("u div greatest(weight, 1L)"))
      .orderBy(col("priority"), col("id"))
      .limit(k)
      .select("id", "weight", "priority")
  }

  /** KMV rollup by MERGE — the mergeability that makes sketches the
    * right materialization at 100 TB: distinct-user (or any distinct)
    * summaries are built once per FINE partition (per day, per shard)
    * as bottom-k hash sets, and any coarser rollup merges the
    * summaries — never re-reads raw rows. Bottom-k of a union equals
    * bottom-k of the union of bottom-ks, so the merged estimate is
    * DIGIT-IDENTICAL to the single-pass [[kmvDistinct]] over the same
    * scope (the qx11 oracle states exactly that invariant). Returns per
    * coarse group: (grp, n_fine_parts, est_distinct).
    *
    * Scale shape: fine summaries = rank ≤ k per (coarse, fine) on the
    * distinct-hash shuffle; the merge re-ranks G·P·k summary rows —
    * raw data is touched once, at fine-summary build time. */
  def kmvMergeRollup(df: DataFrame, valueCol: String, fineCol: String,
      coarseCol: String, k: Int = 64): DataFrame = {
    require(k >= 2, "k >= 2")
    val fine = df.select(col(coarseCol).cast("string").as("grp"),
        col(fineCol).cast("string").as("part"),
        md5(col(valueCol).cast("string")).as("h")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp", "part").orderBy("h")))
      .filter(col("rn") <= k)
    val nparts = fine.select("grp", "part").distinct()
      .groupBy("grp").agg(count(lit(1)).as("n_fine_parts"))
    val merged = fine.select("grp", "h").distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy("h")))
      .filter(col("rn") <= k)
      .withColumn("hi", conv(substring(col("h"), 1, 13), 16, 10).cast("long"))
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"), max("hi").as("hk"))
      .select(col("grp"),
        when(col("cnt") < k, col("cnt").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4503599627370496.0) /
            col("hk").cast("double")).as("est_distinct"))
    nparts.join(merged, "grp")
  }

  /** Deterministic negative sampling — the contrastive/implicit-feedback
    * training staple: for every user in `interactions`, the `k` catalog
    * items they have NOT interacted with whose md5(user_item) hash is
    * smallest — a uniform-without-RNG draw that any engine (and any
    * rerun) reproduces exactly, so train/eval negatives never silently
    * shift between pipeline runs. Returns (user_id, item, rank).
    *
    * SCALE CONTRACT: the catalog side is broadcast and crossed with the
    * user set — the caller bounds it (a sampled catalog slice is the
    * normal input; the [[kmvDistinct]] bottom-k or a modulo slice both
    * work). Cost is |users| × |catalog| hash evaluations, map-side; the
    * anti-join against seen pairs and the per-user rank both run on the
    * user partitioning. */
  def negativeSamples(interactions: DataFrame, userCol: String,
      itemCol: String, catalog: DataFrame, catItemCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1 && k <= 10000, s"k out of range: $k")
    val seen = interactions.select(col(userCol).cast("long").as("user_id"),
      col(itemCol).cast("long").as("item")).distinct()
    val users = seen.select("user_id").distinct()
    val cat = broadcast(
      catalog.select(col(catItemCol).cast("long").as("item")).distinct())
    users.crossJoin(cat)
      .join(seen, Seq("user_id", "item"), "left_anti")
      .withColumn("h", md5(concat(col("user_id"), lit("_"), col("item"))))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("h")))
      .filter(col("rank") <= k)
      .select("user_id", "item", "rank")
  }

  /** Pairwise Jaccard estimates BETWEEN groups from per-group KMV
    * summaries — "which sources/types share members" as one small
    * matrix (audience overlap between event types, vocabulary overlap
    * between sources): per group keep the k smallest md5 hashes of its
    * distinct values; for each group pair, the estimate is the fraction
    * of the union's k smallest hashes that both groups contain — the
    * standard bottom-k Jaccard estimator, and a PURE FUNCTION of the
    * (group, value) set, so any engine redraws the identical matrix.
    * Returns (ga, gb, kk = min(k, |union sample|), inter,
    * jaccard_ppm = inter·10⁶ div kk) for ga < gb (string order).
    *
    * Scale shape: the one real shuffle is the distinct on (group, md5);
    * the bottom-k window leaves |groups|·k rows, and every pair step
    * runs over that O(G·k) summary — the G² pair relation never touches
    * raw data. Mergeable: the summaries are the shippable state. */
  def crossGroupJaccard(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 128): DataFrame = {
    require(k >= 2 && k <= 100000, s"k out of range: $k")
    val hashes = df.select(col(groupCol).cast("string").as("g"),
      md5(col(valueCol).cast("string")).as("h")).distinct()
    val bk = hashes
      .withColumn("r", row_number().over(Window.partitionBy("g").orderBy("h")))
      .filter(col("r") <= k).select("g", "h")
    val groups = bk.select("g").distinct()
    val pairs = groups.as("x").join(groups.as("y"), col("x.g") < col("y.g"))
      .select(col("x.g").as("ga"), col("y.g").as("gb"))
    val tagged = pairs.join(bk.withColumnRenamed("g", "ga"), "ga")
      .select(col("ga"), col("gb"), col("h"), lit(1).as("ia"), lit(0).as("ib"))
      .unionAll(pairs.join(bk.withColumnRenamed("g", "gb"), "gb")
        .select(col("ga"), col("gb"), col("h"), lit(0).as("ia"), lit(1).as("ib")))
    val merged = tagged.groupBy("ga", "gb", "h")
      .agg(max("ia").as("ia"), max("ib").as("ib"))
      .withColumn("r", row_number()
        .over(Window.partitionBy("ga", "gb").orderBy("h")))
      .filter(col("r") <= k)
    merged.groupBy("ga", "gb")
      .agg(count(lit(1)).as("kk"),
        coalesce(sum(when(col("ia") === 1 && col("ib") === 1, 1L)), lit(0L))
          .as("inter"))
      .select(col("ga"), col("gb"), col("kk"), col("inter"),
        expr("(inter * 1000000L) div greatest(1L, kk)").as("jaccard_ppm"))
  }

  /** CMS top-k fidelity — does the Count-Min sketch's heavy-hitter
    * RANKING survive its collisions (estimates over-count; what matters
    * is whether the top-k set is still the top-k): overlap of the
    * CMS-estimate top-k with the exact-count top-k, both from
    * [[cmsHeavyHitters]]'s own output, deterministic (count desc, value)
    * tie-break. One row: (k, hits, recall_ppm).
    *
    * Scale shape: the sketch pipeline's own cost + two TakeOrdered
    * top-k selections over the distinct-value relation + a k-row join. */
  def cmsTopKRecall(df: DataFrame, valueCol: String, k: Int = 10,
      depth: Int = 3, width: Int = 512): DataFrame = {
    require(k >= 1, s"k out of range: $k")
    val hh = cmsHeavyHitters(df, valueCol, depth, width, minEst = 1L)
    val exactTop = hh.orderBy(col("exact_count").desc, col(valueCol))
      .limit(k).select(col(valueCol).as("v"))
    val estTop = hh.orderBy(col("cms_est").desc, col(valueCol))
      .limit(k).select(col(valueCol).as("v"))
    val hits = exactTop.join(estTop, Seq("v"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val kk = exactTop.agg(count(lit(1)).as("k"))
    kk.crossJoin(hits)
      .select(col("k"), col("hits"),
        expr("(hits * 1000000L) div greatest(1L, k)").as("recall_ppm"))
  }

  /** Mergeable quantile-sketch rollup — the federated cousin of
    * [[sampleQuantiles]]: each partition/source ships only its k
    * smallest-(md5-)hash (hash, value) pairs, and merging re-ranks those
    * summaries — bottom-k(∪ bottom-ks) = bottom-k(∪), so the rolled-up
    * quantiles are DIGIT-IDENTICAL to a single-pass sample of the union
    * (the qx11 KMV mergeability argument, applied to value sketches).
    * Returns one row per quantile: (q, value, sample_n, n_parts).
    *
    * Scale shape: per-part bottom-k is a rank window on the part's own
    * partitioning; the merge re-ranks parts·k summary rows; raw rows are
    * touched once. */
  def quantileRollup(df: DataFrame, valueCol: String, idCol: String,
      partCol: String, quantiles: Seq[Double], k: Int = 1024): DataFrame = {
    require(k >= 2, s"k >= 2: $k")
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles in (0,1]: $quantiles")
    val fine = df.select(col(partCol).cast("string").as("part"),
        md5(concat(lit("sq_"), col(idCol).cast("string"))).as("h"),
        col(valueCol).as("v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("part").orderBy("h")))
      .filter(col("rn") <= k)
    val nParts = fine.agg(countDistinct("part").as("n_parts"))
    val merged = fine.select("h", "v")
      .withColumn("rn", row_number().over(Window.orderBy("h")))
      .filter(col("rn") <= k)
    val ranked = merged
      .withColumn("rv", row_number().over(Window.orderBy(col("v"), col("h"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
    ranked
      .select(col("rv"), col("v"), col("n"),
        explode(array(quantiles.map(q => lit(q).cast("double")): _*)).as("q"))
      .filter(col("rv") === greatest(lit(1L), ceil(col("q") * col("n"))))
      .crossJoin(broadcast(nParts))
      .select(col("q"), col("v").as("value"), col("n").as("sample_n"),
        col("n_parts"))
      .orderBy("q")
  }

  /** Sampling-accuracy audit — what a deterministic md5 row sample does
    * to group-level estimates (the check before trusting sampled
    * dashboards at 100 TB): rows whose `md5('sa_' || id)` 52-bit prefix
    * mod 10⁶ falls under `ratePpm` form the sample; each group's
    * scaled-up estimate `sample_n · 10⁶ div ratePpm` is compared to its
    * exact count. Returns
    * (group, exact_n, sample_n, est_n, err_ppm) with
    * err_ppm = |est − exact|·10⁶ div exact.
    *
    * Scale shape: the sample is a per-row hash filter riding the SAME
    * scan as the exact count (one groupBy computes both via a
    * conditional sum). One pass, no joins. */
  def sampleAccuracy(df: DataFrame, idCol: String, groupCol: String,
      ratePpm: Long = 100000L): DataFrame = {
    require(ratePpm >= 1 && ratePpm <= 1000000L,
      s"ratePpm out of range: $ratePpm")
    val inSample =
      conv(substring(md5(concat(lit("sa_"), col(idCol).cast("string"))),
        1, 13), 16, 10).cast("long") % 1000000L < ratePpm
    df.select(col(groupCol).as("group"),
        when(inSample, 1L).otherwise(0L).as("s"))
      .groupBy("group")
      .agg(count(lit(1)).as("exact_n"), sum("s").as("sample_n"))
      .withColumn("est_n", expr(s"(sample_n * 1000000L) div ${ratePpm}L"))
      .withColumn("err_ppm",
        expr("(abs(est_n - exact_n) * 1000000L) div greatest(1L, exact_n)"))
  }

  /** Bloom-filter build + MEASURED false-positive rate — the calibration
    * run before shipping a membership filter to the scan side of a
    * 100 TB join (the advertised FPR is a formula; this is the ground
    * truth on real keys): the filter is the distinct set of
    * (hash_row i, bucket) pairs over `members` (k rows × md5-52-bit
    * buckets mod `m` — a pure function of the key set, so any engine
    * rebuilds the identical filter); a probe key hits when ALL k of its
    * buckets are set. Probing `probes` (caller guarantees disjoint from
    * members) counts pure false positives. One row:
    * (m, k, n_members, n_set_bits, n_probes, n_false_pos, fpr_ppm).
    *
    * Scale shape: build = one distinct over members × k (the filter
    * itself is ≤ m·k rows — O(sketch), not O(data)); probe = explode ×
    * k + one shuffle-hash semi-join against the filter + a count-by-key
    * checking hits == k. Nothing quadratic, nothing driver-side. */
  def bloomFpr(members: DataFrame, probes: DataFrame, keyCol: String,
      m: Int = 4096, k: Int = 3): DataFrame = {
    require(m >= 2 && m <= (1 << 24), s"m out of range: $m")
    require(k >= 1 && k <= 8, s"k out of range: $k")
    def buckets(df: DataFrame) = {
      def b(i: Int) =
        conv(substring(md5(concat(lit(s"bf${i}_"),
          col(keyCol).cast("string"))), 1, 13), 16, 10).cast("long") % m
      df.select(col(keyCol).cast("string").as("key"),
          posexplode(array((0 until k).map(b): _*)))
        .select(col("key"), col("pos").as("i"), col("col").as("b"))
    }
    val filter = buckets(members).select("i", "b").distinct()
    val nMembers = members.select(col(keyCol)).distinct()
      .agg(count(lit(1)).as("n_members"))
    val nBits = filter.agg(count(lit(1)).as("n_set_bits"))
    val probeHits = buckets(probes)
      .join(filter.hint("shuffle_hash"), Seq("i", "b"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("hits"))
      .filter(col("hits") === k)
      .agg(count(lit(1)).as("n_false_pos"))
    val nProbes = probes.select(col(keyCol)).distinct()
      .agg(count(lit(1)).as("n_probes"))
    nMembers.crossJoin(nBits).crossJoin(nProbes).crossJoin(probeHits)
      .select(lit(m.toLong).as("m"), lit(k.toLong).as("k"),
        col("n_members"), col("n_set_bits"), col("n_probes"),
        col("n_false_pos"),
        expr("(n_false_pos * 1000000L) div greatest(1L, n_probes)")
          .as("fpr_ppm"))
  }

  /** Neyman sample allocation — split an inspection/eval budget across
    * strata ∝ N_h·S_h (big AND noisy strata earn more samples than
    * proportional allocation gives them — the survey-sampling optimum
    * for a fixed budget): per stratum (stratum, n_rows, sd_x1000,
    * alloc), with Σ alloc = budget EXACTLY via integer largest-remainder
    * apportionment. All engine-portable: variance from exact integer
    * moments (`valueCol` must be an integer-scaled expression; the
    * (n·Σx² − (Σx)²) moment is carried in DECIMAL(38) so ~10⁶ rows of
    * ~10⁶-unit values cannot overflow), sd floored to ×1000 BIGINT, and
    * the apportionment entirely in BIGINT — weights, floor shares, and
    * the remainder ranking ((budget·w) mod total desc, stratum asc), so
    * no float sum-order can flip an allocation.
    *
    * Scale shape: one moment aggregation over the corpus, then windows
    * over the |strata|-row table. */
  def neymanAllocation(df: DataFrame, strataCol: String, valueCol: Column,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget out of range: $budget")
    val x = valueCol.cast("long")
    val m = df.groupBy(col(strataCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n_rows"), sum(x).as("sx"),
        sum(x.cast("decimal(38,0)") * x.cast("decimal(38,0)")).as("sxx"))
    val a = col("n_rows").cast("decimal(38,0)") * col("sxx") -
      col("sx").cast("decimal(38,0)") * col("sx").cast("decimal(38,0)")
    val varD = a.cast("double") /
      (col("n_rows").cast("double") * col("n_rows").cast("double"))
    // weight floor of 1: a zero-variance stratum keeps a token claim, and
    // total_w > 0 always, so largest-remainder apportionment is exact
    // (Σ alloc = budget) even on degenerate inputs
    val wtab = m.withColumn("sd_x1000",
        floor(sqrt(varD) * 1000d).cast("long"))
      .withColumn("w", greatest(col("n_rows") * col("sd_x1000"), lit(1L)))
    val wAll = Window.orderBy("stratum")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val shares = wtab
      .withColumn("total_w", sum("w").over(wAll))
      .withColumn("base",
        expr(s"(${budget}L * w) div greatest(1L, total_w)"))
      .withColumn("rem", expr(s"(${budget}L * w) % greatest(1L, total_w)"))
      .withColumn("left_over",
        lit(budget) - sum("base").over(wAll))
      .withColumn("rrank", row_number().over(
        Window.orderBy(col("rem").desc, col("stratum"))))
    shares.select(col("stratum"), col("n_rows"), col("sd_x1000"),
      (col("base") + when(col("rrank") <= col("left_over"), 1L)
        .otherwise(0L)).as("alloc"))
  }

  /** AMS second-moment (F₂) sketch — Alon–Matias–Szegedy 1996, the
    * classic estimate of Σ_v f_v², i.e. the SELF-JOIN SIZE on a key (what
    * an optimizer wants before committing to a join order, what a skew
    * monitor wants as one number): `depth`×`width` ±1 counters with
    * deterministic md5 sign hashes, estimate = median over `depth` rows
    * of the mean over `width` of (Σ_v s_j(v)·f_v)². Pure function of the
    * data — any engine reproduces the estimate bit-for-bit (the KMV
    * discipline, qx02). One row: (n_rows, n_distinct, f2_exact, f2_est,
    * err_ppm).
    *
    * Scale shape: ONE count groupBy collapses the corpus to its distinct
    * values; the ×(depth·width) sign expansion runs on that DISTINCT
    * relation only and immediately folds to depth·width counter rows;
    * means and the median are constant-size. In production you ship the
    * counters (mergeable: counters of a union = sum of counters), not
    * the values — this form keeps the exact F₂ beside the estimate
    * because the gate needs both. Overflow: |Σ s·f| ≤ n, so counters²
    * and f2 need n < 3·10⁹ at BIGINT — per group/partition scale; above
    * that, widen to decimal. */
  def amsF2(df: DataFrame, valueCol: String, depth: Int = 5,
      width: Int = 8): DataFrame = {
    require(depth >= 1 && depth % 2 == 1 && depth <= 21,
      s"depth must be odd, 1..21: $depth")
    require(width >= 1 && width <= 64, s"width out of range: $width")
    val freq = df.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("f"))
    // sign from the parity of the first md5 hex digit — engine-portable
    // without any hex->int conversion
    val even = Seq("0", "2", "4", "6", "8", "a", "c", "e").map(lit)
    val counters = freq
      .select(col("v"), col("f"),
        explode(array((0 until depth * width).map(i => lit(i)): _*)).as("j"))
      .withColumn("sgn",
        when(substring(md5(concat_ws(":", lit("ams"), col("j"), col("v"))),
          1, 1).isin(even: _*), lit(1L)).otherwise(lit(-1L)))
      .groupBy("j").agg(sum(col("sgn") * col("f")).as("z"))
    val est = counters
      .select((col("j") % depth).as("r"), (col("z") * col("z")).as("x"))
      .groupBy("r").agg(expr(s"sum(x) div ${width}L").as("m"))
      .agg(sort_array(collect_list("m")).as("ms"))
      .select(element_at(col("ms"), (depth + 1) / 2).as("f2_est"))
    val exact = freq.agg(sum("f").as("n_rows"),
      count(lit(1)).as("n_distinct"),
      sum(col("f") * col("f")).as("f2_exact"))
    // two one-row frames: the cross join is a 1x1 BNLJ by construction
    exact.crossJoin(est)
      .withColumn("err_ppm",
        expr("abs(f2_est - f2_exact) * 1000000L div greatest(1L, f2_exact)"))
  }

  /** Horvitz-Thompson stratified expansion estimator audit — the
    * companion to [[sampleAccuracy]] (uniform rate, counts) for the
    * design every production metrics sample actually uses: UNEQUAL
    * per-stratum inclusion probabilities (census the rare heavy-tail
    * stratum, thin the bulk) expanding a CONTINUOUS metric back to the
    * population total, ŷ_h = Σ_{i∈s_h} y_i / π_h (Horvitz & Thompson,
    * JASA 1952). Inclusion is the deterministic md5 coin (`'ht_' || id`
    * 52-bit prefix mod 10⁶ < ratePpm) so any engine draws the identical
    * sample; the metric totals in floor-cents BIGINTs; the expansion is
    * the exact integer `sampled_cents · 10⁶ div ratePpm`. Per stratum:
    * (stratum, rate_ppm, n, n_sampled, exact_cents, ht_cents, err_ppm) —
    * a census stratum (rate 10⁶) must read err_ppm = 0.
    *
    * Scale shape: the sample rides the SAME scan as the exact total (one
    * conditional sum in one map-side-combined groupBy) — one pass, no
    * joins, stratum-domain-sized output. */
  def htStratifiedTotal(df: DataFrame, idCol: String, strataCol: String,
      metricCol: String, ratesPpm: Map[String, Long],
      defaultRatePpm: Long = 100000L): DataFrame = {
    require((ratesPpm.values.toSeq :+ defaultRatePpm)
      .forall(r => r >= 1 && r <= 1000000L), "rates are ppm in [1, 10^6]")
    val rate = ratesPpm.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0L))) {
        case (acc, (s, r)) => acc.when(col(strataCol) === s, lit(r))
      }.otherwise(lit(defaultRatePpm))
    val inSample =
      conv(substring(md5(concat(lit("ht_"), col(idCol).cast("string"))),
        1, 13), 16, 10).cast("long") % 1000000L < rate
    df.select(col(strataCol).as("stratum"), rate.as("rate_ppm"),
        floor(col(metricCol) * 100).cast("long").as("cents"),
        when(inSample, 1L).otherwise(0L).as("s"))
      .groupBy("stratum", "rate_ppm")
      .agg(count(lit(1)).as("n"), sum("s").as("n_sampled"),
        sum("cents").as("exact_cents"),
        sum(col("s") * col("cents")).as("s_cents"))
      .withColumn("ht_cents", expr("(s_cents * 1000000L) div rate_ppm"))
      .withColumn("err_ppm",
        expr("(abs(ht_cents - exact_cents) * 1000000L) div " +
          "greatest(1L, abs(exact_cents))"))
      .drop("s_cents")
  }

  /** Deterministic weighted sample — priority sampling (Duffield, Lund
    * & Thorup, JACM 2007) with the RNG replaced by the md5 coin: each
    * row draws priority = hash(key) div weight and the k SMALLEST
    * priorities win, so selection probability grows ∝ weight (a
    * 100×-heavier row's priority is 100× smaller) while the sample
    * stays a pure function of the key set — rerun anywhere, same rows.
    * The data-mixing primitive: sample documents ∝ length/quality
    * weight for a training shard without an RNG state to lose. Rows
    * with NULL or non-positive weight are excluded (a zero weight must
    * never be drawn, and h div 0 is undefined). Returns the k selected
    * rows (key, weight, priority) ordered by (priority, key).
    *
    * Scale shape: one projection computes every priority; the bottom-k
    * is a TakeOrdered (per-partition heaps + driver merge of k·P rows),
    * never a global sort. */
  def prioritySample(df: DataFrame, keyCol: Column, weightCol: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 100000, s"k out of range: $k")
    df.select(keyCol.cast("string").as("key"),
        weightCol.cast("long").as("weight"))
      .filter(col("key").isNotNull && col("weight").isNotNull &&
        col("weight") > 0)
      .withColumn("priority", expr(
        "cast(conv(substring(md5(concat('ps:', key)), 1, 13), 16, 10) " +
          "as bigint) div weight"))
      .orderBy(col("priority"), col("key")).limit(k)
  }
}
