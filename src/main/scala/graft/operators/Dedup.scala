package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public deduplication API over a document table (builder contract:
  * first-class training-data operators). Every method returns a DataFrame
  * and is verified end-to-end by the DuckDB oracle gate (qd04/qd06/qd07/
  * qd09/qd10/qd12/qd13/qd17 and the qd19 pipeline capstone invoke these
  * with the gate's parameters). All are lazy single plans except
  * [[duplicateClusters]], which is inherently iterative (a data-dependent
  * fixpoint) and materializes per round, and [[lshCalibration]], which
  * eagerly materializes its narrow (id, block) projection at construction
  * (r11 ADVICE: explain/PlanDump on it runs that one small job).
  *
  * Scale stance (100 TB): all pairwise work is blocked — by content hash,
  * LSH band bucket, or a caller-supplied block column — so pair fan-out
  * is bounded per bucket and every stage is a hash-partitioned
  * groupBy/shuffle join. Shuffled keys in the hot paths are fixed-width
  * longs via the native kernels in [[graft.functions.TextHashes]]. Per-doc
  * size tables are NEVER broadcast (they are O(corpus)); they rejoin via
  * shuffle-hash joins on long ids. Degenerate LSH buckets (empty docs,
  * boilerplate) are dropped by a default `maxBucket` cap before the
  * quadratic in-row pair expansion.
  */
object Dedup {

  private def toks(c: Column): Column = split(c, " ")

  /** Exact duplicate groups by content hash: (content_hash, n_copies,
    * keeper_id = min id). One shuffle. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(idCol).as("keeper_id"))
      .filter(col("n_copies") > 1)

  /** The deduped corpus itself: keep exactly one row (the min id) per
    * distinct content — what a pipeline actually feeds downstream, vs
    * [[exactGroups]]'s report. One window shuffle on the content hash,
    * schema preserved. */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Incremental dedup: the rows of a NEW batch that survive against an
    * already-deduped corpus — drops delta rows whose content already
    * exists in the corpus (hash anti-join), then keeps one row per
    * distinct content within the delta itself (min id). The
    * ingest-time shape of [[dropExactDuplicates]]: the corpus is never
    * rewritten, only probed, so daily/hourly batches stay O(delta) work
    * plus one shuffle against the corpus hash set. */
  def dropDuplicatesIncremental(corpus: DataFrame, delta: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val corpusHashes = corpus.select(md5(col(textCol)).as("__h")).distinct()
    val fresh = delta.withColumn("__h", md5(col(textCol)))
      .join(corpusHashes.hint("shuffle_hash"), Seq("__h"), "left_anti")
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol))
    fresh.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__h")
  }

  /** MinHash signatures: `numHashes` salted-md5 min-hashes over the
    * distinct token set, columns mh0..mh{n-1}. Lexicographic min over hex
    * strings is a total order identical in any engine (oracle-stable).
    *
    * Per-row only (array_min over the hashed token array) — ZERO shuffles.
    * The explode-then-groupBy form would push |distinct tokens| rows per
    * document through a shuffle for a value each row computes alone. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 4): DataFrame = {
    val tk = array_distinct(toks(col(textCol)))
    val sigs = (0 until numHashes).map(i =>
      array_min(transform(tk, t => md5(concat(lit(s"s${i}_"), t)))).as(s"mh$i"))
    df.select(col(idCol) +: sigs: _*)
  }

  /** MinHash + LSH banding candidate pairs: (id_a, id_b), id_a < id_b,
    * distinct across bands. Band buckets expand pairs in-row via the
    * native packed_pairs kernel (ids must fit 31 bits) — one groupBy, no
    * self-join. The bucket key includes the band index, so equal minhash
    * runs in *different* bands never merge buckets.
    *
    * `maxBucket` caps bucket size BEFORE the k(k-1)/2 in-row pair
    * expansion: a degenerate band (empty docs, boilerplate headers) would
    * otherwise produce one giant row and a task OOM. Buckets above the cap
    * are near-useless for dedup anyway (they pair everything with
    * everything) — standard LSH practice is to drop them. */
  def lshCandidatePairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 4, rowsPerBand: Int = 2,
      maxBucket: Int = 1000): DataFrame =
    lshCandidatePairsFromTokens(
      df.select(col(idCol).as("id"),
        array_distinct(toks(col(textCol))).as("tks")),
      numHashes, rowsPerBand, maxBucket)

  /** [[lshCandidatePairs]] over a pre-tokenized (id, tks) relation —
    * `tks` MUST be `array_distinct(split(text, ' '))` (the exact
    * [[minhashSignatures]] token set). Lets callers that need the token
    * sets anyway ([[lshCalibration]]) tokenize the corpus ONCE. */
  private[operators] def lshCandidatePairsFromTokens(tk: DataFrame,
      numHashes: Int, rowsPerBand: Int, maxBucket: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    require(maxBucket >= 2, "maxBucket must be >= 2")
    val spark = tk.sparkSession
    graft.functions.TextHashes.register(spark)
    val sigs = (0 until numHashes).map(i =>
      array_min(transform(col("tks"), t => md5(concat(lit(s"s${i}_"), t))))
        .as(s"mh$i"))
    val sig = tk.select(col("id") +: sigs: _*)
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      sig.select(col("id"), md5(concat(lit(s"$b") +: cols: _*)).as("band"))
    }.reduce(_ unionAll _)
    bands.groupBy("band")
      .agg(collect_list(col("id").cast("long")).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxBucket)
      .select(explode(expr("packed_pairs(ds)")).as("pair")).distinct()
      .select(shiftright(col("pair"), 32).as("id_a"),
        col("pair").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"))
  }

  /** Incremental LSH candidate pairs — the nightly-delta discipline at
    * 100 TB: the corpus is represented by its STORED MinHash signature
    * table ([[minhashSignatures]] output, numHashes md5s per doc — tiny
    * next to the text) and is never re-read or re-shingled; only the
    * `delta` documents are hashed fresh. Candidates are every LSH band
    * collision that TOUCHES the delta (delta↔corpus and delta↔delta —
    * corpus-internal pairs were found when those docs were themselves
    * deltas). Provably equal to running [[lshCandidatePairs]] over
    * corpus ∪ delta and keeping pairs with a delta member (spec-pinned):
    * banding, bucket caps, and pair expansion are byte-identical; only
    * the signature recomputation is skipped.
    *
    * Scale shape: band keys of stored signatures + fresh delta
    * signatures, one bucket groupBy with the same `maxBucket` cap before
    * in-row pair expansion, then the delta filter — one semi-ish hash
    * join per pair side against the delta id set. */
  def lshIncrementalPairs(corpusSigs: DataFrame, delta: DataFrame,
      textCol: String, idCol: String, numHashes: Int = 4,
      rowsPerBand: Int = 2, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    require(maxBucket >= 2, "maxBucket must be >= 2")
    graft.functions.TextHashes.register(delta.sparkSession)
    val dsig = minhashSignatures(delta, textCol, idCol, numHashes)
    def bandsOf(sig: DataFrame) =
      (0 until numHashes / rowsPerBand).map { b =>
        val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => col(s"mh$i"))
        sig.select(col(idCol), md5(concat(lit(s"$b") +: cols: _*)).as("band"))
      }.reduce(_ unionAll _)
    val pairs = bandsOf(corpusSigs).unionAll(bandsOf(dsig))
      .groupBy("band")
      .agg(collect_list(col(idCol).cast("long")).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxBucket)
      .select(explode(expr("packed_pairs(ds)")).as("pair")).distinct()
      .select(shiftright(col("pair"), 32).as("id_a"),
        col("pair").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"))
    // delta membership via two equi semi-joins (an OR join condition
    // would plan as a nested loop against a delta-sized relation)
    val deltaIds = delta.select(col(idCol).cast("long").as("__did")).distinct()
    pairs.join(deltaIds.select(col("__did").as("id_a")).hint("shuffle_hash"),
        Seq("id_a"), "left_semi")
      .select("id_a", "id_b")
      .unionAll(pairs.join(
          deltaIds.select(col("__did").as("id_b")).hint("shuffle_hash"),
          Seq("id_b"), "left_semi")
        // a USING join fronts its key — re-select so the positional
        // union doesn't swap the pair
        .select("id_a", "id_b"))
      .distinct()
  }

  /** Shared gram-bucket Jaccard pipeline. Input `docs` must have columns
    * (block, id: long, grams: array<long> distinct, ng: int). Output one
    * row per *overlapping* pair: (block, id_a, id_b, inter, na, nb, jacc).
    *
    * Per-doc sizes rejoin via shuffle-hash joins on the long id — NOT a
    * broadcast: the sizes relation is one row per document (O(corpus)),
    * which at 100 TB would OOM the driver/executors if broadcast. */
  private def gramJaccardPairs(docs: DataFrame): DataFrame = {
    val g = docs.select(col("block"), col("id"), explode(col("grams")).as("gram"))
    val inter = g.groupBy("block", "gram")
      .agg(collect_list(col("id")).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(col("block"), explode(expr("packed_pairs(ds)")).as("pair"))
      .groupBy("block", "pair").agg(count(lit(1)).as("inter"))
      .select(col("block"), shiftright(col("pair"), 32).as("id_a"),
        col("pair").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"), col("inter"))
    val sizes = docs.select(col("id"), col("ng"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("ng").as("na"))
        .hint("shuffle_hash"), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("ng").as("nb"))
        .hint("shuffle_hash"), "id_b")
      .withColumn("jacc",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
  }

  /** Word-bigram Jaccard similarity for every overlapping pair within a
    * block: (block, id_a, id_b, inter, na, nb, jacc). Shingles are 64-bit
    * hashes inside the row (native bigram_hashes); bucket pair expansion
    * is packed longs; sizes rejoin via shuffle-hash join (never
    * broadcast — see [[gramJaccardPairs]]). */
  def bigramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      blockCol: String): DataFrame = {
    graft.functions.TextHashes.register(df.sparkSession)
    val docs = df
      .select(col(blockCol).as("block"), col(idCol).cast("long").as("id"),
        expr(s"bigram_hashes(split($textCol, ' '))").as("grams"))
      .withColumn("ng", size(col("grams")))
    gramJaccardPairs(docs)
  }

  /** Distinct-token (unigram) Jaccard for every overlapping pair within a
    * block — same bucket pipeline as [[bigramJaccardPairs]], tokens hashed
    * to 64-bit via xxhash64. */
  def tokenJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      blockCol: String): DataFrame = {
    graft.functions.TextHashes.register(df.sparkSession)
    val docs = df
      .select(col(blockCol).as("block"), col(idCol).cast("long").as("id"),
        array_distinct(transform(toks(col(textCol)), t => xxhash64(t))).as("grams"))
      .withColumn("ng", size(col("grams")))
    gramJaccardPairs(docs)
  }

  /** [[tokenJaccardPairs]] over a pre-tokenized (block, id, tks) relation,
    * `tks` = `array_distinct(split(text, ' '))`. `array_distinct` over the
    * hashed distinct tokens keeps the collision semantics of the text
    * form (distinct applied AFTER hashing) bit-identical. */
  private[operators] def tokenJaccardPairsFromTokens(tk: DataFrame): DataFrame = {
    graft.functions.TextHashes.register(tk.sparkSession)
    val docs = tk
      .select(col("block"), col("id"),
        array_distinct(transform(col("tks"), t => xxhash64(t))).as("grams"))
      .withColumn("ng", size(col("grams")))
    gramJaccardPairs(docs)
  }

  /** SimHash near-duplicate pairs: (id_a, id_b, hd) with Hamming distance
    * `hd <= maxHamming` between 16-bit SimHashes. Banding on the two
    * 8-bit halves guarantees full recall for maxHamming <= 1 (pigeonhole:
    * a pair differing in <= 1 bit matches exactly on at least one half);
    * candidate verification is an exact bit_count(xor). Same bucket-cap /
    * shuffle-join scale discipline as [[lshCandidatePairs]] /
    * [[gramJaccardPairs]]; ids must fit 31 bits (packed_pairs). */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 1, maxBucket: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 1,
      "2-half banding guarantees recall only for maxHamming <= 1")
    val spark = df.sparkSession
    graft.functions.TextHashes.register(spark)
    val sig = Text.simhash16(df, textCol, idCol)
      .select(col(idCol).cast("long").as("id"), col("simhash"))
    val bands = sig.select(col("id"), concat(lit("l"), col("simhash") % 256).as("band"))
      .unionAll(sig.select(col("id"), concat(lit("h"), shiftright(col("simhash"), 8)).as("band")))
    val pairs = bands.groupBy("band")
      .agg(collect_list(col("id")).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxBucket)
      .select(explode(expr("packed_pairs(ds)")).as("pair")).distinct()
      .select(shiftright(col("pair"), 32).as("id_a"),
        col("pair").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"))
    pairs
      .join(sig.select(col("id").as("id_a"), col("simhash").as("sa"))
        .hint("shuffle_hash"), "id_a")
      .join(sig.select(col("id").as("id_b"), col("simhash").as("sb"))
        .hint("shuffle_hash"), "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int").as("hd"))
      .filter(col("hd") <= maxHamming)
  }

  /** Near-duplicate pairs over an arbitrary-width hash column (SimHash,
    * image aHash, any Hamming-space fingerprint): (id_a, id_b, hd) with
    * `hd <= maxHamming`. The hash is cut into `numBands` equal bit bands;
    * pigeonhole gives FULL recall whenever `maxHamming < numBands` (a pair
    * within distance d < numBands matches exactly on at least one band).
    * Same bucket-cap / packed-pair / shuffle-join discipline as
    * [[simhashNearDupPairs]] (which keeps its own legacy band-key scheme
    * for oracle stability); ids must fit 31 bits. */
  def hammingNearDupPairs(df: DataFrame, hashCol: String, idCol: String,
      hashBits: Int = 64, numBands: Int = 4, maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    require(hashBits % numBands == 0, "numBands must divide hashBits")
    require(maxHamming < numBands,
      s"banding guarantees recall only for maxHamming < numBands ($numBands)")
    val spark = df.sparkSession
    graft.functions.TextHashes.register(spark)
    val bandBits = hashBits / numBands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val sig = df.select(col(idCol).cast("long").as("id"), col(hashCol).as("hh"))
      .filter(col("hh").isNotNull)
    val bands = (0 until numBands).map { b =>
      sig.select(col("id"), concat(lit(s"$b/"),
        shiftright(col("hh"), b * bandBits).bitwiseAND(lit(mask))).as("band"))
    }.reduce(_ unionAll _)
    val pairs = bands.groupBy("band")
      .agg(collect_list(col("id")).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxBucket)
      .select(explode(expr("packed_pairs(ds)")).as("pair")).distinct()
      .select(shiftright(col("pair"), 32).as("id_a"),
        col("pair").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"))
    pairs
      .join(sig.select(col("id").as("id_a"), col("hh").as("ha"))
        .hint("shuffle_hash"), "id_a")
      .join(sig.select(col("id").as("id_b"), col("hh").as("hb"))
        .hint("shuffle_hash"), "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int").as("hd"))
      .filter(col("hd") <= maxHamming)
  }

  /** Substring-level verbatim-copy pairs (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499 —
    * their signal is a shared >= n-token span, not whole-doc similarity):
    * documents sharing at least one n-token window, as (id_a, id_b,
    * shared) where `shared` counts the DISTINCT shared windows. Catches
    * partial copies — a quoted paragraph, boilerplate header — that
    * whole-document MinHash dilutes below any Jaccard threshold.
    *
    * Scale shape: every window hashes per-row to a fixed-width xxhash64
    * long (the n-token strings are never shuffled); the bucket join is
    * keyed by window hash with the [[lshCandidatePairs]] maxBucket
    * discipline — a boilerplate window shared by thousands of documents
    * is dropped BEFORE the k(k-1)/2 in-bucket expansion — and pairs pack
    * into one long (ids must fit 31 bits, as everywhere in this file). */
  def sharedWindowPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 8, maxBucket: Int = 1000): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val spark = df.sparkSession
    graft.functions.TextHashes.register(spark)
    // r11 opt: native distinct window hashing (codegen'd, no per-window
    // slice/concat allocation) — the composable transform/xxhash64 form
    // ran interpreted per window; hash values are opaque bucket keys, so
    // the chained-hash scheme changes nothing observable (bigramHashes
    // precedent). Column API, not a SQL-string splice of textCol (r11
    // ADVICE: names needing backticks failed to parse).
    val wins = graft.functions.TextHashes.ngramHashesCol(spark,
      toks(col(textCol)), n, truncShort = false)
    df.select(col(idCol).cast("long").as("id"), explode(wins).as("wh"))
      .groupBy("wh")
      .agg(collect_list(col("id")).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxBucket)
      .select(explode(expr("packed_pairs(ds)")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("shared"))
      .select(shiftright(col("pair"), 32).as("id_a"),
        col("pair").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"), col("shared"))
  }

  /** Pick the BEST representative of each duplicate cluster instead of
    * the lowest id: given cluster labels (id, comp — [[duplicateClusters]]
    * output) and per-doc scores, keeps the highest-scoring member (id
    * tie-break) — what a production dedup actually ships: the cleanest
    * copy, not the first-crawled one. Returns (id, comp, score, keep).
    * One rank window over the cluster partitioning. */
  def keepBestPerCluster(clusters: DataFrame, scores: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("comp")
      .orderBy(col(scoreCol).desc, col("id"))
    clusters.join(scores.select(col(idCol).cast("long").as("id"),
        col(scoreCol)).hint("shuffle_hash"), "id")
      .withColumn("keep", row_number().over(w) === 1)
  }

  /** Exact-Jaccard verification of candidate pairs — the VERIFY step after
    * LSH/SimHash candidate generation: each (id_a, id_b) rejoins the two
    * distinct-token sets (shuffle-hash joins on the long ids) and the
    * exact |A∩B| / |A∪B| is computed in-row. Cost scales with the
    * candidate count, never corpus² — the whole point of
    * candidates-then-verify. Returns (id_a, id_b, jacc) for pairs with
    * `jacc >= minJaccard`. */
  def verifyCandidatePairs(pairs: DataFrame, df: DataFrame, textCol: String,
      idCol: String, minJaccard: Double = 0.0): DataFrame = {
    val tk = df.select(col(idCol).cast("long").as("id"),
      array_distinct(toks(col(textCol))).as("tk"))
    pairs
      .join(tk.select(col("id").as("id_a"), col("tk").as("ta")).hint("shuffle_hash"), "id_a")
      .join(tk.select(col("id").as("id_b"), col("tk").as("tb")).hint("shuffle_hash"), "id_b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("jacc", col("inter").cast("double") /
        (size(col("ta")) + size(col("tb")) - col("inter")))
      .filter(col("jacc") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jacc"))
  }

  /** Doc-in-doc detection — ASYMMETRIC containment |A∩B| div |A|, the
    * quote/excerpt/wrapper catcher whole-doc Jaccard structurally misses
    * (a 30-token excerpt inside a 500-token source has Jaccard ≈ 0.06
    * but containment ≈ 1.0, so MinHash-LSH rarely even proposes the
    * pair). Candidates therefore come from [[sharedWindowPairs]] — any
    * verbatim n-token run shared with the host proposes the pair — and
    * the verify step computes exact distinct-token containment BOTH
    * directions in ppm, keeping pairs where either direction clears
    * `minContPpm`. Returns
    * (id_a, id_b, n_a, n_b, inter, cont_a_ppm, cont_b_ppm).
    *
    * Scale shape: candidate generation is the D11 window-bucket shape
    * (maxBucket-capped before pair expansion, window strings never
    * shuffled); the verify joins token sets to CANDIDATES ONLY via
    * shuffle-hash — cost ∝ proposed pairs, never corpus². */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 8, maxBucket: Int = 1000,
      minContPpm: Long = 800000L): DataFrame = {
    require(minContPpm >= 0 && minContPpm <= 1000000L)
    val cand = sharedWindowPairs(df, textCol, idCol, n, maxBucket)
      .select("id_a", "id_b")
    val tk = df.select(col(idCol).cast("long").as("id"),
      array_distinct(toks(col(textCol))).as("tk"))
    cand
      .join(tk.select(col("id").as("id_a"), col("tk").as("ta"))
        .hint("shuffle_hash"), "id_a")
      .join(tk.select(col("id").as("id_b"), col("tk").as("tb"))
        .hint("shuffle_hash"), "id_b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("n_a", size(col("ta")).cast("long"))
      .withColumn("n_b", size(col("tb")).cast("long"))
      .withColumn("cont_a_ppm", expr("(inter * 1000000L) div greatest(1L, n_a)"))
      .withColumn("cont_b_ppm", expr("(inter * 1000000L) div greatest(1L, n_b)"))
      .filter(greatest(col("cont_a_ppm"), col("cont_b_ppm")) >= minContPpm)
      .select("id_a", "id_b", "n_a", "n_b", "inter", "cont_a_ppm", "cont_b_ppm")
  }

  /** Duplicate-cluster resolution: connected components over a candidate-
    * pair edge list — (id, component) with component = the MIN id reachable
    * through any chain of pairs, i.e. the cluster keeper every dedup
    * pipeline needs after candidate generation.
    *
    * Boruvka-style min-hooking WITH GRAPH CONTRACTION: each round every
    * representative hooks to min(self, min neighbor), the hook map is
    * path-compressed twice (pointers only ever decrease, so no cycles),
    * and the edge relation is CONTRACTED through the hooks (endpoints
    * remapped, self-loops and duplicate edges dropped). The loop runs on
    * the shrinking rep graph only; the full label table is resolved ONCE
    * at the end by folding the (tiny) per-round hook maps.
    *
    * Why this shape: plain min-label propagation needs diameter rounds
    * over the FULL edge relation (near-dup graphs contain long hamming-1
    * chains — measured 14 rounds at sf0.1, still 9 with pointer jumping),
    * and every round re-shuffles all edges. Contraction measured 3 rounds
    * on the same graph (edges 6542 -> 750 -> 14 -> 0), each pass over an
    * edge relation a fraction of the previous one — at corpus scale the
    * later passes are nearly free, and convergence is the edge relation
    * literally emptying (`maxIters` is a safety cap). Once the residual
    * graph is under `driverFinishEdges` (bounded — default 500 k edges
    * ≈ 8 MB), a single collect + union-find finishes it driver-side as
    * one literal hook map instead of paying fixed per-round scheduling
    * overhead on near-empty relations (round-6 at sf0.1: qg03
    * 1.78 -> 0.52 s, qd13 1.68 -> 0.73 s, qd35 2.03 -> 0.72 s). Labels
    * verified identical to the
    * propagation implementation on the sf0.1 graph, and the qd13 oracle
    * (recursive transitive closure) checks them end-to-end.
    *
    * Fault tolerance: each round's result must be checkpointed (the
    * lineage grows by several joins per round and the loop drives
    * `isEmpty` actions). By default that is `localCheckpoint()` — fastest,
    * but blocks live only on executors, so on a cluster with spot/
    * preemptible executors ONE lost executor makes the truncated-lineage
    * RDD unrecoverable and fails the job mid-loop. Pass `checkpointDir`
    * (an HDFS/object-store path on a real cluster) to use reliable
    * `checkpoint()` instead: blocks persist to the shared filesystem and
    * survive executor loss. That is the mode a 100 TB deployment should
    * run; local runs and the bench keep the zero-config fast path. */
  def duplicateClusters(pairs: DataFrame, maxIters: Int = 20,
      checkpointDir: Option[String] = None,
      driverFinishEdges: Long = 500000L): DataFrame = {
    val spark = pairs.sparkSession
    checkpointDir.foreach { dir =>
      if (!spark.sparkContext.getCheckpointDir.contains(dir))
        spark.sparkContext.setCheckpointDir(dir)
    }
    def ckpt(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    var e = ckpt(pairs.select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .unionAll(pairs.select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
      .distinct())
    // lazy on purpose: read exactly once (final resolve), off the round-0
    // checkpointed edges — its own eager checkpoint was a wasted job
    val ids = e.select(col("src").as("id")).distinct()
    var hooks = List.empty[DataFrame]
    var i = 0
    // count, not isEmpty: the materialized-block scan costs the same and
    // the size drives the driver-endgame cut below
    var n = e.count()
    while (i < maxIters && n > driverFinishEdges) {
      // hook: rep -> min(self, min neighbor). Both edge directions are
      // present, so every live rep has a row; least() keeps pointers
      // monotonically decreasing -> the final single rep per component is
      // its global min id.
      val hook = e.groupBy("src").agg(least(col("src"), min(col("dst"))).as("rp"))
        .select(col("src").as("r"), col("rp"))
      // two path compressions (rp := rp(rp)) over the hook map — tiny next
      // to the edge relation; one checkpointed job (ReuseExchange plans
      // the hook subtree once per self-join). Round-6 profiling note: a
      // lazy persist() here (folding materialization into the contract
      // job) measured SLOWER (qg03 1.78 -> 2.30 s) — the contract's two
      // join branches race the cold cache and duplicate the hook
      // computation — so the eager checkpoint stays.
      def compress(h: DataFrame, j: Int): DataFrame =
        h.join(h.select(col("r").as(s"r$j"), col("rp").as(s"rp$j")),
            col("rp") === col(s"r$j"), "left")
          .select(col("r"), coalesce(col(s"rp$j"), col("rp")).as("rp"))
      val h2 = ckpt(compress(compress(hook, 1), 2))
      hooks ::= h2
      // contract: remap both endpoints through the hooks, drop self-loops
      // and duplicate edges — the graph SHRINKS every round
      e = ckpt(e
        .join(h2.select(col("r").as("src"), col("rp").as("nsrc")), "src")
        .join(h2.select(col("r").as("dst"), col("rp").as("ndst")), "dst")
        .select(col("nsrc").as("src"), col("ndst").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct())
      n = e.count()
      i += 1
    }
    // DRIVER ENDGAME (Kiveris et al. 2014's multi-round-then-finish
    // discipline): contraction shrinks the rep graph geometrically, so
    // within a couple of rounds it is far below `driverFinishEdges` —
    // but each extra distributed round still costs 3 fixed-overhead
    // driver actions over near-empty relations (round-6 profiling: the
    // tail rounds were ~0.4 s each of pure scheduling at sf0.1). Once
    // the residual graph fits the BOUNDED threshold (500 k edges ≈ 8 MB
    // — trivially driver-safe), one collect + union-find replaces the
    // whole tail, emitted as one final literal hook map. Corpora whose
    // graphs never shrink under the threshold just run the full loop.
    if (n > 0 && n <= driverFinishEdges) {
      val res = e.select("src", "dst").collect()
      val parent = new scala.collection.mutable.LongMap[Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nx = parent(c); parent(c) = r; c = nx
        }
        r
      }
      res.foreach { row =>
        val ra = find(row.getLong(0)); val rb = find(row.getLong(1))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val hookRows = parent.keys.toSeq.map(x => (x, find(x)))
        .filter { case (a, b) => a != b }
      import spark.implicits._
      hooks ::= hookRows.toDF("r", "rp")
    }
    // resolve the full label table once: comp(id) = hook maps applied
    // oldest-first (k tiny left joins in a single job, k = rounds)
    var comp = ids.withColumn("comp", col("id"))
    hooks.reverse.zipWithIndex.foreach { case (h, j) =>
      comp = comp.join(h.select(col("r").as(s"hr$j"), col("rp").as(s"hp$j")),
          col("comp") === col(s"hr$j"), "left")
        .select(col("id"), coalesce(col(s"hp$j"), col("comp")).as("comp"))
    }
    comp
  }

  /** Benchmark-contamination check: which corpus documents share at least
    * `minShared` distinct `n`-token shingles with any document of an
    * evaluation/benchmark set. Returns (doc_id, n_bench_hits = benchmark
    * docs overlapped, max_shared = most shingles shared with a single
    * benchmark doc), one row per contaminated corpus doc.
    *
    * Scale shape: an inverted-index join on the shingle — never corpus x
    * bench. Shingles whose corpus document frequency exceeds `maxDf`
    * (boilerplate headers, the n-grams every document contains) are
    * dropped BEFORE the join: they carry no contamination signal and are
    * exactly the postings whose fan-out would blow the join up. Join keys
    * are xxhash64 longs, not gram strings (fixed-width shuffle). */
  def crossCorpusContamination(corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 3, maxDf: Int = 50,
      minShared: Int = 2): DataFrame = {
    require(maxDf >= 1 && minShared >= 1)
    contaminationJoin(
      contaminationPostings(corpus, textCol, idCol, n, "cid"),
      bench, textCol, idCol, n, maxDf, minShared)
  }

  /** [[crossCorpusContamination]] with a broadcast Bloom pre-filter of the
    * benchmark grams — IDENTICAL results (Bloom filters have no false
    * negatives; false positives die in the exact join), radically better
    * 100 TB shape: the corpus posting stream (O(corpus tokens) rows — the
    * dominant shuffle of the plain operator) is cut MAP-SIDE to just the
    * postings whose gram might appear in the benchmark, so shuffle volume
    * scales with the contamination overlap, not the corpus. The filter
    * itself is `numBits/8` bytes however big the corpus is (the benchmark
    * side is small by definition), built with one aggregate over the
    * bench grams and broadcast once.
    *
    * The df cap stays exact: the Bloom test is deterministic per gram, so
    * a surviving gram keeps ALL its corpus postings and its window count
    * still equals the full-corpus df. */
  def crossCorpusContaminationBloom(corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 3, maxDf: Int = 50,
      minShared: Int = 2, numBits: Long = 1L << 22): DataFrame = {
    require(maxDf >= 1 && minShared >= 1)
    graft.functions.TextHashes.register(corpus.sparkSession)
    // built eagerly (one aggregate over the small bench side — the qv05
    // KMeans precedent) and inlined as a constant: `might_contain`
    // requires a constant/scalar-subquery filter, and a literal ships
    // with the task binary exactly like the optimizer's own injected
    // runtime filters
    val bf = contaminationPostings(bench, textCol, idCol, n, "bid")
      .agg(expr(s"bloom_filter_agg(g, ${numBits / 10}L, ${numBits}L)").as("bf"))
      .head().getAs[Array[Byte]](0)
    val cg = contaminationPostings(corpus, textCol, idCol, n, "cid")
      .filter(if (bf == null) lit(false) // empty bench: nothing can match
        else call_function("might_contain", lit(bf), col("g")))
    contaminationJoin(cg, bench, textCol, idCol, n, maxDf, minShared)
  }

  private def contaminationPostings(df: DataFrame, textCol: String,
      idCol: String, n: Int, as: String): DataFrame = {
    graft.functions.TextHashes.register(df.sparkSession)
    // r11 opt: hash windows in-row via the native kernel instead of
    // materializing each shingle STRING and xxhash64-ing it after the
    // explode; `true` keeps Text.shingles' truncated-short-doc contract
    df.select(col(idCol).as(as), explode(
      graft.functions.TextHashes.ngramHashesCol(df.sparkSession,
        toks(col(textCol)), n, truncShort = true)).as("g"))
  }

  private def contaminationJoin(cg: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int, maxDf: Int,
      minShared: Int): DataFrame = {
    // df cap via a window count over the SAME shuffle the join needs —
    // a groupBy-then-rejoin would recompute the whole shingle-explode
    // subtree a second time (the partial-agg child defeats ReuseExchange)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val capped = cg
      .withColumn("gdf", count(lit(1)).over(w))
      .filter(col("gdf") <= maxDf)
      .drop("gdf")
    val bg = contaminationPostings(bench, textCol, idCol, n, "bid")
    capped.join(bg.hint("shuffle_hash"), "g")
      .groupBy("cid", "bid").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .groupBy(col("cid").as(idCol))
      .agg(count(lit(1)).as("n_bench_hits"), max("shared").as("max_shared"))
  }

  /** Per-block Jaccard summary — (block, n_pairs, max_jacc, avg_jacc) over
    * ALL C(n,2) pairs of the block — WITHOUT an all-pairs join. Overlapping
    * pairs come from the token-bucket pipeline; the (possibly astronomical)
    * count of zero-overlap pairs enters analytically: they contribute 0 to
    * the jacc sum and n_pairs = n(n-1)/2 has a closed form. A within-block
    * `docs × docs` join (the naive form) is quadratic in block size — a
    * 1 M-doc block would be 5·10¹¹ joined rows; this never materializes a
    * zero-overlap pair. Blocks with a single document (no pairs) are
    * omitted, matching the pairwise SQL semantics. */
  def tokenJaccardBlockSummary(df: DataFrame, textCol: String, idCol: String,
      blockCol: String): DataFrame = {
    val pairs = tokenJaccardPairs(df, textCol, idCol, blockCol)
    val overlap = pairs.groupBy("block").agg(
      max("jacc").as("max_overlap"),
      sum(col("jacc").cast("decimal(20,10)")).as("sum_jacc"))
    val counts = df.groupBy(col(blockCol).as("block"))
      .agg(count(lit(1)).as("n_docs"))
    counts.join(overlap, Seq("block"), "left")
      .select(col("block"),
        expr("(n_docs * (n_docs - 1)) div 2").as("n_pairs"),
        // overlap jaccs are strictly positive, so implicit zero pairs
        // never win the max; absent overlap means the max is exactly 0
        coalesce(col("max_overlap"), lit(0.0)).as("max_jacc"),
        (coalesce(col("sum_jacc"), lit(0).cast("decimal(20,10)")).cast("double") /
          expr("(n_docs * (n_docs - 1)) div 2")).as("avg_jacc"))
      .filter(col("n_pairs") > 0)
  }

  /** Token-overlap precision/recall/F1 for candidate pairs, in scaled
    * 64-bit integer arithmetic (bit-identical across engines — the same
    * discipline as [[graft.operators.Text.bm25TopK]]'s integer scores):
    * over DISTINCT tokens, `prec = |A∩B|·scale div |A|`,
    * `rec = |A∩B|·scale div |B|`, `f1 = 2·prec·rec div (prec+rec)`
    * (0 when the overlap is empty). This is the contamination-style
    * overlap-F1 used to grade near-dup candidates more asymmetrically
    * than Jaccard — a short doc contained in a long one scores high
    * recall even when Jaccard is low.
    *
    * SCALE CONTRACT: two hash-joins of the pair list against the
    * tokenized corpus (the same shuffle-hash rejoin shape as
    * [[verifyCandidatePairs]]); all metric arithmetic is per-row Column
    * algebra after the joins. `prec·rec ≤ scale²` must stay under 2⁶³ —
    * the default 10⁶ scale leaves 6 orders of headroom. */
  def overlapF1Pairs(pairs: DataFrame, df: DataFrame, textCol: String,
      idCol: String, scale: Long = 1000000L): DataFrame = {
    require(scale >= 1 && scale <= 2000000000L, s"scale out of range: $scale")
    val tk = df.select(col(idCol).cast("long").as("id"),
      array_distinct(toks(col(textCol))).as("tk"))
    pairs
      .join(tk.select(col("id").as("id_a"), col("tk").as("ta")).hint("shuffle_hash"), "id_a")
      .join(tk.select(col("id").as("id_b"), col("tk").as("tb")).hint("shuffle_hash"), "id_b")
      .withColumn("n_inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("prec", expr(s"(n_inter * ${scale}L) div size(ta)"))
      .withColumn("rec", expr(s"(n_inter * ${scale}L) div size(tb)"))
      .select(col("id_a"), col("id_b"), col("n_inter"), col("prec"), col("rec"),
        when(col("n_inter") === 0, lit(0L))
          .otherwise(expr("(2 * prec * rec) div (prec + rec)")).as("f1"))
  }

  /** Edit-distance verification of candidate pairs — the EXPENSIVE last
    * gate of a fuzzy-dedup pipeline (candidates from LSH/SimHash, cheap
    * set-overlap verify first, Levenshtein only on the survivors: the
    * standard candidates→verify→confirm funnel, cf. Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" §4).
    * Each (id_a, id_b) rejoins the two raw strings and computes the exact
    * character-level Levenshtein distance plus its normalized form in
    * parts-per-million of the LONGER string (`dist_ppm` = 0 for identical
    * texts, 1 000 000 when every character of the longer differs). Rows
    * with `dist_ppm <= maxDistPpm` survive.
    *
    * SCALE CONTRACT: two shuffle-hash rejoins of the pair list against the
    * corpus (the [[verifyCandidatePairs]] shape — the corpus-sized text
    * relation is never broadcast), then per-row `levenshtein` (codegen'd
    * built-in). Two measures keep the quadratic kernel honest:
    *   - the pair relation is EXPLICITLY repartitioned on (id_a, id_b)
    *     to the session's shuffle parallelism before the kernel — a pair
    *     relation is small in BYTES (two ids) but huge in CPU, and AQE's
    *     byte-based coalescing would otherwise fold it onto one core
    *     (measured 22 s → 1.3 s at sf0.1 for the identical rows);
    *   - `levenshtein`'s THRESHOLD form bounds each pair's DP at the
    *     largest distance `maxDistPpm` could accept for its lengths
    *     (banded O(len·threshold) + early exit, −1 beyond — and −1 rows
    *     are exactly the rows the ppm filter would drop, so results are
    *     unchanged; the threshold is `((ppm+1)·len − 1) div 10⁶`, the
    *     greatest dist with `dist·10⁶ div len ≤ ppm`).
    * Total cost ∝ candidates × len × threshold — which is still why this
    * belongs AFTER a cheap verify, and why the operator takes pairs
    * rather than generating them. */
  /** Fuzzy record-linkage JOIN between two tables — the entity-resolution
    * staple (match a dirty feed against the master table): rows sharing a
    * caller-computed BLOCK key pair up, and pairs within `maxDistPpm`
    * normalized edit distance link. Returns (id_l, id_r, dist, dist_ppm).
    * The block key is the recall contract and deliberately the caller's
    * choice (phonetic key, sorted-token prefix, length-banded suffix — a
    * key the expected corruption cannot move); a pair in different
    * blocks is invisible.
    *
    * SCALE CONTRACT: one hash equi-join on the block key, guarded like
    * [[lshCandidatePairs]] — blocks whose left×right pair product
    * exceeds `maxBucket` are dropped BEFORE the join (a null/default
    * block key would otherwise go quadratic); then the
    * [[editDistanceVerify]] kernel discipline: explicit pair-key
    * repartition (AQE byte-coalescing would serialize the CPU-bound
    * DP) and threshold-banded `levenshtein`. */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
      idL: String, txtL: String, blkL: String,
      idR: String, txtR: String, blkR: String,
      maxDistPpm: Long, maxBucket: Long = 10000L): DataFrame = {
    require(maxDistPpm >= 0 && maxDistPpm <= 1000000L,
      s"maxDistPpm out of range: $maxDistPpm")
    require(maxBucket >= 1, s"maxBucket >= 1: $maxBucket")
    val l = left.select(col(idL).cast("long").as("id_l"),
      col(txtL).as("ta"), col(blkL).as("__blk"))
    val r = right.select(col(idR).cast("long").as("id_r"),
      col(txtR).as("tb"), col(blkR).as("__blk"))
    val ln = l.groupBy("__blk").agg(count(lit(1)).as("__nl"))
    val rn = r.groupBy("__blk").agg(count(lit(1)).as("__nr"))
    val ok = ln.join(rn, "__blk")
      .filter(col("__nl") * col("__nr") <= maxBucket)
      .select("__blk")
    val shufflePartitions = left.sparkSession.sessionState.conf.numShufflePartitions
    l.join(ok.hint("shuffle_hash"), "__blk")
      .join(r, "__blk")
      .repartition(shufflePartitions, col("id_l"), col("id_r"))
      .withColumn("__len", expr("greatest(length(ta), length(tb), 1L)"))
      .withColumn("dist", expr(
        s"levenshtein(ta, tb, cast(least(((${maxDistPpm}L + 1) * __len - 1) div 1000000L, " +
          "2147483647L) as int))").cast("long"))
      .filter(col("dist") >= 0)
      .withColumn("dist_ppm", expr("(dist * 1000000L) div __len"))
      .filter(col("dist_ppm") <= maxDistPpm)
      .select(col("id_l"), col("id_r"), col("dist"), col("dist_ppm"))
  }

  def editDistanceVerify(pairs: DataFrame, df: DataFrame, textCol: String,
      idCol: String, maxDistPpm: Long = 1000000L): DataFrame = {
    require(maxDistPpm >= 0 && maxDistPpm <= 1000000L,
      s"maxDistPpm out of range: $maxDistPpm")
    val tx = df.select(col(idCol).cast("long").as("id"), col(textCol).as("tx"))
    val shufflePartitions = df.sparkSession.sessionState.conf.numShufflePartitions
    pairs
      .join(tx.select(col("id").as("id_a"), col("tx").as("ta")).hint("shuffle_hash"), "id_a")
      .join(tx.select(col("id").as("id_b"), col("tx").as("tb")).hint("shuffle_hash"), "id_b")
      .repartition(shufflePartitions, col("id_a"), col("id_b"))
      .withColumn("__len", expr("greatest(length(ta), length(tb), 1L)"))
      .withColumn("dist", expr(
        s"levenshtein(ta, tb, cast(least(((${maxDistPpm}L + 1) * __len - 1) div 1000000L, " +
          "2147483647L) as int))").cast("long"))
      .filter(col("dist") >= 0)
      .withColumn("dist_ppm", expr("(dist * 1000000L) div __len"))
      .filter(col("dist_ppm") <= maxDistPpm)
      .select(col("id_a"), col("id_b"), col("dist"), col("dist_ppm"))
  }

  /** Dedup savings report — what exact dedup actually buys, per source
    * (the ROI table that justifies the pass): keep the smallest-id copy
    * of each identical text; everything else is "saved". Returns
    * (grp, n_docs, total_chars, dup_docs, saved_chars, savings_ppm).
    *
    * Scale shape: one content-hash window (partitioned by md5, the
    * [[dropExactDuplicates]] shuffle) marks survivors; one group
    * aggregation folds the report. */
  def dedupSavings(df: DataFrame, textCol: String, idCol: String,
      sizeCol: String, groupCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("h").orderBy("id")
    df.select(col(groupCol).as("grp"), col(idCol).cast("long").as("id"),
        col(sizeCol).cast("long").as("sz"), md5(col(textCol)).as("h"))
      .withColumn("dup", (row_number().over(w) > 1).cast("long"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"), sum("sz").as("total_chars"),
        coalesce(sum("dup"), lit(0L)).as("dup_docs"),
        coalesce(sum(col("dup") * col("sz")), lit(0L)).as("saved_chars"))
      .withColumn("savings_ppm",
        expr("(saved_chars * 1000000L) div greatest(1L, total_chars)"))
  }

  /** Dedup threshold sweep — the duplicate-rate curve that picks the
    * Jaccard cutoff (0.7 vs 0.8 changes how much corpus survives; sweep
    * once, decide on evidence): over the block-bounded exact pair table,
    * for each candidate threshold, how many pairs clear it and how many
    * DOCUMENTS are implicated (would be dropped or clustered). Returns
    * (threshold_ppm, n_pairs, n_docs), one row per threshold.
    *
    * Scale shape: the pair table is computed ONCE ([[tokenJaccardPairs]],
    * block-bounded); the sweep explodes each pair into its qualifying
    * thresholds (fan-out ≤ |thresholds|, a constant) and counts; doc
    * counts are a distinct over (threshold, id). */
  def thresholdSweep(df: DataFrame, textCol: String, idCol: String,
      blockCol: String,
      thresholdsPpm: Seq[Long] = Seq(500000L, 600000L, 700000L, 800000L,
        900000L)): DataFrame = {
    require(thresholdsPpm.nonEmpty, "thresholdsPpm must be non-empty")
    require(thresholdsPpm.forall(t => t >= 0 && t <= 1000000L),
      s"thresholds in [0, 1e6]: $thresholdsPpm")
    val pairs = tokenJaccardPairs(df, textCol, idCol, blockCol)
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("long") * 1000000L).as("num"),
        (col("na").cast("long") + col("nb").cast("long") -
          col("inter").cast("long")).as("uni"))
    val th = array(thresholdsPpm.map(lit): _*)
    val hit = pairs.select(col("id_a"), col("id_b"),
        explode(filter(th, t => col("num") >= t * col("uni"))).as("t"))
    val pairCounts = hit.groupBy("t").agg(count(lit(1)).as("n_pairs"))
    val docCounts = hit.select(col("t"), col("id_a").as("id"))
      .unionAll(hit.select(col("t"), col("id_b").as("id")))
      .distinct()
      .groupBy("t").agg(count(lit(1)).as("n_docs"))
    val allT = df.sparkSession.range(1)
      .select(explode(th).as("t"))
    allT.join(pairCounts, Seq("t"), "left_outer")
      .join(docCounts, Seq("t"), "left_outer")
      .select(col("t").as("threshold_ppm"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
  }

  /** MinHash-LSH index calibration — the measured precision/recall a
    * banded index actually delivers on THIS corpus (the banding formula
    * predicts it; tune bands/rows on evidence, like [[Sketches.bloomFpr]]
    * for Bloom filters): ground truth is every same-block pair at
    * distinct-token Jaccard ≥ `thresholdPpm` (exact, integer-compared:
    * inter·10⁶ ≥ t·union); predictions are [[lshCandidatePairs]]
    * restricted to same-block. One row:
    * (n_candidates, n_truth, true_pos, precision_ppm, recall_ppm).
    *
    * Scale shape: candidates come from the capped band buckets;
    * exact-verification joins token sets to CANDIDATE pairs only
    * (shuffle-hash, cost ∝ candidates); ground truth reuses the
    * block-bounded [[tokenJaccardPairs]] bucket pipeline. The final
    * cross of three one-row aggregates is driver-free. */
  def lshCalibration(df: DataFrame, textCol: String, idCol: String,
      blockCol: String, thresholdPpm: Long = 500000L,
      numHashes: Int = 4, rowsPerBand: Int = 2,
      maxBucket: Int = 1000): DataFrame = {
    require(thresholdPpm >= 0 && thresholdPpm <= 1000000L,
      s"thresholdPpm out of range: $thresholdPpm")
    // r12 (VERDICT r11 #1): r11 localCheckpoint'ed the full (id, blk, tks)
    // projection here — and qd73 got SLOWER in every full-suite run
    // (builder 3.10→4.14 s, driver 4.65/6.06 s): materializing the wide
    // token arrays costs more than the pruned text re-scans it saves (the
    // same lesson the qd47 persist revert recorded). Kept: the
    // tokenize-once *API* (the FromTokens internals below). Dropped: the
    // checkpoint of `tks` — `base` is lazy again, each consumer rebuilds
    // tokens from the columnar pruned scan. Only the NARROW (id, blk)
    // relation (16 B/row, 2 join consumers) is materialized.
    val base = df.select(col(idCol).cast("long").as("id"),
        col(blockCol).as("blk"),
        array_distinct(toks(col(textCol))).as("tks"))
    val ids = base.select(col("id"), col("blk")).localCheckpoint()
    val cand = lshCandidatePairsFromTokens(base.select("id", "tks"),
        numHashes, rowsPerBand, maxBucket)
      .join(ids.select(col("id").as("id_a"), col("blk").as("ba"))
        .hint("shuffle_hash"), "id_a")
      .join(ids.select(col("id").as("id_b"), col("blk").as("bb"))
        .hint("shuffle_hash"), "id_b")
      .filter(col("ba") === col("bb"))
      .select("id_a", "id_b")
    val tk = base.select(col("id"), col("tks").as("tk"))
    val candJ = cand
      .join(tk.select(col("id").as("id_a"), col("tk").as("ta"))
        .hint("shuffle_hash"), "id_a")
      .join(tk.select(col("id").as("id_b"), col("tk").as("tb"))
        .hint("shuffle_hash"), "id_b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni",
        (size(col("ta")) + size(col("tb"))).cast("long") - col("inter"))
      .withColumn("hit",
        (col("inter") * 1000000L >= lit(thresholdPpm) * col("uni"))
          .cast("long"))
    val truth = tokenJaccardPairsFromTokens(
      base.select(col("blk").as("block"), col("id"), col("tks")))
      .filter(col("inter").cast("long") * 1000000L >=
        lit(thresholdPpm) *
          (col("na").cast("long") + col("nb").cast("long") - col("inter")))
    val cOut = candJ.agg(count(lit(1)).as("n_candidates"),
      coalesce(sum("hit"), lit(0L)).as("true_pos"))
    val tOut = truth.agg(count(lit(1)).as("n_truth"))
    cOut.crossJoin(tOut)
      .select(col("n_candidates"), col("n_truth"), col("true_pos"),
        expr("(true_pos * 1000000L) div greatest(1L, n_candidates)")
          .as("precision_ppm"),
        expr("(true_pos * 1000000L) div greatest(1L, n_truth)")
          .as("recall_ppm"))
  }
}
