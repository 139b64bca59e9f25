package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public text-analysis API over a document table (builder contract:
  * token counting, quality scoring, language ID, fingerprinting) —
  * the library face of the qd01/qd02/qd03/qd08 oracle queries, mirroring
  * the Dedup/Similarity facades.
  *
  * Scale stance (100 TB): every operator is per-row Column algebra or one
  * hash-partitioned groupBy — no joins, no driver materialization, nothing
  * quadratic. All built-ins (codegen'd); the only higher-order functions
  * are bounded by per-document token counts.
  */
object Text {

  /** Whitespace tokenization — the engine's standard token stream. */
  def tokens(c: Column): Column = split(c, " ")

  /** BPE-style regex tokenization: letter runs, single digits, and single
    * punctuation marks as separate tokens (the shape of GPT-2's pre-
    * tokenizer, minus unicode classes — the pattern is deliberately
    * engine-portable). */
  val BpeishPattern = "[a-z]+|[0-9]|[^a-z0-9 ]"

  def regexTokens(c: Column): Column = regexp_extract_all(c, lit(BpeishPattern), lit(0))

  /** Corpus stats per group: (groupCol, n_docs, sum_tokens, min_chars,
    * max_chars, avg_chars). One partial-aggregated shuffle. */
  def corpusStats(df: DataFrame, textCol: String, ncharsCol: String,
      groupCol: String): DataFrame =
    df.select(col(groupCol), col(ncharsCol).as("n_chars"),
        size(tokens(col(textCol))).as("n_tokens"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("sum_tokens"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
        (sum("n_chars").cast("double") / count(lit(1))).as("avg_chars"))

  /** Per-document quality heuristics: token count, distinct-token count,
    * type/token ratio, average word length (chars net of separators),
    * stopword ratio. Pure per-row expressions. */
  def qualityScores(df: DataFrame, textCol: String, ncharsCol: String,
      idCol: String, stopwords: Seq[String]): DataFrame =
    df.withColumn("tk", tokens(col(textCol)))
      .withColumn("n_tokens", size(col("tk")))
      .withColumn("n_uniq", size(array_distinct(col("tk"))))
      .withColumn("n_stop", size(filter(col("tk"), x => x.isInCollection(stopwords))))
      .select(col(idCol), col("n_tokens"), col("n_uniq"),
        (col("n_uniq").cast("double") / col("n_tokens")).as("type_token_ratio"),
        ((col(ncharsCol) - (col("n_tokens") - 1)).cast("double") / col("n_tokens")).as("avg_word_len"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stopword_ratio"))

  /** Corpus phrase mining: the `k` n-gram phrases present in the most
    * DOCUMENTS (per-doc distinct shingles, so a phrase repeated inside
    * one doc counts once) — the boilerplate/template detector that feeds
    * blocklists and the D14 novelty view from the corpus side. Ties
    * break lexicographically. Returns (phrase, df).
    *
    * SCALE CONTRACT: one tokenize scan explodes per-doc distinct grams,
    * one partial-aggregated groupBy counts them, and the top-k is a
    * TakeOrderedAndProject — per-partition heaps, never a full sort of
    * the gram table. */
  def topPhrases(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, k: Int = 20, minDf: Long = 2L): DataFrame = {
    require(n >= 1 && k >= 1 && minDf >= 1)
    df.select(explode(shingles(col(textCol), n)).as("phrase"))
      .groupBy("phrase").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("phrase"))
      .limit(k)
  }

  /** Hard-negative mining for retrieval training (the DPR/contrastive
    * recipe): from a ranked candidate list per query, the top `k`
    * documents that are NOT labelled positives — the highest-ranked
    * wrong answers, which is exactly what contrastive training wants to
    * push away. Re-ranks after the anti-join so every query yields k
    * negatives when available (a rank-then-drop would under-fill).
    * Returns (queryIdCol, docIdCol, neg_rank).
    *
    * SCALE CONTRACT: one anti-join of the (top-k-sized) ranked lists
    * against the positives on the (query, doc) key and a rank window
    * per query over what survives — cost ∝ Σ ranked-list sizes, never
    * the corpus; the corpus-sized work lives in the upstream ranker
    * (BM25/ANN). */
  def hardNegatives(ranked: DataFrame, positives: DataFrame,
      queryIdCol: String, docIdCol: String, rankCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(queryIdCol).orderBy(col(rankCol), col(docIdCol))
    ranked
      .join(positives.select(col(queryIdCol), col(docIdCol)),
        Seq(queryIdCol, docIdCol), "left_anti")
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
      .select(col(queryIdCol), col(docIdCol), col("neg_rank"))
  }

  /** Code-likeness signals per document — the prose-vs-code router of a
    * pretraining mix (code gets its own dedup/quality/tokenizer path).
    * All-integer and regex-only so any engine reproduces them exactly:
    * brace/bracket/semicolon count, operator-character count, code
    * keyword hits (word-bounded), indented-line count, and a scaled
    * symbol density `(n_brace + n_op) · 10⁶ div n_chars`. Thresholding
    * is the caller's policy (signals, not a verdict — the Gopher/
    * StarCoder filters all cut differently). Per-row only, zero
    * shuffles, codegen'd. */
  def codeSignals(df: DataFrame, textCol: String, idCol: String,
      keywords: Seq[String] = Seq("def", "return", "import", "class",
        "const", "var", "function", "void", "int", "for", "while",
        "if", "else", "null")): DataFrame = {
    require(keywords.nonEmpty && keywords.forall(_.matches("[A-Za-z_]+")),
      "keywords must be word-chars only (they enter a regex)")
    val t = col(textCol)
    // long counts: the driver's value compare is type-strict (r7 lesson)
    def cnt(re: String) =
      size(regexp_extract_all(t, lit(re), lit(0))).cast("long")
    val kw = keywords.mkString("\\b(", "|", ")\\b")
    df.select(col(idCol),
      cnt("[{}\\[\\]();]").as("n_brace"),
      cnt("[=+*/<>|&!%-]").as("n_op"),
      cnt(kw).as("n_keyword"),
      cnt("(?m)^[ ]{2,}|(?m)^\\t").as("n_indent"),
      // floor((n_brace + n_op)·10⁶ / n_chars): counts ≤ ~10⁴ and chars ≥ 1
      // keep the double product < 2⁵³, so floor-of-double == integer div
      // in both engines
      when(length(t) > 0,
        floor((cnt("[{}\\[\\]();]") + cnt("[=+*/<>|&!%-]"))
          .cast("double") * lit(1000000.0) / length(t)).cast("long"))
        .otherwise(lit(0L)).as("symbol_ppm"))
  }

  /** Per-document n-gram novelty: what fraction of a doc's DISTINCT
    * n-token grams appear in no other document — (id, n_grams, n_novel,
    * novelty). Low novelty flags template/memorized/boilerplate-heavy
    * docs the way per-doc repetition scores can't (the repeats live in
    * OTHER documents). Shape: one distinct-postings shuffle on xxhash64
    * gram keys; df counts ride a window over the same shuffle the
    * re-aggregation needs (the qd22 discipline — no subtree recompute). */
  def ngramNovelty(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val g = df.select(col(idCol).as("id"),
        explode(array_distinct(shingles(col(textCol), n))).as("gram"))
      .select(col("id"), xxhash64(col("gram")).as("g"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    g.withColumn("df", count(lit(1)).over(w))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams"))
  }

  /** Keep only documents above the `minPct` quality percentile WITHIN
    * their group (per-source/per-language cuts — an absolute threshold
    * over mixed sources throws away whole domains): ranks `scoreCol`
    * ascending by percent_rank per group, keeps rank >= minPct. Returns
    * the surviving rows plus the rank. One window shuffle on the group
    * key. */
  def qualityPercentileFilter(df: DataFrame, scoreCol: String,
      groupCol: String, idCol: String, minPct: Double): DataFrame = {
    require(minPct >= 0 && minPct < 1, "minPct must be in [0, 1)")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(col(scoreCol), col(idCol))
    df.withColumn("q_rank", percent_rank().over(w))
      .filter(col("q_rank") >= minPct)
  }

  /** Marker-word language ID: appends hits_<lang> evidence columns and a
    * `predicted` column (first language in `markers` order wins ties;
    * zero evidence -> "unknown"). N-gram-heuristic langid at its simplest,
    * per-row only. */
  def languageId(df: DataFrame, textCol: String,
      markers: Seq[(String, Seq[String])]): DataFrame = {
    require(markers.nonEmpty, "need at least one language's markers")
    val withHits = markers.foldLeft(df.withColumn("tk", tokens(col(textCol)))) {
      case (acc, (l, ws)) =>
        acc.withColumn(s"hits_$l", size(filter(col("tk"), x => x.isInCollection(ws))))
    }.drop("tk")
    val hitCols = markers.map { case (l, _) => col(s"hits_$l") }
    val best = if (hitCols.length == 1) hitCols.head else greatest(hitCols: _*)
    val predicted = markers.init.foldLeft(when(best === 0, lit("unknown"))) {
      case (acc, (l, _)) => acc.when(col(s"hits_$l") === best, l)
    }.otherwise(markers.last._1)
    withHits.withColumn("predicted", predicted)
  }

  /** Code-switching / mixed-language scan — the [[languageId]] blind
    * spot: a document whose halves vote for DIFFERENT languages gets one
    * confident-looking whole-doc label, but a monolingual training
    * mixture wants it flagged (or routed to a bilingual bucket). Votes
    * the marker heuristic on the first and second character halves
    * independently (both in ONE projection — no join, no second scan)
    * and reports the half-pair matrix with a `mixed` flag (halves
    * disagree AND both are known). The char-midpoint split can cut a
    * word; both engines cut identically, so the comparison is exact.
    * Output: (lang_first, lang_second, mixed, n_docs).
    *
    * Scale shape: one projection evaluates both halves' marker hits
    * (the markerScan discipline), then a ≤ (|langs|+1)²-row rollup. */
  def codeSwitchScan(df: DataFrame, textCol: String, idCol: String,
      markers: Seq[(String, Seq[String])]): DataFrame = {
    require(markers.nonEmpty, "need at least one language's markers")
    val halves = df.select(col(idCol),
      expr(s"substring($textCol, 1, length($textCol) div 2)").as("__h1"),
      expr(s"substring($textCol, length($textCol) div 2 + 1)").as("__h2"))
    val first = languageId(halves, "__h1", markers)
      .withColumnRenamed("predicted", "lang_first")
      .drop(markers.map { case (l, _) => s"hits_$l" }: _*)
    val both = languageId(first, "__h2", markers)
      .withColumnRenamed("predicted", "lang_second")
      .drop(markers.map { case (l, _) => s"hits_$l" }: _*)
    both.select(col("lang_first"), col("lang_second"),
        when(col("lang_first") =!= col("lang_second") &&
          col("lang_first") =!= "unknown" &&
          col("lang_second") =!= "unknown", 1L).otherwise(0L).as("mixed"))
      .groupBy("lang_first", "lang_second", "mixed")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** 16-bit SimHash over the token multiset: per-token md5, one bit per
    * nibble-derived position, majority vote per bit. (doc_id, simhash).
    *
    * Computed entirely per-row by the native codegen'd `simhash16_long`
    * kernel (one MD5 digest + 16 integer ops per token) — ZERO shuffles.
    * The explode-then-groupBy form pushes |tokens| x 16 rows through two
    * shuffles at corpus scale for a value each row computes alone; the
    * composable per-row form (nested aggregate over md5 hex substrings)
    * runs 16 interpreted string ops per token. Semantics are byte-identical
    * to both (the qd08 oracle checks the formula end-to-end). */
  def simhash16(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.TextHashes.register(df.sparkSession)
    df.select(col(idCol),
      call_function("simhash16_long", tokens(col(textCol))).as("simhash"))
  }

  /** Scrub common PII-ish spans from text: emails, then URLs, then long
    * digit runs (phone/ids), each replaced with a fixed tag token. ASCII
    * regexes only (identical RE semantics in any engine — no \\w, no
    * unicode classes). Order matters: an email inside a URL query string
    * is scrubbed as part of the URL it sits in only if the URL pattern
    * fires first — here emails win on purpose (the tag survives inside
    * the URL tag's place). */
  private[operators] val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[operators] val urlRe = "https?://[^ ]+"
  private[operators] val numRe = "[0-9]{6,}"

  def scrub(c: Column): Column = {
    val noEmail = regexp_replace(c, emailRe, "<EMAIL>")
    val noUrl = regexp_replace(noEmail, urlRe, "<URL>")
    regexp_replace(noUrl, numRe, "<NUM>")
  }

  /** Canonical text form for dedup keys and token counts: Unicode NFC
    * (composed "é" == e + combining acute — the native codegen'd
    * `nfc_normalize` kernel; Spark has no built-in), lowercased,
    * whitespace runs collapsed to single spaces, trimmed. Two crawls of
    * the same page that differ only in encoding form or spacing now hash
    * identically — run BEFORE [[graft.operators.Dedup]] keys. Per-row,
    * zero shuffles. DuckDB twin: `trim(regexp_replace(lower(
    * nfc_normalize(x)), '\s+', ' ', 'g'))`. */
  def normalizeText(c: Column): Column = {
    val nfc = call_function("nfc_normalize", c)
    trim(regexp_replace(lower(nfc), "\\s+", " "))
  }

  /** Corpus vocabulary: (token, df = documents containing it, rank by df
    * desc with token tie-break) filtered to `minDf <= df <= maxDf` — the
    * tokenizer-building / stopword-cutting view of a corpus. One
    * distinct-postings shuffle + one groupBy; the rank window sorts only
    * the (vocabulary-sized) df table. */
  def vocabulary(df: DataFrame, textCol: String, idCol: String,
      minDf: Int = 1, maxDf: Int = Int.MaxValue): DataFrame = {
    require(minDf >= 1 && maxDf >= minDf)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("df").desc, col("token"))
    df.select(col(idCol), explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
      .withColumn("rank", row_number().over(w))
  }

  /** All URL host names in the text (ASCII regex, engine-portable) — the
    * per-domain accounting step of web-corpus curation (domain mix,
    * per-domain caps via [[capPerGroup]], blocklists). Per-row only. */
  def extractDomains(c: Column): Column =
    regexp_extract_all(c, lit("https?://([a-z0-9.-]+)"), lit(1))

  /** Canonical URL form for web-corpus dedup — the same page fetched via
    * `HTTP://WWW.Site.com:80/a/?utm_source=x#frag` and
    * `http://site.com/a` must collapse to one key before exact dedup or
    * crawl-frontier accounting. Deterministic, engine-portable steps
    * (each a regex/array built-in both Spark and DuckDB evaluate
    * identically): lowercase scheme+host, strip `:80`/`:443`, strip a
    * leading `www.`, drop the fragment, drop trailing path slashes, drop
    * tracking params (`utm_*`, `fbclid`, `gclid`, `ref`), sort the
    * surviving query params. Pure per-row Column algebra — codegen'd,
    * zero shuffles; NOT a full RFC 3986 normalizer (percent-encoding
    * case and dot-segments are out of scope, documented). */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = regexp_replace(regexp_replace(hostport, ":(80|443)$", ""),
      "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val kept = filter(split(query, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("fbclid=") ||
        p.startsWith("gclid=") || p.startsWith("ref=") || p === ""))
    val q = array_join(array_sort(kept), "&")
    concat(scheme, lit("://"), host, path,
      when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) — the
    * standard hybrid-retrieval combiner (BM25 + dense ranks in RAG
    * stacks): fused(d) = Σ_lists scale div (k0 + rank_list(d)), in
    * integer arithmetic so every engine agrees digit-for-digit (the
    * float 1/(k+r) sum is order-dependent). Each input holds one ranked
    * list as (idCol, rankCol) with rank 1 = best; ids missing from a
    * list contribute nothing for it. Returns the top `k` of
    * (id, lists, rrf) by (rrf DESC, id).
    *
    * SCALE CONTRACT: a unionAll of the (already small, top-k-sized)
    * ranked lists, one groupBy id, and a TakeOrderedAndProject — cost ∝
    * Σ list sizes, never the corpus; the corpus-sized work lives in the
    * upstream rankers. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, k0: Int = 60, scale: Long = 1000000L): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 1 && k0 >= 0)
    require(scale >= 1 && scale <= 1000000000000L)
    val tagged = rankings.map(_.select(col(idCol).cast("long").as("id"),
      col(rankCol).cast("long").as("rank")))
    tagged.reduce(_ unionAll _)
      .groupBy("id")
      .agg(count(lit(1)).as("lists"),
        sum(expr(s"${scale}L div (${k0}L + rank)")).as("rrf"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
  }

  private def hexVal(c: Column): Column = instr(lit("0123456789abcdef"), c) - 1

  /** Deterministic 0..99 bucket from the id's md5 (first two hex chars) —
    * the engine-portable hash for splits/sampling: identical in any engine
    * with md5, unlike xxhash/rand. */
  def hashBucket100(idCol: Column): Column = {
    val h = md5(idCol.cast("string"))
    (hexVal(substring(h, 1, 1)) * 16 + hexVal(substring(h, 2, 1))) % 100
  }

  /** Deterministic train/val/test split: every row gets a `split` label
    * from its id's hash bucket, stable across runs/engines/partitionings —
    * the reproducible alternative to randomSplit for training data.
    * `weights` are integer percents summing to 100, assigned in order. */
  def deterministicSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame = {
    require(weights.map(_._2).sum == 100, "weights must sum to 100")
    require(weights.nonEmpty)
    val bucket = hashBucket100(col(idCol))
    val cums = weights.scanLeft(0)(_ + _._2).tail
    val split = weights.init.zip(cums).foldLeft(when(lit(false), lit(null: String))) {
      case (acc, ((name, _), cum)) => acc.when(bucket < cum, name)
    }.otherwise(weights.last._1)
    df.withColumn("split", split)
  }

  /** Deterministic 0..9999 bucket (first four md5 hex chars) — the finer
    * face of [[hashBucket100]] for basis-point sampling rates. */
  def hashBucket10000(idCol: Column): Column = {
    val h = md5(idCol.cast("string"))
    (hexVal(substring(h, 1, 1)) * 4096 + hexVal(substring(h, 2, 1)) * 256 +
      hexVal(substring(h, 3, 1)) * 16 + hexVal(substring(h, 4, 1))) % 10000
  }

  /** Deterministic source-weighted corpus mixture — the data-mixing step
    * of a pretraining pipeline (sample web at 8%, books at 100%, …):
    * keep each row iff its id's md5 bucket falls under its source's
    * sampling rate in basis points (0..10000 = 0..100%). Reproducible
    * across runs/engines/partitionings (no RNG state), and a pure
    * per-row filter — no shuffle, pushdown-eligible. Sources absent
    * from `ratesBps` default to `defaultBps`. Rates above 100% (true
    * oversampling) are out of scope: a row is emitted at most once —
    * replication belongs to the training loader, not the corpus. */
  def mixture(df: DataFrame, sourceCol: String, idCol: String,
      ratesBps: Map[String, Int], defaultBps: Int = 0): DataFrame = {
    require((ratesBps.values.toSeq :+ defaultBps).forall(r => r >= 0 && r <= 10000),
      "rates are basis points in [0, 10000]")
    val rate = ratesBps.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0))) {
        case (acc, (src, r)) => acc.when(col(sourceCol) === src, lit(r))
      }.otherwise(lit(defaultBps))
    df.filter(hashBucket10000(col(idCol)) < rate)
  }

  /** [[mixture]] steered by TOKEN budgets instead of rates — the form a
    * pretraining recipe actually states ("at most N tokens of web"):
    * each source's sampling rate is `min(10000, budget·10⁴ div total)`
    * basis points from its current token total, then the same
    * deterministic hash filter applies. Two passes: ONE aggregate for
    * per-source totals (collected — bounded by the source cardinality,
    * never rows), then the per-row filter. Hash sampling is uniform
    * over rows, so the sampled token mass meets the budget in
    * expectation (row-exact budget packing is [[packSequences]]' job);
    * sources at or under budget — and sources absent from `budgets` —
    * keep everything.
    *
    * SCALE CONTRACT: `sourceCol` must be LOW-cardinality (corpus names,
    * not domains/urls) — the totals aggregate is collected driver-side,
    * so distinct sources are capped at `maxSources` (default 100 000)
    * and the call fails loudly rather than OOM the driver on a
    * high-cardinality misuse. Null sources and null token sums are
    * dropped from the totals (a null source can carry no budget; its
    * rows fall through to the keep-everything default). */
  def mixtureToBudget(df: DataFrame, sourceCol: String, idCol: String,
      tokenCol: String, budgets: Map[String, Long],
      maxSources: Int = 100000): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    require(maxSources >= 1, "maxSources must be >= 1")
    val totalRows = df.groupBy(col(sourceCol).cast("string").as("src"))
      .agg(sum(col(tokenCol)).as("tot"))
      .limit(maxSources + 1)
      .collect()
    require(totalRows.length <= maxSources,
      s"mixtureToBudget: > $maxSources distinct values in '$sourceCol' — " +
        "pass a low-cardinality source column (the totals are collected driver-side)")
    val totals = totalRows.iterator
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = budgets.flatMap { case (src, budget) =>
      totals.get(src).map { tot =>
        // BigInt: budget * 10000 overflows Long for budgets > ~9.2e14
        src -> (if (tot <= 0) 10000
                else (BigInt(budget) * 10000 / tot).min(10000).toInt)
      }
    }
    mixture(df, sourceCol, idCol, rates, defaultBps = 10000)
  }

  /** Temperature-flattened group mixture — the multilingual α-sampling
    * recipe (XLM-R / mBERT: sample language l with probability ∝ n_l^α
    * so head languages stop drowning the tail), with the exponent FIXED
    * at α = 1/2: IEEE-754 sqrt is correctly rounded, so
    * `floor(sqrt(n))` is bit-identical in every engine, where a
    * `pow(n, 0.3)` is not — the engine-exactness trade this library
    * makes throughout. Each group's expected kept-row count is
    * `budgetRows · √n_g / Σ√n`, realized as a per-source basis-point
    * rate `min(10000, budgetRows·√n_g·10⁴ div (Σ√n·n_g))` through the
    * same deterministic md5-bucket filter as [[mixture]]. Groups larger
    * than their flattened share downsample; tail groups keep
    * (relatively) more — rates cap at 100%, a row is emitted at most
    * once.
    *
    * SCALE CONTRACT: [[mixtureToBudget]]'s — one aggregate collected
    * driver-side, bounded by `maxGroups` (group must be low-cardinality:
    * languages, sources); the filter itself is per-row, zero shuffles,
    * pushdown-eligible. Rate arithmetic runs in BigInt and caps before
    * the int conversion. */
  def temperatureMixture(df: DataFrame, groupCol: String, idCol: String,
      budgetRows: Long, maxGroups: Int = 100000): DataFrame = {
    require(budgetRows >= 0, "budgetRows must be >= 0")
    require(maxGroups >= 1, "maxGroups must be >= 1")
    val rows = df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"))
      .limit(maxGroups + 1)
      .collect()
    require(rows.length <= maxGroups,
      s"temperatureMixture: > $maxGroups distinct values in '$groupCol' — " +
        "pass a low-cardinality group column (the totals are collected driver-side)")
    val counts = rows.iterator.filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = counts.map { case (g, n) =>
      g -> math.floor(math.sqrt(n.toDouble)).toLong
    }
    val sumW = w.values.sum
    val rates = counts.map { case (g, n) =>
      g -> (if (n <= 0 || sumW <= 0) 0
            else (BigInt(budgetRows) * w(g) * 10000 / (BigInt(sumW) * n))
              .min(10000).toInt)
    }
    mixture(df, groupCol, idCol, rates, defaultBps = 0)
  }

  /** Lexical-diversity metrics per corpus slice — the distinct-n view
    * behind "is this source templated?": per group, document/token
    * totals, corpus-level distinct unigram and bigram counts, and the
    * distinct-n ratios in ppm (`distinct · 10⁶ div occurrences` —
    * Li et al. 2016's distinct-1/distinct-2, integer-exact). Boilerplate
    * farms and n-gram loops crater distinct-2 long before quality
    * heuristics notice. Bigrams are position-level strings (`w₁ w₂`), so
    * the oracle replays them verbatim.
    *
    * Scale shape: one explode feeds two partial-aggregated groupBys
    * (token level and distinct level) on the group key; output
    * cardinality = group count. Nothing driver-side. */
  def diversityMetrics(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), tokens(col(textCol)).as("w"))
    val uni = base.select(col("grp"), explode(col("w")).as("tok"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("distinct_unigrams"))
    val bi = base.filter(size(col("w")) >= 2)
      .select(col("grp"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1]))")).as("bg"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("bg")).as("distinct_bigrams"))
    val docs = base.groupBy("grp").agg(count(lit(1)).as("n_docs"))
    docs.join(uni, Seq("grp"), "left").join(bi, Seq("grp"), "left")
      .na.fill(0L, Seq("n_tokens", "distinct_unigrams", "n_bigrams", "distinct_bigrams"))
      .select(col("grp"), col("n_docs"), col("n_tokens"),
        col("distinct_unigrams"), col("n_bigrams"), col("distinct_bigrams"),
        expr("(distinct_unigrams * 1000000L) div greatest(n_tokens, 1L)").as("d1_ppm"),
        expr("(distinct_bigrams * 1000000L) div greatest(n_bigrams, 1L)").as("d2_ppm"))
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
    * the MOSS algorithm): hash every `k`-token gram, slide a `window` of
    * consecutive gram hashes, keep each window's MINIMUM — the guarantee
    * is that any shared run of `window + k − 1` tokens between two
    * documents shares at least one selected fingerprint, at a fixed
    * ~2/(window+1) sampling density (neither the every-gram blowup of
    * [[Dedup.sharedWindowPairs]] nor [[fingerprint]]'s single global
    * min). Hashes are the 52-bit md5-prefix integers the sketch family
    * uses, so any engine replays them digit-for-digit. Returns the
    * exploded distinct fingerprint relation (id, fp) — feed it to the
    * banded-pair shape or a contamination join.
    *
    * Scale shape: entirely per-row Column algebra (transform/slice over
    * the token array; grams and windows bounded by tokens-per-doc), then
    * one explode — zero shuffles in the operator itself. */
  def winnowingFingerprints(df: DataFrame, textCol: String, idCol: String,
      k: Int = 4, window: Int = 4): DataFrame = {
    require(k >= 1 && k <= 64, s"k out of range: $k")
    require(window >= 1 && window <= 256, s"window out of range: $window")
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
      .withColumn("hs", expr(
        s"""transform(sequence(1, greatest(size(w) - ${k - 1}, 1)),
           |  i -> cast(conv(substring(md5(concat_ws(' ', slice(w, i, $k))), 1, 13), 16, 10) as bigint))""".stripMargin))
      .withColumn("fp", explode(expr(
        s"""array_distinct(transform(sequence(1, greatest(size(hs) - ${window - 1}, 1)),
           |  j -> array_min(slice(hs, j, $window))))""".stripMargin)))
      .select("id", "fp").distinct()
  }

  /** Class-balanced cap: keep at most `cap` rows per group, chosen by the
    * deterministic md5-of-id order (not arrival order — stable under any
    * partitioning). The majority-class downsampling step of a balanced
    * training set; one window shuffle on the group key. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, cap: Int): DataFrame = {
    require(cap >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Distinct `n`-token shingles of the token array, each joined with a
    * single space — the gram unit for contamination checks and n-gram
    * dedup. Documents shorter than `n` shingle what they have (slice
    * truncates), matching [[fingerprint]]'s window semantics. Per-row. */
  def shingles(c: Column, n: Int): Column = {
    require(n >= 1)
    val tk = tokens(c)
    array_distinct(transform(
      sequence(lit(1), greatest(size(tk) - (n - 1), lit(1))),
      i => array_join(slice(tk, i, lit(n)), " ")))
  }

  /** Gopher-style repetition / quality signals, entirely per-row (zero
    * shuffles — every signal is a function of the document's own token
    * array): token count, duplicate-token fraction, adjacent-repeat
    * fraction ("the the"), and the fraction of bigram occurrences taken by
    * the single most frequent bigram (boilerplate/loop detector). The
    * top-bigram count is O(distinct-bigrams x bigrams) per row — bounded
    * by document length, not corpus size. */
  def repetitionScores(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    df.withColumn("tk", tk)
      .withColumn("n", size(col("tk")))
      .withColumn("bg", when(col("n") >= 2, transform(
        sequence(lit(1), greatest(col("n") - 1, lit(1))),
        i => array_join(slice(col("tk"), i, lit(2)), " ")))
        .otherwise(array().cast("array<string>")))
      .withColumn("adj", when(col("n") >= 2, size(filter(
        sequence(lit(1), greatest(col("n") - 1, lit(1))),
        i => element_at(col("tk"), i) === element_at(col("tk"), i + 1))))
        .otherwise(0))
      .withColumn("top_bg", when(col("n") >= 2, array_max(transform(
        array_distinct(col("bg")),
        x => size(filter(col("bg"), y => y === x))))).otherwise(0))
      .select(col(idCol), col("n").as("n_tokens"),
        ((col("n") - size(array_distinct(col("tk")))).cast("double") / col("n"))
          .as("dup_token_frac"),
        when(col("n") >= 2, col("adj").cast("double") / (col("n") - 1))
          .otherwise(0.0).as("adj_dup_frac"),
        when(col("n") >= 2, col("top_bg").cast("double") / (col("n") - 1))
          .otherwise(0.0).as("top_bigram_frac"))
  }

  /** Contiguous sequence packing: assign each document a training-shard
    * bin so every bin holds ~`budget` tokens — the packing step before
    * writing fixed-size training sequences. Documents are laid out in
    * deterministic `orderCol` order within each `partCol` partition and a
    * running token total assigns `bin = floor(prefix_sum_before / budget)`
    * (documents may straddle a boundary, as real sequence packing does
    * with its EOD-concatenated token stream).
    *
    * Scale shape: one window shuffle on the partition column — packing is
    * inherently sequential, so the sequential unit is the PARTITION
    * (source/shard), never the whole corpus: each partition's prefix sum
    * sorts only its own rows. Emits (partCol, orderCol, n_tokens, bin). */
  def packSequences(df: DataFrame, partCol: String, orderCol: String,
      textCol: String, budget: Int): DataFrame = {
    require(budget >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCol).orderBy(orderCol)
    df.select(col(partCol), col(orderCol),
        size(tokens(col(textCol))).as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens").cast("long")).over(w) - col("n_tokens"), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $budget")) // integer div, not double
      .drop("cum_before")
  }

  /** Rolling-window document fingerprint (winnowing-style): the
    * lexicographic MIN of the md5 of every `window` consecutive tokens —
    * one stable id per document that survives local edits outside the
    * minimizing window. md5-over-joined-tokens (not xxhash) so the result
    * is reproducible in any engine (the oracle-stability rule the minhash
    * path also follows); documents shorter than `window` hash what they
    * have. Per-row only. */
  def fingerprint(df: DataFrame, textCol: String, idCol: String,
      window: Int = 3): DataFrame = {
    require(window >= 1, "window >= 1")
    val tk = tokens(col(textCol))
    val windowHashes = transform(
      sequence(lit(1), greatest(size(tk) - (window - 1), lit(1))),
      j => md5(array_join(slice(tk, j, lit(window)), " ")))
    df.select(col(idCol), array_min(windowHashes).as("fingerprint"))
  }

  /** RAG-style overlapping token-window chunking: each document becomes
    * chunks of `window` tokens starting at 0, stride, 2·stride, … while
    * the start is inside the document, so every token is covered and
    * consecutive chunks overlap by `window − stride` tokens (the standard
    * retrieval-chunking shape). Output: (id, chunk_id, start, n_tokens,
    * chunk_text); every document yields ≥ 1 chunk.
    *
    * SCALE CONTRACT: pure per-row Column algebra (sequence + posexplode +
    * slice), zero shuffles, codegen'd end to end; fan-out per row is
    * ⌈dl/stride⌉, bounded by the document's own token count. */
  def chunk(df: DataFrame, textCol: String, idCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, "window >= 1")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window]: $stride")
    val tk = tokens(col(textCol))
    df.select(col(idCol), tk.as("tk"), size(tk).as("dl"))
      .select(col(idCol), col("tk"), col("dl"),
        posexplode(sequence(lit(0),
          expr(s"((dl - 1) div $stride) * $stride").cast("int"),
          lit(stride))))
      .select(col(idCol), col("pos").as("chunk_id"), col("col").as("start"),
        least(lit(window), col("dl") - col("col")).as("n_tokens"),
        array_join(slice(col("tk"), col("col") + 1, lit(window)), " ")
          .as("chunk_text"))
  }

  /** BM25 top-k retrieval in pure 64-bit integer arithmetic — the same
    * determinism discipline as [[graft.operators.Similarity]]'s integer
    * IDF: no `ln`, no doubles, so the scores are bit-identical in any
    * engine. The classic k1 = 1.2, b = 0.75 saturation
    *
    *   tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * is cleared of fractions by multiplying through by 10·avgdl10
    * (avgdl quantized to tenth-tokens: `avgdl10 = (Σdl·10) div N`):
    *
    *   tfterm = (22·tf·avgdl10·scaleT) div (10·tf·avgdl10 + 3·avgdl10 + 90·dl)
    *   score  = Σ_t ((N·scaleI) div df(t)) · tfterm(t, d)
    *
    * idf is the repo's integer surrogate `(N·scaleI) div df` — the same
    * monotone-in-1/df shape as log-IDF with rare terms dominating.
    *
    * SCALE CONTRACT: one tokenize scan feeds a partial-aggregated
    * (doc, term) tf table; document frequencies collapse to |Q| rows and
    * rejoin broadcast, as do the two corpus scalars (N, Σdl); the final
    * ORDER BY + LIMIT is a TakeOrderedAndProject (per-partition heaps,
    * never a full sort). Magnitudes: tfterm ≤ 2.2·scaleT and
    * idf ≤ N·scaleI, so keep N·scaleI·2.2·scaleT < 2⁶³ — at web scale
    * (N ~ 1e10) drop scaleI to 1e3. Defaults are sized for corpora to
    * ~1e9 docs. */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k: Int,
      scaleT: Long = 1000000L, scaleI: Long = 1000000L): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, "k >= 1")
    val tk = tokens(col(textCol))
    val docToks = df.select(col(idCol).as("doc"),
      size(tk).cast("long").as("dl"), explode(tk).as("tok"))
    val stats = broadcast(df.select(size(tk).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), sum("dl").as("tot"))
      .select(col("n"), expr("(tot * 10) div n").as("avgdl10")))
    val hits = docToks.filter(col("tok").isin(queryTerms: _*))
    val tf = hits.groupBy("doc", "tok")
      .agg(count(lit(1)).as("tf"), first("dl").as("dl"))
    val dft = hits.select("doc", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dft), "tok").crossJoin(stats)
      .select(col("doc"),
        (expr(s"(n * ${scaleI}L) div df") *
          expr(s"(22 * tf * avgdl10 * ${scaleT}L) div " +
            "(10 * tf * avgdl10 + 3 * avgdl10 + 90 * dl)")).as("s"))
      .groupBy("doc").agg(sum("s").as("bm25"))
      .orderBy(col("bm25").desc, col("doc"))
      .limit(k)
  }

  /** Retrieval evaluation metrics — precision@k, recall@k and MRR per
    * query, all in integer ppm (nDCG's log₂ is deliberately out: not
    * engine-exact). `runs` is a ranked result list (query, doc, rank);
    * `qrels` the relevance judgments (query, doc). One row per JUDGED
    * query: (query_id, n_rel, hits, prec_ppm, recall_ppm, mrr_ppm) —
    * queries whose top-k found nothing relevant score zeros, so eval
    * accounting stays total. `mrr_ppm = scale div rank-of-first-relevant`
    * (0 when none in the top-k).
    *
    * Scale shape: one hash join of the (top-k-sized) run list against
    * the judgments on (query, doc), one per-query aggregation, and a
    * shuffle-hash rejoin against the per-query judgment counts — cost
    * ∝ list sizes, never corpus. */
  def retrievalMetrics(runs: DataFrame, qrels: DataFrame, queryCol: String,
      docCol: String, rankCol: String, k: Int,
      scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    require(scale >= 1 && scale <= 1000000000L, s"scale out of range: $scale")
    val r = runs.select(col(queryCol).as("query_id"), col(docCol).as("doc"),
        col(rankCol).cast("long").as("rank"))
      .filter(col("rank") <= k)
    val q = qrels.select(col(queryCol).as("query_id"), col(docCol).as("doc"))
      .distinct()
    val nrel = q.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val hits = r.join(q, Seq("query_id", "doc"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("hits"), min("rank").as("first_rel"))
    nrel.join(hits.hint("shuffle_hash"), Seq("query_id"), "left")
      .na.fill(0L, Seq("hits"))
      .select(col("query_id"), col("n_rel"), col("hits"),
        expr(s"(hits * ${scale}L) div ${k}L").as("prec_ppm"),
        expr(s"(hits * ${scale}L) div greatest(n_rel, 1L)").as("recall_ppm"),
        coalesce(expr(s"${scale}L div first_rel"), lit(0L)).as("mrr_ppm"))
  }

  /** PMI-style collocation mining — the statistically-surprising word
    * pairs within a `window`-token neighbourhood (Church & Hanks 1990's
    * association ratio), in the engine-exact integer surrogate
    * `pmi_ppm = c(x,y)·N·scale div (c(x)·c(y))` (the true PMI's log is
    * monotone in this ratio, so rankings agree; > scale means the pair
    * co-occurs more than independence predicts). Pairs are unordered
    * (x < y), self-pairs excluded, and only pairs seen ≥ `minCount`
    * times rank. Returns the top `k` by (pmi_ppm, x, y).
    *
    * Scale shape: the pair explode emits ≤ window rows per token
    * position (cost ∝ corpus tokens × window, linear); unigram counts
    * rejoin via shuffle-hash (vocabulary-sized, never broadcast); the
    * final top-k is a TakeOrderedAndProject. Overflow bound:
    * `cxy·N·scale < 2⁶³` — at ppm scale that holds while
    * `cxy·N < 9·10¹²`; for web-scale corpora drop `scale` to 10³. */
  def collocations(df: DataFrame, textCol: String, window: Int = 3,
      minCount: Long = 5L, k: Int = 50, scale: Long = 1000000L): DataFrame = {
    require(window >= 1 && window <= 16, s"window out of range: $window")
    require(minCount >= 1 && k >= 1, "minCount and k must be >= 1")
    val base = df.select(tokens(col(textCol)).as("w"))
    // sequence(a, b) descends when a > b — the size >= 2 filter keeps the
    // outer bound non-negative
    val pairsDf = base.filter(size(col("w")) >= 2)
      .select(explode(expr(
        s"""flatten(transform(sequence(0, size(w) - 2), i ->
           |  transform(sequence(1, least($window, size(w) - 1 - i)), o ->
           |    struct(least(w[i], w[i+o]) AS x, greatest(w[i], w[i+o]) AS y))))""".stripMargin)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .filter(col("x") < col("y"))
    val cxy = pairsDf.groupBy("x", "y").agg(count(lit(1)).as("cxy"))
    val uni = base.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("ct"))
    val nTot = broadcast(base.select(size(col("w")).cast("long").as("s"))
      .agg(sum("s").as("ntok")))
    cxy.filter(col("cxy") >= minCount)
      .join(uni.select(col("t").as("x"), col("ct").as("cx")).hint("shuffle_hash"), "x")
      .join(uni.select(col("t").as("y"), col("ct").as("cy")).hint("shuffle_hash"), "y")
      .crossJoin(nTot)
      .select(col("x"), col("y"), col("cxy"),
        expr(s"(cxy * ntok * ${scale}L) div (cx * cy)").as("pmi_ppm"))
      .orderBy(col("pmi_ppm").desc, col("x"), col("y"))
      .limit(k)
  }

  /** Cross-document line-level dedup — the RefinedWeb/CCNet "remove
    * repeated lines" pass: any exact line appearing in at least `minDf`
    * DISTINCT documents (nav bars, cookie banners, boilerplate footers)
    * is stripped from every document; the per-document remainder is
    * reassembled in original line order. Returns one row per input doc:
    * (id, text, n_kept, n_removed) — docs whose every line is boilerplate
    * survive with empty text, so corpus accounting stays total.
    *
    * Line identity for the frequency table is `xxhash64(line)` — the
    * document-frequency aggregation and its rejoin shuffle 8-byte keys,
    * not line strings (a 64-bit collision could at worst strip one extra
    * line; the standard trade every hash-keyed dedup here makes). The
    * line text itself is shuffled exactly once, carried alongside its
    * hash into the final per-document regroup.
    *
    * SCALE CONTRACT: one distinct-postings shuffle on the line hash (the
    * [[ngramNovelty]] df shape), one hash rejoin, one groupBy(id)
    * reassembly whose payload is the document itself — nothing quadratic,
    * no driver structures. */
  def dedupLines(df: DataFrame, textCol: String, idCol: String,
      minDf: Long): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val lines = df.select(col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("h", xxhash64(col("line")))
    val dfTab = lines.select("h", "id").distinct()
      .groupBy("h").agg(count(lit(1)).as("line_df"))
    lines.join(dfTab.hint("shuffle_hash"), "h")
      .groupBy("id")
      .agg(
        array_join(transform(array_sort(collect_list(
          when(col("line_df") < minDf, struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("text"),
        count(when(col("line_df") < minDf, 1)).as("n_kept"),
        count(when(col("line_df") >= minDf, 1)).as("n_removed"))
  }

  /** Corpus-trained bigram language-model scoring — the CCNet-style
    * perplexity-bucket quality filter in engine-exact integer form: the
    * corpus itself trains bigram counts, and each document scores the
    * MEAN scaled conditional probability of its token transitions,
    *   s(w₁w₂) = c(w₁w₂)·scale div c(w₁·),   lm_score = Σs div n_bigrams
    * (occurrence-level, so a repeated transition counts every time).
    * High scores = text whose transitions look like the corpus;
    * gibberish, shuffled text, and boilerplate-free outliers sink.
    * ln()-free on purpose: real perplexity is not reproducible across
    * engines digit-for-digit, this surrogate is (same monotone ordering
    * for single-transition comparisons). Returns (id, n_bigrams,
    * lm_score); docs under 2 tokens score with n_bigrams 0 / null.
    *
    * Scale shape: one explode builds the occurrence-level bigram
    * relation; the count tables aggregate on (w₁,w₂) and w₁ and rejoin
    * via shuffle-hash (the bigram vocabulary is corpus-sized — never
    * broadcast); the final per-doc aggregation keys on id. Nothing
    * quadratic, nothing driver-side. */
  def lmScore(df: DataFrame, textCol: String, idCol: String,
      scale: Long = 1000000L): DataFrame = {
    require(scale >= 1 && scale <= 1000000000000L, s"scale out of range: $scale")
    val base = df.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
    val bg = base.filter(size(col("w")) >= 2)
      .select(col("id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i+1] AS w2))")).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val scored = bg
      .join(c12.hint("shuffle_hash"), Seq("w1", "w2"))
      .join(c1.hint("shuffle_hash"), Seq("w1"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr(s"(c12 * ${scale}L) div c1")).as("__s"))
      .select(col("id"), col("n_bigrams"),
        expr("__s div n_bigrams").as("lm_score"))
    base.select("id").join(scored.hint("shuffle_hash"), Seq("id"), "left")
      .na.fill(0L, Seq("n_bigrams"))
  }

  /** Unigram-distribution divergence between two corpus slices — the
    * "did the vocabulary move" monitor (new crawl vs old, train vs eval,
    * this week's ingest vs last): per-token occurrence shares on each
    * side in ppm, the absolute share gap, and the global total-variation
    * distance `tvd_ppm = Σ|pa − pb| div 2` stamped on every row — all
    * integer, engine-exact (TVD needs no ln(), unlike KL/JS — same
    * moved-mass reading, reproducible digit-for-digit). Returns the
    * `topK` most-divergent tokens: (token, n_a, n_b, pa_ppm, pb_ppm,
    * gap_ppm, tvd_ppm). Tokens absent from a side count zero there.
    *
    * Scale shape: one tokenize+count aggregation per side (vocabulary-
    * sized outputs), a full-outer hash join of the two count tables, a
    * one-row global aggregate broadcast back, and a TakeOrdered top-k —
    * raw text is scanned once per side, nothing quadratic. Overflow:
    * gap_ppm ≤ scale, so Σgap needs vocab·scale < 2⁶³ — any real
    * vocabulary at ppm scale. */
  def unigramDivergence(a: DataFrame, b: DataFrame, textCol: String,
      topK: Int = 50, scale: Long = 1000000L): DataFrame = {
    require(topK >= 1 && topK <= 100000, s"topK out of range: $topK")
    require(scale >= 1 && scale <= 1000000000L, s"scale out of range: $scale")
    def counts(df: DataFrame, tag: String) =
      df.select(explode(tokens(col(textCol))).as("token"))
        .groupBy("token").agg(count(lit(1)).as(s"n_$tag"))
    val joined = counts(a, "a").join(counts(b, "b"), Seq("token"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val tot = broadcast(joined.agg(
      sum("n_a").as("ta"), sum("n_b").as("tb")))
    val shares = joined.crossJoin(tot)
      .select(col("token"), col("n_a"), col("n_b"),
        expr(s"(n_a * ${scale}L) div greatest(1L, ta)").as("pa_ppm"),
        expr(s"(n_b * ${scale}L) div greatest(1L, tb)").as("pb_ppm"))
      .withColumn("gap_ppm", expr("abs(pa_ppm - pb_ppm)"))
    val tvd = broadcast(shares.agg(
      expr("sum(gap_ppm) div 2").as("tvd_ppm")))
    shares.crossJoin(tvd)
      .orderBy(col("gap_ppm").desc, col("token"))
      .limit(topK)
  }

  /** BPE merge-candidate mining — the distributed inner step of
    * byte-pair-encoding tokenizer training (Sennrich et al. 2016): count
    * every adjacent symbol pair inside every word across the corpus and
    * rank the merge candidates. At character level this is round one of
    * training verbatim; the same counting shape repeats per merge round
    * with re-segmented words. Returns the `topK` pairs with `cnt >=
    * minCount`: (pair, cnt, rank), rank dense in (cnt desc, pair) order
    * so the result is deterministic under ties.
    *
    * Scale shape: one scan explodes words then their length−1 adjacent
    * pairs (fan-out ∝ corpus characters, the same order as reading the
    * text), one partial-aggregated count groupBy on the pair key
    * (alphabet²-bounded output), TakeOrdered top-k — no joins, nothing
    * driver-side. */
  def bpePairs(df: DataFrame, textCol: String, topK: Int = 50,
      minCount: Long = 1L): DataFrame = {
    require(topK >= 1 && topK <= 100000, s"topK out of range: $topK")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    df.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("pair"))))
      .filter(col("rank") <= topK)
  }

  /** BPE merge application — the tokenize half of the [[bpePairs]]
    * story (mine merges → apply merges = a working round-1 tokenizer):
    * text explodes to space-separated characters (the original word gap
    * widens to 3+ spaces, so no merge can cross a word boundary), then
    * each 2-character merge pair `xy` rewrites every ` x y ` run to
    * ` xy ` via LITERAL (non-regex) replace — left-to-right,
    * non-overlapping, identical in the JVM and DuckDB. A single
    * non-overlapping pass skips every OTHER pair of an `xxxx` run (the
    * match consumes the shared trailing space), so each merge applies
    * THREE passes — exact for runs of up to ~2³ repeats, the practical
    * ceiling in prose; the residual is a documented approximation, not
    * an engine divergence (the oracle replays the identical passes).
    * Merges apply in the given order (rank order from [[bpePairs]] —
    * the GPT-2-style round-1 batch; later rounds would re-mine over the
    * merged symbols). Returns (id, syms = the symbol array after
    * merging).
    *
    * Scale shape: pure per-row string algebra — zero shuffles; the
    * merge list is a bounded driver-side constant folded into the
    * projection. */
  def bpeApplyMerges(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[String]): DataFrame = {
    require(merges.nonEmpty && merges.size <= 100, "1..100 merges")
    merges.foreach(m => require(m.length == 2,
      s"round-1 merges are 2-char pairs, got '$m'"))
    val spaced = concat(lit(" "),
      regexp_replace(col(textCol), "(.)", "$1 "))
    val merged = merges.foldLeft(spaced) { (acc, m) =>
      val from = s" ${m.charAt(0)} ${m.charAt(1)} "
      val to = s" $m "
      (1 to 3).foldLeft(acc)((a, _) =>
        call_function("replace", a, lit(from), lit(to)))
    }
    df.select(col(idCol).cast("long").as("id"),
      filter(split(trim(regexp_replace(merged, " +", " ")), " "),
        s => length(s) > 0).as("syms"))
  }

  /** Integer-scaled Flesch reading-ease — the readability gate of a
    * curation mix (too-hard legalese and too-easy spam both score out):
    * per document, word count (space-delimited runs), sentence count
    * ([.!?]+ runs, floored at 1), and a vowel-group syllable
    * approximation ([aeiouyAEIOUY]+ runs, floored at the word count —
    * every word has at least one syllable), folded into the Flesch
    * formula in milli-units with integer division:
    *   score_milli = 206835 − (1015·words) div sentences
    *                        − (84600·syllables) div words.
    * The 206.835/1.015/84.6 coefficients are the published constants
    * ×1000. `band` buckets the score the way a curation rule would:
    * ≥ 70000 "easy", ≥ 30000 "standard", else "hard". Zero-word
    * documents are dropped (no denominator). All regex is simple
    * character classes — Java and RE2 agree.
    *
    * Scale shape: per-row regex counting only — zero shuffles; the
    * plan is one projection over the corpus scan. */
  def readability(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
        size(expr(s"regexp_extract_all($textCol, '[^ ]+', 0)")).cast("long")
          .as("words"),
        greatest(lit(1L),
          size(expr(s"regexp_extract_all($textCol, '[.!?]+', 0)")).cast("long"))
          .as("sentences"),
        size(expr(s"regexp_extract_all($textCol, '[aeiouyAEIOUY]+', 0)"))
          .cast("long").as("vg"))
      .filter(col("words") > 0)
      .withColumn("syllables", greatest(col("words"), col("vg")))
      .withColumn("score_milli", expr(
        "206835L - (1015L * words) div sentences - (84600L * syllables) div words"))
      .withColumn("band", when(col("score_milli") >= 70000L, "easy")
        .when(col("score_milli") >= 30000L, "standard").otherwise("hard"))
      .drop("vg")

  /** Compliance-marker audit per source — which slices carry contact
    * info, license/copyright marks, or live URLs (the release-review
    * scan that runs BEFORE [[scrub]] rewrites anything): per group, the
    * number of documents containing each marker class, via simple
    * case-insensitive regexes Java and RE2 evaluate identically.
    * Returns (grp, n_docs, with_email, with_url, with_copyright,
    * with_rights).
    *
    * Scale shape: per-row rlike flags folded into ONE group
    * aggregation — adding a marker class adds a column, not a scan. */
  def complianceMarkers(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    def flag(re: String) =
      sum(when(col(textCol).rlike(re), 1L).otherwise(0L))
    df.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n_docs"),
        flag("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}")
          .as("with_email"),
        flag("https?://").as("with_url"),
        flag("(?i)copyright|\\(c\\) [0-9]{4}").as("with_copyright"),
        flag("(?i)all rights reserved").as("with_rights"))
  }

  /** Vocabulary tail statistics per group — the OOV-risk and
    * templating read on each source/language slice: vocabulary size,
    * token total, hapax legomena (types occurring exactly once — a high
    * hapax share means open vocabulary, typos, or OCR noise; a LOW one
    * means templated text), and the mass of the single heaviest type.
    * Returns per group: (grp, vocab, tokens, hapax,
    * hapax_ppm = hapax·10⁶ div vocab, top_mass_ppm = max(count)·10⁶
    * div tokens).
    *
    * Scale shape: one token explode → (group, token) partial-agg
    * counts, then a group-key re-agg of the count table. Output is
    * O(groups). */
  def vocabTail(df: DataFrame, textCol: String,
      groupCol: String): DataFrame =
    df.select(col(groupCol).cast("string").as("grp"),
        explode(split(col(textCol), " ")).as("token"))
      .groupBy("grp", "token").agg(count(lit(1)).as("c"))
      .groupBy("grp")
      .agg(count(lit(1)).as("vocab"), sum("c").as("tokens"),
        coalesce(sum(when(col("c") === 1, 1L)), lit(0L)).as("hapax"),
        max("c").as("top_c"))
      .select(col("grp"), col("vocab"), col("tokens"), col("hapax"),
        expr("(hapax * 1000000L) div vocab").as("hapax_ppm"),
        expr("(top_c * 1000000L) div tokens").as("top_mass_ppm"))

  /** Cross-slice shingle reuse — how much of each corpus slice is
    * RECYCLED text (the "is today's crawl just yesterday again" read
    * that decides whether to keep crawling a source): documents bucket
    * into `nBuckets` id-range slices (the [[graft.operators.Quality.heapsGrowth]]
    * bucketing); each document contributes its DISTINCT n-token
    * shingles, and an occurrence counts as reused when its shingle first
    * appeared in an EARLIER bucket. Returns per bucket:
    * (bucket, n_occs, reused_occs, reuse_ppm). Complements Heaps growth:
    * that counts novel TYPES, this weighs recycled VOLUME.
    *
    * Scale shape: one shingle explode → per-doc distinct, evaluated
    * EXACTLY ONCE: occurrences pre-aggregate to (shingle, bucket) →
    * count with map-side combine, then one groupBy on the shingle key
    * folds each shingle's ≤ nBuckets rows into min(bucket) + a
    * bounded-by-construction per-bucket list that unrolls in place — no
    * first-bucket self-join, no second scan of the explode (the joined
    * form re-evaluated it and measured ~2× slower), and never a min
    * window PARTITIONED BY the corpus-sized shingle key (sorts millions
    * of one-row partitions, measured ~5× slower). Final agg is nBuckets
    * rows. */
  def shingleReuse(df: DataFrame, textCol: String, idCol: String,
      n: Int = 8, nBuckets: Int = 10): DataFrame = {
    require(n >= 1 && nBuckets >= 2 && nBuckets <= 10000)
    graft.functions.TextHashes.register(df.sparkSession)
    val bounds = broadcast(df.agg(
      min(col(idCol).cast("long")).as("lo"),
      max(col(idCol).cast("long")).as("hi")))
    // r11 opt: native distinct window hashing (see ngram_hashes scaladoc)
    // — this transform/slice/concat_ws/xxhash64 chain was the query's
    // dominant per-row cost and ran interpreted; hashes are opaque
    // distinct keys here, so the chained-hash values change nothing.
    // Column API, not a SQL-string splice of textCol (r11 ADVICE).
    val wins = graft.functions.TextHashes.ngramHashesCol(df.sparkSession,
      split(col(textCol), " "), n, truncShort = false)
    val occ = df.select(col(idCol).cast("long").as("id"), wins.as("ws"))
      .crossJoin(bounds)
      .select(expr(s"((id - lo) * $nBuckets) div (hi - lo + 1)").as("bucket"),
        explode(col("ws")).as("sh"))
    val perBucket = occ.groupBy("sh", "bucket").agg(count(lit(1)).as("c"))
    perBucket.groupBy("sh")
      .agg(min("bucket").as("first_bucket"),
        collect_list(struct(col("bucket"), col("c"))).as("bl"))
      .select(col("first_bucket"), explode(col("bl")).as("b"))
      .groupBy(col("b.bucket").as("bucket"))
      .agg(sum("b.c").as("n_occs"),
        coalesce(sum(when(col("first_bucket") < col("b.bucket"), col("b.c"))),
          lit(0L)).as("reused_occs"))
      .select(col("bucket"), col("n_occs"), col("reused_occs"),
        expr("(reused_occs * 1000000L) div greatest(1L, n_occs)")
          .as("reuse_ppm"))
  }

  /** Inverted-index construction — the (token → postings) relation a
    * retrieval system actually materializes, as data: per token with
    * document frequency ≥ `minDf`, the df, the total occurrence count,
    * and a bounded posting SAMPLE (the `sampleK` lowest doc ids,
    * comma-joined ascending — a string so any engine compares it
    * byte-for-byte). The full posting lists stay distributed; the
    * sample is the inspectable fingerprint.
    *
    * Scale shape: one token explode → (token, doc) partial-agg counts;
    * df/tf re-aggregate on the token key's own shuffle; the posting
    * sample is a rank-window top-k per token (never a full collect_list
    * of a hot token's postings — a stopword's list would be
    * corpus-sized). */
  def invertedIndex(df: DataFrame, textCol: String, idCol: String,
      minDf: Long = 2L, sampleK: Int = 20): DataFrame = {
    require(sampleK >= 1 && sampleK <= 1000, s"sampleK out of range: $sampleK")
    val posting = df.select(col(idCol).cast("long").as("id"),
        explode(split(col(textCol), " ")).as("token"))
      .groupBy("token", "id").agg(count(lit(1)).as("tf"))
    val stats = posting.groupBy("token")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"))
      .filter(col("df") >= minDf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("token").orderBy("id")
    val sample = posting
      .withColumn("r", row_number().over(w)).filter(col("r") <= sampleK)
      .groupBy("token")
      .agg(array_join(transform(sort_array(collect_list(col("id"))),
        _.cast("string")), ",").as("postings"))
    stats.join(sample, "token")
      .select("token", "df", "total_tf", "postings")
  }

  /** Per-document TF-IDF keyword extraction — the topical fingerprint
    * behind tagging, routing, and cheap topic clustering (T12 answers
    * "what characterizes a SOURCE"; this answers "what is THIS DOC
    * about"): tokens of length ≥ `minLen` score
    * `tf · nDocs · 1000 div df` (integer-rational IDF — no cross-engine
    * ln()), and each document keeps its `topK` by (score desc, token
    * asc). Returns (id, token, tf, df, score_scaled, rank).
    *
    * Scale shape: one token explode feeds BOTH the per-doc tf counts and
    * the df table (distinct postings on the token key); df rejoins the
    * tf relation via shuffle-hash (the vocabulary is corpus-sized —
    * never broadcast); the corpus-size scalar is a one-row broadcast;
    * the final rank window runs on the doc partitioning. */
  def keywordsPerDoc(df: DataFrame, textCol: String, idCol: String,
      topK: Int = 5, minLen: Int = 3): DataFrame = {
    require(topK >= 1 && topK <= 1000, s"topK out of range: $topK")
    require(minLen >= 1, "minLen >= 1")
    val toks = df.select(col(idCol).cast("long").as("id"),
        explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) >= minLen)
    val tf = toks.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = broadcast(df.agg(
      countDistinct(col(idCol).cast("long")).as("n_docs")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("score_scaled").desc, col("token"))
    tf.join(dfreq.hint("shuffle_hash"), "token")
      .crossJoin(nDocs)
      .withColumn("score_scaled", expr("(tf * n_docs * 1000L) div df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("id", "token", "tf", "df", "score_scaled", "rank")
  }

  /** Gopher-style filter funnel — the attrition report a corpus release
    * ships alongside the data (how many documents each quality rule
    * removed, applied IN ORDER): one row per stage
    * `(stage, rule, n_in, n_fail, n_out)` where stage i's input is the
    * survivor set of stages < i, so `n_out` of the last row is the
    * released corpus size. Rules (Rae et al. Gopher §A1.1 shapes, with
    * engine-portable arithmetic):
    *   1 `word_count`   — token count within [minWords, maxWords]
    *   2 `mean_word_len`— 100·(chars−(tokens−1)) div tokens in
    *                      [mwlLo, mwlHi] (×100 fixed point, floor div)
    *   3 `stopword`     — contains " the " or " a " as a whole token
    *   4 `max_chars`    — at most maxChars characters
    *
    * Scale shape: one projection computes every rule flag, one partial-
    * aggregated count pass folds the funnel (a new rule is one more agg
    * column), and the per-stage rows unroll from the single moment row
    * via `inline` — no second scan, no shuffle beyond the global agg. */
  def filterFunnel(df: DataFrame, textCol: String,
      minWords: Int = 20, maxWords: Int = 2000,
      mwlLo: Int = 400, mwlHi: Int = 500, maxChars: Int = 450): DataFrame = {
    val nt = size(tokens(col(textCol)))
    val mwl = expr(s"(100 * (length(${textCol}) - (size(split(${textCol}, ' ')) - 1)))" +
      s" div size(split(${textCol}, ' '))")
    val padded = concat(lit(" "), col(textCol), lit(" "))
    val flags = df.select(
      (nt >= minWords && nt <= maxWords).as("f1"),
      (mwl >= mwlLo && mwl <= mwlHi).as("f2"),
      (padded.contains(" the ") || padded.contains(" a ")).as("f3"),
      (length(col(textCol)) <= maxChars).as("f4"))
    def n(c: Column) = sum(when(c, 1L).otherwise(0L))
    val m = flags.agg(count(lit(1)).as("n0"),
      n(col("f1")).as("s1"),
      n(col("f1") && col("f2")).as("s2"),
      n(col("f1") && col("f2") && col("f3")).as("s3"),
      n(col("f1") && col("f2") && col("f3") && col("f4")).as("s4"))
    m.select(inline(array(
      struct(lit(1L).as("stage"), lit("word_count").as("rule"),
        col("n0").as("n_in"), (col("n0") - col("s1")).as("n_fail"),
        col("s1").as("n_out")),
      struct(lit(2L).as("stage"), lit("mean_word_len").as("rule"),
        col("s1").as("n_in"), (col("s1") - col("s2")).as("n_fail"),
        col("s2").as("n_out")),
      struct(lit(3L).as("stage"), lit("stopword").as("rule"),
        col("s2").as("n_in"), (col("s2") - col("s3")).as("n_fail"),
        col("s3").as("n_out")),
      struct(lit(4L).as("stage"), lit("max_chars").as("rule"),
        col("s3").as("n_in"), (col("s3") - col("s4")).as("n_fail"),
        col("s4").as("n_out")))))
  }

  /** OOV-rate audit — what share of each source's token stream falls
    * outside a fixed-size vocabulary (the tokenizer-coverage question:
    * a source with high OOV will fragment into bytes and train badly):
    * the vocabulary is the corpus's own top-`vocabSize` tokens by count
    * (count desc, token asc — deterministic), and the report is
    * per-source (grp, n_tokens, n_oov, oov_ppm).
    *
    * Scale shape: vocabulary selection is a TakeOrdered over the token
    * count table (never a global sort); the membership check is one
    * broadcast semi-join of the exploded stream against the ≤vocabSize
    * vocab. One corpus scan feeds both. */
  def oovRate(df: DataFrame, textCol: String, groupCol: String,
      vocabSize: Int = 500): DataFrame = {
    require(vocabSize >= 1, s"vocabSize out of range: $vocabSize")
    val toks = df.select(col(groupCol).as("grp"),
      explode(tokens(col(textCol))).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(vocabSize)
      .select("token")
    val flagged = toks.join(broadcast(vocab).withColumn("__in", lit(1L)),
        Seq("token"), "left_outer")
      .select(col("grp"), coalesce(col("__in"), lit(0L)).as("in_vocab"))
    flagged.groupBy("grp")
      .agg(count(lit(1)).as("n_tokens"),
        sum(lit(1L) - col("in_vocab")).as("n_oov"))
      .withColumn("oov_ppm", expr("(n_oov * 1000000L) div n_tokens"))
  }

  /** Span-corruption prep — the T5/FIM-style masking manifest (which
    * span of each document becomes the denoising target), with the span
    * chosen by hash so every engine, run, and shard masks the SAME
    * tokens: start = 1 + md5(id) mod (n − len + 1) (clamped for short
    * docs; the +1 makes every valid start reachable, so the final token
    * can end a full-length mask), span = the `maskLen` tokens from
    * there. Returns (id, n_tokens, mask_start, mask_len, span_text).
    *
    * Scale shape: pure per-row Column algebra — hash, slice, join; zero
    * shuffle. */
  def spanCorruption(df: DataFrame, textCol: String, idCol: String,
      maskLen: Int = 3): DataFrame = {
    require(maskLen >= 1, s"maskLen out of range: $maskLen")
    val toks = tokens(col(textCol))
    val n = size(toks).cast("long")
    val h = conv(substring(md5(concat(lit("sc_"),
      col(idCol).cast("string"))), 1, 13), 16, 10).cast("long")
    val start = lit(1L) + h % greatest(n - maskLen + 1L, lit(1L))
    val len = least(lit(maskLen.toLong), n - start + 1L)
    df.select(col(idCol).cast("long").as("id"), n.as("n_tokens"),
        start.as("mask_start"), len.as("mask_len"),
        concat_ws(" ", slice(toks, start.cast("int"), len.cast("int")))
          .as("span_text"))
  }

  /** Generic marker scan — the configurable cousin of
    * [[complianceMarkers]] (prompt-injection phrases, refusal strings,
    * policy markers — whatever this corpus's release review needs to
    * count): per (group, marker), documents matching the marker's regex
    * and the hit rate. Returns (grp, marker, n_docs, n_hits, hit_ppm),
    * long format so adding a marker never changes the schema.
    *
    * Scale shape: ONE projection evaluates every marker's rlike flag,
    * one group aggregation folds all counts, and the long format unrolls
    * from the group row via `inline` — markers add columns to the same
    * scan, not scans. */
  def markerScan(df: DataFrame, textCol: String, groupCol: String,
      markers: Seq[(String, String)]): DataFrame = {
    require(markers.nonEmpty, "markerScan needs at least one marker")
    val flags = df.select(col(groupCol).as("grp") +:
      markers.zipWithIndex.map { case ((_, re), i) =>
        when(col(textCol).rlike(re), 1L).otherwise(0L).as(s"__m$i") }: _*)
    val agg = flags.groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        markers.indices.map(i => sum(col(s"__m$i")).as(s"__s$i")): _*)
    agg.select(col("grp"), col("n_docs"), inline(array(
      markers.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("marker"), col(s"__s$i").as("n_hits"),
          expr(s"(__s$i * 1000000L) div n_docs").as("hit_ppm"))
      }: _*)))
      .select("grp", "marker", "n_docs", "n_hits", "hit_ppm")
  }

  /** Quality-sorted token-budget curve — how many tokens the corpus
    * yields as the quality bar drops (the data-constrained-scaling
    * question: "what does raising the cutoff cost?"): docs bucket by
    * integer type-token-ratio percent (the qd02 diversity signal), and
    * the curve accumulates docs/tokens from the BEST bucket down.
    * Returns (score_bucket, n_docs, tokens, cum_docs, cum_tokens),
    * descending buckets.
    *
    * Scale shape: per-row scoring + one ≤101-key groupBy; the
    * cumulative window runs over ≤101 bucket rows. No global sort of
    * documents — the bucket grid IS the sort. */
  def budgetCurve(df: DataFrame, textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    val bucketed = df.select(
        expr(s"(size(array_distinct(split($textCol, ' '))) * 100) div " +
          s"size(split($textCol, ' '))").as("score_bucket"),
        size(tk).cast("long").as("nt"))
      .groupBy("score_bucket")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_bucket").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    bucketed
      .withColumn("cum_docs", sum("n_docs").over(w))
      .withColumn("cum_tokens", sum("tokens").over(w))
  }

  /** Boilerplate-header detection — which shared opening lines dominate
    * a source (crawler banners, licence headers, template intros): per
    * group, the most common `k`-token document PREFIX and the share of
    * documents carrying it; a share near 1 means the source needs a
    * header-strip pass. Returns
    * (grp, n_docs, top_prefix, n_with_top, share_ppm).
    *
    * Scale shape: the prefix is per-row Column algebra; one (group,
    * prefix) count groupBy; the per-group argmax is a rank window over
    * the (group, distinct-prefix) table. */
  def headerBoilerplate(df: DataFrame, textCol: String, groupCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k out of range: $k")
    val pre = df.select(col(groupCol).as("grp"),
      concat_ws(" ", slice(tokens(col(textCol)), 1, k)).as("prefix"))
    val counts = pre.groupBy("grp", "prefix").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(col("c").desc, col("prefix"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    counts
      .withColumn("n_docs", sum("c").over(tot))
      .withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(col("grp"), col("n_docs"), col("prefix").as("top_prefix"),
        col("c").as("n_with_top"),
        expr("(c * 1000000L) div n_docs").as("share_ppm"))
  }

  /** Corpus release diff — what changed between two dataset snapshots
    * (the dataset-versioning changelog a release note quotes): per
    * group, counts of ADDED ids (only in `b`), REMOVED ids (only in
    * `a`), CHANGED ids (both, text md5 differs) and UNCHANGED. Returns
    * (grp, n_added, n_removed, n_changed, n_unchanged).
    *
    * Scale shape: one full-outer hash join on the id key with texts
    * reduced to md5 BEFORE the join (fixed-width compare, no long
    * strings through the shuffle), then one count aggregation. */
  def corpusDiff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String, groupCol: String): DataFrame = {
    def side(df: DataFrame, tag: String) =
      df.select(col(idCol).cast("long").as("id"),
        col(groupCol).as(s"g$tag"), md5(col(textCol)).as(s"h$tag"))
    side(a, "a").join(side(b, "b"), Seq("id"), "full_outer")
      .select(coalesce(col("ga"), col("gb")).as("grp"),
        when(col("ha").isNull, "added")
          .when(col("hb").isNull, "removed")
          .when(col("ha") =!= col("hb"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("grp")
      .agg(
        coalesce(sum(when(col("status") === "added", 1L)), lit(0L))
          .as("n_added"),
        coalesce(sum(when(col("status") === "removed", 1L)), lit(0L))
          .as("n_removed"),
        coalesce(sum(when(col("status") === "changed", 1L)), lit(0L))
          .as("n_changed"),
        coalesce(sum(when(col("status") === "unchanged", 1L)), lit(0L))
          .as("n_unchanged"))
  }

  /** Stratified inspection sample — the per-stratum manifest a human
    * review (or an eval-set draw) starts from: the `k` documents of each
    * stratum with the smallest `md5('ss_' || id)` — a pure function of
    * the id set, so every engine, run, and partitioning draws the SAME
    * manifest, and a re-run after appending data only ever ADDS lower
    * hashes (stable review queues). Returns (stratum, id, rank).
    *
    * Scale shape: one rank window per stratum (hash-partitioned on the
    * stratum key); at scale replace with a per-partition top-k +
    * k-row merge if strata are huge — the hash order makes both give
    * identical output. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k out of range: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum").orderBy("h", "id")
    df.select(col(strataCol).as("stratum"), col(idCol).cast("long").as("id"),
        md5(concat(lit("ss_"), col(idCol).cast("string"))).as("h"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("stratum", "id", "rank")
  }

  /** Token-budget clipping — the context-window guillotine a training
    * pipeline runs before packing (every example must fit `budget`
    * tokens, cut at a token boundary, never mid-word): per document
    * `(id, n_tokens, n_kept, clipped, clipped_chars)` where
    * `clipped_chars` is the character length of the kept prefix joined
    * by single spaces.
    *
    * Scale shape: pure per-row Column algebra (split/slice/concat_ws) —
    * no shuffle at all; cost is linear in kept tokens. */
  def clipToTokenBudget(df: DataFrame, textCol: String, idCol: String,
      budget: Int): DataFrame = {
    require(budget >= 1, s"budget out of range: $budget")
    val toks = tokens(col(textCol))
    df.select(col(idCol).cast("long").as("id"),
        size(toks).cast("long").as("n_tokens"),
        least(size(toks), lit(budget)).cast("long").as("n_kept"),
        (size(toks) > budget).cast("long").as("clipped"),
        length(concat_ws(" ", slice(toks, 1, budget))).cast("long")
          .as("clipped_chars"))
  }

  /** Benchmark decontamination audit — the GPT-3-appendix test-set
    * overlap scan: a training document is CONTAMINATED when it shares
    * ANY single `n`-token shingle with the held-out evaluation corpus
    * (metrics computed on leaked eval data are fiction). Per `groupCol`:
    * (grp, n_docs, n_contaminated, contam_ppm). Documents shorter than
    * `n` tokens contribute no shingles and can never flag — the audit
    * measures n-gram leakage, not short-doc identity (use D1 exact
    * dedup for that). Complements
    * [[graft.operators.Dedup.crossCorpusContamination]]: that is the
    * pair FINDER (which doc leaked from which benchmark item, df-capped,
    * ≥ minShared scored); this is the release-gate REPORT under the
    * strict any-one-shingle rule, per source — no df cap, because a
    * boilerplate shingle shared with eval is still (conservatively)
    * contamination under the rule.
    *
    * Scale shape: both corpora explode to DISTINCT md5'd shingles; the
    * eval shingle set is ∝ the eval corpus, so membership is one
    * shuffle-hash LEFT SEMI join on the shingle hash — never broadcast
    * (an eval suite can be millions of shingles), never doc×doc. The
    * flagged-id set rejoins the corpus once on the doc key. */
  def decontaminationAudit(corpus: DataFrame, evalDocs: DataFrame,
      textCol: String, idCol: String, groupCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 1, s"n out of range: $n")
    graft.functions.TextHashes.register(corpus.sparkSession)
    def shingles(df: DataFrame, cols: Column*): DataFrame = {
      // r11 opt: native long window hashes instead of md5 hex strings —
      // `sh` is an opaque semi-join key, so only compute + shuffle width
      // change (see ngram_hashes scaladoc). Column API, not a SQL-string
      // splice of textCol (r11 ADVICE).
      val ws = graft.functions.TextHashes.ngramHashesCol(df.sparkSession,
        split(col(textCol), " "), n, truncShort = false)
      df.select(cols :+ explode(ws).as("sh"): _*)
    }
    val evalSet = shingles(evalDocs).select("sh").distinct()
    val flagged = shingles(corpus, col(idCol).cast("long").as("id"))
      .join(evalSet.hint("shuffle_hash"), Seq("sh"), "left_semi")
      .select("id").distinct()
      .withColumn("__hit", lit(1L))
    corpus.select(col(idCol).cast("long").as("id"),
        col(groupCol).as("grp"))
      .join(flagged.hint("shuffle_hash"), Seq("id"), "left_outer")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("__hit"), lit(0L)).as("n_contaminated"))
      .withColumn("contam_ppm",
        expr("(n_contaminated * 1000000L) div greatest(1L, n_docs)"))
  }

  /** Source-overlap provenance matrix — which sources copy from which
    * (a crawl slice that shares half its shingles with another source is
    * a mirror, not new data; [[shingleReuse]] sees recycling over TIME,
    * this sees it across SOURCES): per overlapping source pair
    * (grp_a < grp_b): shared distinct `n`-gram shingles, each side's
    * distinct-shingle count, DIRECTIONAL containment ppm (shared ÷ each
    * side — the mirror reads near 10⁶ on its side even when the host is
    * huge) and Jaccard ppm. Non-overlapping pairs emit nothing.
    *
    * Scale shape: the corpus collapses to DISTINCT (source, shingle-md5)
    * first; the shingle self-join's fan-out is bounded by
    * sources-per-shingle ≤ |sources| (a dimension, not the corpus);
    * per-source totals rejoin on the source key. Never doc×doc, never
    * corpus×corpus. */
  def sourceOverlapMatrix(df: DataFrame, textCol: String, groupCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 1, s"n out of range: $n")
    graft.functions.TextHashes.register(df.sparkSession)
    // r11 opt (two changes, results identical): (1) window hashes via the
    // native kernel as 8-byte longs instead of 32-hex md5 STRINGS — the
    // hash is an opaque distinct key on both engines (the oracle md5's
    // the window only as its own stand-in), so this cuts both the
    // per-window compute and the shuffle width 4x; (2) `gs` is consumed
    // THREE times (totals + both self-join sides) — left lazy, the whole
    // shingle explode ran 3x per query (guide §2.4). Column API, not a
    // SQL-string splice of textCol (r11 ADVICE).
    val ws = graft.functions.TextHashes.ngramHashesCol(df.sparkSession,
      split(col(textCol), " "), n, truncShort = false)
    val gs = df.select(col(groupCol).as("grp"), explode(ws).as("sh"))
      .distinct()
      .localCheckpoint()
    val totals = gs.groupBy("grp").agg(count(lit(1)).as("n_sh"))
    val shared = gs.as("a").join(gs.as("b"),
        col("a.sh") === col("b.sh") && col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(totals.select(col("grp").as("grp_a"), col("n_sh").as("n_a")),
        "grp_a")
      .join(totals.select(col("grp").as("grp_b"), col("n_sh").as("n_b")),
        "grp_b")
      .select(col("grp_a"), col("grp_b"), col("shared"), col("n_a"),
        col("n_b"),
        expr("(shared * 1000000L) div n_a").as("contain_a_ppm"),
        expr("(shared * 1000000L) div n_b").as("contain_b_ppm"),
        expr("(shared * 1000000L) div (n_a + n_b - shared)")
          .as("jaccard_ppm"))
  }

  /** Unicode anomaly audit — the invisible-character screen a corpus
    * needs before training or rendering (bidi overrides enable
    * Trojan-Source-style display spoofing, zero-width characters carry
    * watermarks/evade dedup, C0 controls break tokenizers, U+FFFD marks
    * upstream mojibake): per `groupCol`, documents containing each
    * class and the any-anomaly rate. Returns (grp, n_docs, with_control,
    * with_zero_width, with_bidi, with_replacement, anomaly_ppm). The
    * character classes are literal codepoint sets shared verbatim by
    * Java and RE2 regex dialects.
    *
    * Scale shape: ONE projection evaluates all four rlike flags, one
    * group aggregation — classes add columns, not scans (the
    * [[markerScan]] discipline). */
  def unicodeAnomalies(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val control = "[\\x{01}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}]"
    val zeroWidth = "[\\x{200B}-\\x{200D}\\x{FEFF}]"
    val bidi = "[\\x{202A}-\\x{202E}\\x{2066}-\\x{2069}]"
    val replacement = "\\x{FFFD}"
    val t = col(textCol)
    val flags = df.select(col(groupCol).as("grp"),
      t.rlike(control).cast("long").as("__c"),
      t.rlike(zeroWidth).cast("long").as("__z"),
      t.rlike(bidi).cast("long").as("__b"),
      t.rlike(replacement).cast("long").as("__r"))
    flags.groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("__c"), lit(0L)).as("with_control"),
        coalesce(sum("__z"), lit(0L)).as("with_zero_width"),
        coalesce(sum("__b"), lit(0L)).as("with_bidi"),
        coalesce(sum("__r"), lit(0L)).as("with_replacement"),
        coalesce(sum(greatest(col("__c"), col("__z"), col("__b"),
          col("__r"))), lit(0L)).as("n_any"))
      .withColumn("anomaly_ppm",
        expr("(n_any * 1000000L) div greatest(1L, n_docs)"))
      .drop("n_any")
  }

  /** Vocabulary-size coverage sweep — the "how big must the tokenizer
    * vocab be" curve ([[oovRate]] answers it for ONE size; this sweeps):
    * token types rank by (count desc, token asc), and each candidate
    * size reports the share of token OCCURRENCES its top-V types cover.
    * Returns (vocab_size, covered_occurrences, total_occurrences,
    * coverage_ppm), one row per candidate; a candidate larger than the
    * true vocabulary covers everything.
    *
    * Scale shape: one token-count aggregation; the ranked head is a
    * TakeOrdered LIMIT max(sizes) (bounded by the largest candidate —
    * never a global sort of the corpus-sized type table); the cumulative
    * window and the candidate join run over that ≤ max(sizes)-row
    * relation. The sizes×head inequality join is bounded×bounded (BNLJ
    * by design, whitelisted). */
  def vocabCoverageSweep(df: DataFrame, textCol: String,
      sizes: Seq[Int]): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 1), "sizes must be >= 1")
    require(sizes.max <= 100000, s"largest candidate too big: ${sizes.max}")
    val counts = df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("total_occurrences"))
    val head = counts.orderBy(col("c").desc, col("token")).limit(sizes.max)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy(col("c").desc, col("token"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val cum = head.withColumn("cum", sum("c").over(w))
      .withColumn("rn", row_number().over(
        W.orderBy(col("c").desc, col("token"))))
    val cand = df.sparkSession.range(1)
      .select(explode(typedLit(sizes.distinct.sorted)).as("vocab_size"))
    cand.join(cum, col("rn") <= col("vocab_size"), "left_outer")
      .groupBy("vocab_size")
      .agg(coalesce(max("cum"), lit(0L)).as("covered_occurrences"))
      .crossJoin(broadcast(total))
      .withColumn("coverage_ppm",
        expr("(covered_occurrences * 1000000L) div " +
          "greatest(1L, total_occurrences)"))
      .select(col("vocab_size").cast("long").as("vocab_size"),
        col("covered_occurrences"), col("total_occurrences"),
        col("coverage_ppm"))
  }

  /** PII scrubbing audit — the per-document REPORT face of the [[scrub]]
    * transform (same three regexes, verbatim — emails → `<EMAIL>`, URLs
    * → `<URL>`, 6+-digit runs → `<NUM>`; [[scrub]] answers "rewrite the
    * corpus", this answers "what did the rewrite touch, prove it"):
    * (id, n_emails, n_urls, n_longnums, chars_removed, scrub_md5) —
    * match counts from the raw text, the md5 fingerprinting the scrubbed
    * output so any engine's rewrite is byte-comparable without shipping
    * the text twice.
    *
    * Scale shape: pure per-row projection, zero shuffles; at 100 TB this
    * is a map-only rewrite pass. */
  def scrubPii(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t0 = col(textCol)
    df.select(col(idCol).cast("long").as("id"),
      regexp_count(t0, lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(t0, lit(urlRe)).cast("long").as("n_urls"),
      regexp_count(t0, lit(numRe)).cast("long").as("n_longnums"),
      (length(t0) - length(scrub(t0))).cast("long").as("chars_removed"),
      md5(scrub(t0)).as("scrub_md5"))
  }
}
