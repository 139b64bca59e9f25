package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "en", "the cat sat on the mat", 22),
      (2L, "en", "a dog", 5),
      (3L, "fr", "le chat et la souris", 20)
    ).toDF("doc_id", "lang", "text", "n_chars")
  }

  test("corpusStats aggregates token and char stats per group") {
    val m = Text.corpusStats(docs, "text", "n_chars", "lang")
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    assert(m("en").getAs[Long]("n_docs") == 2)
    assert(m("en").getAs[Long]("sum_tokens") == 6 + 2)
    assert(m("en").getAs[Int]("min_chars") == 5)
    assert(m("en").getAs[Int]("max_chars") == 22)
    assert(m("en").getAs[Double]("avg_chars") == 13.5)
    assert(m("fr").getAs[Long]("n_docs") == 1)
  }

  test("qualityScores: type/token, word length, stopword ratio") {
    val r = Text.qualityScores(docs.filter(col("doc_id") === 1), "text", "n_chars",
        "doc_id", Seq("the", "a", "of", "and", "to")).collect().head
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Int]("n_uniq") == 5) // "the" twice
    assert(r.getAs[Double]("type_token_ratio") == 5.0 / 6)
    // 22 chars - 5 separators = 17 letters over 6 tokens
    assert(r.getAs[Double]("avg_word_len") == 17.0 / 6)
    assert(r.getAs[Double]("stopword_ratio") == 2.0 / 6)
  }

  test("languageId: evidence columns, first-marker tie-break, unknown on zero evidence") {
    val markers = Seq("en" -> Seq("the", "and"), "fr" -> Seq("le", "et"))
    val out = Text.languageId(docs, "text", markers)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("hits_en"), r.getAs[Int]("hits_fr"), r.getAs[String]("predicted"))).toMap
    assert(out(1L) == ((2, 0, "en")))
    assert(out(3L) == ((0, 2, "fr")))
    assert(out(2L) == ((0, 0, "unknown")))
  }

  test("simhash16: identical docs collide, 16-bit range, deterministic") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "x y z"))
      .toDF("id", "text")
    val h = Text.simhash16(d, "text", "id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(h(1L) == h(2L))
    assert(h.values.forall(v => v >= 0 && v < (1L << 16)))
    val again = Text.simhash16(d, "text", "id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(again == h)
  }

  test("deterministicSplit: stable, exhaustive, and roughly proportional") {
    val s = spark
    import s.implicits._
    val d = (0L until 1000L).toDF("id")
    val once = Text.deterministicSplit(d, "id")
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once.values.sum == 1000)
    assert(once("train") > 700 && once("train") < 900) // hash-proportional
    assert(once.keySet == Set("train", "val", "test"))
    // same ids -> same assignment, regardless of partitioning
    val again = Text.deterministicSplit(d.repartition(7), "id")
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == once)
    val custom = Text.deterministicSplit(d, "id", Seq("a" -> 50, "b" -> 50))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(custom.keySet == Set("a", "b"))
  }

  test("mixture: rate-0 drops all, rate-10000 keeps all, samples nest monotonically, partitioning-stable") {
    val s = spark
    import s.implicits._
    val d = (0L until 3000L).map(i => (i, s"src${i % 3}")).toDF("id", "source")
    val kept = Text.mixture(d, "source", "id",
        Map("src0" -> 10000, "src1" -> 0), defaultBps = 2500)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("src0") == 1000, s"full rate must keep every row: $bySrc")
    assert(!bySrc.contains("src1"), "zero rate must drop the source entirely")
    // default 25% on src2: hash-proportional, not exact
    assert(bySrc("src2") > 180 && bySrc("src2") < 320, s"~25%: $bySrc")
    // threshold sampling nests: the 10% sample is a subset of the 40% one
    def ids(bps: Int) = Text.mixture(d, "source", "id",
        Map.empty, defaultBps = bps)
      .collect().map(_.getLong(0)).toSet
    assert(ids(1000).subsetOf(ids(4000)), "samples must nest by rate")
    // stable under repartitioning (no RNG state)
    val again = Text.mixture(d.repartition(7), "source", "id",
        Map("src0" -> 10000, "src1" -> 0), defaultBps = 2500)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again.toSet == kept.toSet)
  }

  test("mixtureToBudget: over-budget sources downsample toward the budget, under-budget and unlisted keep all") {
    val s = spark
    import s.implicits._
    // src0: 1000 rows x 100 tokens = 100k total, budget 25k -> ~25% kept
    // src1: 1000 x 100 = 100k, budget 200k -> under budget, keep all
    // src2: unlisted -> keep all
    val d = (0L until 3000L).map(i => (i, s"src${i % 3}", 100L))
      .toDF("id", "source", "toks")
    val kept = Text.mixtureToBudget(d, "source", "id", "toks",
        Map("src0" -> 25000L, "src1" -> 200000L))
      .groupBy("source").agg(sum("toks").as("t"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kept("src1") == (100000L, 1000L), s"under budget keeps all: $kept")
    assert(kept("src2") == (100000L, 1000L), s"unlisted keeps all: $kept")
    val (t0, _) = kept("src0")
    assert(t0 > 17000 && t0 < 33000, s"~25k of src0 tokens expected, got $t0")
    // deterministic: same inputs -> same sample
    val again = Text.mixtureToBudget(d.repartition(5), "source", "id", "toks",
        Map("src0" -> 25000L, "src1" -> 200000L))
      .agg(sum("toks")).head().getLong(0)
    assert(again == kept.values.map(_._1).sum)
  }

  test("capPerGroup keeps exactly cap rows per group, deterministically") {
    val s = spark
    import s.implicits._
    val d = Seq.tabulate(10)(i => (i.toLong, if (i < 7) "big" else "small"))
      .toDF("id", "grp")
    val kept = Text.capPerGroup(d, "grp", "id", 3)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id")))
    assert(kept.count(_._1 == "big") == 3)
    assert(kept.count(_._1 == "small") == 3) // under the cap: all kept
    val kept2 = Text.capPerGroup(d.repartition(5), "grp", "id", 3)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id")))
    assert(kept2.toSet == kept.toSet) // choice independent of partitioning
  }

  test("scrub replaces emails, URLs, and long digit runs with tag tokens") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "see https://a.example.com/p?q=1 and http://b.io/x"),
      (3L, "id 1234567890 ok 12345 short"),
      (4L, "clean text stays put"))
      .toDF("id", "text")
    val out = Text.scrub(org.apache.spark.sql.functions.col("text"))
    val m = d.select($"id", out.as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "mail <EMAIL> now")
    assert(m(2L) == "see <URL> and <URL>")
    assert(m(3L) == "id <NUM> ok 12345 short") // < 6 digits untouched
    assert(m(4L) == "clean text stays put")
  }

  test("fingerprint: stable under edits away from the minimizing window, short docs covered") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "aardvark zebra yak xylophone wombat"),
      (2L, "aardvark zebra yak xylophone CHANGED"), // edit outside min window?
      (3L, "hi")) // shorter than the window
      .toDF("id", "text")
    val f = Text.fingerprint(d, "text", "id", window = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("fingerprint")).toMap
    // doc 3: single window = the whole (short) token list
    val expectShort = java.security.MessageDigest.getInstance("MD5")
      .digest("hi".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(f(3L) == expectShort)
    // docs 1/2 share windows "aardvark zebra yak" and "zebra yak xylophone";
    // equal iff one of those is the minimum for both — verify directly
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val w1 = Seq("aardvark zebra yak", "zebra yak xylophone", "yak xylophone wombat").map(md5hex)
    assert(f(1L) == w1.min)
  }

  test("shingles: distinct n-grams, short docs shingle what they have") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "a b c a b c"), (2L, "xy")).toDF("id", "text")
    val out = d.select(col("id"), Text.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[String](1).toSet).toMap
    assert(out(1L) == Set("a b c", "b c a", "c a b")) // distinct across repeats
    assert(out(2L) == Set("xy")) // shorter than n -> the whole doc
  }

  test("repetitionScores: dup/adjacent/top-bigram fractions") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "go go go stop"), // adjacent repeats + dominant bigram
      (2L, "all words fully distinct"),
      (3L, "solo")).toDF("id", "text")
    val m = Text.repetitionScores(d, "text", "id")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val r1 = m(1L)
    assert(r1.getAs[Int]("n_tokens") == 4)
    assert(r1.getAs[Double]("dup_token_frac") == 2.0 / 4) // "go" x3 -> 2 dups
    assert(r1.getAs[Double]("adj_dup_frac") == 2.0 / 3) // go|go, go|go
    assert(r1.getAs[Double]("top_bigram_frac") == 2.0 / 3) // "go go" twice of 3
    val r2 = m(2L)
    assert(r2.getAs[Double]("dup_token_frac") == 0.0)
    assert(r2.getAs[Double]("adj_dup_frac") == 0.0)
    assert(r2.getAs[Double]("top_bigram_frac") == 1.0 / 3) // all bigrams unique
    val r3 = m(3L) // single token: no bigrams, guarded divisions
    assert(r3.getAs[Int]("n_tokens") == 1)
    assert(r3.getAs[Double]("adj_dup_frac") == 0.0)
    assert(r3.getAs[Double]("top_bigram_frac") == 0.0)
  }

  test("packSequences: per-partition prefix-sum bins at the token budget") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "a", "one two three"), // 3 tokens, cum_before 0 -> bin 0
      (2L, "a", "four five"), // cum_before 3 -> bin 0
      (3L, "a", "six seven eight"), // cum_before 5 -> bin 1 (budget 5)
      (4L, "b", "x")) // other partition restarts at bin 0
      .toDF("id", "src", "text")
    val out = Text.packSequences(d, "src", "id", "text", budget = 5)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Long]("bin"))).toMap
    assert(out(1L) == ((3, 0L)))
    assert(out(2L) == ((2, 0L)))
    assert(out(3L) == ((3, 1L)))
    assert(out(4L) == ((1, 0L)))
  }

  test("chunk: overlapping windows cover every token; short docs yield one chunk") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "a b c d e f g h i j"), (2L, "x"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Text.chunk(d, "text", "doc_id", window = 4, stride = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id")) ->
        (r.getAs[Int]("start"), r.getAs[Int]("n_tokens"), r.getAs[String]("chunk_text")))
      .toMap
    // 10 tokens, starts 0/3/6/9: full windows then the 1-token tail
    assert(out((1L, 0)) == ((0, 4, "a b c d")))
    assert(out((1L, 1)) == ((3, 4, "d e f g")))
    assert(out((1L, 2)) == ((6, 4, "g h i j")))
    assert(out((1L, 3)) == ((9, 1, "j")))
    // 1-token and empty docs still produce exactly one chunk
    assert(out((2L, 0)) == ((0, 1, "x")))
    assert(out((3L, 0)) == ((0, 1, "")))
    assert(out.size == 6)
    intercept[IllegalArgumentException] {
      Text.chunk(d, "text", "doc_id", window = 4, stride = 5)
    }
  }

  test("bm25TopK: hand-computed integer scores, ranking, and doc tie-break") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "spark spark join"), // dl=3, tf(spark)=2, tf(join)=1
      (2L, "spark window"), // dl=2, tf(spark)=1
      (3L, "other tokens here"), // no query terms
      (4L, "join join join join"), // dl=4, tf(join)=4
      (5L, "spark window") // identical to doc 2 -> equal score, id tie-break
    ).toDF("doc_id", "text")
    // N=5, tot=3+2+3+4+2=14, avgdl10 = 140 div 5 = 28. df(spark)=3, df(join)=2.
    // idf(spark) = 5e6 div 3 = 1666666; idf(join) = 5e6 div 2 = 2500000.
    // tfterm = (22*tf*28*1e6) div (10*tf*28 + 3*28 + 90*dl)
    //   d1 spark tf=2 dl=3: 1232000000 div (560+84+270=914) = 1347921
    //   d1 join  tf=1 dl=3:  616000000 div (280+84+270=634) =  971608
    //   d2 spark tf=1 dl=2:  616000000 div (280+84+180=544) = 1132352
    //   d4 join  tf=4 dl=4: 2464000000 div (1120+84+360=1564)=1575447
    val exp1 = 1666666L * 1347921L + 2500000L * 971608L
    val exp2 = 1666666L * 1132352L
    val exp4 = 2500000L * 1575447L
    val out = Text.bm25TopK(d, "text", "doc_id", Seq("spark", "join"), k = 4)
      .collect().map(r => (r.getAs[Long]("doc"), r.getAs[Long]("bm25")))
    assert(out.map(_._1).toSeq == Seq(1L, 4L, 2L, 5L)) // 2 before 5 on the tie
    val m = out.toMap
    assert(m(1L) == exp1 && m(4L) == exp4 && m(2L) == exp2 && m(5L) == exp2)
    // k cuts inside the tie deterministically: doc 2 in, doc 5 out
    val top3 = Text.bm25TopK(d, "text", "doc_id", Seq("spark", "join"), k = 3)
      .collect().map(_.getAs[Long]("doc")).toSeq
    assert(top3 == Seq(1L, 4L, 2L))
    intercept[IllegalArgumentException] {
      Text.bm25TopK(d, "text", "doc_id", Nil, k = 1)
    }
  }

  test("canonicalizeUrl: case, ports, www, fragment, slash, tracking params, param order") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      // the full gauntlet collapses to one clean form
      "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&id=5#frag" ->
        "http://example.com/a/b?id=5",
      "http://example.com/a/b?id=5" -> "http://example.com/a/b?id=5",
      // param sorting: b=2&a=1 -> a=1&b=2; gclid dropped; 443 stripped
      "https://Site.net:443/p?b=2&a=1&gclid=zz" -> "https://site.net/p?a=1&b=2",
      // all params tracking -> no '?' at all
      "https://x.org/q?utm_medium=m&fbclid=f&ref=r" -> "https://x.org/q",
      // bare host, no path/query
      "https://WWW.Host.io" -> "https://host.io",
      // :8080 is NOT a default port and survives
      "http://h.co:8080/x" -> "http://h.co:8080/x")
    val out = cases.map(_._1).toDF("url")
      .select(Text.canonicalizeUrl(org.apache.spark.sql.functions.col("url")))
      .collect().map(_.getString(0)).toSeq
    assert(out == cases.map(_._2))
  }

  test("codeSignals separates code from prose and is null/empty-safe") {
    val s = spark
    import s.implicits._
    val code = "def f(x):\n  return x+1;\nwhile (i<n) { a[i] = b*2; }"
    val prose = "the quick brown fox jumps over the lazy dog again and again"
    val out = Text.codeSignals(
        Seq((1L, code), (2L, prose), (3L, "")).toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (brace, op, kw, indent, ppm) = out(1L)
    // code: braces/brackets/semicolons, operators, keywords (def, return,
    // while, if absent), one indented line, dense symbols
    assert(brace == 10, s"brace $brace") // ( ) ; ( ) { [ ] ; ; }
    assert(op == 4, s"op $op") //           + < = *
    assert(kw == 3) //                      def, return, while
    assert(indent == 1) //                 "  return" line
    assert(ppm > 100000L)
    val (pb, pop, pkw, pin, pppm) = out(2L)
    assert(pb == 0 && pop == 0 && pkw == 0 && pin == 0 && pppm == 0)
    assert(out(3L) == ((0L, 0L, 0L, 0L, 0L))) // empty text: all zeros, no div-by-zero
    intercept[IllegalArgumentException] {
      Text.codeSignals(Seq((1L, "x")).toDF("doc_id", "text"), "text",
        "doc_id", keywords = Seq("a.b"))
    }
  }

  test("topPhrases: doc frequency (not occurrences), minDf cut, lexicographic ties, k cap") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c a b c x y z"), //   "a b c" twice in ONE doc: df counts it once
      (2L, "a b c q r s"),
      (3L, "q r s t u v"),
      (4L, "zz zz zz")).toDF("doc_id", "text")
    val out = Text.topPhrases(docs, "text", "doc_id", n = 3, k = 10, minDf = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // "a b c" in docs 1,2 (df 2); "q r s" in docs 2,3 (df 2); ties
    // break lexicographically; everything else df 1 -> cut
    assert(out == Seq(("a b c", 2L), ("q r s", 2L)), s"got $out")
    // k cap keeps the deterministic head
    assert(Text.topPhrases(docs, "text", "doc_id", n = 3, k = 1, minDf = 2L)
      .collect().map(_.getString(0)).toSeq == Seq("a b c"))
  }

  test("hardNegatives: positives drop, survivors re-rank densely, k caps per query") {
    val s = spark
    import s.implicits._
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4),
      (2L, 20L, 1), (2L, 21L, 2)).toDF("query_id", "doc_id", "rank")
    val positives = Seq((1L, 10L), (1L, 12L), (2L, 21L)).toDF("query_id", "doc_id")
    val out = Text.hardNegatives(ranked, positives, "query_id", "doc_id", "rank", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // q1: 10 and 12 are positives -> negatives are 11 (neg_rank 1) and
    // 13 (neg_rank 2, re-ranked densely past the dropped positives);
    // q2: only 20 survives
    assert(out == Set((1L, 11L, 1), (1L, 13L, 2), (2L, 20L, 1)))
    // k caps: with k=1 only the top surviving negative per query remains
    val capped = Text.hardNegatives(ranked, positives, "query_id", "doc_id", "rank", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 11L), (2L, 20L)))
  }

  test("rrfFuse: doc on both lists beats single-list docs; integer scores; ties to smaller id") {
    val s = spark
    import s.implicits._
    val l1 = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val l2 = Seq((2L, 1L), (4L, 2L)).toDF("id", "rank")
    val out = Text.rrfFuse(Seq(l1, l2), "id", "rank", k = 10, k0 = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 2: 10^6 div 62 + 10^6 div 61 = 16129 + 16393 = 32522 — top
    assert(out.head == ((2L, 2L, 32522L)))
    // doc 1 (rank 1, one list) = 16393; doc 4 = 16129; doc 3 = 15873
    assert(out.map(_._1).toSeq == Seq(2L, 1L, 4L, 3L))
    // k truncates deterministically
    assert(Text.rrfFuse(Seq(l1, l2), "id", "rank", k = 2)
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 1L))
  }

  test("dedupLines: boilerplate stripped, order kept, all-boilerplate doc empty") {
    val s = spark
    import s.implicits._
    val boiler = "subscribe now"
    val docs = Seq(
      (1L, s"alpha one\n$boiler\nbeta two"),
      (2L, s"$boiler\ngamma three"),
      (3L, s"delta four\n$boiler"),
      (4L, boiler)).toDF("doc_id", "txt")
    val out = Text.dedupLines(docs, "txt", "doc_id", minDf = 3L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("alpha one\nbeta two", 2L, 1L)))  // middle line gone, order kept
    assert(out(2L) == (("gamma three", 1L, 1L)))
    assert(out(3L) == (("delta four", 1L, 1L)))
    assert(out(4L) == (("", 0L, 1L)))                       // doc survives, empty
  }

  test("dedupLines: below-minDf lines survive; single-doc repeats count once") {
    val s = spark
    import s.implicits._
    // "rare line" is in only 2 docs (one of them twice): df = 2 < 3 -> kept
    val docs = Seq(
      (1L, "rare line\nrare line"),
      (2L, "rare line"),
      (3L, "other")).toDF("doc_id", "txt")
    val out = Text.dedupLines(docs, "txt", "doc_id", minDf = 3L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(out(1L) == (("rare line\nrare line", 0L)))
    assert(out(2L) == (("rare line", 0L)))
    assert(out(3L) == (("other", 0L)))
  }


  test("lmScore: hand-computed bigram conditionals; short docs score null") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z"))
      .toDF("doc_id", "txt")
    // c(a,b)=2, c(a,c)=1, c1(a)=3
    val out = Text.lmScore(docs, "txt", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(1L) == ((1L, 2000000L / 3)))
    assert(out(2L) == ((1L, 2000000L / 3)))
    assert(out(3L) == ((1L, 1000000L / 3)))
    assert(out(4L) == ((0L, -1L)))  // no bigrams -> null score
  }


  test("temperatureMixture: equals mixture() with the hand-derived sqrt rates") {
    val s = spark
    import s.implicits._
    // group A: 100 rows (w=10), group B: 4 rows (w=2); sumW=12, budget=12
    // rateA = 12*10*1e4/(12*100) = 1000 bps; rateB = 12*2*1e4/(12*4) = 5000
    val df = ((1L to 100L).map(i => (i, "A")) ++ (101L to 104L).map(i => (i, "B")))
      .toDF("id", "g")
    val got = Text.temperatureMixture(df, "g", "id", budgetRows = 12L)
      .collect().map(_.getLong(0)).toSet
    val want = Text.mixture(df, "g", "id", Map("A" -> 1000, "B" -> 5000))
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
    // flattening: the big group's rate (10%) is far under the small one's (50%)
  }

  test("temperatureMixture: rates cap at 100% when the budget exceeds the corpus") {
    val s = spark
    import s.implicits._
    val df = (1L to 30L).map(i => (i, if (i <= 20) "A" else "B")).toDF("id", "g")
    assert(Text.temperatureMixture(df, "g", "id", budgetRows = 100000L).count() == 30)
  }

  test("diversityMetrics: hand-computed distinct-1/2 on a templated group") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("tpl", "a a a a"),          // 4 tokens, 1 distinct; 3 bigrams "a a", 1 distinct
      ("tpl", "a a a a"),          // same again: totals 8/1, bigrams 6/1
      ("var", "x y z"),            // 3 tokens 3 distinct; 2 distinct bigrams
      ("one", "solo")              // 1 token, no bigram
    ).toDF("src", "txt")
    val out = Text.diversityMetrics(df, "txt", "src")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out("tpl") == ((2L, 8L, 1L, 6L, 1L, 125000L, 166666L)))
    assert(out("var") == ((1L, 3L, 3L, 2L, 2L, 1000000L, 1000000L)))
    assert(out("one") == ((1L, 1L, 1L, 0L, 0L, 1000000L, 0L)))
  }

  test("winnowing: shared 7-token run guarantees a common fingerprint (k=4, w=4)") {
    val s = spark
    import s.implicits._
    val run = "q w e r t y u" // window + k - 1 = 7 tokens
    val docs = Seq(
      (1L, s"a b c d e $run f g h"),
      (2L, s"m n o p $run z z2 z3"),
      (3L, "totally different words here throughout the entire doc")).toDF("doc_id", "txt")
    val fp = Text.winnowingFingerprints(docs, "txt", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)   // the winnowing guarantee
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // density: far fewer fingerprints than grams
    assert(byDoc(1L).size < 10)
  }

  test("winnowing: partition-invariant and short-doc degenerate cases") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b c d e f g h i j")).toDF("doc_id", "txt")
    def run(d: org.apache.spark.sql.DataFrame) =
      Text.winnowingFingerprints(d, "txt", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run(docs)
    assert(a == run(docs.repartition(7)))
    assert(a.count(_._1 == 1L) == 1)  // sub-k doc: one gram, one window, one fp
  }


  test("retrievalMetrics: hand-graded run with a zero-hit query") {
    val s = spark
    import s.implicits._
    val runs = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 10L, 1L), (2L, 11L, 2L)).toDF("q", "d", "r")
    val qrels = Seq((1L, 11L), (1L, 12L), (1L, 99L), (2L, 98L))
      .toDF("q", "d")
    val out = Text.retrievalMetrics(runs, qrels, "q", "d", "r", k = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    // q1: top-2 = {10, 11}, relevant among them = {11} at rank 2
    assert(out(1L) == ((3L, 1L, 500000L, 333333L, 500000L)))
    // q2: nothing relevant in the run at all
    assert(out(2L) == ((1L, 0L, 0L, 0L, 0L)))
  }

  test("collocations: the recurring pair survives minCount; association ratio exact") {
    val s = spark
    import s.implicits._
    // "new york" in every doc; fillers vary per doc so every other pair
    // occurs once and dies at minCount
    val docs = (1 to 6).map(i => s"f${i}a new york f${i}b f${i}c").toDF("txt")
    val rows = Text.collocations(docs, "txt", window = 2, minCount = 3L, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // c(new,york)=6, c(new)=c(york)=6, N=30: pmi = 6*30*1e6/(6*6) = 5e6
    assert(rows.toSeq == Seq(("new", "york", 6L, 5000000L)))
  }

  test("unigramDivergence: shares, gaps, global TVD, and one-sided tokens") {
    val s = spark
    import s.implicits._
    val a = Seq("x x y").toDF("txt")
    val b = Seq("x z").toDF("txt")
    val rows = Text.unigramDivergence(a, b, "txt", topK = 10)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("pa_ppm"),
          r.getAs[Long]("pb_ppm"), r.getAs[Long]("gap_ppm"),
          r.getAs[Long]("tvd_ppm")))
    // ta=3, tb=2: pa(x)=666666 pa(y)=333333; pb(x)=500000 pb(z)=500000
    // gaps 166666 / 333333 / 500000; tvd = 999999 div 2 = 499999
    assert(rows.toMap == Map(
      "x" -> ((2L, 1L, 666666L, 500000L, 166666L, 499999L)),
      "y" -> ((1L, 0L, 333333L, 0L, 333333L, 499999L)),
      "z" -> ((0L, 1L, 0L, 500000L, 500000L, 499999L))))
    // gap-desc, token-asc order
    assert(rows.map(_._1).toSeq == Seq("z", "y", "x"))
  }

  test("bpePairs: adjacent in-word pairs counted, single-char words dropped, minCount floors") {
    val s = spark
    import s.implicits._
    val docs = Seq("abab ab ba a").toDF("txt")
    // abab -> ab, ba, ab; ab -> ab; ba -> ba; "a" contributes nothing
    val rows = Text.bpePairs(docs, "txt", topK = 10, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.toSeq == Seq(("ab", 3L, 1), ("ba", 2L, 2)))
    // minCount above every pair -> empty
    assert(Text.bpePairs(docs, "txt", topK = 10, minCount = 4L).count() == 0L)
  }

  test("readability: hand-counted Flesch milli-score, syllable floor, empty doc dropped") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat sat. it ran!"), // 5 words, 2 sentences, vg: e,a,a,i,a = 5
      (2L, "xyz qrst"),             // 0 vowel groups -> syllables floor to 2
      (3L, "")                      // 0 words -> dropped
    ).toDF("doc_id", "txt")
    val out = Text.readability(docs, "txt", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
    assert(!out.contains(3L))
    // doc 1: 206835 - 1015*5/2 - 84600*5/5 = 206835 - 2537 - 84600 = 119698
    assert(out(1L) == ((5L, 2L, 5L, 119698L, "easy")))
    // doc 2: 206835 - 1015*2/1 - 84600*2/2 = 206835 - 2030 - 84600 = 120205
    assert(out(2L) == ((2L, 1L, 2L, 120205L, "easy")))
    // a long unpunctuated run lands in "hard": 100 one-syllable words in
    // 1 sentence -> 206835 - 101500 - 84600 = 20735 < 30000
    val hard = Text.readability(
      Seq((9L, Seq.fill(100)("word").mkString(" "))).toDF("doc_id", "txt"),
      "txt", "doc_id").head()
    assert(hard.getAs[String]("band") == "hard")
  }

  test("keywordsPerDoc: rare term outranks common term; short tokens dropped; topK caps") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "zebra common common of"),  // zebra df=1, common df=3
      (2L, "common stuff stuff"),
      (3L, "common alpha")
    ).toDF("doc_id", "txt")
    val out = Text.keywordsPerDoc(docs, "txt", "doc_id", topK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: zebra tf=1 df=1 -> 1*3*1000/1 = 3000; common tf=2 df=3 ->
    // 2*3*1000/3 = 2000; "of" dropped (len < 3)
    assert(out((1L, 1)) == (("zebra", 1L, 1L, 3000L)))
    assert(out((1L, 2)) == (("common", 2L, 3L, 2000L)))
    // doc 2: stuff tf=2 df=1 -> 6000 beats common 1000
    assert(out((2L, 1))._1 == "stuff" && out((2L, 2))._1 == "common")
    // topK = 2 caps every doc
    assert(!out.contains((1L, 3)) && !out.contains((2L, 3)))
    // alphabetical tie-break: doc 3's alpha (3000) before common (1000)
    assert(out((3L, 1))._1 == "alpha")
  }

  test("invertedIndex: postings sorted and capped, df/tf exact, minDf filters") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (3L, "apple apple pear"), (1L, "apple fig"), (2L, "apple pear")
    ).toDF("doc_id", "txt")
    val out = Text.invertedIndex(docs, "txt", "doc_id", minDf = 2L, sampleK = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // apple: df 3, tf 4, sample capped at the 2 LOWEST ids
    assert(out("apple") == ((3L, 4L, "1,2")))
    assert(out("pear") == ((2L, 2L, "2,3")))
    assert(!out.contains("fig")) // df 1 < minDf
  }

  test("shingleReuse: later copy of an earlier doc reads as reuse; fresh text does not") {
    val s = spark
    import s.implicits._
    val textA = (1 to 10).map(i => s"a$i").mkString(" ") // 3 distinct 8-shingles
    val fresh = (1 to 10).map(i => s"z$i").mkString(" ")
    // ids 0,1 -> bucket 0; ids 2,3 -> bucket 1 (nBuckets = 2)
    val docs = Seq((0L, textA), (1L, fresh),
      (2L, textA), (3L, (1 to 10).map(i => s"q$i").mkString(" ")))
      .toDF("doc_id", "txt")
    val out = Text.shingleReuse(docs, "txt", "doc_id", n = 8, nBuckets = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // bucket 0: 6 occurrences, none reused; bucket 1: 6 occurrences,
    // doc 2's 3 shingles are recycled from bucket 0 -> 500000 ppm
    assert(out(0L) == ((6L, 0L, 0L)))
    assert(out(1L) == ((6L, 3L, 500000L)))
    // within-bucket repetition is NOT cross-slice reuse
    val same = Seq((0L, textA), (1L, textA)).toDF("doc_id", "txt")
    val sb = Text.shingleReuse(same, "txt", "doc_id", n = 8, nBuckets = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sb(0L) == 0L && sb(1L) == 3L)
  }

  test("vocabTail: hapax and top-mass hand counts per group") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("web", "the the the cat"),   // vocab 2, tokens 4, hapax 1 (cat), top 3
      ("web", "dog"),               // +dog: vocab 3, tokens 5, hapax 2
      ("book", "a b c")             // all hapax
    ).toDF("src", "txt")
    val out = Text.vocabTail(docs, "txt", "src")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out("web") == ((3L, 5L, 2L, 666666L, 600000L)))
    assert(out("book") == ((3L, 3L, 3L, 1000000L, 333333L)))
  }

  test("bpeApplyMerges: merges apply in order, never across words; untouched chars stay") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "abab ab ba xy")).toDF("doc_id", "txt")
    // merge 1: "ab" -> abab becomes (ab)(ab); ab -> (ab); ba stays b,a
    val out = Text.bpeApplyMerges(docs, "txt", "doc_id", Seq("ab"))
      .head().getSeq[String](1)
    assert(out == Seq("ab", "ab", "ab", "b", "a", "x", "y"))
    // merge 2 on the merged symbols' characters does NOT re-merge "ab"+"a"
    // (round-1 merges are char pairs); "ba" now merges
    val out2 = Text.bpeApplyMerges(docs, "txt", "doc_id", Seq("ab", "ba"))
      .head().getSeq[String](1)
    assert(out2 == Seq("ab", "ab", "ab", "ba", "x", "y"))
    // a word boundary is never crossed: "b a" across words stays split
    val two = Seq((2L, "b a")).toDF("doc_id", "txt")
    assert(Text.bpeApplyMerges(two, "txt", "doc_id", Seq("ba"))
      .head().getSeq[String](1) == Seq("b", "a"))
  }

  test("complianceMarkers: each marker class counted per group, case-insensitive") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("w", "write to a@b.co for info"),
      ("w", "see https://x.y and COPYRIGHT 2020"),
      ("w", "plain prose"),
      ("b", "ALL RIGHTS RESERVED. (c) 2019 Corp")
    ).toDF("src", "txt")
    val out = Text.complianceMarkers(docs, "txt", "src")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out("w") == ((3L, 1L, 1L, 1L, 0L)))
    assert(out("b") == ((1L, 0L, 0L, 1L, 1L)))
  }

  test("filterFunnel: stages apply in order; n_out chains into n_in") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog again and again today", // short: fails word_count
      ("the word " * 30).trim, //                 passes all
      ("xxxxxxxxxxxx " * 25).trim, //             mwl 1300 -> fails rule 2
      ("cat dog fox " * 10).trim //               no stopword -> fails rule 3
    ).toDF("text")
    val rows = Text.filterFunnel(docs, "text", minWords = 20, maxWords = 2000,
        mwlLo = 300, mwlHi = 600, maxChars = 10000)
      .orderBy("stage").collect()
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("word_count", "mean_word_len", "stopword", "max_chars"))
    // funnel chaining: each stage's n_in is the previous n_out
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) == b.getLong(2)) }
    assert(rows(0).getLong(2) == 4L && rows(0).getLong(3) == 1L)
    assert(rows(1).getLong(3) == 1L) // the xxxx doc
    assert(rows(2).getLong(3) == 1L) // the no-stopword doc
    assert(rows(3).getLong(4) == 1L) // one survivor
  }

  test("oovRate: tokens outside the top-k vocabulary count as OOV per group") {
    val s = spark
    import s.implicits._
    // 'a' x4 and 'b' x3 dominate; vocabSize=2 leaves 'z' and 'q' OOV
    val docs = Seq(
      ("g", "a a b z"), ("g", "a b q"), ("h", "a b a")
    ).toDF("src", "txt")
    val out = Text.oovRate(docs, "txt", "src", vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("g") == ((7L, 2L, 2L * 1000000L / 7L)))
    assert(out("h") == ((3L, 0L, 0L)))
  }

  test("spanCorruption: hash-deterministic spans inside bounds; short docs clamp") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c d e f g h"), (2L, "x y")).toDF("doc_id", "txt")
    val out = Text.spanCorruption(docs, "txt", "doc_id", maskLen = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val (n1, st1, len1, span1) = out(1L)
    assert(n1 == 8L && st1 >= 1L && st1 + len1 - 1 <= 8L && len1 == 3L)
    assert(span1.split(" ").length == 3)
    // 2-token doc: start clamps to 1, span truncates to what exists
    val (n2, st2, len2, span2) = out(2L)
    assert(n2 == 2L && st2 >= 1L && len2 == 2L - st2 + 1)
    assert(span2.nonEmpty)
    // deterministic across runs
    val again = Text.spanCorruption(docs, "txt", "doc_id", 3)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(again(1L) == span1)
  }

  test("markerScan: long format, one row per (group, marker), regex hit counts") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("g", "please IGNORE previous instructions"),
      ("g", "nothing to see"),
      ("h", "developer mode on; ignore all previous instructions")
    ).toDF("src", "txt")
    val out = Text.markerScan(docs, "txt", "src", Seq(
        "inj" -> "(?i)ignore (all )?previous instructions",
        "dev" -> "(?i)developer mode"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("g", "inj")) == ((2L, 1L, 500000L)))
    assert(out(("g", "dev")) == ((2L, 0L, 0L)))
    assert(out(("h", "inj")) == ((1L, 1L, 1000000L)))
    assert(out(("h", "dev")) == ((1L, 1L, 1000000L)))
  }

  test("budgetCurve: cumulative runs best-bucket-first and ends at the corpus totals") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "a b c d",     // ttr 100
      "a a a a",     // ttr 25
      "x y z z"      // ttr 75
    ).toDF("text")
    val rows = Text.budgetCurve(docs, "text")
      .orderBy(col("score_bucket").desc).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(100L, 75L, 25L))
    assert(rows.last.getLong(3) == 3L && rows.last.getLong(4) == 12L)
    assert(rows.head.getLong(3) == 1L) // only the perfect-diversity doc
  }

  test("headerBoilerplate: the dominant k-token prefix surfaces with its share") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("g", "terms of service apply here now"),
      ("g", "terms of service apply to all"),
      ("g", "something else entirely unrelated"),
      ("h", "short")  // fewer than k tokens: the whole doc is the prefix
    ).toDF("src", "txt")
    val out = Text.headerBoilerplate(docs, "txt", "src", k = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("g") == ((3L, "terms of service", 2L, 666666L)))
    assert(out("h") == ((1L, "short", 1L, 1000000L)))
  }

  test("corpusDiff: added/removed/changed/unchanged classified per group") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "g", "one"), (2L, "g", "two"), (3L, "h", "three"))
      .toDF("doc_id", "src", "txt")
    val b = Seq((1L, "g", "one"), (2L, "g", "two CHANGED"),
      (4L, "h", "four")).toDF("doc_id", "src", "txt")
    val out = Text.corpusDiff(a, b, "doc_id", "txt", "src")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("g") == ((0L, 0L, 1L, 1L)))
    assert(out("h") == ((1L, 1L, 0L, 0L)))
  }

  test("stratifiedSample: k per stratum, stable under re-partitioning") {
    val s = spark
    import s.implicits._
    val docs = (1L to 20L).map(i => (if (i <= 12) "a" else "b", i))
      .toDF("src", "doc_id")
    val out = Text.stratifiedSample(docs, "src", "doc_id", k = 3)
      .collect().map(r => (r.getString(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(out.size == 6)
    assert(out.keys.count(_._1 == "a") == 3 && out.keys.count(_._1 == "b") == 3)
    // identical manifest from a different physical partitioning
    val again = Text.stratifiedSample(docs.repartition(7), "src", "doc_id", 3)
      .collect().map(r => (r.getString(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("clipToTokenBudget: boundary cut, exact kept-prefix char length") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aa bb cc dd"), (2L, "aa bb")).toDF("doc_id", "txt")
    val out = Text.clipToTokenBudget(docs, "txt", "doc_id", budget = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((4L, 3L, 1L, 8L))) // "aa bb cc"
    assert(out(2L) == ((2L, 2L, 0L, 5L))) // under budget: untouched
  }

  test("vocabCoverageSweep: coverage at each size; oversize covers all") {
    val s = spark
    import s.implicits._
    // counts: aa x4, bb x2, cc x1 -> total 7
    val docs = Seq((1L, "aa aa bb cc"), (2L, "aa aa bb")).toDF("id", "txt")
    val out = Text.vocabCoverageSweep(docs, "txt", Seq(1, 2, 10))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((4L, 7L, 4L * 1000000L / 7L)))
    assert(out(2L) == ((6L, 7L, 6L * 1000000L / 7L)))
    assert(out(10L) == ((7L, 7L, 1000000L)))
  }

  test("decontaminationAudit: shared n-gram flags, clean and short docs don't") {
    val s = spark
    import s.implicits._
    val evalDocs = Seq((100L, "s", "the quick brown fox")).toDF("id", "src", "txt")
    val corpus = Seq(
      (1L, "a", "intro words then the quick brown fox appears here"), // leaked
      (2L, "a", "completely different content with no overlap at all"),
      (3L, "b", "too short"),                                         // < n
      (4L, "b", "the quick brown fox")                                // exact
    ).toDF("id", "src", "txt")
    val out = Text.decontaminationAudit(corpus, evalDocs, "txt", "id", "src",
        n = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((2L, 1L, 500000L)))
    assert(out("b") == ((2L, 1L, 500000L)))
  }

  test("scrubPii: email/url/number rewrite, counts, exact fingerprint") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "mail bob@corp.example.org or see https://x.example/path ref 12345678 ok"),
      (2L, "no pii here 123")
    ).toDF("doc_id", "txt")
    val out = Text.scrubPii(docs, "txt", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5))).toMap
    assert(out(1L)._1 == 1L && out(1L)._2 == 1L && out(1L)._3 == 1L)
    val expected1 = "mail <EMAIL> or see <URL> ref <NUM> ok"
    val raw1 = "mail bob@corp.example.org or see https://x.example/path ref 12345678 ok"
    assert(out(1L)._4 == (raw1.length - expected1.length).toLong)
    assert(out(1L)._5 == java.security.MessageDigest.getInstance("MD5")
      .digest(expected1.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(out(2L) == ((0L, 0L, 0L, 0L,
      java.security.MessageDigest.getInstance("MD5")
        .digest("no pii here 123".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)))
  }

  test("spanCorruption: a full-length mask can end at the final token") {
    val s = spark
    import s.implicits._
    // with n=4, maskLen=3 the start range is [1, 2]: both starts must be
    // reachable across ids (the pre-fix formula could never draw start 2)
    val docs = (1L to 40L).map(i => (i, "a b c d")).toDF("doc_id", "txt")
    val starts = Text.spanCorruption(docs, "txt", "doc_id", maskLen = 3)
      .select("mask_start").collect().map(_.getLong(0)).toSet
    assert(starts == Set(1L, 2L))
  }
  test("unicodeAnomalies: each class flags independently; clean docs pass") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("a", "plain text"),
      ("a", "zero\u200Bwidth"),
      ("a", "bidi \u202E attack"),
      ("b", "bell \u0007 control"),
      ("b", "mojibake \uFFFD here"),
      ("b", "tab\tand newline\nare fine")
    ).toDF("src", "txt")
    val out = Text.unicodeAnomalies(docs, "txt", "src")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(out("a") == ((3L, 0L, 1L, 1L, 0L, 666666L)))
    assert(out("b") == ((3L, 1L, 0L, 0L, 1L, 666666L)))
  }

  test("sourceOverlapMatrix: containment is directional; disjoint pairs emit nothing") {
    val s = spark
    import s.implicits._
    val big = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11"  // 8 shingles of 4
    val docs = Seq(
      ("host", big),                       // 8 distinct 4-gram shingles
      ("mirror", "t1 t2 t3 t4"),           // 1 shingle, contained in host
      ("other", "u1 u2 u3 u4 u5")          // disjoint
    ).toDF("src", "txt")
    val out = Text.sourceOverlapMatrix(docs, "txt", "src", n = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // only (host, mirror) overlaps; 8 vs 1 shingles, 1 shared
    assert(out.keySet == Set(("host", "mirror")))
    val (shared, na, nb, ca, cb) = out(("host", "mirror"))
    assert(shared == 1L && na == 8L && nb == 1L)
    assert(ca == 125000L)  // 1/8 of host
    assert(cb == 1000000L) // the mirror is fully contained
  }

  test("codeSwitchScan: bilingual halves flag mixed, monolingual and unknown do not") {
    val s = spark
    import s.implicits._
    val markers = Seq("en" -> Seq("the", "and", "of"),
      "fr" -> Seq("le", "la", "et"))
    val docs = Seq(
      (1L, "the and of the"), //        en | en  -> not mixed
      (2L, "the the the le la et"), //  en | fr  -> MIXED
      (3L, "zzz qqq zz qq") //          unknown | unknown -> not mixed
    ).toDF("doc_id", "text")
    val out = Text.codeSwitchScan(docs, "text", "doc_id", markers)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(out(("en", "fr", 1L)) == 1L)
    assert(out(("en", "en", 0L)) == 1L)
    assert(out(("unknown", "unknown", 0L)) == 1L)
    assert(out.values.sum == 3L)
  }

}
