package graft.operators

import graft.SparkSpec

class GraphsSpec extends SparkSpec {

  test("triangleStats: K4 plus a pendant has 4 triangles; dups/reversals/loops collapse") {
    val s = spark
    import s.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val noisy = (k4 ++ Seq((4L, 5L)) ++ // pendant edge: no new triangle
      k4.map(_.swap) ++ //                every edge also reversed
      Seq((2L, 1L), (3L, 3L))) //         duplicate + self-loop
      .toDF("a", "b")
    val r = Graphs.triangleStats(noisy, "a", "b").head()
    assert(r.getAs[Long]("n_edges") == 7)
    assert(r.getAs[Long]("n_triangles") == 4)
    // oriented wedge count for K4+pendant: every triangle contributes
    // exactly one closed wedge, and wedges >= triangles always
    assert(r.getAs[Long]("n_wedges") >= 4)
  }

  test("clusteringCoefficients: K4 vertices at 1.0, pendant at 0, bridge diluted") {
    val s = spark
    import s.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val df = (k4 ++ Seq((4L, 5L))).toDF("a", "b")
    val out = Graphs.clusteringCoefficients(df, "a", "b")
      .collect()
      .map(r => r.getAs[Long]("n") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("triangles"), r.getAs[Double]("coeff")))
      .toMap
    // vertices 1-3: degree 3, in 3 triangles each -> coeff 2*3/(3*2) = 1
    Seq(1L, 2L, 3L).foreach(v => assert(out(v) == ((3L, 3L, 1.0)), s"v$v"))
    // vertex 4 gains the pendant edge: degree 4, still 3 triangles -> 0.5
    assert(out(4L) == ((4L, 3L, 0.5)))
    // the pendant has degree 1: coeff 0 by convention
    assert(out(5L) == ((1L, 0L, 0.0)))
  }

  test("triangleStats: triangle-free graph (star + path) counts zero") {
    val s = spark
    import s.implicits._
    val star = (2L to 6L).map(i => (1L, i)) ++ Seq((6L, 7L), (7L, 8L))
    val r = Graphs.triangleStats(star.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Long]("n_edges") == 7)
    assert(r.getAs[Long]("n_triangles") == 0)
  }

  test("pageRank: symmetric graphs rank uniformly, exact scaled longs") {
    val s = spark
    import s.implicits._
    // K4 is vertex-transitive: every vertex must get the identical rank.
    // With scale = 1200 the uniform start r0 = 300 is divisible by the
    // degree (3), by 20 (85r/100 exact) and seeds an exact base term, so
    // the integer recurrence preserves the uniform fixed point verbatim.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val r = Graphs.pageRank(k4, "a", "b", iters = 5, scale = 1200L)
      .collect().map(x => x.getAs[Long]("n") -> x.getAs[Long]("rank")).toMap
    assert(r.size == 4)
    assert(r.values.toSet == Set(300L))
  }

  test("pageRank: star center outranks leaves; mass stays ~scale") {
    val s = spark
    import s.implicits._
    val star = (2L to 6L).map(i => (1L, i)).toDF("a", "b")
    val r = Graphs.pageRank(star, "a", "b", iters = 10)
      .collect().map(x => x.getAs[Long]("n") -> x.getAs[Long]("rank")).toMap
    assert(r(1L) > r(2L) * 2, s"center ${r(1L)} vs leaf ${r(2L)}")
    // leaves are symmetric
    assert((2L to 6L).map(r).toSet.size == 1)
    // total mass within integer-truncation slack of scale
    val total = r.values.sum
    assert(total > 999900000000L && total <= 1000000000000L, s"mass $total")
  }

  test("pageRank: dirty input (dups, reversals, self-loops) collapses first") {
    val s = spark
    import s.implicits._
    val clean = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val noisy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (3L, 3L))
      .toDF("a", "b")
    val a = Graphs.pageRank(clean, "a", "b").collect()
      .map(x => x.getAs[Long]("n") -> x.getAs[Long]("rank")).toMap
    val b = Graphs.pageRank(noisy, "a", "b").collect()
      .map(x => x.getAs[Long]("n") -> x.getAs[Long]("rank")).toMap
    assert(a == b)
  }

  test("labelPropagation: two triangles across a bridge settle into two communities") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("a", "b")
    // hand-run of the deterministic sync update (most-frequent neighbour
    // label, ties to smallest):
    //  r1: 1->2, 2->1, 3->1, 4->3, 5->4, 6->4
    //  r2: 1->1, 2->1, 3->1, 4->4, 5->3, 6->3
    //  r3: 1->1, 2->1, 3->1, 4->3, 5->3, 6->3
    val out = Graphs.labelPropagation(df, "a", "b", iters = 3).collect()
      .map(r => r.getAs[Long]("n") -> r.getAs[Long]("label")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation: iters=0 is the identity labelling") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Graphs.labelPropagation(df, "a", "b", iters = 0).collect()
      .map(r => r.getAs[Long]("n") -> r.getAs[Long]("label")).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("kCore: pendants and paths peel away, the triangle survives with in-core degrees") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L), (1L, 3L), (2L, 3L), // triangle = the 2-core
      (4L, 1L), (5L, 6L)).toDF("a", "b") // pendant + disconnected path
    val out = Graphs.kCore(df, "a", "b", k = 2, rounds = 2).collect()
      .map(r => r.getAs[Long]("n") -> r.getAs[Long]("deg")).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: a graph below k empties out") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assert(Graphs.kCore(df, "a", "b", k = 2, rounds = 2).count() == 0)
  }

  test("linkPrediction: square predicts its two diagonals; adjacency is excluded") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val out = Graphs.linkPrediction(df, "a", "b").collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("common"), r.getAs[Long]("ra_score"))).toSet
    // diagonals: two common neighbours of degree 2 each -> ra = 2 * 10^6/2
    assert(out == Set((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
  }

  test("linkPrediction: triangle + pendant scores through the shared vertex") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Graphs.linkPrediction(df, "a", "b").collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("common"), r.getAs[Long]("ra_score"))).toSet
    // (1,4) and (2,4) share only vertex 3 (deg 3): ra = 10^6 div 3
    assert(out == Set((1L, 4L, 1L, 333333L), (2L, 4L, 1L, 333333L)))
  }

  test("linkPrediction: hubs above maxDeg are excluded as intermediates") {
    val s = spark
    import s.implicits._
    val star = (1L to 5L).map(i => (0L, i)).toDF("a", "b")
    assert(Graphs.linkPrediction(star, "a", "b", maxDeg = 4).count() == 0)
    // with the cap lifted the star predicts all C(5,2) leaf pairs
    assert(Graphs.linkPrediction(star, "a", "b", maxDeg = 5).count() == 10)
  }

  test("hits: in-star concentrates authority on the center, hubs on the pointers") {
    val s = spark
    import s.implicits._
    // 4 sources all point at vertex 0: auth(0) = max = scale, sources
    // are the (equal) top hubs = scale, and nobody else scores
    val star = (1L to 4L).map(i => (i, 0L)).toDF("s", "d")
    val out = Graphs.hits(star, "s", "d", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((0L, 0L, 1000000L), (1L, 1000000L, 0L),
      (2L, 1000000L, 0L), (3L, 1000000L, 0L), (4L, 1000000L, 0L)))
  }

  test("hits: bipartite weighting favours the dst with more in-links, dedups edges") {
    val s = spark
    import s.implicits._
    // srcs 1,2,3 -> dst 10; src 1 -> dst 20; duplicate edges collapse
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L), (1L, 10L))
      .toDF("s", "d")
    val out = Graphs.hits(e, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // dst 10 (3 in-links) is the max authority; dst 20 strictly less
    assert(out(10L)._2 == 1000000L)
    assert(out(20L)._2 > 0L && out(20L)._2 < 1000000L)
    // src 1 points at both dsts -> strictly the top hub
    assert(out(1L)._1 == 1000000L)
    assert(out(2L)._1 < 1000000L && out(2L)._1 == out(3L)._1)
    // dsts have no out-edges -> hub 0; srcs have no in-edges -> auth 0
    assert(out(10L)._1 == 0L && out(1L)._2 == 0L)
  }

  test("hits is partition-invariant") {
    val s = spark
    import s.implicits._
    val e = (0 until 200).map(i => ((i % 13).toLong, (100 + i % 7).toLong))
      .toDF("s", "d")
    def run(d: org.apache.spark.sql.DataFrame) =
      Graphs.hits(d, "s", "d", iters = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(e) == run(e.repartition(11)))
  }

  test("shortestHops: path graph distances, hop cap, unreachable absent") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4-5-6 plus a disconnected edge 10-11
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (10L, 11L))
      .toDF("a", "b")
    val seeds = Seq(1L).toDF("n")
    val out = Graphs.shortestHops(e, "a", "b", seeds, "n", maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    // vertex 6 is 5 hops out (beyond the cap); 10/11 unreachable — absent
  }

  test("shortestHops: multi-seed takes the minimum; edges undirected") {
    val s = spark
    import s.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val out = Graphs.shortestHops(e, "a", "b", Seq(1L, 5L).toDF("n"), "n", 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 3 is 2 hops from both ends; 4 is 1 hop from seed 5 (reverse edge)
    assert(out == Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("shortestHops: early exit on exhausted frontier returns seeds of an edgeless vertex") {
    val s = spark
    import s.implicits._
    val e = Seq((1L, 2L)).toDF("a", "b")
    // seed 7 has no edges: frontier empties after round 1, loop stops
    val out = Graphs.shortestHops(e, "a", "b", Seq(7L).toDF("n"), "n", 50)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(7L -> 0))
  }

  test("personalizedPageRank: all-vertices seed set degenerates to plain pageRank") {
    val s = spark
    import s.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("a", "b")
    val allV = Seq(1L, 2L, 3L, 4L).toDF("n")
    val ppr = Graphs.personalizedPageRank(e, "a", "b", allV, "n", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = Graphs.pageRank(e, "a", "b", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr == pr)
  }

  test("personalizedPageRank: driver replay of the integer recurrence; non-vertex seeds ignored") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4-5, seed at 1 (99 is not a vertex -> dropped)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val scale = 1000000000000L
    val out = Graphs.personalizedPageRank(e, "a", "b",
        Seq(1L, 99L).toDF("n"), "n", iters = 4, scale = scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 5 && !out.contains(99L))
    // exact driver-side replay of the scaled-integer recurrence
    val deg = Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 1L)
    val nbr = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L, 4L),
      4L -> Seq(3L, 5L), 5L -> Seq(4L))
    var r = Map(1L -> scale, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L)
    for (_ <- 1 to 4)
      r = r.keys.map { v =>
        val tele = if (v == 1L) ((scale * 15) / 100) / 1 else 0L
        v -> (tele + 85 * nbr(v).map(u => r(u) / deg(u)).sum / 100)
      }.toMap
    assert(out == r)
  }

  test("modularity: two triangles + bridge under the natural split; unassigned nodes drop") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("u", "v")
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L),
      (6L, 1L)).toDF("n", "c")
    val rows = Graphs.modularity(edges, "u", "v", assign, "n", "c")
      .collect().map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("e_in"),
          r.getAs[Long]("d_sum"), r.getAs[Long]("contrib_ppm"),
          r.getAs[Long]("modularity_ppm"))).toMap
    // m=7; each side: e_in=3, d_sum=7 -> intra = 3e6 div 7 = 428571,
    // exp = 49e6 div 196 = 250000, contrib = 178571, Q = 357142
    assert(rows == Map(
      0L -> ((3L, 3L, 7L, 178571L, 357142L)),
      1L -> ((3L, 3L, 7L, 178571L, 357142L))))
    // node 6 unassigned: community 1 keeps only the (4,5) intra edge
    val partial = Graphs.modularity(edges, "u", "v",
        assign.filter($"n" =!= 6L), "n", "c")
      .collect().map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("e_in"),
          r.getAs[Long]("d_sum"))).toMap
    assert(partial(1L) == ((2L, 1L, 5L)))
    assert(partial(0L) == ((3L, 3L, 7L)))
  }

  test("degreeAssortativity: star is maximally disassortative; regular graph reports 0") {
    val s = spark
    import s.implicits._
    // star K1,3: center deg 3, leaves deg 1; orientation terms:
    // (3,1)x3 and (1,3)x3 -> n=6, sum_x=12, sum_xy=18, sum_x2=30
    // num = 6*18 - 144 = -36; den = 6*30 - 144 = 36; r = -1 exactly
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    val r = Graphs.degreeAssortativity(star, "u", "v").head()
    assert(r.getAs[Long]("n_terms") == 6L)
    assert(r.getAs[Long]("num") == -36L && r.getAs[Long]("den") == 36L)
    assert(r.getAs[Long]("r_milli") == -1000L)
    // triangle: 2-regular -> den 0, r reports 0; dirty input (dups,
    // self-loops, reversed copies) canonicalizes away
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (1L, 1L))
      .toDF("u", "v")
    val t = Graphs.degreeAssortativity(tri, "u", "v").head()
    assert(t.getAs[Long]("n_terms") == 6L)
    assert(t.getAs[Long]("den") == 0L && t.getAs[Long]("r_milli") == 0L)
    // floor semantics on the negative numerator: path graph P3 —
    // degrees 1,2,1; terms (1,2)(2,1)(2,1)(1,2): n=4 sum_x=6 sum_xy=8
    // sum_x2=10: num=-4, den=4 -> r exactly -1000 milli
    val p3 = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    assert(Graphs.degreeAssortativity(p3, "u", "v")
      .head().getAs[Long]("r_milli") == -1000L)
  }

  test("associationRules: hand support/confidence/lift; mega-basket dropped by cap") {
    val s = spark
    import s.implicits._
    // baskets: {1,2} x3, {1,3} x1 -> occ(1)=4, occ(2)=3, occ(3)=1, n=4
    val bi = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (13L, 1L), (13L, 3L)).toDF("b", "i")
    val out = Graphs.associationRules(bi, "b", "i", minSupport = 2L, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(6), r.getLong(7))).toMap
    // 1->2: support 3, conf 3/4 = 750000, lift 3*4/(4*3) = 1000000
    assert(out((1L, 2L)) == ((3L, 750000L, 1000000L)))
    // 2->1: conf 3/3 = 1000000, same lift
    assert(out((2L, 1L)) == ((3L, 1000000L, 1000000L)))
    assert(!out.contains((1L, 3L))) // support 1 < minSupport
    // a basket over the cap contributes nothing
    val mega = bi.unionAll((1L to 5L).map(i => (99L, 100 + i)).toDF("b", "i"))
    val capped = Graphs.associationRules(mega, "b", "i",
      minSupport = 2L, topK = 10, maxBasket = 4)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (2L, 1L)))
  }

  test("closenessFromSeeds: path-graph hand values; maxHops truncates; isolated seed reaches 0") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4: from seed 1: dists 1,2,3 -> reached 3, sum 6,
    // harmonic 1e6 + 5e5 + 333333
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val out = Graphs.closenessFromSeeds(p, "u", "v", Seq(1L, 9L), maxHops = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 6L, 1833333L)))
    assert(out(9L) == ((0L, 0L, 0L))) // seed not in the graph
    // maxHops = 1 sees only the direct neighbour
    val near = Graphs.closenessFromSeeds(p, "u", "v", Seq(1L), maxHops = 1)
      .head()
    assert(near.getLong(1) == 1L && near.getLong(3) == 1000000L)
  }

  test("communityConductance: two cliques joined by one bridge have low conductance") {
    val s = spark
    import s.implicits._
    // clique {1,2,3}, clique {10,11,12}, bridge 3-10
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("a", "b")
    val out = Graphs.communityConductance(edges, "a", "b", iters = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // volumes sum to 2|E| = 14; every cross-community edge is counted once
    // per side, so total cut = 2 * bridges
    assert(out.values.map(_._2).sum == 14L)
    assert(out.values.map(_._3).sum % 2 == 0L)
    // conductance of every community is at most ~1/3 (1 bridge / vol >= 6)
    out.values.foreach { case (_, vol, cut, phi) =>
      assert(phi == cut * 1000000L / math.min(vol, 14L - vol)) }
  }

  test("edgeSampleAudit: keepPpm=1e6 keeps everything, 0 keeps nothing; buckets are octaves") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)).toDF("a", "b")
    val all = Graphs.edgeSampleAudit(edges, "a", "b", keepPpm = 1000000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // degrees: 1->3 (bucket 2), 2->2 (bucket 2), 3->2 (bucket 2), 4->1 (bucket 1)
    assert(all == Map(1L -> ((1L, 1L)), 2L -> ((3L, 3L))))
    val none = Graphs.edgeSampleAudit(edges, "a", "b", keepPpm = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(none.values.forall(_ == 0L))
  }

  test("itemCf: cosine^2-ppm on co-occurrence counts; hub baskets dropped") {
    val s = spark
    import s.implicits._
    // baskets: {1,2} twice, {1,3} once, plus a hub basket that must be
    // ignored under maxBasket = 3
    val baskets = Seq(
      (10L, 1L), (10L, 2L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L),
      (99L, 1L), (99L, 2L), (99L, 3L), (99L, 4L) // hub: size 4 > cap
    ).toDF("o", "p")
    val out = Graphs.itemCf(baskets, "o", "p", k = 2, maxBasket = 3)
      .collect().map(r => (r.getLong(0), r.getInt(4)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // c_1 = 3, c_2 = 2, c_12 = 2 -> 4e6/6 = 666666; c_13 = 1 -> 1e6/3
    assert(out((1L, 1)) == ((2L, 2L, 666666L)))
    assert(out((1L, 2)) == ((3L, 1L, 333333L)))
    assert(out((2L, 1)) == ((1L, 2L, 666666L)))
    assert(out((3L, 1)) == ((1L, 1L, 333333L)))
    // the hub-only item 4 never appears
    assert(!out.keys.exists(_._1 == 4L))
  }

  test("kTruss: k=4 keeps the 4-clique, peels the pendant triangle; k=3 keeps both") {
    val s = spark
    import s.implicits._
    // K4 on {1,2,3,4} (every edge closes 2 triangles) + a triangle
    // {4,5,6} hanging off it (each of its edges closes exactly 1)
    val k4 = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    val tri = Seq((4L,5L),(5L,6L),(4L,6L))
    val edges = (k4 ++ tri).toDF("a", "b")
    val out4 = Graphs.kTruss(edges, "a", "b", k = 4, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out4.keySet == k4.toSet)
    assert(out4.values.forall(_ == 2L))
    val out3 = Graphs.kTruss(edges, "a", "b", k = 3, iters = 3)
    assert(out3.count() == 9L) // every edge closes >= 1 triangle
  }

  test("doubleSweepDiameter: exact on a path graph; ties break to smaller id") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4-5 plus a spur 3-9: diameter = 4 (1..5)
    val edges = Seq((1L,2L),(2L,3L),(3L,4L),(4L,5L),(3L,9L)).toDF("a","b")
    val r = Graphs.doubleSweepDiameter(edges, "a", "b", seed = 3L,
      maxHops = 10).head()
    // from 3: farthest are 1,5,9 at dist 2 -> tie picks 1; from 1:
    // farthest is 5 at dist 4 = the true diameter
    assert(r.getAs[Long]("sweep1_far") == 1L)
    assert(r.getAs[Long]("sweep1_ecc") == 2L)
    assert(r.getAs[Long]("sweep2_far") == 5L)
    assert(r.getAs[Long]("diameter_lb") == 4L)
    assert(r.getAs[Long]("n_reached") == 6L)
  }

  test("randomWalks: every step follows an edge, walks never dead-end, corpus is deterministic") {
    val s = spark
    import s.implicits._
    // triangle 1-2-3 plus pendant 3-4 (undirected mirroring: 4 can walk back)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Graphs.randomWalks(edges, "a", "b", len = 3, walksPerNode = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 4 nodes x 2 walks x 4 steps (0..3)
    assert(out.length == 32)
    val byWalk = out.groupBy(_._1)
    assert(byWalk.size == 8)
    val adj = Set((1L,2L),(2L,3L),(1L,3L),(3L,4L)).flatMap { case (u,v) =>
      Set((u,v),(v,u)) }
    byWalk.values.foreach { steps =>
      val sorted = steps.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == Seq(0L, 1L, 2L, 3L)) // full length, no dead end
      assert(sorted.head._4 == sorted.head._2) // step 0 is the seed
      sorted.toSeq.sliding(2).foreach { pair =>
        val (x, y) = (pair(0), pair(1))
        assert(adj((x._4, y._4)), s"non-edge hop ${x._4}->${y._4}")
      }
    }
    // pure function of the graph: identical corpus under any partitioning
    val again = Graphs.randomWalks(edges.repartition(7), "a", "b",
        len = 3, walksPerNode = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(x => (x._1, x._3)).toSeq == out.sortBy(x => (x._1, x._3)).toSeq)
  }

  test("louvainSweep: triangles coalesce by least label, the hand modularity matches exactly") {
    val s = spark
    import s.implicits._
    // two triangles joined by a bridge (the qg11 modularity fixture)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val out = Graphs.louvainSweep(edges, "a", "b").head()
    assert(out.getAs[Long]("n_vertices") == 6L)
    assert(out.getAs[Long]("n_edges") == 7L)
    // every vertex has a positive singleton-merge gain (4m = 28 > 2kikj)
    assert(out.getAs[Long]("n_merged") == 6L)
    // least-label coalescing: {1,2,3} via min-degree targets, {5,6}
    // mutual pair, 4 alone (its min-degree target 5 labels as 4? no —
    // 4 -> least(4,5) = 4, 5 -> least(5,6) = 5, 6 -> least(5,6) = 5)
    assert(out.getAs[Long]("n_communities") == 3L)
    // hand modularity of {1,2,3},{4},{5,6} at m = 7, scale 1e6:
    //  c1: 3e6 div 7 - 49e6 div 196 = 428571 - 250000 = 178571
    //  c4: 0       - 9e6 div 196  =        - 45918
    //  c5: 1e6 div 7 - 16e6 div 196 = 142857 - 81632 = 61225
    assert(out.getAs[Long]("modularity_ppm") == 178571L - 45918L + 61225L)
  }

  test("node2vecWalks: hops follow edges, degree-1 backtrack is forced, weights steer the corpus") {
    val s = spark
    import s.implicits._
    // triangle 1-2-3 with pendant 3-4: walks reaching 4 can only go back
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val adj = Set((1L,2L),(2L,3L),(1L,3L),(3L,4L)).flatMap { case (u,v) =>
      Set((u,v),(v,u)) }
    def corpus(wr: Int, wc: Int, wo: Int) =
      Graphs.node2vecWalks(edges, "a", "b", len = 3, walksPerNode = 1,
          wReturn = wr, wCommon = wc, wOut = wo)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val out = corpus(1, 4, 2)
    assert(out.length == 16) // 4 seeds x 4 steps
    out.groupBy(_._1).values.foreach { steps =>
      val sorted = steps.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == Seq(0L, 1L, 2L, 3L))
      assert(sorted.head._4 == sorted.head._2)
      sorted.toSeq.sliding(2).foreach { pair =>
        assert(adj((pair(0)._4, pair(1)._4)),
          s"non-edge hop ${pair(0)._4}->${pair(1)._4}")
      }
      // forced backtrack: any visit to degree-1 node 4 must return to 3
      sorted.toSeq.sliding(2).foreach { pair =>
        if (pair(0)._4 == 4L) assert(pair(1)._4 == 3L)
      }
    }
    // deterministic replay under any partitioning
    val again = Graphs.node2vecWalks(edges.repartition(5), "a", "b",
        len = 3, walksPerNode = 1, wReturn = 1, wCommon = 4, wOut = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(x => (x._1, x._3)).toSeq ==
      out.sortBy(x => (x._1, x._3)).toSeq)
    // the bias is live: crushing the return weight changes the corpus
    val ret = corpus(1000000, 1, 1)
    assert(ret.sortBy(x => (x._1, x._3)).toSeq !=
      out.sortBy(x => (x._1, x._3)).toSeq)
  }

}
