package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  // tiny 4-dim corpus: 1 ~ query, 2 orthogonal, 3 = scaled copy of 1
  private lazy val emb = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "a", Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, "a", Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, "a", Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, "b", Seq(0.5f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
  }

  test("topKCosine ranks the near-parallel vector first, scaled copy = 1.0") {
    val top = Similarity.topKCosine(emb, "embedding", "vec_id", 0L, 3).collect()
    assert(top.map(_.getAs[Long]("vec_id")).toSeq == Seq(3L, 1L, 2L))
    assert(top(0).getAs[Double]("cos_sim") == 1.0) // scaling preserves cosine
    assert(top(2).getAs[Double]("cos_sim") == 0.0) // orthogonal
  }

  test("blockedCosinePairs stays within blocks") {
    val pairs = Similarity.blockedCosinePairs(emb, "embedding", "vec_id", "label")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L))) // block "b" has 1 vec
  }

  test("blockedCosinePairs: a block above maxBlock is dropped, not exploded") {
    val s = spark
    import s.implicits._
    // block "big" has 5 vectors (> cap of 4), block "ok" has 3
    val df = ((0 until 5).map(i => (i.toLong, "big", Seq(1.0f, i.toFloat))) ++
      (10 until 13).map(i => (i.toLong, "ok", Seq(1.0f, i.toFloat)))).toDF(
      "vec_id", "label", "embedding")
    val pairs = Similarity.blockedCosinePairs(df, "embedding", "vec_id", "label", maxBlock = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((10L, 11L), (10L, 12L), (11L, 12L)))
    // default cap is invisible for sane blocks
    val all = Similarity.blockedCosinePairs(df, "embedding", "vec_id", "label")
      .collect()
    assert(all.length == 10 + 3) // C(5,2) + C(3,2)
  }

  test("lshBuckets: parallel vectors share a bucket, deterministic across runs") {
    val b1 = Similarity.lshBuckets(emb, "embedding", "vec_id", 8, 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    val b2 = Similarity.lshBuckets(emb, "embedding", "vec_id", 8, 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    assert(b1 == b2) // md5-derived hyperplanes: no RNG state
    assert(b1(0L) == b1(3L)) // exactly parallel -> identical sign bits
  }

  test("ivfTopK returns the brute-force answer when every cell is probed") {
    val ivf = Similarity.ivfTopK(emb, "embedding", "vec_id", 0L, 3,
        sampleMod = 2, nprobe = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val brute = Similarity.topKCosine(emb, "embedding", "vec_id", 0L, 3)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(ivf.toSet.subsetOf(brute.toSet))
    assert(ivf.nonEmpty)
  }

  test("centroidSample is size-capped: codebook size is constant as the corpus doubles") {
    val s = spark
    import s.implicits._
    def cents(n: Int) = {
      val df = (0 until n).map(i => (i.toLong, Seq(i.toFloat, 1.0f)))
        .toDF("vec_id", "embedding")
      val e = df.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
        .withColumn("qq", expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x * x)"))
      Similarity.centroidSample(e, "vec_id", 3, 16)
    }
    // the cap binds: 100 then 200 mod-sample hits, both clamp to 16
    assert(cents(300).count() == 16L)
    assert(cents(600).count() == 16L)
    // deterministic: the FIRST 16 sampled ids in id order
    val ids = cents(600).orderBy("cid").collect().map(_.getAs[Long]("cid")).toSeq
    assert(ids == (0L until 48L by 3L).toSeq)
    // below the cap the sample passes through untouched
    assert(cents(30).count() == 10L)
  }

  // 3 well-separated clusters in 4-d; 10 vectors each, query = id 0
  private lazy val clustered = {
    val s = spark
    import s.implicits._
    val rows = for {
      c <- 0 until 3
      i <- 0 until 10
    } yield {
      val base = Array(0.0f, 0.0f, 0.0f, 0.0f)
      base(c) = 10.0f
      base((c + 1) % 4) = 0.1f * i // small deterministic spread
      ((c * 10 + i).toLong, base.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("ivfTopKTrained: full probe == brute force; 1-cell probe finds the query's own cluster") {
    val brute = Similarity.topKCosine(clustered, "embedding", "vec_id", 0L, 5)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val full = Similarity.ivfTopKTrained(clustered, "embedding", "vec_id", 0L, 5,
        nCells = 3, nprobe = 3)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(full == brute) // the qv05 invariant, exactly
    // partial probe: trained cells align with the true clusters, so the
    // single probed cell holds the query's 9 cluster-mates
    val partial = Similarity.ivfTopKTrained(clustered, "embedding", "vec_id", 0L, 5,
        nCells = 3, nprobe = 1)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(partial.toSet.subsetOf((1L to 9L).toSet),
      s"probed cell should be the query's cluster, got $partial")
    assert(partial.size == 5)
    // determinism: same seed + data -> same model -> same result
    val again = Similarity.ivfTopKTrained(clustered, "embedding", "vec_id", 0L, 5,
        nCells = 3, nprobe = 1)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(again == partial)
  }

  test("batchTopKCosine: each query's per-query ranking equals the single-query operator") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val emb = (0L until 30L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val batch = Similarity.batchTopKCosine(emb, emb.filter($"vec_id" < 3),
        "embedding", "vec_id", "vec_id", k = 4)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq
      }
    (0L until 3L).foreach { q =>
      val single = Similarity.topKCosine(emb, "embedding", "vec_id", q, 4)
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      assert(batch(q) == single, s"query $q")
    }
  }

  test("tfidfCosinePairs: identical docs cos 1.0, df cap drops common tokens") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "blk", "rare tokens appear here"),
      (2L, "blk", "rare tokens appear here"), // identical -> cos 1.0
      (3L, "blk", "rare words somewhere else"), // shares only "rare"
      (4L, "blk", "unrelated content entirely different"),
      (5L, "oth", "rare tokens appear here")) // other block: no pair
      .toDF("doc_id", "source", "text")
    val out = Similarity.tfidfCosinePairs(docs, "text", "doc_id", "source",
        scale = 1000, maxDf = 100)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("cos"))).toMap
    assert(math.abs(out((1L, 2L)) - 1.0) < 1e-12)
    assert(out((1L, 3L)) > 0 && out((1L, 3L)) < 0.5) // one shared token
    assert(!out.keySet.exists { case (a, b) => a == 4L || b == 4L })
    assert(!out.keySet.exists { case (a, b) => a == 5L || b == 5L }) // blocked
    // df cap: "rare" is in 4 docs; with maxDf = 3 it is cut and the only
    // cross-doc similarity left is the identical pairs' remaining tokens
    val capped = Similarity.tfidfCosinePairs(docs, "text", "doc_id", "source",
        scale = 1000, maxDf = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(capped == Set((1L, 2L)))
  }

  test("pqTopK: with every vector its own centroid, ADC distance IS exact L2 top-k") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 30L).map(i => (i, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("vec_id", "embedding")
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(e => math.round(e.toDouble * 10000))
    val q0 = quant(rows.head._2)
    val exact = rows.drop(1).map { case (id, v) =>
      (id, quant(v).zip(q0).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy { case (id, d) => (d, id) }.take(5)
    // sampleMod = 1: codebook = all vectors, codes locate each subvector
    // exactly, ADC == exact L2
    val got = Similarity.pqTopK(df, "embedding", "vec_id", 0L, 5,
        m = 2, sampleMod = 1)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("adist"))).toSeq
    assert(got == exact)
    // coarse codebook (4 centroids): still returns k rows, adist >= 0
    val coarse = Similarity.pqTopK(df, "embedding", "vec_id", 0L, 5,
        m = 2, sampleMod = 8)
      .collect()
    assert(coarse.length == 5 && coarse.forall(_.getAs[Long]("adist") >= 0))
  }

  test("ivfPqTopK: probing every cell equals the full PQ ADC scan") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(19)
    val df = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val full = Similarity.pqTopK(df, "embedding", "vec_id", 0L, 6,
        m = 2, sampleMod = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val probedAll = Similarity.ivfPqTopK(df, "embedding", "vec_id", 0L, 6,
        m = 2, sampleMod = 7, nprobe = 6) // 6 cells (ids 0,7,...,35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(probedAll == full)
    // partial probe returns k rows with non-decreasing adist
    val partial = Similarity.ivfPqTopK(df, "embedding", "vec_id", 0L, 6,
        m = 2, sampleMod = 7, nprobe = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(partial.size == 6 && partial == partial.sorted)
  }

  test("pqTopKTrained: nCodes >= trainRows >= corpus is exact L2; partial K is deterministic and clustered-recall-bearing") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0L until 30L).map(i => (i, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("vec_id", "embedding")
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(e => math.round(e.toDouble * 10000))
    val q0 = quant(rows.head._2)
    val exact = rows.drop(1).map { case (id, v) =>
      (id, quant(v).zip(q0).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy { case (id, d) => (d, id) }.take(5)
    // the qv13 invariant: every training point its own center -> exact L2
    val got = Similarity.pqTopKTrained(df, "embedding", "vec_id", 0L, 5,
        m = 2, nCodes = 30, trainRows = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == exact)
    // genuinely trained partial-K path on clustered data: the ADC top-5
    // stays inside the query's cluster, and the same seed reproduces it
    val t1 = Similarity.pqTopKTrained(clustered, "embedding", "vec_id", 0L, 5,
        m = 2, nCodes = 3, trainRows = 30, iters = 8)
      .collect().map(_.getLong(0)).toSeq
    val t2 = Similarity.pqTopKTrained(clustered, "embedding", "vec_id", 0L, 5,
        m = 2, nCodes = 3, trainRows = 30, iters = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(t1 == t2, "same seed + data must reproduce the same codebook")
    assert(t1.toSet.subsetOf((1L to 9L).toSet),
      s"trained codes should keep the query's cluster nearest, got $t1")
  }

  test("ivfPqTopKResidual: probe-all covers every id; residual ADC error < raw on clustered data") {
    val s = spark
    import s.implicits._
    // 3 clusters at distant absolute positions, the SAME local offset
    // pattern inside each — residuals repeat across clusters, so a tiny
    // residual codebook represents them better than raw absolute rows
    val rows = for {
      c <- 0 until 3
      i <- 0 until 10
    } yield {
      val v = Array.fill(8)(0.0f)
      v(c) = 10.0f
      v(3) = 0.3f * i
      ((c * 10 + i).toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(e => math.round(e.toDouble * 10000))
    val q0 = quant(rows.head._2)
    val exact = rows.drop(1).map { case (id, v) =>
      id -> quant(v).zip(q0).map { case (a, b) => (a - b) * (a - b) }.sum
    }.toMap
    // sampleMod = 10 -> cells anchored at ids 0, 10, 20 (one per cluster)
    val res = Similarity.ivfPqTopKResidual(df, "embedding", "vec_id", 0L, 29,
        m = 2, sampleMod = 10, nprobe = 3, nCodes = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res.keySet == (1L until 30L).toSet,
      "probe-all must score every non-query id exactly once")
    val raw = Similarity.ivfPqTopK(df, "embedding", "vec_id", 0L, 29,
        m = 2, sampleMod = 10, nprobe = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def meanErr(adist: Map[Long, Long]): Double =
      adist.map { case (id, a) => math.abs(a - exact(id)).toDouble }.sum / adist.size
    assert(meanErr(res) < meanErr(raw),
      s"residual ADC error ${meanErr(res)} should undercut raw ${meanErr(raw)}")
  }

  test("ivfPqTopKTrainedResidual: exact in the degenerate config; recall >= deterministic variant at equal budget; deterministic") {
    val s = spark
    import s.implicits._
    // same clustered geometry as the residual spec: distant clusters,
    // repeated local offsets
    val rows = for {
      c <- 0 until 3
      i <- 0 until 10
    } yield {
      val v = Array.fill(8)(0.0f)
      v(c) = 10.0f
      v(3) = 0.3f * i
      ((c * 10 + i).toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(e => math.round(e.toDouble * 10000))
    val q0 = quant(rows.head._2)
    val exactD = rows.drop(1).map { case (id, v) =>
      id -> quant(v).zip(q0).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    // 1) degenerate config = exact L2: every training residual its own
    // code (nCodes >= trainRows >= corpus) + probe-all -> ADC distance
    // is ||q - v||^2 exactly, whatever KMeans learned for the cells
    val all = Similarity.ivfPqTopKTrainedResidual(df, "embedding", "vec_id",
        0L, 29, m = 2, nCells = 3, nprobe = 3, nCodes = 30, trainRows = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(all.toMap == exactD.toMap,
      s"degenerate trained-residual ADC must equal exact L2")
    // 2) at a REAL code budget, trained cells + trained residual
    // codebooks must recall the true top-5 at least as well as the
    // deterministic id-sample variant with the same budget
    val trueTop5 = exactD.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    def recall(ids: Seq[Long]): Double = ids.toSet.intersect(trueTop5).size / 5.0
    val trained = Similarity.ivfPqTopKTrainedResidual(df, "embedding", "vec_id",
        0L, 5, m = 2, nCells = 3, nprobe = 1, nCodes = 4, trainRows = 30)
      .collect().map(_.getLong(0)).toSeq
    val deterministic = Similarity.ivfPqTopKResidual(df, "embedding", "vec_id",
        0L, 5, m = 2, sampleMod = 10, nprobe = 1, nCodes = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(recall(trained) >= recall(deterministic),
      s"trained recall ${recall(trained)} < deterministic ${recall(deterministic)}")
    assert(recall(trained) >= 0.8, s"trained top-5 $trained misses $trueTop5")
    // 3) seeded end to end: same data -> same result
    val again = Similarity.ivfPqTopKTrainedResidual(df, "embedding", "vec_id",
        0L, 5, m = 2, nCells = 3, nprobe = 1, nCodes = 4, trainRows = 30)
      .collect().map(_.getLong(0)).toSeq
    assert(again == trained)
  }

  test("sqTopK: scale-1 corpus is exact brute force; int8 codes stay in range; recall holds at real scales") {
    val s = spark
    import s.implicits._
    // magnitudes <= 0.0127 land on the quantized grid within [-127, 127]
    // -> scale 1, codes == q, ranking exactly brute force
    val tiny = (0L until 20L).map { i =>
      (i, (0 until 8).map(j => ((i * 7 + j * 3) % 255 - 127) / 10000.0f))
    }.toDF("vec_id", "embedding")
    val brute = Similarity.topKCosine(tiny, "embedding", "vec_id", 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    val sq = Similarity.sqTopK(tiny, "embedding", "vec_id", 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(sq == brute, s"scale-1 SQ must equal brute force: $sq vs $brute")
    // real magnitudes: scale > 1, codes within [-127, 127], index schema
    // is 1-byte codes
    val real = (0L until 30L).map { i =>
      (i, (0 until 8).map(j => math.sin(i * 1.7 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val enc = Similarity.sqEncode(real, "embedding", "vec_id")
    assert(enc.schema("codes").dataType.asInstanceOf[
      org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.ByteType)
    val rows = enc.collect()
    assert(rows.forall(_.getSeq[Byte](2).forall(c => c >= -127 && c <= 127)))
    assert(rows.exists(_.getLong(1) > 1L), "real magnitudes must need scale > 1")
    // recall vs brute force at 8-bit precision on smooth vectors: top-5
    // overlap >= 4/5
    val b5 = Similarity.topKCosine(real, "embedding", "vec_id", 0L, 5)
      .collect().map(_.getLong(0)).toSet
    val s5 = Similarity.sqTopK(real, "embedding", "vec_id", 0L, 5)
      .collect().map(_.getLong(0)).toSet
    assert(b5.intersect(s5).size >= 4, s"SQ top-5 $s5 vs brute $b5")
  }

  test("pq_encode picks the nearest centroid per subspace, lowest index on ties") {
    val s = spark
    import s.implicits._
    graft.functions.TextHashes.register(s)
    val cb = typedLit(Seq(Seq(0L, 0L, 10L, 10L), Seq(10L, 10L, 0L, 0L),
      Seq(10L, 10L, 10L, 10L)))
    val got = Seq((Seq(1L, 1L, 9L, 9L), 1)).toDF("v", "i")
      .select(call_function("pq_encode", col("v"), cb, lit(2)).as("c"))
      .as[Seq[Int]].head()
    // subspace 0 = (1,1): nearest of (0,0)/(10,10)/(10,10) is centroid 0;
    // subspace 1 = (9,9): nearest of (10,10)/(0,0)/(10,10) is 0 vs 2 tie
    // broken low -> 0
    assert(got == Seq(0, 0))
    val tie = Seq((Seq(5L, 5L, 5L, 5L), 1)).toDF("v", "i")
      .select(call_function("pq_encode", col("v"), cb, lit(2)).as("c"))
      .as[Seq[Int]].head()
    assert(tie == Seq(0, 0)) // equidistant everywhere: lowest index wins
  }

  test("rerankTopK: with candidates == corpus, equals brute-force cosine top-k") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val df = (0L until 25L).map(i => (i, Seq.fill(64)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val exact = Similarity.topKCosine(df, "embedding", "vec_id", 3L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val reranked = Similarity.rerankTopK(df, "embedding", "vec_id", 3L, 5,
        candidates = 24)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(reranked == exact) // full candidate set -> re-rank IS brute force
    // narrow candidates still return k rows with descending scores
    val narrow = Similarity.rerankTopK(df, "embedding", "vec_id", 3L, 5,
        candidates = 8).collect().map(_.getDouble(1)).toSeq
    assert(narrow.size == 5 && narrow == narrow.sorted.reverse)
  }

  test("MLlib HashingTF featurizes text into the similarity suite (duplicate ranks first)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "spark shuffles partition the keyspace across executors"),
      (1L, "spark shuffles partition the keyspace across executors"), // dup of 0
      (2L, "completely different words about cooking pasta tonight"),
      (3L, "spark partitions and shuffles keyspace executor work")) //    related
      .toDF("doc_id", "text")
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("tokens").setOutputCol("tf").setNumFeatures(64)
    val feats = tf.transform(docs.withColumn("tokens", split(col("text"), " ")))
      .select(col("doc_id"),
        org.apache.spark.ml.functions.vector_to_array(col("tf"), "float32")
          .as("embedding"))
    val top = Similarity.topKCosine(feats, "embedding", "doc_id", 0L, 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("cos_sim")))
    assert(top.head._1 == 1L && math.abs(top.head._2 - 1.0) < 1e-12)
    assert(top.map(_._1).contains(3L)) // related doc in top-3
    assert(top.last._2 < top.head._2)
  }

  test("signSketch packs sign bits; bit 63 wraps to Long.MinValue") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0L, Seq(1.0f, -1.0f, 0.5f, 0.0f)), // bits 0,2 -> 5
      (1L, Seq(-1.0f, -1.0f, -1.0f, -1.0f)) // no bits -> 0
    ).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
        Similarity.signSketch(col("embedding"), dim = 4).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 5L, 1L -> 0L)) // 0.0f is NOT > 0
    // dim 64 with only the last component positive = the sign bit
    val hi = Seq((0L, Seq.fill(63)(-1.0f) :+ 1.0f)).toDF("vec_id", "embedding")
      .select(Similarity.signSketch(col("embedding")).as("sk"))
      .head().getLong(0)
    assert(hi == Long.MinValue)
  }

  test("hammingTopK matches a driver-side brute-force Hamming ranking") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map(i =>
      (i, Seq.fill(64)((rnd.nextFloat() - 0.5f))))
    val df = rows.toDF("vec_id", "embedding")
    def sketch(v: Seq[Float]): Long =
      v.zipWithIndex.foldLeft(0L) { case (acc, (e, i)) =>
        if (e > 0) acc | (1L << i) else acc }
    val qs = sketch(rows(7)._2)
    val expected = rows.filter(_._1 != 7L)
      .map { case (id, v) => (id, java.lang.Long.bitCount(sketch(v) ^ qs).toLong) }
      .sortBy { case (id, h) => (h, id) }.take(5)
    val got = Similarity.hammingTopK(df, "embedding", "vec_id", 7L, 5)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("hamming"))).toSeq
    assert(got == expected)
  }

  test("semanticDedup: near-dups evicted to lowest-id representative, cap guards cells") {
    val s = spark
    import s.implicits._
    // centroids are the even ids (sampleMod 2); each odd id is a near-dup
    // of one centroid and lands in that centroid's cell
    val df = Seq(
      (0L, Seq(1.0f, 0.01f, 0f, 0f)), // centroid, x-direction
      (1L, Seq(0.99f, 0.0f, 0f, 0f)), // near-dup of 0
      (2L, Seq(0f, 1.0f, 0f, 0f)), //    centroid, y-direction
      (3L, Seq(0.01f, 0.98f, 0f, 0f)), // near-dup of 2
      (5L, Seq(0.98f, 0.03f, 0f, 0f)) // second near-dup of 0
    ).toDF("vec_id", "embedding")
    val dropped = Similarity.semanticDedup(df, "embedding", "vec_id",
        sampleMod = 2, tau = 0.95)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("rep_id"))).toMap
    // 1 and 5 evicted by representative 0; 3 evicted by 2
    assert(dropped == Map(1L -> 0L, 5L -> 0L, 3L -> 2L))
    // a cell above maxCell is dropped before the quadratic join
    val capped = Similarity.semanticDedup(df, "embedding", "vec_id",
        sampleMod = 2, tau = 0.95, maxCell = 2)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("rep_id"))).toMap
    assert(capped == Map(3L -> 2L)) // 0's 3-vec cell dropped, 2's survives
  }

  test("mmrRerank: diversity penalty skips the near-duplicate relevance would pick") {
    val s = spark
    import s.implicits._
    // 1 and 2 are both highly query-relevant and near-parallel to each
    // other; 3 is less relevant but points AWAY from 1's off-query tilt
    // (negative y), so cos(3, 1) ≪ rel(3). Pure relevance picks (1, 2);
    // MMR at λ=0.5 picks (1, 3): 2's redundancy penalty (cos≈1 with the
    // already-selected 1) swamps its relevance edge.
    val df = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), // query
      (1L, Seq(0.9f, 0.3f, 0.0f, 0.0f)), // rel ≈ 0.949
      (2L, Seq(0.88f, 0.3f, 0.0f, 0.0f)), // rel ≈ 0.947, cos(2,1) ≈ 1.0
      (3L, Seq(0.7f, -0.6f, 0.0f, 0.0f)) // rel ≈ 0.759, cos(3,1) ≈ 0.51
    ).toDF("vec_id", "embedding")
    val rel = Similarity.mmrRerank(df, "embedding", "vec_id", 0L,
        k = 2, poolSize = 3, lambda = 1.0)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(rel == Seq(1L, 2L)) // λ=1 ⇒ pure relevance order
    val div = Similarity.mmrRerank(df, "embedding", "vec_id", 0L,
        k = 2, poolSize = 3, lambda = 0.5)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(div == Seq(1L, 3L)) // redundant 2 displaced by diverse 3
  }

  test("mmrRerank matches an independent greedy reimplementation on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 30L).map(i => (i, Seq.fill(16)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("vec_id", "embedding")
    // independent model on the same integer grid the operator uses
    val q = rows.map { case (id, v) =>
      id -> v.map(e => math.round(e.toDouble * 10000)).toArray }.toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      def n(x: Array[Long]) = math.sqrt(x.map(v => v * v).sum.toDouble)
      d / (n(a) * n(b))
    }
    val qv = q(4L)
    val pool = rows.collect { case (id, _) if id != 4L => (id, cos(q(id), qv)) }
      .sortBy { case (id, rel) => (-rel, id) }.take(12)
    val (lam, mu) = (0.7, 1.0 - 0.7)
    var sel = Vector.empty[(Long, Double, Double)]
    var rem = pool
    for (_ <- 1 to 5) {
      val best = rem.map { case (id, rel) =>
        val pen = if (sel.isEmpty) 0.0 else sel.map(t => cos(q(id), q(t._1))).max
        (id, rel, lam * rel - mu * pen)
      }.minBy { case (id, _, score) => (-score, id) }
      sel :+= best
      rem = rem.filterNot(_._1 == best._1)
    }
    val got = Similarity.mmrRerank(df, "embedding", "vec_id", 4L,
        k = 5, poolSize = 12, lambda = 0.7)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Double]("rel"), r.getAs[Double]("mmr"))).toSeq
    assert(got == sel) // ids, relevances, and mmr scores all digit-exact
  }

  test("jlProjectTopK matches an independent projection + cosine reimplementation") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0L until 25L).map(i => (i, Seq.fill(16)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("vec_id", "embedding")
    // independent model: same md5 coin, same integer grid
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, i: Int): Long = {
      val h = md.digest(s"5_${j}_${i}".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xF) < 8) 1L else -1L
    }
    val q = rows.map { case (id, v) =>
      id -> v.map(e => math.round(e.toDouble * 10000)).toArray }.toMap
    def proj(v: Array[Long]): Array[Long] =
      Array.tabulate(4)(j => v.indices.map(i => sign(j, i) * v(i)).sum)
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      def n(x: Array[Long]) = math.sqrt(x.map(v => v * v).sum.toDouble)
      d / (n(a) * n(b))
    }
    val pq = proj(q(3L))
    val pqn = math.sqrt(pq.map(v => v * v).sum.toDouble)
    val expected = rows.collect { case (id, _) if id != 3L =>
      val p = proj(q(id))
      val d = p.zip(pq).map { case (x, y) => x * y }.sum.toDouble
      (id, d / (math.sqrt(p.map(v => v * v).sum.toDouble) * pqn))
    }.sortBy { case (id, c) => (-c, id) }.take(6)
    val got = Similarity.jlProjectTopK(df, "embedding", "vec_id", 3L,
        k = 6, outDim = 4, dim = 16, seed = 5)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("pcos"))).toSeq
    assert(got == expected)
    // and the projection actually preserves neighborhoods here: the
    // exact-space top-1 survives into the projected top-6 (of 24)
    val exactTop = rows.collect { case (id, _) if id != 3L => (id, cos(q(id), q(3L))) }
      .maxBy(_._2)._1
    assert(got.map(_._1).contains(exactTop))
  }

  test("mineParallelPairs: designed 1-1 alignment, margins near parity, partition-invariant") {
    val s = spark
    import s.implicits._
    // a dominant shared first component pins every vector into ONE LSH
    // bucket whatever sign the md5 plane draws, so candidate recall is
    // total; the small components define the intended alignment
    def v(e1: Float, e2: Float, e3: Float) = Seq(100f, e1, e2, e3)
    val a = Seq((0L, v(1f, 0f, 0f)), (2L, v(0f, 1f, 0f)), (4L, v(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val b = Seq((1L, v(0.9f, 0.1f, 0f)), (3L, v(0.1f, 0.9f, 0f)),
      (5L, v(0f, 0.1f, 0.9f))).toDF("vec_id", "embedding")
    def run(aa: org.apache.spark.sql.DataFrame, bb: org.apache.spark.sql.DataFrame) =
      Similarity.mineParallelPairs(aa, bb, "embedding", "vec_id",
        k = 2, numPlanes = 1, dim = 4)
    val out = run(a, b).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(t => t._1 -> t._2).toMap == Map(0L -> 1L, 2L -> 3L, 4L -> 5L),
      s"alignment wrong: ${out.toSeq}")
    // near-parallel vectors: scaled cos ~ 10^8, margin ~ parity (10^6)
    assert(out.forall(t => t._3 > 99000000L), s"cos off: ${out.toSeq}")
    assert(out.forall(t => math.abs(t._4 - 1000000L) < 50000L),
      s"margin off parity: ${out.toSeq}")
    // determinism under repartitioning
    val out2 = run(a.repartition(7), b.repartition(5)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
  }

  test("knnGraph: duplicates are mutual top neighbours at cos exactly 1.0") {
    val s = spark
    import s.implicits._
    val base = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.01f * i)
    val other = Array.tabulate(64)(i => if (i == 1) 1.0f else -0.01f * i)
    val df = Seq((1L, base.toSeq), (2L, base.toSeq), (3L, other.toSeq))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnGraph(df, "embedding", "vec_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val bySrc = out.groupBy(_._1)
    // identical vectors share a bucket and rank each other first at ~1.0
    // (cos = d / sqrt(d)^2 — one double rounding away from exact 1)
    val t1 = bySrc(1L).head; val t2 = bySrc(2L).head
    assert((t1._1, t1._2, t1._4) == ((1L, 2L, 1)) && math.abs(t1._3 - 1.0) < 1e-12)
    assert((t2._1, t2._2, t2._4) == ((2L, 1L, 1)) && math.abs(t2._3 - 1.0) < 1e-12)
    // ranks are contiguous from 1 and capped at k
    bySrc.values.foreach { rows =>
      assert(rows.map(_._4).sorted.sameElements(1 to rows.length) && rows.length <= 2)
    }
  }

  test("embeddingDrift: identical slices -> cos 1, zero L2 gap; floor div handles negative sums") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, Array(0.5f, -0.25f)), (2L, Array(0.1f, -0.75f)))
      .toDF("id", "emb")
    val same = Similarity.embeddingDrift(a, a, "emb").head()
    assert(same.getAs[Long]("n_a") == 2L && same.getAs[Long]("n_b") == 2L)
    assert(same.getAs[Long]("l2_diff2") == 0L)
    assert(math.abs(same.getAs[Double]("cos_mean") - 1.0) < 1e-12)
    // hand case with a negative mean: sums a = (6000, -10000), n=2 ->
    // means (3000, -5000); b single row (1000, 1000) -> means (1000, 1000)
    val b = Seq((3L, Array(0.1f, 0.1f))).toDF("id", "emb")
    val r = Similarity.embeddingDrift(a, b, "emb").head()
    assert(r.getAs[Long]("dot_ab") == 3000L * 1000 - 5000L * 1000)
    assert(r.getAs[Long]("norm2_a") == 3000L * 3000 + 5000L * 5000)
    assert(r.getAs[Long]("norm2_b") == 2000000L)
    assert(r.getAs[Long]("l2_diff2") == 2000L * 2000 + 6000L * 6000)
    // odd negative sum: one vector (-0.00015) -> grid -2 (round half even
    // on .5? -1.5 rounds to -2); floor(-2/1) = -2 either engine
    val c = Seq((9L, Array(-0.0003f, 0.0003f))).toDF("id", "emb")
    val rc = Similarity.embeddingDrift(c, b, "emb").head()
    assert(rc.getAs[Long]("norm2_a") == 18L) // (-3)^2 + 3^2
  }

  test("duplicateVectorGroups: grid-identical vectors group; distinct ones don't") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(0.1f, 0.2f)), (2L, Array(0.1f, 0.2f)),     // exact dup
      (3L, Array(0.10004f, 0.2f)),                          // same grid cell (x10000 rounds to 1000)
      (4L, Array(0.5f, 0.5f))
    ).toDF("vec_id", "emb")
    val r = Similarity.duplicateVectorGroups(df, "emb").head()
    assert(r.getAs[Long]("n_vecs") == 4L)
    assert(r.getAs[Long]("n_groups") == 2L) // {1,2,3} and {4}
    assert(r.getAs[Long]("n_dup_vecs") == 2L)
    assert(r.getAs[Long]("max_group") == 3L)
    assert(r.getAs[Long]("dup_ppm") == 500000L)
  }

  test("duplicateVectorGroups: null elements do not collide with shorter vectors") {
    val s = spark
    import s.implicits._
    // [1,NULL,2] must NOT hash equal to [1,2]: concat_ws drops nulls,
    // so without the sentinel these would merge into one group.
    val df = Seq(
      (1L, Array[java.lang.Float](0.1f, null, 0.2f)),
      (2L, Array[java.lang.Float](0.1f, 0.2f))
    ).toDF("vec_id", "emb")
    val r = Similarity.duplicateVectorGroups(df, "emb").head()
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("n_dup_vecs") == 0L)
  }

  test("coresetCoverage: members score against their own centroid; sums exact") {
    val s = spark
    import s.implicits._
    // sampleMod=2 -> centroids are ids 0,2; id 1 matches 0's direction,
    // id 3 matches 2's. Cells must be {0:(0,1)}, {2:(2,3)}.
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(2.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.0f, 3.0f))
    ).toDF("vec_id", "emb")
    val out = Similarity.coresetCoverage(df, "emb", "vec_id",
        sampleMod = 2, maxCentroids = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // perfect alignment: cos = 1.0 -> 1e6 ppm each, 2 members per cell
    assert(out == Map(0L -> ((2L, 1000000L, 2000000L)),
      2L -> ((2L, 1000000L, 2000000L))))
  }

  test("pqDistortion: sampleMod=1 every-vector-a-centroid is lossless (0 ppm)") {
    val s = spark
    import s.implicits._
    val df = (0L to 7L).map(i =>
      (i, Array.tabulate(8)(j => (i + j).toFloat / 10f)))
      .toDF("vec_id", "emb")
    val r = Similarity.pqDistortion(df, "emb", "vec_id", m = 4,
      sampleMod = 1, maxCentroids = 64).head()
    assert(r.getAs[Long]("total_dist2") == 0L)
    assert(r.getAs[Long]("distortion_ppm") == 0L)
    assert(r.getAs[Long]("n_vecs") == 8L)
    // a coarser codebook (one centroid) must lose energy
    val r2 = Similarity.pqDistortion(df, "emb", "vec_id", m = 4,
      sampleMod = 1000, maxCentroids = 1).head()
    assert(r2.getAs[Long]("total_dist2") > 0L)
    assert(r2.getAs[Long]("max_dist2") > 0L)
  }

  test("labelNoise: a mislabeled vector inside a tight cluster is flagged") {
    val s = spark
    import s.implicits._
    // 5 near-identical vectors; 4 labeled 0, one labeled 1 -> the odd one
    // out has all-disagreeing neighbors; the 0s keep majority agreement
    val df = (0L to 4L).map { i =>
      (i, if (i == 4) 1 else 0, Array(1.0f, 0.001f * i))
    }.toDF("vec_id", "label", "emb")
    val out = Similarity.labelNoise(df, "emb", "label", "vec_id", k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((4L, 0L, 0L)))       // clean majority class
    assert(out(1L) == ((1L, 1L, 1000000L))) // the flipped label is suspect
  }

  test("normProfile: zero vectors isolate in bucket 0; octaves split by bit length") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(0.0f, 0.0f)),      // n2 = 0 -> bucket 0
      (2L, Array(0.0001f, 0.0f)),   // q = (1, 0), n2 = 1 -> bucket 1
      (3L, Array(0.0003f, 0.0f))    // q = (3, 0), n2 = 9 -> bucket 4
    ).toDF("vec_id", "emb")
    val out = Similarity.normProfile(df, "emb", "vec_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(out(0L) == ((1L, 0L, 0L)))
    assert(out(1L) == ((1L, 1L, 1L)))
    assert(out(4L) == ((1L, 9L, 9L)))
  }

  test("ivfCellBalance: populations sum to the corpus; empty cells reported") {
    val s = spark
    import s.implicits._
    // ids 0..9; centroids = ids 0 and 5 (mod 5, cap 2); vectors cluster
    // around the two centroids
    val df = (0L to 9L).map { i =>
      val base = if (i < 5) 1.0f else -1.0f
      (i, Array(base, base * 0.9f))
    }.toDF("vec_id", "emb")
    val out = Similarity.ivfCellBalance(df, "emb", "vec_id",
        sampleMod = 5, maxCentroids = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(0L, 5L))
    assert(out.values.map(_._1).sum == 10L)
    assert(out(0L)._1 == 5L && out(5L)._1 == 5L)
    assert(out(0L)._2 == 500000L)
  }

  test("hammingRecall: sign-identical corpus gives full recall; zero-hit queries still report") {
    val s = spark
    import s.implicits._
    // vectors whose cosine order IS their sign-pattern order: recall = 1
    val df = Seq(
      (0L, Array(1.0f, 1.0f, -1.0f)),
      (1L, Array(0.9f, 0.8f, -1.0f)),  // same signs as query 0
      (2L, Array(-1.0f, -1.0f, 1.0f)), // opposite
      (3L, Array(1.0f, 0.9f, -0.9f))   // same signs
    ).toDF("vec_id", "emb")
    val out = Similarity.hammingRecall(df, "emb", "vec_id", queryMod = 4L,
        k = 2, dim = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // query 0: exact top-2 = {1, 3} (cosine), hamming top-2 = {1, 3} (0 bits)
    assert(out(0L) == ((2L, 1000000L)))
  }

  test("centroidPurity: separable labels score 100%, a flipped vector is impure") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(0.9f, 0.1f)),
      (3L, 1, Array(0.0f, 1.0f)), (4L, 1, Array(0.1f, 0.9f)),
      (5L, 1, Array(1.0f, 0.0f)) // labeled 1 but sits on label 0's axis
    ).toDF("vec_id", "label", "emb")
    val out = Similarity.centroidPurity(df, "emb", "label", "vec_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((2L, 2L, 1000000L)))
    assert(out(1L)._1 == 3L && out(1L)._2 == 2L) // the flipped vector misses
    assert(out(1L)._3 == 2000000L / 3L)
  }

  test("hubnessAudit: in-degree histogram includes the never-retrieved zero bucket") {
    val s = spark
    import s.implicits._
    // four colinear vectors share an LSH bucket (identical plane signs)
    // and retrieve each other (in-degree 3 each); the negated vector
    // lands in the complement bucket alone (in-degree 0, never retrieved)
    val base = Array.tabulate(64)(j => (j + 1).toFloat / 64f)
    val df = (1L to 4L).map(i => (i, base.map(_ * i)))
      .:+((5L, base.map(v => -v))).toDF("vec_id", "emb")
    val out = Similarity.hubnessAudit(df, "emb", "vec_id", k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 1L, 3L -> 4L))
  }

  test("sqDistortionSweep: 13 bits lossless on the grid; fewer bits lose monotonically") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array(0.5f, -0.25f, 0.1234f, 0.9999f))).toDF("vec_id", "emb")
    val out = Similarity.sqDistortionSweep(df, "emb", bits = Seq(4, 8, 13))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap // bits -> total_dist2
    assert(out(13L) == 0L) // m = 1: nothing dropped
    assert(out(8L) > 0L && out(4L) > out(8L))
    // hand check at 8 bits: m = 32; pmod of each grid value
    val m = 32L
    val grid = Seq(5000L, -2500L, 1234L, 9999L)
    val exp = grid.map(x => { val p = ((x % m) + m) % m; p * p }).sum
    assert(out(8L) == exp)
  }

  test("clipCalibration: per-dimension exact ranges; outlier only widens its own dim") {
    val s = spark
    import s.implicits._
    // dim 0: constant 0.1; dim 1: 1..100 plus one huge outlier
    val df = (1 to 100).map(i =>
      (i.toLong, Array(0.1f, if (i == 100) 1000f else i / 1000f)))
      .toDF("vec_id", "emb")
    val out = Similarity.clipCalibration(df, "emb")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(2), r.getDouble(5), r.getLong(6))).toMap
    assert(out(0) == ((1000L, 1000.0, 1000L))) // constant: p99 = min = max
    val (mn, p99, mx) = out(1)
    assert(mn == 10L && mx == 10000000L)
    assert(p99 < 1000000.0) // the p99 clip excludes the outlier
  }

  test("mrlTruncationSweep: full-dim recall is perfect, prefix energy is exact, zero prefixes guarded") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0.5f),
      2L -> Seq(1f, 1f, 0.5f, 0f),
      3L -> Seq(0.5f, 0f, 1f, 1f),
      4L -> Seq(1f, 0.5f, 0.5f, 0.5f),
      5L -> Seq(0f, 0f, 1f, 1f)) // zero 2-prefix: the -2 guard path
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.mrlTruncationSweep(df, "embedding", "vec_id",
        dims = Seq(2, 4), queryMod = 3L, k = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == Set(2L, 4L))
    // exact integer energy on the e*10000 grid, mirrored in plain Scala
    val q = vecs.map(_._2.map(e => math.round(e.toDouble * 10000)))
    val tot = q.map(_.map(x => x * x).sum).sum
    val p2 = q.map(_.take(2).map(x => x * x).sum).sum
    assert(out(2L)._1 == p2 * 1000000L / tot)
    assert(out(4L)._1 == 1000000L)
    // panel = ids {0, 3}; full-dim prefix IS the truth -> perfect recall
    assert(out(4L)._2 == 2L)
    assert(out(4L)._4 == 1000000L)
    assert(out(2L)._4 >= 0L && out(2L)._4 <= 1000000L)
  }

  test("ivfProbeSweep: recall and scanned share are monotone in nprobe, all-cells probe is exact") {
    val s = spark
    import s.implicits._
    // two clusters around ids 0 and 5 -> centroid sample {0, 5} at mod 5
    val vecs = (0 until 10).map { i =>
      val base = if (i < 5) Seq(1f, 0f, 0f, 0f) else Seq(0f, 1f, 0f, 0f)
      (i.toLong, base.zipWithIndex.map { case (v, j) =>
        v + (if (j == 3) i * 0.01f else 0f) })
    }
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.ivfProbeSweep(df, "embedding", "vec_id",
        probes = Seq(1, 2), queryMod = 4L, k = 2, sampleMod = 5,
        maxCentroids = 64)
      .orderBy("nprobe")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out.forall(_._2 == 3L)) // panel = ids 0, 4, 8
    // probing every cell IS the exact scan
    assert(out(1)._6 == 1000000L)
    assert(out(1)._4 == 1000000L) // scanned everything (minus self)
    // fewer probes never scan or recall more
    assert(out(0)._3 <= out(1)._3 && out(0)._5 <= out(1)._5)
  }

  test("silhouette: centroids score 1, equidistant point scores 0 with cid tie-break") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0L, Seq(1.0, 0.0)), // centroid of cell 0
      (1L, Seq(0.0, 1.0)), // centroid of cell 1
      (2L, Seq(1.0, 0.1)), // near cell 0
      (3L, Seq(0.0, 0.9)), // near cell 1
      (4L, Seq(0.5, 0.5)) //  exactly between -> cid 0 by tie-break, s = 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.silhouette(df, "embedding", "vec_id",
        sampleMod = 1, maxCentroids = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // id2: a=1000^2, b=10000^2+9000^2 -> floor(1e6*180e6/181e6) = 994475
    assert(out(0L) == ((3L, 664825L, 0L))) // {0 -> 1e6, 2 -> 994475, 4 -> 0}
    assert(out(1L) == ((2L, 997237L, 994475L)))
  }

  test("embeddingDecontam: exact copy lands in dup, 0.96 in near, orthogonal in clean") {
    val s = spark
    import s.implicits._
    // panel = ids % 3 == 0; (0.3, 0.4) has integer norm 5000 on the grid,
    // so the identical-vector cosine is EXACTLY 1.0 (no floor slip)
    val df = Seq(
      (0L, Seq(0.3, 0.4)), //  panel
      (3L, Seq(0.3, 0.4)), //  panel
      (1L, Seq(0.3, 0.4)), //  exact copy -> dup, 1000000
      (2L, Seq(0.4, 0.3)), //  cos 24/25 -> near, 960000
      (4L, Seq(0.4, -0.3)) // orthogonal -> clean, 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.embeddingDecontam(df, "embedding", "vec_id",
        evalMod = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("dup" -> ((1L, 1000000L)), "near" -> ((1L, 960000L)),
      "clean" -> ((1L, 0L))))
  }

  test("multiProbeTopK: extra probes dominate rank-wise, probe set is bounded, rerun is identical") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .filter(col("vec_id") < 1000)
    def run(p: Int) = Similarity.multiProbeTopK(
        emb, "embedding", "vec_id", queryId = 0L, k = 10, probes = p)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val one = run(1)
    val three = run(3)
    assert(one.length <= 10 && three.length <= 10)
    // probes=1 candidates are a subset of probes=3 candidates, so the
    // rank-i result can only get closer
    assert(three.length >= one.length)
    one.zip(three).foreach { case ((_, c1, _), (_, c3, _)) =>
      assert(c3 >= c1) }
    // <= `probes` distinct buckets appear in the results
    assert(three.map(_._3).distinct.length <= 3)
    assert(one.map(_._3).distinct.length == 1)
    // deterministic: zero RNG anywhere
    assert(run(3).toSeq == three.toSeq)
  }

  test("nnDescentRound: candidates contain the bucket graph, so every source's k-th neighbour can only improve; is_new tracks graph membership") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .filter(col("vec_id") < 500)
    val g = Similarity.knnGraph(emb, "embedding", "vec_id", k = 5)
      .select(col("src"), col("rank"), col("nbr"), col("cos").as("cos0"))
    val r = Similarity.nnDescentRound(emb, "embedding", "vec_id", k = 5)
    // rank-wise dominance: the candidate set contains every production
    // edge, so the refined rank-i neighbour is at least as close as the
    // production rank-i neighbour (lists may be LONGER — a source with 2
    // bucket-mates can gain a worse-than-2nd 5th — but never worse at
    // the same rank)
    val cmp = g.select("src", "rank", "cos0")
      .join(r.select("src", "rank", "cos"), Seq("src", "rank"))
    assert(cmp.filter(col("cos") < col("cos0")).count() == 0)
    // the round actually recovers cross-bucket neighbours on real data
    val newEdges = r.filter(col("is_new")).count()
    assert(newEdges > 0)
    // is_new is exactly non-membership in the bucket graph
    val wrong = r.join(g.select("src", "nbr").withColumn("m", lit(1)),
        Seq("src", "nbr"), "left_outer")
      .filter(col("is_new") =!= col("m").isNull)
    assert(wrong.count() == 0)
    // ranks are a clean 1..n prefix per source
    val badRank = r.groupBy("src")
      .agg(max("rank").as("mx"), count(lit(1)).as("c"))
      .filter(col("mx") =!= col("c") || col("mx") > 5)
    assert(badRank.count() == 0)
  }
  test("filteredTopKAudit: post-filter misses beyond the overfetch horizon; full overfetch = exact") {
    val sp = spark
    import sp.implicits._
    // query = e1; ids 1-6 INELIGIBLE and closest to the query; ids
    // 10-13 eligible but strictly farther. With k=2, m=4 the unfiltered
    // top-4 is all ineligible -> post-filter finds NOTHING of the truth.
    val rows = Seq(
      (0L, 0, Seq(1.0f, 0.0f)),
      (1L, 1, Seq(1.0f, 0.01f)), (2L, 1, Seq(1.0f, 0.02f)),
      (3L, 1, Seq(1.0f, 0.03f)), (4L, 1, Seq(1.0f, 0.04f)),
      (5L, 1, Seq(1.0f, 0.05f)), (6L, 1, Seq(1.0f, 0.06f)),
      (10L, 3, Seq(1.0f, 0.5f)), (11L, 3, Seq(1.0f, 0.6f)),
      (12L, 3, Seq(1.0f, 0.7f)), (13L, 3, Seq(1.0f, 0.8f))
    ).toDF("vec_id", "label", "embedding")
    val starved = Similarity.filteredTopKAudit(rows, "embedding", "vec_id",
      queryId = 0L, k = 2, overfetch = 4,
      eligible = col("label") % 3 === 0).head()
    assert(starved.getAs[Long]("n_eligible") == 4L)
    assert(starved.getAs[Long]("hits") == 0L)
    assert(starved.getAs[Long]("recall_ppm") == 0L)
    // overfetch >= corpus: the two strategies are provably identical
    val full = Similarity.filteredTopKAudit(rows, "embedding", "vec_id",
      queryId = 0L, k = 2, overfetch = 20,
      eligible = col("label") % 3 === 0).head()
    assert(full.getAs[Long]("hits") == 2L)
    assert(full.getAs[Long]("recall_ppm") == 1000000L)
    // partial horizon: m=8 reaches 2 of the 4 eligible -> both of the
    // truth's top-2 (10, 11) sit inside the top-8 by construction
    val partial = Similarity.filteredTopKAudit(rows, "embedding", "vec_id",
      queryId = 0L, k = 3, overfetch = 8,
      eligible = col("label") % 3 === 0).head()
    assert(partial.getAs[Long]("hits") == 2L)
    assert(partial.getAs[Long]("recall_ppm") == 666666L)
    val e = intercept[IllegalArgumentException](
      Similarity.filteredTopKAudit(rows, "embedding", "vec_id", 0L,
        k = 5, overfetch = 4, eligible = col("label") % 3 === 0))
    assert(e.getMessage.contains("overfetch"))
  }
}
