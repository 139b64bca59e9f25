package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (builder contract:
  * brute-force cosine top-k baseline + LSH-bucketed scale path).
  *
  * Cross-engine determinism: float elements are quantized to an integer grid
  * (round(e * 10000) — binary floats can never land on an exact .5 tie at a
  * power-of-ten scale, so the rounding is engine-independent), making dot
  * products exact BIGINT arithmetic; the final cosine is then a deterministic
  * double in any engine.
  *
  * Scale notes: the brute-force path broadcasts the (single) query vector;
  * the LSH path buckets vectors by random-hyperplane sign bits so candidate
  * generation is a hash-partitioned groupBy, not an all-pairs join.
  */
object VectorOps {
  import Relational.t

  /** embedding -> exact integer grid (array<bigint>). */
  private def quant(c: Column): Column =
    transform(c, e => round(e.cast("double") * 10000).cast("long"))

  /** Codegen'd native dot product (graft.functions.DotProductLong) — the
    * composable aggregate(zip_with(...)) form allocates an intermediate
    * array per row and stays interpreted. Queries call `reg(s)` first;
    * call_function resolves against the active session at analysis time. */
  private def reg(s: SparkSession): Unit = graft.functions.DotProductLong.register(s)
  private def dot(a: Column, b: Column): Column = call_function("dot_long", a, b)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-k against a query vector (vec_id = 0),
    // broadcast nested-loop over the quantized grid.
    "qv01_knn_cosine" -> { (s, d) =>
      reg(s)
      val emb = t(s, d, "embeddings").select(col("vec_id"), quant(col("embedding")).as("q"))
      val query = emb.filter(col("vec_id") === 0)
        .select(col("q").as("qv"))
      emb.filter(col("vec_id") =!= 0)
        .join(broadcast(query))
        .select(col("vec_id"),
          (dot(col("q"), col("qv")).cast("double") /
            (sqrt(dot(col("q"), col("q")).cast("double")) *
              sqrt(dot(col("qv"), col("qv")).cast("double")))).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(20)
    },
    // Pairwise cosine stats within each label group (blocked all-pairs —
    // the exact near-dup-by-embedding pattern, block-bounded).
    "qv02_cosine_blocked" -> { (s, d) =>
      reg(s)
      val emb = t(s, d, "embeddings")
        .select(col("label"), col("vec_id"), quant(col("embedding")).as("q"))
        .withColumn("nrm", sqrt(dot(col("q"), col("q")).cast("double")))
      val pairs = emb.as("a").join(emb.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.label").as("label"),
          (dot(col("a.q"), col("b.q")).cast("double") /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
      pairs.groupBy("label")
        .agg(count(lit(1)).as("n_pairs"), max("cos").as("max_cos"),
          (sum(col("cos").cast("decimal(20,10)")).cast("double") / count(lit(1))).as("avg_cos"),
          sum(when(col("cos") > 0.8, 1L).otherwise(0L)).as("n_near_dup"))
        .orderBy("label")
    },
    // IVF-style ANN: coarse centroids (deterministic id-sample), exact-
    // integer L2 cell assignment, then top-k cosine within the nprobe=2
    // cells nearest the query. The scale path: search cost is
    // |cells probed| / |cells| of brute force, and every stage is a
    // hash-partitioned join/window - no driver-side index.
    "qv04_ivf_ann" -> { (s, d) =>
      reg(s)
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, d, "embeddings").select(col("vec_id"), quant(col("embedding")).as("q"))
        .withColumn("qq", dot(col("q"), col("q")))
      val cents = emb.filter(col("vec_id") % 53 === 0)
        .select(col("vec_id").as("cid"), col("q").as("cq"), col("qq").as("cc"))
      // assign every vector to its nearest centroid (exact bigint L2)
      val w = Window.partitionBy("vec_id").orderBy(col("dist2"), col("cid"))
      val assigned = emb.join(broadcast(cents))
        .withColumn("dist2", col("qq") + col("cc") - lit(2) * dot(col("q"), col("cq")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("vec_id", "q", "qq", "cid")
      // probe the 2 cells nearest the query vector
      val query = emb.filter(col("vec_id") === 0)
        .select(col("q").as("xq"), col("qq").as("xqq"))
      val probed = cents.join(broadcast(query))
        .withColumn("dist2", col("xqq") + col("cc") - lit(2) * dot(col("cq"), col("xq")))
        .orderBy(col("dist2"), col("cid")).limit(2)
        .select("cid")
      assigned.join(broadcast(probed), "cid")
        .filter(col("vec_id") =!= 0)
        .join(broadcast(query))
        .select(col("vec_id"),
          (dot(col("q"), col("xq")).cast("double") /
            (sqrt(col("qq").cast("double")) * sqrt(col("xqq").cast("double")))).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
    },
    // Random-hyperplane LSH bucketing: 8 sign bits from md5-derived +/-1
    // hyperplane components; bucket histogram (candidate-generation stage).
    // The +/-1 component depends only on (plane, dim) — 8x64 values — so
    // the hyperplanes are materialized ONCE as 8 broadcast rows of
    // array<bigint> and each projection is a single codegen'd dot_long.
    // (The naive posexplode x planes cross join re-derived an md5 per
    // vector x dim x plane row: 512x the hash work and a 64x row blowup.)
    "qv03_lsh_buckets" -> { (s, d) =>
      reg(s)
      val planes = spark_rangePlanes(s).withColumn("comp", expr(
        """transform(sequence(0, 63), i ->
          |  CASE WHEN instr('0123456789abcdef', substring(md5(concat(p, '_', i)), 1, 1)) - 1 < 8
          |    THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)""".stripMargin))
      val emb = t(s, d, "embeddings").select(col("vec_id"), quant(col("embedding")).as("q"))
      val signs = emb.crossJoin(broadcast(planes))
        .select(col("vec_id"), col("p"), dot(col("q"), col("comp")).as("proj"))
        .withColumn("bit", when(col("proj") >= 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(p AS INT))")).otherwise(0L))
      signs.groupBy("vec_id").agg(sum("bit").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_vecs"))
        .orderBy("bucket")
    }
  )

  private def spark_rangePlanes(s: SparkSession): DataFrame =
    s.range(8).select(col("id").cast("int").as("p"))

  val oracleSql: Map[String, String] = Map(
    "qv01_knn_cosine" ->
      """WITH emb AS (SELECT vec_id,
        |  list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * 10000) AS BIGINT)) AS q
        | FROM embeddings),
        |qv AS (SELECT q AS v FROM emb WHERE vec_id = 0),
        |scored AS (SELECT e.vec_id,
        |  CAST(list_sum(list_transform(range(1, 65), i -> e.q[i] * qv.v[i])) AS DOUBLE) /
        |   (SQRT(CAST(list_sum(list_transform(range(1, 65), i -> e.q[i] * e.q[i])) AS DOUBLE)) *
        |    SQRT(CAST(list_sum(list_transform(range(1, 65), i -> qv.v[i] * qv.v[i])) AS DOUBLE))) AS cos_sim
        | FROM emb e, qv WHERE e.vec_id <> 0)
        |SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,
    "qv02_cosine_blocked" ->
      """WITH emb AS (SELECT label, vec_id,
        |  list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * 10000) AS BIGINT)) AS q
        | FROM embeddings),
        |nemb AS (SELECT label, vec_id, q,
        |  SQRT(CAST(list_sum(list_transform(range(1, 65), i -> q[i] * q[i])) AS DOUBLE)) AS nrm
        | FROM emb),
        |pairs AS (SELECT a.label,
        |  CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS DOUBLE) / (a.nrm * b.nrm) AS cos
        | FROM nemb a JOIN nemb b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT label, COUNT(*) AS n_pairs, MAX(cos) AS max_cos,
        | CAST(SUM(CAST(cos AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS avg_cos,
        | CAST(SUM(CASE WHEN cos > 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup
        |FROM pairs GROUP BY label ORDER BY label""".stripMargin,
    "qv04_ivf_ann" ->
      """WITH emb AS (SELECT vec_id,
        |  list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * 10000) AS BIGINT)) AS q
        | FROM embeddings),
        |nemb AS (SELECT vec_id, q,
        |  list_sum(list_transform(range(1, 65), i -> q[i] * q[i])) AS qq FROM emb),
        |cents AS (SELECT vec_id AS cid, q AS cq, qq AS cc FROM nemb WHERE vec_id % 53 = 0),
        |assigned AS (SELECT vec_id, q, qq, cid FROM (
        |  SELECT e.vec_id, e.q, e.qq, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      e.qq + c.cc - 2 * list_sum(list_transform(range(1, 65), i -> e.q[i] * c.cq[i])),
        |      c.cid) AS rn
        |  FROM nemb e, cents c) WHERE rn = 1),
        |query AS (SELECT q AS xq, qq AS xqq FROM nemb WHERE vec_id = 0),
        |probed AS (SELECT cid FROM cents, query
        |  ORDER BY xqq + cc - 2 * list_sum(list_transform(range(1, 65), i -> cq[i] * xq[i])), cid
        |  LIMIT 2)
        |SELECT a.vec_id,
        |  CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * query.xq[i])) AS DOUBLE) /
        |   (SQRT(CAST(a.qq AS DOUBLE)) * SQRT(CAST(query.xqq AS DOUBLE))) AS cos_sim
        |FROM assigned a JOIN probed USING (cid), query
        |WHERE a.vec_id <> 0
        |ORDER BY cos_sim DESC, a.vec_id LIMIT 10""".stripMargin,
    "qv03_lsh_buckets" ->
      """WITH el AS (SELECT vec_id, CAST(i - 1 AS INT) AS i, q[i] AS qe
        | FROM (SELECT vec_id,
        |   list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * 10000) AS BIGINT)) AS q
        |  FROM embeddings), unnest(range(1, 65)) t(i)),
        |planes AS (SELECT vec_id, p, qe,
        |  CASE WHEN instr('0123456789abcdef', substr(md5(p || '_' || i), 1, 1)) - 1 < 8
        |    THEN 1 ELSE -1 END AS comp
        | FROM el, (SELECT CAST(unnest(generate_series(0, 7)) AS INT) AS p)),
        |signs AS (SELECT vec_id, p, SUM(comp * qe) AS proj FROM planes GROUP BY vec_id, p),
        |buckets AS (SELECT vec_id,
        |  CAST(SUM(CASE WHEN proj >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
        | FROM signs GROUP BY vec_id)
        |SELECT bucket, COUNT(*) AS n_vecs FROM buckets GROUP BY bucket ORDER BY bucket""".stripMargin
  )
}
