package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the 100 TB co-located join tool: two fact tables bucketed
  * on the join key join WITHOUT any shuffle exchange — each bucket pair
  * joins in place. At cluster scale this turns the biggest recurring cost
  * of a fact-fact join (re-shuffling both sides every query) into a
  * one-time cost at write time. This spec proves the engine's write path
  * produces bucket-compatible tables and that Spark's planner actually
  * elides the exchanges.
  */
class BucketingSpec extends SparkSpec {
  // NOTE: shared TestSpark session — set/restore conf, never getOrCreate
  // a private builder (it would silently rewrite the shared session conf).

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val s = spark
    import s.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = s.read.parquet(sf("sf0.001") + "/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val ord = s.read.parquet(sf("sf0.001") + "/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      li.write.mode("overwrite")
        .option("path", s"$wh/li_b").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      ord.write.mode("overwrite")
        .option("path", s"$wh/ord_b").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
      val joined = s.table("li_bucketed")
        .join(s.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(1200))
      // co-located: neither join side shuffles (bucketed scans already
      // satisfy the required hash distribution); the only acceptable
      // exchange would come AFTER the join, and the groupBy key equals the
      // bucket key so even that one is elided
      assert(!p.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle:\n" + p.take(2000))
      // and it computes the right thing
      val viaBuckets = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val direct = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaBuckets == direct)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
