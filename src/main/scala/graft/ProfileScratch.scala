package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling tool for the r12 optimization round (NOT part of the
  * driver contract; delete or keep — it is measurement-only). Times
  * subtrees of a heavy query with the noop sink (guide §1.4). */
object ProfileScratch {
  def time(label: String, reps: Int)(df: => DataFrame): Unit = {
    val spark = SparkSession.active
    val ts = (1 to reps).map { _ =>
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PROF $label%-28s min=${ts.min}%.3f  all=${ts.map(t => f"$t%.2f").mkString(" ")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.TextHashes.register(spark)
    spark.range(100).selectExpr("sum(id)").collect()
    val reps = sys.env.getOrElse("PROF_REPS", "4").toInt

    val docs = graft.queries.Relational.t(spark, sfDir, "documents")
    val tks = docs.select(col("doc_id").cast("long").as("id"),
      col("source").as("blk"),
      array_distinct(split(col("text"), " ")).as("tks"))

    args.headOption.getOrElse("qd73") match {
      case "qd73" =>
        time("scan+tokenize", reps)(tks)
        val sigs = (0 until 4).map(i =>
          array_min(transform(col("tks"), t => md5(concat(lit(s"s${i}_"), t))))
            .as(s"mh$i"))
        time("minhash_sigs", reps)(tks.select(col("id") +: sigs: _*))
        val sig = tks.select(col("id") +: sigs: _*)
        val bands = (0 until 2).map { b =>
          val cols = (b * 2 until (b + 1) * 2).map(i => col(s"mh$i"))
          sig.select(col("id"), md5(concat(lit(s"$b") +: cols: _*)).as("band"))
        }.reduce(_ unionAll _)
        time("bands", reps)(bands)
        val pairs = bands.groupBy("band")
          .agg(collect_list(col("id").cast("long")).as("ds"))
          .filter(size(col("ds")) > 1 && size(col("ds")) <= 1000)
          .select(explode(expr("packed_pairs(ds)")).as("pair")).distinct()
          .select(shiftright(col("pair"), 32).as("id_a"),
            col("pair").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"))
        time("lsh_pairs", reps)(pairs)
        val tk2 = tks.select(col("id"), col("tks").as("tk"))
        val candJ = pairs
          .join(tk2.select(col("id").as("id_a"), col("tk").as("ta")).hint("shuffle_hash"), "id_a")
          .join(tk2.select(col("id").as("id_b"), col("tk").as("tb")).hint("shuffle_hash"), "id_b")
          .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
        time("verify_joins", reps)(candJ)
        val truthIn = tks.select(col("blk").as("block"), col("id"),
          array_distinct(transform(col("tks"), t => xxhash64(t))).as("grams"))
          .withColumn("ng", size(col("grams")))
        time("truth_grams", reps)(truthIn)
        time("full_query", reps)(
          SparkEntry.queries("qd73_lsh_calibration")(spark, sfDir))
      case "qd47" =>
        val base = graft.queries.Relational.t(spark, sfDir, "documents")
          .select("doc_id", "text", "source")
        val dup = base.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text"), col("source"))
        val docs10 = base.unionAll(dup).filter(col("doc_id") % 10 === 0)
        time("docs10", reps)(docs10)
        val cands = graft.operators.Dedup.lshCandidatePairs(
          docs10, "text", "doc_id", numHashes = 4, rowsPerBand = 2)
        time("lsh_cands", reps)(cands)
        val near = graft.operators.Dedup.verifyCandidatePairs(
          cands, docs10, "text", "doc_id", minJaccard = 0.9)
        time("verify", reps)(near)
        time("full_query", reps)(
          SparkEntry.queries("qd47_edit_distance")(spark, sfDir))
      case name =>
        time("full_query", reps)(SparkEntry.queries(name)(spark, sfDir))
    }
    spark.stop()
  }
}
