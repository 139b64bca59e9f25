package graft
import org.apache.spark.sql.SparkSession

/** Iteration helper: time a single SparkEntry query N times.
  * Usage: runMain graft.BenchOne <queryName> [reps] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // mirror graft.Bench's session (r11): AQE SMJ->SHJ runtime rewrite
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    val times = (1 to reps).map { _ =>
      // same rep hygiene as graft.Bench.measure: drop cached relations
      // (incl. localCheckpoint blocks via the post-gc ContextCleaner) so
      // reps don't accumulate storage and GC debt onto later reps
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"$name: ${times.map(t => f"$t%.3f").mkString(" ")} min=${times.min}%.3f")
    spark.stop()
  }
}
