package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, d).queryExecution.executedPlan.toString
        val marks = Seq("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
          "ShuffledHashJoin", "BroadcastHashJoin", "BatchEvalPython", "ScalaUDF")
          .filter(p.contains).mkString(",")
        println(s"AUDIT $name: $marks")
      } catch { case e: Throwable => println(s"AUDIT $name: ERROR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
