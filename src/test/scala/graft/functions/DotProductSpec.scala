package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("dot_long matches the composable aggregate/zip_with form") {
    DotProductLong.register(spark)
    val rnd = new scala.util.Random(1)
    val rows = (0 until 50).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextLong() % 10000), Seq.fill(64)(rnd.nextLong() % 10000))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      call_function("dot_long", $"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (acc, x) => acc + x).as("slow"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("dot_long works in SQL and nulls propagate") {
    DotProductLong.register(spark)
    val one = spark.sql("SELECT dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").collect()
    assert(one(0).getLong(0) == 4 + 10 + 18)
    val n = spark.sql("SELECT dot_long(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS d").collect()
    assert(n(0).isNullAt(0))
  }

  test("dot_long stays inside whole-stage codegen") {
    DotProductLong.register(spark)
    val df = spark.range(10)
      .select(array($"id", $"id" + 1).as("a"), array(lit(2L), lit(3L)).as("b"))
      .select(call_function("dot_long", $"a", $"b").as("d"))
    val vals = df.collect().map(_.getLong(0))
    assert(vals(4) == 4 * 2 + 5 * 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }
}
