package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("kmvDistinct is exact below k and within KMV error above k") {
    val s = spark
    import s.implicits._
    // group "small": 40 distinct values < k=64 -> exact
    // group "big": 5000 distinct values -> estimate within ~4/sqrt(k)
    val rows = (0 until 40).map(i => ("small", s"v$i")) ++
      (0 until 5000).flatMap(i => Seq(("big", s"w$i"), ("big", s"w$i"))) // dups collapse
    val out = Sketches.kmvDistinct(rows.toDF("grp", "v"), "v", "grp", k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("small") == ((40L, 40.0)))
    val (exact, est) = out("big")
    assert(exact == 5000L)
    val relErr = math.abs(est - exact) / exact
    assert(relErr < 4.0 / math.sqrt(64), s"est $est vs $exact (relErr $relErr)")
  }

  test("kmvDistinct is deterministic across runs and partitionings") {
    val s = spark
    import s.implicits._
    val df = (0 until 1000).map(i => ("g", s"x${i % 700}")).toDF("grp", "v")
    val a = Sketches.kmvDistinct(df, "v", "grp", k = 32).collect()(0).getDouble(2)
    val b = Sketches.kmvDistinct(df.repartition(13), "v", "grp", k = 32)
      .collect()(0).getDouble(2)
    assert(a == b) // md5 order is data-defined, not partition-defined
  }
}
