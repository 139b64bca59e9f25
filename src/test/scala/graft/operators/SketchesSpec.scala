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

  test("cmsHeavyHitters matches an independent in-JVM sketch replay exactly") {
    val s = spark
    import s.implicits._
    val (depth, width) = (3, 16) // tiny width so collisions actually happen
    // zipf-ish: value i appears (50 - i) times
    val values = (0 until 40).flatMap(i => Seq.fill(50 - i)(s"v$i"))
    val df = values.toDF("x")
    // reference model: plain Scala collections + MessageDigest
    def bucket(i: Int, v: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"c${i}_$v".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(13)
      (java.lang.Long.parseLong(hex, 16) % width).toInt
    }
    val counters = scala.collection.mutable.Map.empty[(Int, Int), Long]
    for (v <- values; i <- 0 until depth)
      counters((i, bucket(i, v))) = counters.getOrElse((i, bucket(i, v)), 0L) + 1
    val expected = values.distinct.map { v =>
      v -> (0 until depth).map(i => counters((i, bucket(i, v)))).min
    }.toMap
    val exact = values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = Sketches.cmsHeavyHitters(df, "x", depth = depth, width = width,
        minEst = 1L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == expected.keySet)
    for ((v, (ex, est)) <- out) {
      assert(ex == exact(v), s"exact($v)")
      assert(est == expected(v), s"est($v)")
      assert(est >= ex, s"CMS must never under-count ($v)")
    }
    // thresholding keeps only rows whose ESTIMATE clears the bar
    val thr = Sketches.cmsHeavyHitters(df, "x", depth = depth, width = width,
        minEst = 40L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(thr == expected.filter(_._2 >= 40L))
    assert(thr.nonEmpty && thr.size < expected.size)
  }

  test("cmsHeavyHitters is partition-invariant") {
    val s = spark
    import s.implicits._
    val df = (0 until 500).map(i => s"k${i % 37}").toDF("x")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.cmsHeavyHitters(d, "x", depth = 2, width = 8, minEst = 1L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(df) == run(df.repartition(11)))
  }
}
