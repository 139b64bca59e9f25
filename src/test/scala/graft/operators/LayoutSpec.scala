package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("zValue2 matches a driver-side Morton reference") {
    val s = spark
    import s.implicits._
    graft.functions.TextHashes.register(s)
    val rows = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.zValue2(col("a"), col("b"), aMax = 31, bMax = 31, bits = 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def morton(a: Long, b: Long): Long =
      (0 until 5).foldLeft(0L)((acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
    // maxima == 2^bits - 1 makes quantization the identity
    rows.foreach { case (a, b) => assert(got((a, b)) == morton(a, b), s"($a,$b)") }
    // interleave basics: z(1,0)=1, z(0,1)=2, z(3,3)=15
    assert(got((1L, 0L)) == 1L && got((0L, 1L)) == 2L && got((3L, 3L)) == 15L)
  }

  test("zorderByRange: every partition's bounding box is local in BOTH dimensions") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(4000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val parts = Layout.zorderByRange(pts, "x", "y", 1023, 1023,
        numPartitions = 16, bits = 10)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(
        (max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"),
        count(lit(1)).as("n"))
      .collect()
    assert(parts.length == 16)
    // a random (unclustered) 16-way split would leave every partition
    // spanning ~the full 1024x1024 square; z-range partitions must be
    // tight on average in the product of extents
    val avgArea = parts.map(r => (r.getAs[Long]("dx") + 1).toDouble *
      (r.getAs[Long]("dy") + 1)).sum / parts.length
    assert(avgArea < 1024.0 * 1024 / 4, s"avg bbox area $avgArea")
  }

  test("bucketed tables join with zero exchanges") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets")
    val facts = (0L until 2000L).map(i => (i % 97, i, s"f$i")).toDF("k", "seq", "payload")
    val dims = (0L until 500L).map(i => (i % 97, s"d$i")).toDF("k", "attr")
    try {
      Layout.writeBucketed(facts, "graft_bt_facts", s"$dir/facts",
        Seq("k"), numBuckets = 8, sortCols = Seq("k"))
      Layout.writeBucketed(dims, "graft_bt_dims", s"$dir/dims",
        Seq("k"), numBuckets = 8, sortCols = Seq("k"))
      val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = s.table("graft_bt_facts").join(s.table("graft_bt_dims"), "k")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), plan) // the whole point of bucketing
        assert(joined.count() == facts.join(dims, "k").count())
        // the same join on plain (unbucketed) parquet DOES shuffle both sides
        facts.write.mode("overwrite").parquet(s"$dir/plain_f")
        dims.write.mode("overwrite").parquet(s"$dir/plain_d")
        val plain = s.read.parquet(s"$dir/plain_f")
          .join(s.read.parquet(s"$dir/plain_d"), "k")
          .queryExecution.executedPlan.toString
        assert(plain.contains("Exchange"), plain)
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      s.sql("DROP TABLE IF EXISTS graft_bt_facts")
      s.sql("DROP TABLE IF EXISTS graft_bt_dims")
    }
  }

  test("shardPacking: greedy first-fit in id order, per group, exact boundaries") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("a", 1L, 60L), ("a", 2L, 50L), // before=0,60   -> shards 0,0
      ("a", 3L, 10L),                 // before=110    -> shard 1
      ("a", 4L, 300L),                // before=120    -> shard 1 (oversized doc stays)
      ("b", 1L, 10L)                  // group b independent
    ).toDF("src", "id", "sz")
    val out = Layout.shardPacking(docs, "sz", "src", "id", targetBytes = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(("a", 0L)) == ((2L, 110L, 1L, 2L)))
    assert(out(("a", 1L)) == ((2L, 310L, 3L, 4L)))
    assert(out(("b", 0L)) == ((1L, 10L, 1L, 1L)))
  }
}
