package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hive-style partitioned output = the 100 TB read-path pruning tool: a
  * training corpus written `partitionBy(split/lang/source)` lets every
  * downstream job that filters on those columns skip whole directories at
  * PLAN time (PartitionFilters in the scan, zero data files touched for
  * pruned partitions) — the storage-layout complement to BucketingSpec's
  * shuffle elision. */
class PartitionPruningSpec extends SparkSpec {

  test("partitionBy write + filtered read prunes at plan time") {
    val s = spark
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString + "/docs"
    val docs = s.read.parquet(sf("sf0.001") + "/documents.parquet")
    graft.operators.Text.deterministicSplit(docs, "doc_id")
      .write.mode("overwrite").partitionBy("split", "lang").parquet(out)

    val read = s.read.parquet(out)
      .filter(col("split") === "train" && col("lang") === "en")
    val p = read.queryExecution.executedPlan.toString
    // the filter lands in PartitionFilters (directory pruning), not in
    // PushedFilters/post-scan row filters
    assert(p.contains("PartitionFilters:"), p.take(1200))
    assert(p.contains("isnotnull(split") || p.contains("(split"), p.take(1200))
    // pruned scan touches only the matching partition's files (numFiles
    // metric of the executed scan vs the files actually on disk)
    read.collect()
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val scanned = scan.metrics("numFiles").value
    val matching = {
      val dir = java.nio.file.Paths.get(out, "split=train", "lang=en")
      java.nio.file.Files.walk(dir).filter(_.toString.endsWith(".parquet")).count()
    }
    val total = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .filter(_.toString.endsWith(".parquet")).count()
    assert(scanned == matching, s"scanned $scanned, expected $matching")
    assert(scanned < total, "pruning must skip the other partitions")
    // and the values round-trip
    val expected = graft.operators.Text.deterministicSplit(docs, "doc_id")
      .filter(col("split") === "train" && col("lang") === "en").count()
    assert(read.count() == expected)
  }
}
