package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout tools — the part of a 100 TB deployment that decides
  * how much data every LATER query has to read:
  *
  *  - Z-order (Morton) clustering: interleave the bits of two quantized
  *    dimensions so range-partitioning on ONE value gives file-level
  *    min/max locality on BOTH columns — parquet row-group skipping then
  *    prunes on either predicate (the Delta/Iceberg OPTIMIZE ZORDER
  *    pattern, here as a plain deterministic Column).
  *  - Bucketed tables: pre-shuffle a fact table ONCE on its join key;
  *    every subsequent join/aggregate on that key plans with zero
  *    exchanges (Spark's bucketing metadata proves co-partitioning).
  */
object Layout {

  /** Morton/Z-value of two non-negative columns, each linearly quantized
    * to `bits` bits over `[0, aMax]` / `[0, bMax]` then bit-interleaved
    * (a gets the even bit positions). Deterministic closed form — no
    * ranks, no data passes — so it is stable across engines and across
    * ingest batches (re-clustering a delta never moves old rows).
    *
    * Domain: inputs and `max * (2^bits - 1)` must stay under 2^52 so the
    * floor-of-double quantization is exact integer math (bits <= 26
    * with 32-bit inputs in practice; the default 16 is plenty — 65536
    * distinct cells per dimension). */
  def zValue2(a: Column, b: Column, aMax: Long, bMax: Long,
      bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 26, "bits must be in [1, 26]")
    require(aMax > 0 && bMax > 0, "maxima must be positive")
    val scale = (1L << bits) - 1
    def quant(c: Column, mx: Long) =
      floor(c.cast("long") * lit(scale) / lit(mx)).cast("long")
    // native codegen'd interleave: the composable aggregate(sequence(...))
    // form ran interpreted per row (measured 1.9 s / 600 k rows at sf0.1,
    // ~10x this kernel) — layout passes touch EVERY row of an ingest, so
    // the per-row constant matters at 100 TB
    call_function("z_interleave", quant(a, aMax), quant(b, bMax), lit(bits))
  }

  /** Range-partition + sort `df` by the Z-value of (`aCol`, `bCol`) —
    * write the result and every output file carries tight min/max on
    * BOTH columns. `numPartitions` is the target file count: size it to
    * ~128 MB-1 GB files at the deployment's scale. */
  def zorderByRange(df: DataFrame, aCol: String, bCol: String,
      aMax: Long, bMax: Long, numPartitions: Int,
      bits: Int = 16): DataFrame = {
    graft.functions.TextHashes.register(df.sparkSession)
    val z = zValue2(col(aCol), col(bCol), aMax, bMax, bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Write `df` as an external parquet table bucketed (and sorted) by
    * `bucketCols` into `numBuckets` — the pay-the-shuffle-once layout:
    * a join or aggregation on the bucket columns against another table
    * bucketed the same way plans with NO exchange on either side (and no
    * sort, when `sortCols` covers the join key). At 100 TB this converts
    * every repeated fact-to-fact join from two corpus-sized shuffles to
    * zero. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      bucketCols: Seq[String], numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must not be empty")
    val w = df.write.format("parquet").option("path", path)
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tableName)
  }

  /** WebDataset-style shard assignment — pack each group's documents
    * (in deterministic `idCol` order) into shards of ~`targetBytes`:
    * a document opens a new shard when the bytes BEFORE it reach the
    * next multiple of the target (greedy first-fit in id order — the
    * same layout every run, so resumable ingest rewrites nothing).
    * Returns one row per shard:
    * (group, shard, n_docs, bytes, min_id, max_id), ordered.
    *
    * Scale shape: one cumulative-sum window per group (partition-bounded
    * by the group's own row count — shard layout is per-source by
    * construction, so no global sort), then a (group, shard) aggregate.
    * The shard id is a closed form of the prefix sum: no iteration, no
    * driver state. */
  def shardPacking(df: DataFrame, sizeCol: String, groupCol: String,
      idCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes out of range: $targetBytes")
    df.select(col(groupCol).as("grp"), col(idCol).cast("long").as("id"),
        col(sizeCol).cast("long").as("sz"))
      .withColumn("before", coalesce(sum("sz").over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")
          .orderBy("id").rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("shard", expr(s"before div ${targetBytes}L"))
      .groupBy("grp", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("sz").as("bytes"),
        min("id").as("min_id"), max("id").as("max_id"))
      .orderBy("grp", "shard")
  }
}
