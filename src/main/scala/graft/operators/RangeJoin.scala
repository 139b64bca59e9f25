package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: pairs (a, b) with the same key and
  * `|b.time - a.time| <= window`.
  *
  * Spark plans a raw `a JOIN b ON key AND b.t BETWEEN a.t-w AND a.t+w` as an
  * equi-join on key with the range as a post-filter — fine until one key has
  * many rows, where it degenerates quadratically. This operator adds the
  * standard bin trick: both sides get `bin = floor(t / w)`, the left side is
  * replicated into (bin-1, bin, bin+1), and the join key becomes
  * (key, bin) — every true pair lands in exactly one of the three bins, the
  * hash join does the pruning, and the residual |dt| <= w filter removes
  * false positives. Work per task is bounded by rows-per-(key, bin), not
  * rows-per-key.
  */
object RangeJoin {

  /** @param left/right  inputs; both need `keys` and their time column
    * @param leftTime / rightTime  long-typed ordering columns (same unit)
    * @param window  half-width of the match window (same unit, > 0)
    */
  def binnedRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, window: Long): DataFrame = {
    require(window > 0)
    val l = left.withColumn("__bin",
      explode(array(lit(-1L), lit(0L), lit(1L)) ) )
      .withColumn("__bin", expr(s"CAST($leftTime DIV ${window}L AS BIGINT) + __bin"))
    val r = right.withColumn("__bin", expr(s"CAST($rightTime DIV ${window}L AS BIGINT)"))
    l.join(r, keys :+ "__bin")
      .filter(abs(col(rightTime) - col(leftTime)) <= window)
      .drop("__bin")
  }

  /** Interval OVERLAP join: all (left, right) row pairs whose
    * `[start, end]` intervals intersect (`ls <= re && rs <= le` —
    * closed-interval semantics). The temporal/genomics staple Spark
    * plans as a broadcast-nested-loop or a post-filtered cartesian.
    *
    * Bin trick, interval edition: each side explodes into every
    * `binSize`-wide bin its interval touches, the join key is the bin
    * (plus `keys`), and each surviving pair is attributed to exactly ONE
    * bin — the bin containing the overlap's start `max(ls, rs)` — so no
    * distinct/dedup shuffle is needed. Work per task is bounded by
    * rows-per-bin; replication is `span/binSize + 1` per row, so pick
    * `binSize` near the typical interval span. Column names must be
    * disjoint across sides (the binnedRangeJoin convention). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String, rightStart: String, rightEnd: String,
      binSize: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binSize > 0)
    def binned(df: DataFrame, s: String, e: String) =
      df.filter(col(s) <= col(e)).withColumn("__bin",
        explode(expr(s"sequence($s DIV ${binSize}L, $e DIV ${binSize}L)")))
    val pairs = binned(left, leftStart, leftEnd)
      .join(binned(right, rightStart, rightEnd), keys :+ "__bin")
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
    pairs
      .filter(col("__bin") ===
        expr(s"GREATEST($leftStart, $rightStart) DIV ${binSize}L"))
      .drop("__bin")
  }

  /** Interval-union length (the classic merge-intervals sweep) — per
    * key, the total UNIQUE time covered after overlaps collapse: the
    * honest "engaged minutes" behind every activity metric (summing raw
    * interval lengths double-counts overlapping sessions; X14's peak
    * concurrency asks how DEEP the overlap gets, this asks how WIDE the
    * union is). One ordered pass per key: sort by (start, end), track
    * the running max end over PRIOR rows, and each interval contributes
    * max(0, end − max(start, prior_max_end)) — exact integers, and the
    * per-row contributions are order-symmetric under ties so the
    * per-key SUM is engine-deterministic. Returns one row per key:
    * (key, n_intervals, raw_us, union_us, span_us) — raw−union is the
    * overlap the naive sum would have double-counted.
    *
    * Scale shape: ONE window + ONE aggregate, both on the key's own
    * partitioning — no joins, no global sort; cost ∝ intervals. */
  def intervalUnionLength(df: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("__k"),
        col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"))
      .filter(col("__s").isNotNull && col("__e").isNotNull &&
        col("__e") >= col("__s"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__k")
      .orderBy(col("__s"), col("__e"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    base.withColumn("__pmax", max("__e").over(w))
      .withColumn("__cov", greatest(lit(0L), col("__e") -
        greatest(col("__s"), coalesce(col("__pmax"), col("__s")))))
      .groupBy(col("__k").as(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__e") - col("__s")).as("raw_us"),
        sum("__cov").as("union_us"),
        (max("__e") - min("__s")).as("span_us"))
  }
}
