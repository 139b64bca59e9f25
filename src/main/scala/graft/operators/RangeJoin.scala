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
}
