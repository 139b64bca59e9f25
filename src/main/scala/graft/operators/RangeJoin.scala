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
}
