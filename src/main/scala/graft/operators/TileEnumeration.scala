package graft.operators

import graft.core.{BBox, Tiles}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — distributed tile-keyspace generator (SURVEY §2.1).
  *
  * The reference materializes the full tile list on the client
  * (`main.py:89` `list(tiles(*self.bounds, [self.zoom]))`); at 100 TB scale
  * that list is billions of keys, so we generate it as a partitioned
  * `spark.range` with pure-arithmetic projection — no driver materialization,
  * no shuffle, evenly partitioned, and the closed-form count is O(1).
  */
object TileEnumeration {
  /** All XYZ tiles intersecting `bbox` at `zoom`, as (z:int, x:int, y:int). */
  def tiles(spark: SparkSession, bbox: BBox, zoom: Int): DataFrame = {
    val (x0, x1, y0, y1) = Tiles.tileRange(bbox, zoom)
    val w = (x1 - x0 + 1).toLong
    val n = w * (y1 - y0 + 1).toLong
    spark.range(n).select(
      lit(zoom).as("z"),
      (lit(x0) + (col("id") % w)).cast("int").as("x"),
      (lit(y0) + (col("id") / w)).cast("int").as("y"))
  }

  /** O(1) tile count (P5 `n_tiles`, `main.py:101-107`, without an action). */
  def count(bbox: BBox, zoom: Int): Long = Tiles.tileCount(bbox, zoom)
}
