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

  /** Roll a (z, x, y) tile relation up `levels` zoom levels: parent tile
    * (z-levels, x >> levels, y >> levels) with its covered-child count —
    * pyramid building (gdal2tiles / overview generation), one groupBy on
    * integer-divided keys. Per-row arithmetic; the shuffle is the
    * pyramid's own (parents are 4^levels smaller than children). */
  def parentRollup(tiles: DataFrame, levels: Int): DataFrame = {
    require(levels >= 1, "levels must be >= 1")
    val f = 1 << levels
    tiles.groupBy((col("z") - levels).as("z"),
        expr(s"CAST(x DIV $f AS INT)").as("x"),
        expr(s"CAST(y DIV $f AS INT)").as("y"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_children"))
  }

  /** Bing-maps quadkey of an XYZ tile: `z` base-4 digits, digit i (from
    * the most significant) = bit i of x + 2·bit i of y — the string form
    * of the Morton/Z-order interleave ([[Layout.zValue2]]'s cousin): a
    * parent's quadkey is every descendant's PREFIX, so prefix-range scans
    * cover subtrees. Per-row, engine-portable integer/string ops. */
  def quadkey(z: Int, x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    require(z >= 1 && z <= 30, "z in [1, 30]")
    array_join(transform(sequence(lit(z), lit(1), lit(-1)), i =>
      (call_function("shiftright", x, (i - 1).cast("int")).bitwiseAND(lit(1))
        + lit(2) * call_function("shiftright", y, (i - 1).cast("int"))
          .bitwiseAND(lit(1))).cast("string")), "")
  }
}
