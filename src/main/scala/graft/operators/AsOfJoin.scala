package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `rightTime <= leftTime` within the same key (optionally within a
  * tolerance). Spark has no built-in relational as-of join; this composes
  * one from built-ins (preference order (a) of the builder contract).
  *
  * Implementation: union both sides tagged, single sort-per-key window,
  * `last(rightValue, ignoreNulls)` over rows-preceding — ONE shuffle on the
  * key, no range-condition join explosion. At 100 TB this is the shape you
  * want: the naive `l JOIN r ON key AND r.t <= l.t` + max() approach is a
  * quadratic-blowup range join; this is linear in rows after one hash
  * partition by key with a per-partition sort — and both engines
  * (DuckDB ASOF JOIN, this operator) agree on semantics, which the oracle
  * checks (qa01).
  */
object AsOfJoin {

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param keyCols   equi-join key column names (same names both sides)
    * @param leftTime  left ordering column name
    * @param rightTime right ordering column name
    * @param rightVals right value columns to carry (null when no match)
    * @param tolerance max allowed `leftTime - rightTime` in the time
    *                  column's own units; a most-recent match OLDER than
    *                  this yields nulls (pandas merge_asof semantics —
    *                  the match is still the most recent row, tolerance
    *                  only decides whether it counts)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns
    // All right values travel in ONE struct so the fill below picks them
    // from the SAME most-recent right row — filling each column
    // independently with last(ignoreNulls) would skip a right row whose
    // value is NULL and stitch outputs from different rows, which is not
    // what an as-of match means (DuckDB ASOF JOIN returns the matched
    // row's values *including its NULLs*, and qa01 checks that).
    // the matched row's own time rides along as __rt so a tolerance can be
    // applied against the SAME row the values came from
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c)) :+
        org.apache.spark.sql.types.StructField("__rt", right.schema(rightTime).dataType))
    // tag and align schemas: side 0 = right (sorts before left on ties so a
    // right row at the exact same time IS visible to the left row)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          struct(rightVals.map(col) :+ col(rightTime).as("__rt"): _*).as("__r")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).cast(right.schema(rightTime).dataType).as("__t"), lit(1).as("__side"),
          lit(null).cast(rStructType).as("__r")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val unioned = r.unionByName(l)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // the struct itself is non-null for every right row (even when its
    // fields are null), so ignoreNulls skips only the left-side fillers
    val filled = unioned.withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__m", tolerance match {
        // beyond-tolerance matches null out whole (all fields from the one
        // matched row, so they vanish together)
        case Some(tol) =>
          when(col("__t") - col("__asof").getField("__rt") <= tol, col("__asof"))
        case None => col("__asof")
      })
    filled.filter(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(col) ++
        rightVals.map(c => col("__m").getField(c).as(s"asof_$c")): _*)
  }

  /** Forward as-of join — for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` (pandas `merge_asof(direction='forward')`):
    * the same one-shuffle union/window shape as [[asofBackward]], with
    * `first(ignoreNulls)` over rows-FOLLOWING and the right side sorting
    * AFTER the left on time ties so a right row at the exact same time is
    * visible. Tolerance nulls out matches farther than
    * `rightTime - leftTime > tolerance`, as a unit. */
  def asofForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c)) :+
        org.apache.spark.sql.types.StructField("__rt", right.schema(rightTime).dataType))
    // side 1 = right: sorts AFTER left on ties, so an equal-time right row
    // falls inside the forward window (>= semantics)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(1).as("__side"),
          struct(rightVals.map(col) :+ col(rightTime).as("__rt"): _*).as("__r")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).cast(right.schema(rightTime).dataType).as("__t"), lit(0).as("__side"),
          lit(null).cast(rStructType).as("__r")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val unioned = r.unionByName(l)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(0, Window.unboundedFollowing)
    val filled = unioned.withColumn("__asof", first(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__m", tolerance match {
        case Some(tol) =>
          when(col("__asof").getField("__rt") - col("__t") <= tol, col("__asof"))
        case None => col("__asof")
      })
    filled.filter(col("__side") === 0)
      .select(leftCols.toIndexedSeq.map(col) ++
        rightVals.map(c => col("__m").getField(c).as(s"asof_$c")): _*)
  }
}
