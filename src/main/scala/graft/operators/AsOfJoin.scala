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
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // tag and align schemas: side 0 = right (sorts before left on ties so a
    // right row at the exact same time IS visible to the left row)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        rightVals.map(c => col(c).as(s"__r_$c")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).cast(right.schema(rightTime).dataType).as("__t"), lit(1).as("__side")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val unioned = r.unionByName(l)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = rightVals.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }
}
