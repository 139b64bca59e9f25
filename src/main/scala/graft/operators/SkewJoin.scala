package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join.
  *
  * When one join key carries a disproportionate share of rows (hot users,
  * null-ish defaults, celebrity entities), a plain hash join puts the whole
  * hot key in one task. AQE's skew-join split handles sort-merge cases at
  * runtime; this helper is the explicit form that also works for
  * aggregate-then-join shapes and for forcing even layout on write:
  * the fact side gets a deterministic salt in [0, nSalts), the dim side is
  * replicated nSalts times, and the join key becomes (key, salt) — hot keys
  * spread over nSalts tasks at the cost of replicating the (small) dim.
  */
object SkewJoin {

  /** @param fact   large, possibly skewed side
    * @param dim    small side (replicated nSalts times — keep it small)
    * @param keys   equi-join key column names present on both sides
    * @param nSalts number of ways to split each hot key
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0)
    // deterministic per-row salt: hash of the full fact row spreads rows of
    // the same key uniformly without an RNG (replayable under task retry)
    val factSalted = fact.withColumn("__salt",
      pmod(hash(fact.columns.toIndexedSeq.map(col): _*), lit(nSalts)))
    val dimSalted = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    factSalted.join(dimSalted, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Salted two-phase aggregation for skewed group keys: partial aggregate
    * on (key, salt), then final aggregate on key. `partials` maps each
    * wanted output to (partialExpr, finalExpr-over-partial-column). */
  def saltedAgg(df: DataFrame, keys: Seq[String], nSalts: Int,
      partials: Seq[(String, Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(nSalts)))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(s"__p_${partials.head._1}"),
        partials.tail.map(p => p._2.as(s"__p_${p._1}")): _*)
    partial.groupBy(keys.map(col): _*)
      .agg(partials.head._3(col(s"__p_${partials.head._1}")).as(partials.head._1),
        partials.tail.map(p => p._3(col(s"__p_${p._1}")).as(p._1)): _*)
  }
}
