package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the Deequ-style contract checks a
  * production 100 TB ingest runs before publishing a snapshot: violation
  * COUNTS (never row samples — those are a debugging follow-up query),
  * uniform output `(rule, target, violations, checked)` so downstream
  * gating is one filter.
  *
  * Scale shape: every row-local rule (not-null, non-negative, set
  * membership) folds into ONE aggregate pass over the table — adding a
  * rule adds a column to the same partial agg, not a scan. Uniqueness is
  * one groupBy per key set (count over the key's own shuffle);
  * referential integrity is a distinct-keys anti-join, never a row-level
  * join.
  */
object Quality {

  /** Row-local + uniqueness rules.
    * @param notNull      columns that must be non-null
    * @param nonNegative  numeric columns that must be >= 0
    * @param inSet        column -> allowed values
    * @param unique       key sets that must be duplicate-free (a key set
    *                     with n occurrences of a key counts n-1 violations)
    */
  def audit(df: DataFrame, notNull: Seq[String] = Nil,
      nonNegative: Seq[String] = Nil,
      inSet: Map[String, Seq[String]] = Map.empty,
      unique: Seq[Seq[String]] = Nil): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal: Seq[(String, String, Column)] =
      notNull.map(c => ("not_null", c,
        sum(when(col(c).isNull, 1L).otherwise(0L)))) ++
      nonNegative.map(c => ("non_negative", c,
        sum(when(col(c) < 0, 1L).otherwise(0L)))) ++
      inSet.toSeq.sortBy(_._1).map { case (c, allowed) =>
        ("in_set", c, sum(when(!col(c).isin(allowed: _*), 1L).otherwise(0L)))
      }
    val locals: Seq[DataFrame] =
      if (rowLocal.isEmpty) Nil
      else {
        val aggs = rowLocal.map { case (r, c, e) => e.as(s"${r}__$c") } :+
          count(lit(1)).as("__checked")
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        rowLocal.zipWithIndex.map { case ((r, c, _), i) =>
          Seq((r, c, row.getLong(i), row.getLong(rowLocal.size)))
            .toDF("rule", "target", "violations", "checked")
        }
      }
    val uniques: Seq[DataFrame] = unique.map { keys =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
        .agg(sum(col("n") - 1).as("violations"), sum("n").as("checked"))
        .select(lit("unique").as("rule"),
          lit(keys.mkString(",")).as("target"),
          col("violations"), col("checked"))
    }
    (locals ++ uniques).reduce(_ unionAll _)
  }

  /** Referential integrity: child keys with no matching parent —
    * (rule, target, violations = orphan DISTINCT keys, checked = child's
    * distinct keys). Distinct-keys anti-join: the join input is the key
    * cardinality, never the row count. */
  def refIntegrity(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val ck = child.select(col(childKey).as("k")).distinct()
    val pk = parent.select(col(parentKey).as("k")).distinct()
    val orphans = ck.join(pk, Seq("k"), "left_anti")
      .agg(count(lit(1)).as("violations"))
    ck.agg(count(lit(1)).as("checked")).crossJoin(orphans)
      .select(lit("ref_integrity").as("rule"),
        lit(s"$childKey->$parentKey").as("target"),
        col("violations"), col("checked"))
  }
}
