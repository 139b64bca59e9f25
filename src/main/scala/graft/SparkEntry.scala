package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.BBox
import graft.operators.TileEnumeration
import graft.queries.{FilterQueries, LabelQueries, Relational, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's "table scan": enumerate the README Rio job keyspace
    * (`main.py:89`, README.md:22-31 -> 312 tiles) as a distributed range. */
  def entry(spark: SparkSession): DataFrame =
    TileEnumeration.tiles(spark, BBox(-44.4836, -23.0266, -43.4127, -22.5856), 13)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ FilterQueries.queries ++ FilterQueries.tileQueries ++
      TextOps.queries ++ VectorOps.queries ++ LabelQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ FilterQueries.oracleSql ++ FilterQueries.tileOracleSql ++
      TextOps.oracleSql ++ VectorOps.oracleSql ++ LabelQueries.oracleSql
}
