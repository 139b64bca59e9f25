package graft.queries

import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Breadth beyond the core checklist: as-of join (custom operator),
  * exact percentiles, grouping sets. */
object MiscQueries {
  import Relational.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Custom operator: backward as-of join (purchases <- latest prior
    // error per user), checked against DuckDB's native ASOF JOIN.
    "qa01_asof_join" -> { (s, d) =>
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("rts"), col("value").as("err_value"))
      AsOfJoin.asofBackward(purchases, errors, Seq("user_id"), "ts", "rts",
          Seq("err_value", "rts"))
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"),
          col("asof_err_value").as("err_value"),
          expr("asof_rts div 1000").as("err_ts_us"))
        .orderBy("event_id")
    },
    // Exact interpolated percentiles (sort-based, per group).
    "qp01_percentiles" -> { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
          expr("percentile(l_discount, 0.25)").as("p25_discount"))
        .orderBy("l_returnflag")
    },
    // GROUPING SETS with grouping() disambiguation.
    "qp02_grouping_sets" -> { (s, d) =>
      t(s, d, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
          |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
          |  COUNT(*) AS n
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin)
    }
  )

  val oracleSql: Map[String, String] = Map(
    "qa01_asof_join" ->
      """SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
        | r.value AS err_value, epoch_us(r.ts) AS err_ts_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "qp01_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS median_qty,
        | quantile_cont(l_extendedprice, 0.9) AS p90_price,
        | quantile_cont(l_discount, 0.25) AS p25_discount
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "qp02_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin
  )
}
