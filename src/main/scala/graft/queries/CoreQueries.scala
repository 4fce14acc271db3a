package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Core relational operator queries: aggregation, join, window, sort,
  * top-k, set ops, cube/rollup, distinct.
  *
  * Determinism discipline for the DuckDB oracle gate:
  *  - double aggregates go through DECIMAL(18,2) so partial-aggregation
  *    order can never change the result (decimal sums are exact); the
  *    final value is cast back to DOUBLE, which is IEEE-deterministic.
  *  - every result has a total ORDER BY on its key columns (Catalyst's
  *    EliminateSorts removes the sort under `count()`-style benches).
  */
object CoreQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A3-style hash aggregation with map-side partial agg (TPC-H Q1 shape).
    "q1_agg_pricing" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // O8 top-k: orderBy + limit — Spark plans TakeOrderedAndProject (no full sort materialization).
    "q2_topk_orders" -> ((s, d) => {
      orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // §2.9 parity-plus star join: broadcast the small dims, shuffle only the fact table.
    "q3_join_star" -> ((s, d) => {
      val li = lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
      val o  = orders(s, d).select("o_orderkey", "o_custkey")
      val c  = customer(s, d).select("c_custkey", "c_nationkey")
      val n  = nation(s, d).select("n_nationkey", "n_name")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // §2.8 window functions: running sum + row_number per partition key.
    "q4_window_running" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"), dec(col("l_quantity")).as("qty"))
        .withColumn("rn", row_number().over(w))
        .withColumn("running_qty",
          sum(col("qty")).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("rn"), col("running_qty"))
        .orderBy("l_suppkey", "rn")
    }),

    // §2.9 semi/anti joins (EXISTS / NOT EXISTS).
    "q5_anti_join" -> ((s, d) => {
      val c = customer(s, d).select("c_custkey", "c_name", "c_acctbal")
      val o = orders(s, d).select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .orderBy("c_custkey")
    }),
    "q5b_semi_join" -> ((s, d) => {
      val c = customer(s, d).select("c_custkey", "c_mktsegment")
      val o = orders(s, d)
        .filter(col("o_totalprice") > 100000.0)
        .select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")
    }),

    // J5 set ops: intersect / except, tagged + unioned into one result.
    "q6_setops" -> ((s, d) => {
      val cn = customer(s, d).select(col("c_nationkey").cast("int").as("nationkey")).distinct()
      val sn = supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")).distinct()
      cn.intersect(sn).withColumn("tag", lit("both"))
        .unionByName(cn.except(sn).withColumn("tag", lit("cust_only")))
        .unionByName(sn.except(cn).withColumn("tag", lit("supp_only")))
        .orderBy("tag", "nationkey")
    }),

    // A6 grouping sets: rollup over (status, priority).
    "q7_rollup" -> ((s, d) => {
      orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    // A5 distinct count + plain distinct.
    "q8_distinct" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")
    }),

    // Tumbling event-time window aggregation (batch form; streaming parity in graft.streaming).
    "q9_events_hourly" -> ((s, d) => {
      events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // Filter + projection pushdown to parquet (M2/M3/P6 shape).
    "q10_filter_project" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    }),

    // Ordering + lag/lead analytics over events per user.
    "q11_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("gap_sec",
          (col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double")))
        .filter(col("prev_type").isNotNull)
        .groupBy("event_type", "prev_type")
        .agg(count(lit(1)).as("n"),
          sum(round(col("gap_sec"), 6).cast("decimal(18,6)")).cast("double").as("sum_gap_sec"))
        .orderBy("event_type", "prev_type")
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q3_join_star" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q4_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS rn,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q5b_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q6_setops" ->
      """WITH cn AS (SELECT DISTINCT CAST(c_nationkey AS INT) AS nationkey FROM customer),
        |     sn AS (SELECT DISTINCT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
        |SELECT nationkey, 'both' AS tag FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
        |UNION ALL
        |SELECT nationkey, 'cust_only' AS tag FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
        |UNION ALL
        |SELECT nationkey, 'supp_only' AS tag FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
        |ORDER BY tag, nationkey""".stripMargin,
    "q7_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q8_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q9_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q10_filter_project" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q11_lag_lead" ->
      """WITH t AS (
        |  SELECT event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |    EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_sec
        |  FROM events)
        |SELECT event_type, prev_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(gap_sec, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_gap_sec
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY event_type, prev_type ORDER BY event_type, prev_type""".stripMargin
  )
}
