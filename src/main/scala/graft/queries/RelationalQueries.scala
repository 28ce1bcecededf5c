package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Relational/analytics queries over the TPC-H-ish tables — the batch-SQL
  * face of the engine (status analytics in the reference are this shape:
  * `StatusMetricsBolt` count-by-status writ large).
  *
  * Determinism discipline for the DuckDB oracle: every money/quantity sum
  * accumulates in exact DECIMAL (2-dec inputs are exact in decimal, so the
  * sum is order-independent) and only the final value is cast to double —
  * identical bits on both engines regardless of partitioning.
  */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1 pricing summary: scan-heavy agg; filter + 2-col grouping
    // push into the parquet scan, partial agg map-side.
    "q01_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
               (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))).cast("double")
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // 3-way join with broadcast dims: revenue by market segment + order
    // priority. customer/orders are the small sides at scale — broadcast
    // customer (dim), shuffle-join the fact once.
    "q13_join_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o  = t(s, dir, "orders")
      val c  = t(s, dir, "customer")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") *
               (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))).cast("double")
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("c_mktsegment", "o_orderpriority")
    }),

    // Windowed event-time aggregation (Structured Streaming shape run as
    // batch): tumbling 1-hour windows per event type — watermark+window
    // semantics of the streaming engine, verifiable in SQL.
    "q14_event_windows" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy("hour", "event_type")),

    // Per-supplier as-of-style latest shipment (window last-value) —
    // keyset pagination shape of HybridSpout refills.
    "q15_latest_per_supplier" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").desc, col("l_orderkey").desc, col("l_linenumber").desc)
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_shipdate"))
        .orderBy("l_suppkey")
    }),

    // Grouped top-N with rank over join — per-nation top-3 customers by
    // account balance (broadcast nation, window on customer).
    "q16_topn_per_nation" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val w = Window.partitionBy(col("n_name")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select(col("n_name"), col("c_custkey"), col("rnk"))
        .orderBy("n_name", "rnk")
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q13_join_revenue" ->
      """SELECT c_mktsegment, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment, o_orderpriority
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,

    "q14_event_windows" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q15_latest_per_supplier" ->
      """SELECT l_suppkey, l_orderkey, l_shipdate FROM (
        |  SELECT l_suppkey, l_orderkey, l_shipdate,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
        |  FROM lineitem) x
        |WHERE rn = 1 ORDER BY l_suppkey""".stripMargin,

    "q16_topn_per_nation" ->
      """SELECT n_name, c_custkey, rnk FROM (
        |  SELECT n_name, c_custkey,
        |    row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey) x
        |WHERE rnk <= 3 ORDER BY n_name, rnk""".stripMargin
  )
}
