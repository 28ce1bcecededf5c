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
    // PARTIAL AGGREGATION BELOW THE JOIN (a decomposition Catalyst does
    // not derive itself): the final group keys (c_mktsegment via
    // o_custkey, o_orderpriority) are functions of the ORDER, so
    // lineitem pre-aggregates per l_orderkey before the join — the fact
    // shuffle carries one narrow (key, decimal-sum, count) row per
    // order instead of every line item (~4× fewer rows, far fewer
    // bytes). DECIMAL partial sums re-aggregate exactly (associative),
    // so the oracle hash is unchanged.
    "q13_join_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o  = t(s, dir, "orders")
      val c  = t(s, dir, "customer")
      val liAgg = li.groupBy(col("l_orderkey")).agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .as("rev_part"),
        count(lit(1)).as("cnt_part"))
      liAgg.join(o, liAgg("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(sum(col("rev_part")).cast("double").as("revenue"),
          sum(col("cnt_part")).as("n_items"))
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

    // Per-supplier as-of-style latest shipment — keyset pagination
    // shape of HybridSpout refills. ONE combiner-friendly hash
    // aggregate, no per-partition sort of the full fact table (a
    // row_number window would sort all of lineitem just to keep one
    // row per supplier — WindowGroupLimit trims the window's OUTPUT,
    // not the sort; and `max(struct(...))` would fall back to
    // SortAggregate, because struct agg buffers aren't
    // UnsafeRow-mutable). The tie-break tuple is packed into ONE
    // BIGINT so the aggregate stays a codegen'd max(long)
    // HashAggregate: days-since-epoch (15 bits, through 2059) << 48 |
    // orderkey (45 bits) << 3 | linenumber (3 bits, TPC-H 1..7);
    // numeric order of the pack IS the lexicographic tie-break
    // (latest shipdate, then orderkey, then linenumber). A silent
    // field overflow would corrupt the argmax, so out-of-range rows
    // raise instead (same fail-fast stance as pagerank's rank-wrap
    // guard) — the range check is a codegen'd branch per row.
    "q15_latest_per_supplier" -> ((s, dir) => {
      val days = datediff(col("l_shipdate"), lit("1970-01-01"))
      // midnight check included: a time-of-day component would be
      // silently coarsened by day-granularity packing, changing the
      // tie-break — fail fast instead
      val inRange = days.between(0, (1 << 15) - 1) &&
        col("l_orderkey").between(0, (1L << 45) - 1) &&
        col("l_linenumber").between(0, 7) &&
        col("l_shipdate") === date_trunc("day", col("l_shipdate"))
      val pack = when(inRange,
          days.cast("long") * lit(1L << 48) +
            col("l_orderkey") * lit(8L) + col("l_linenumber"))
        .otherwise(raise_error(
          lit("q15 tie-break pack overflow: shipdate/orderkey/linenumber out of range"))
          .cast("long"))
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(max(pack).as("p"))
        .select(col("l_suppkey"),
          shiftright(col("p"), 3).bitwiseAND(lit((1L << 45) - 1)).as("l_orderkey"),
          date_add(lit("1970-01-01").cast("date"),
            shiftright(col("p"), 48).cast("int"))
            .cast("timestamp").as("l_shipdate"))
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
    }),

    // Multi-level aggregation: ROLLUP over (key, status) on the frontier
    // view — per-host-per-status counts, per-host subtotals, grand total
    // in ONE pass (Catalyst expands the grouping sets into a single
    // Expand + hash agg; partial aggregation still combines map-side).
    "q36_status_rollup" -> ((s, dir) =>
      statusView(s, dir)
        .rollup(col("key"), col("status"))
        .agg(count(lit(1)).as("n"), min(col("event_id")).as("min_event"))
        .orderBy(col("key").asc_nulls_first, col("status").asc_nulls_first)),

    // Backward as-of join (operators.AsofJoin): each event picks up the
    // most recent order of the same user at-or-before its timestamp.
    // Union + one window pass — single hash shuffle on the key, no
    // range-join blowup (see AsofJoin scaladoc).
    "q37_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id").as("k"), col("ts").as("t"), col("event_id"))
      val o = t(s, dir, "orders")
        .select(col("o_custkey").as("k"),
          col("o_orderdate").cast("timestamp_ntz").as("t"), col("o_orderkey"))
        // state side must be unique per (key, time): latest orderkey wins
        .groupBy("k", "t").agg(max(col("o_orderkey")).as("asof_orderkey"))
      graft.operators.AsofJoin.asofJoin(e, o, "k", "t")
        .select(col("event_id"), col("k").as("user_id"), col("asof_orderkey"))
        .orderBy("event_id")
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
        |WHERE rnk <= 3 ORDER BY n_name, rnk""".stripMargin,

    "q36_status_rollup" ->
      s"""WITH v AS (${Tables.statusViewSql})
         |SELECT key, status, count(*) AS n, min(event_id) AS min_event
         |FROM v GROUP BY ROLLUP (key, status)
         |ORDER BY key NULLS FIRST, status NULLS FIRST""".stripMargin,

    "q37_asof_join" ->
      """WITH o AS (
        |  SELECT o_custkey AS k, CAST(o_orderdate AS TIMESTAMP) AS t,
        |         max(o_orderkey) AS asof_orderkey
        |  FROM orders GROUP BY 1, 2),
        |e AS (SELECT event_id, user_id AS k, CAST(ts AS TIMESTAMP) AS t FROM events)
        |SELECT e.event_id, e.k AS user_id, o.asof_orderkey
        |FROM e ASOF LEFT JOIN o ON e.k = o.k AND e.t >= o.t
        |ORDER BY event_id""".stripMargin
  )
}
