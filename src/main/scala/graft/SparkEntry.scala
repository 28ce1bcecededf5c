package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{AnalyticsQueries, CoverageQueries, CrawlQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-domain query maps; every entry with a
  * DuckDB-expressible equivalent also appears in `oracleSql` (same column
  * names on both sides — the driver's compare sorts columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the frontier top-K selection — the reference's defining query. */
  def entry(spark: SparkSession): DataFrame =
    CrawlQueries.queries("q02_frontier_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ CrawlQueries.queries ++
      AnalyticsQueries.queries ++ CoverageQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ CrawlQueries.oracles ++
      AnalyticsQueries.oracles ++ CoverageQueries.oracles
}
