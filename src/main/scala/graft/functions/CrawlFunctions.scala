package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Status

/** Codegen-friendly column expressions for the crawl domain.
  *
  * Everything here is composed from `org.apache.spark.sql.functions._`
  * built-ins so it stays inside whole-stage codegen and (where relevant)
  * pushes down to the scan. The heavier, stateful pieces (full
  * BasicURLNormalizer, filter chains) live in [[Urls]] / the filter
  * package and are registered as UDFs by [[UdfRegistry]] for the few
  * places column algebra genuinely can't express them.
  */
object CrawlFunctions {

  /** Host of a URL as a column expression (lowercased).
    * Equivalent to `parse_url(url, 'HOST')` but tolerant of missing
    * scheme; regexp is codegen'd. */
  def hostCol(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))

  /** Paid-level domain from a host column: last two labels, or last three
    * when the 2-label tail is a known public suffix (URLPartitioner
    * byDomain mode, `core/.../util/URLPartitioner.java:60-75`). */
  def pldCol(hostC: Column): Column = {
    val labels    = split(hostC, "\\.")
    val n         = size(labels)
    val lastTwo   = array_join(slice(labels, -2, 2), ".")
    val lastThree = array_join(slice(labels, -3, 3), ".")
    when(n <= lit(2), hostC)
      .otherwise(when(lastTwo.isin(Urls.twoLevelSuffixList: _*), lastThree).otherwise(lastTwo))
  }

  /** partition key column: mode byHost | byDomain (byIP needs metadata /
    * a resolver and goes through the UDF path). */
  def partitionKeyCol(url: Column, mode: String): Column = mode match {
    case "byDomain" => pldCol(hostCol(url))
    case _          => hostCol(url)
  }

  /** Status.fromHTTPCode as a CASE expression (`Status.java:26-34`). */
  def statusFromHttpCode(code: Column): Column =
    when(code === 200 || code === 304, Status.Fetched)
      .when(code >= 300 && code < 400, Status.Redirection)
      .otherwise(Status.FetchError)

  /** URL document id — sha256 hex of the (normalized) url string
    * (`AbstractStatusUpdaterBolt.java:251-253`). Built-in sha2 = codegen. */
  def urlSha256(url: Column): Column = sha2(url, 256)
}

/** UDF registration for the few scalar functions whose semantics need real
  * Scala (IDN, percent-escape table, public-suffix logic on arbitrary
  * input). Registered once per SparkSession; everything else in the engine
  * prefers column algebra.
  */
object UdfRegistry {
  def register(spark: SparkSession): Unit = {
    spark.udf.register("normalize_url", (u: String) => Urls.normalize(u).orNull)
    spark.udf.register("resolve_url", (base: String, rel: String) => Urls.resolve(base, rel).orNull)
    spark.udf.register("partition_key",
      (u: String, mode: String) => Urls.partitionKey(u, mode).orNull)
  }
}
