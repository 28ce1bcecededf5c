package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table materialization for co-located joins — the cluster
  * answer to "this join key is used by every downstream stage, stop
  * shuffling the corpus for it". A table written with `bucketBy(n, key)`
  * carries its hash-partitioning as metadata: every later join or
  * aggregation on `key` reads the buckets AS the shuffle output and
  * plans NO Exchange on that side (BucketingSpec pins this on the
  * physical plan). The frontier store implements the same idea by hand
  * for its merge key (`FrontierStore` scaladoc); this utility is the
  * catalog-native form for analytics tables — e.g. a crawl corpus
  * bucketed by content digest joins its dedup keep-lists shuffle-free
  * forever after.
  *
  * At 100 TB: bucketing costs ONE shuffle at write time and amortizes
  * it over every subsequent join/agg on the key — the break-even is a
  * single reuse. Pick `buckets` ≈ the cluster's target partition count
  * at the table's full size (buckets are the parallelism floor for
  * bucket-reading stages). `sortBy(key)` additionally pre-sorts each
  * bucket file so a sort-merge join can skip its Sort when each bucket
  * holds one file (write with one task per bucket to guarantee that;
  * multi-file buckets still skip the Exchange, just not the Sort).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table under
    * the session catalog (in-memory catalog + warehouse dir — no Hive
    * needed). Pass `path` to pin the data location explicitly (an
    * EXTERNAL table — bucket metadata still rides in the catalog);
    * without it the session warehouse dir is used. Drops any previous
    * registration first so a stale location from an earlier session
    * can't collide (LOCATION_ALREADY_EXISTS fires even when the
    * in-memory catalog is empty). */
  def saveBucketed(df: DataFrame, table: String, key: String,
                   buckets: Int, path: Option[String] = None): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    val w = df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides along from the
    * catalog, which is what lets the planner drop the Exchange). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
