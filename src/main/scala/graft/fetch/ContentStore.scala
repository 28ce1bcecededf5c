package graft.fetch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-content cache keyed by sha256(url) — the Spark-native shape of
  * the reference's S3 content cache (`external/aws/.../s3/S3Cacher
  * .java:38` stores fetched bytes under the URL digest;
  * `S3CacheChecker.java:42` consults it before fetching).
  *
  * Layout: parquet partitioned by the first hex byte of the digest
  * (256 dirs) — object-store friendly (no hot prefix, bounded listing)
  * and lets a digest-filtered read prune 255/256 partitions. Writes
  * append; readers dedupe to the newest row per digest, so re-fetches
  * supersede older captures without rewrites (same idea as the frontier
  * store's generation model, but append-only because content is
  * immutable history, not mutable state).
  *
  * `split` is the cache-checker: ONE broadcast of the batch's digests
  * (a crawl batch is small next to the store) splits it into hits —
  * served from the store, no fetch — and misses to go through
  * [[FetchStage]]. Both sides stay DataFrames; nothing collects.
  */
class ContentStore(path: String) {

  /** Append content rows (url + content bytes + fetch time). */
  def store(df: DataFrame): Unit =
    df.select(
        sha2(col("url"), 256).as("url_sha256"),
        substring(sha2(col("url"), 256), 1, 2).as("shard"),
        col("url"), col("content"),
        col("fetch_time").cast("timestamp_ntz").as("fetch_time"))
      .write.mode("append").partitionBy("shard").parquet(path)

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("url_sha256", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType),
    org.apache.spark.sql.types.StructField("fetch_time", org.apache.spark.sql.types.TimestampNTZType),
    org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.StringType)))

  /** Current view: newest capture per digest. Empty (typed) before the
    * first write — a cache miss, not an error. */
  def read(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("url_sha256"))
      .orderBy(col("fetch_time").desc)
    val dir = new java.io.File(path)
    val hasData = dir.isDirectory && dir.listFiles().exists(_.getName.startsWith("shard="))
    val raw =
      if (hasData) spark.read.parquet(path)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    raw.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn", "shard")
  }

  /** Cache check for a fetch batch: (hits with content, misses).
    * The batch digest set broadcasts; the store is only read on the
    * hit side, digest-filtered so partition pruning applies. */
  def split(spark: SparkSession, batch: DataFrame): (DataFrame, DataFrame) = {
    val keyed = batch.withColumn("url_sha256", sha2(col("url"), 256))
    val cached = read(spark).select(
      col("url_sha256"), col("content"), col("fetch_time").as("cached_at"))
    val hits = keyed.join(cached, Seq("url_sha256"))
    val misses = keyed.join(broadcast(cached.select(col("url_sha256"))),
      Seq("url_sha256"), "left_anti")
    (hits, misses)
  }
}
