package graft.frontier

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrawlFunctions
import graft.model.Status

/** The frontier/status table: one row per normalized URL, the engine's
  * single piece of long-lived state (SURVEY §1.4).
  *
  * Backed by versioned parquet directories with a `_CURRENT` pointer —
  * the merge writes a new version and atomically swaps the pointer, so
  * readers never see a half-written table (poor-man's Delta; a Delta
  * `MERGE INTO` slots straight into [[merge]]'s interface).
  *
  * At scale the table is hash-distributed on `url_sha256` (the merge
  * shuffles both sides once on that key) and range-partitionable on
  * `bucket` for frontier-query pruning; `next_fetch_date` min/max stats
  * prune untouched files on select.
  *
  * Merge semantics = `AbstractStatusUpdaterBolt.execute`
  * (`core/.../persistence/AbstractStatusUpdaterBolt.java:139-242`):
  *  - existing row + incoming DISCOVERED ⇒ keep existing (dedup cache);
  *  - incoming non-DISCOVERED overrides (fresh fetch result);
  *  - FETCH_ERROR increments `fetch.error.count`; ≥ maxFetchErrors ⇒ ERROR;
  *  - scheduler sets `next_fetch_date`; ERROR ⇒ never (null).
  */
final class FrontierStore(val root: String, numBuckets: Int = 64,
                          maxFetchErrors: Int = 3,
                          scheduler: DefaultScheduler = DefaultScheduler()) extends Serializable {

  private def currentFile = Paths.get(root, "_CURRENT")

  def exists: Boolean = Files.exists(currentFile)

  private def currentVersion: Int =
    if (exists) new String(Files.readAllBytes(currentFile)).trim.toInt else -1

  /** Read the current frontier table (empty-schema DF when absent). */
  def read(spark: SparkSession): DataFrame = {
    val v = currentVersion
    if (v < 0)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.model.Schemas.status)
        .withColumn("next_fetch_date", col("next_fetch_date").cast("timestamp_ntz"))
        .withColumn("error_count", lit(0))
    else spark.read.parquet(s"$root/v$v")
  }

  private def writeVersion(df: DataFrame): Unit = {
    val v = currentVersion + 1
    df.write.mode("overwrite").parquet(s"$root/v$v")
    val tmp = Paths.get(root, "_CURRENT.tmp")
    Files.createDirectories(Paths.get(root))
    Files.write(tmp, v.toString.getBytes)
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Normalize incoming status rows (url, status, metadata[, signature])
    * into full frontier rows: id, partition key, bucket. */
  private def enrich(updates: DataFrame): DataFrame =
    updates
      .withColumn("url_sha256", CrawlFunctions.urlSha256(col("url")))
      .withColumn("key", CrawlFunctions.partitionKeyCol(col("url"), "byHost"))
      .withColumn("bucket", pmod(hash(col("key")), lit(numBuckets)))

  /** MERGE INTO status — the §3.3 upsert. `updates` needs columns
    * (url, status, metadata); `now` stamps scheduling. One shuffle on
    * url_sha256 (window dedup), map-side everything else. */
  def merge(spark: SparkSession, updates: DataFrame,
            now: java.sql.Timestamp = new java.sql.Timestamp(System.currentTimeMillis())): Unit = {
    val existing = read(spark)
      .select(col("url_sha256"), col("url"), col("status"), col("next_fetch_date"),
        col("key"), col("bucket"), col("metadata"), col("error_count"),
        lit(0).as("incoming"))
    val nowC = lit(now).cast("timestamp_ntz")
    val incoming = enrich(updates)
      .select(col("url_sha256"), col("url"), col("status"),
        lit(null).cast("timestamp_ntz").as("next_fetch_date"),
        col("key"), col("bucket"), col("metadata"),
        when(col("status") === Status.FetchError, 1).otherwise(0).as("error_count"),
        lit(1).as("incoming"))

    // Precedence within the merge batch and against existing rows:
    // non-DISCOVERED incoming > existing > DISCOVERED incoming, then
    // recency. Encoded as a sort rank inside one window — a single
    // shuffle implements the whole WHEN MATCHED/NOT MATCHED ladder.
    val rank =
      when(col("incoming") === 1 && col("status") =!= Status.Discovered, 0)
        .when(col("incoming") === 0, 1)
        .otherwise(2)
    val w = Window.partitionBy(col("url_sha256")).orderBy(rank, col("status"))

    val unioned = existing.unionByName(incoming)
      .withColumn("rn", row_number().over(w))
      // carry the error history: sum error counts across merged rows,
      // capped escalation handled below
      .withColumn("total_errors",
        sum(col("error_count")).over(Window.partitionBy(col("url_sha256"))))
      .where(col("rn") === 1)
      .drop("rn", "incoming")

    val escalated = unioned
      .withColumn("error_count",
        when(col("status") === Status.Fetched, 0).otherwise(col("total_errors")))
      .withColumn("status",
        when(col("status") === Status.FetchError && col("error_count") >= maxFetchErrors,
          Status.Error).otherwise(col("status")))
      .drop("total_errors")

    val scheduled = escalated
      .withColumn("next_fetch_date",
        coalesce(col("next_fetch_date"),
          scheduler.nextFetchDate(col("status"), col("metadata"), nowC)))

    writeVersion(scheduled.select(
      "url_sha256", "url", "status", "next_fetch_date", "key", "bucket",
      "metadata", "error_count"))
  }

  /** Frontier selection — AggregationSpout / SQLSpout semantics
    * (`AggregationSpout.java:110-166`, `SQLSpout.java:120-139`): due
    * URLs, top-`perBucket` per key by next_fetch_date, at most
    * `maxKeys` keys ordered by their earliest due date, global LIMIT.
    * The due-date filter prunes parquet files before the single window
    * shuffle. */
  def selectBatch(spark: SparkSession, now: java.sql.Timestamp,
                  perBucket: Int = 5, maxKeys: Int = 100,
                  limit: Int = 500,
                  excludeInFlight: Option[DataFrame] = None): DataFrame = {
    val due = read(spark)
      .where(col("next_fetch_date").isNotNull &&
        col("next_fetch_date") <= lit(now).cast("timestamp_ntz") &&
        col("status") =!= Status.Error)
    val afterPurgatory = excludeInFlight match {
      case Some(inflight) => due.join(broadcast(inflight.select(col("url_sha256"))),
        Seq("url_sha256"), "left_anti")
      case None => due
    }
    // Key selection first: top-`maxKeys` keys by earliest due date as a
    // small aggregate + TakeOrdered (never a global window over URL
    // rows — that would single-partition the sort at scale), then the
    // per-key top-K window joins only the surviving keys.
    val topKeys = afterPurgatory
      .groupBy(col("key")).agg(min(col("next_fetch_date")).as("key_min"))
      .orderBy(col("key_min"), col("key"))
      .limit(maxKeys)
    val wk = Window.partitionBy(col("key")).orderBy(col("next_fetch_date"), col("url"))
    afterPurgatory
      .join(broadcast(topKeys), Seq("key"))
      .withColumn("rn", row_number().over(wk))
      .where(col("rn") <= perBucket)
      .orderBy(col("key_min"), col("key"), col("rn"))
      .limit(limit)
      .select("url_sha256", "url", "status", "next_fetch_date", "key", "metadata")
  }

  /** Count-by-status — StatusMetricsBolt (`StatusMetricsBolt.java:44`). */
  def statusCounts(spark: SparkSession): DataFrame =
    read(spark).groupBy("status").agg(count(lit(1)).as("n"))
}
