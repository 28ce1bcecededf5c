package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram-based range sharding: split a corpus into `n` contiguous
  * ranges of a sort key (token/char count) with near-equal populations
  * — the "write the training set as N balanced, range-ordered shards"
  * step of a dataset build, and the same mechanism a distributed
  * range-partitioner uses (Spark's own `RangePartitioner` samples the
  * key distribution; public source
  * `core/src/main/scala/org/apache/spark/Partitioner.scala`).
  *
  * A global `ntile`/`row_number` over the corpus would funnel every row
  * through ONE window partition — the canonical scale-killer. Instead:
  * collapse the corpus to its key HISTOGRAM (distinct key values with
  * counts — a map-side-combinable aggregate whose working set is the
  * value domain, not the row count), compute each value's shard from
  * the histogram's running count, and broadcast the value→shard map
  * back for a MAP-ONLY assignment. The corpus itself is never sorted
  * and never shuffled on the key; rows with equal keys land in the
  * same shard, so shard sizes are balanced up to key-value granularity
  * — exactly the guarantee a real range partitioner gives.
  *
  * Everything is BIGINT arithmetic (`shard = cum_before * n div total`)
  * — deterministic on any engine at any parallelism.
  */
object Sharding {

  /** Value→shard map from the key histogram: (key value, shard).
    * The window runs over the DISTINCT-value histogram — value-domain
    * sized, not corpus sized. */
  private def valueShards(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    val hist = df.groupBy(col(keyCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = hist.agg(sum("cnt")).first().getLong(0)
    hist.select(col("v"), (sum("cnt").over(w) - col("cnt")).as("cum"))
      // Column `/` is float division — `div` keeps the arithmetic BIGINT
      .select(col("v"), expr(s"cum * $n div $total").as("shard"))
  }

  /** Shard manifest: one row per shard with
    * (shard, n_docs, sum_key, min_key, max_key). */
  def rangeShardStats(df: DataFrame, keyCol: String, n: Int): DataFrame =
    df.select(col(keyCol).cast("long").as("v"))
      .join(broadcast(valueShards(df, keyCol, n)), "v")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("v").as("sum_key"),
        min("v").as("min_key"), max("v").as("max_key"))
      .orderBy("shard")

  /** Per-row shard assignment (id, shard) — the surface a shard writer
    * consumes (`df.write.partitionBy("shard")`). Map-only over the
    * corpus: the value→shard map rides in broadcast. */
  def assignShards(df: DataFrame, idCol: String, keyCol: String,
                   n: Int): DataFrame =
    df.select(col(idCol).cast("long").as(idCol),
        col(keyCol).cast("long").as("v"))
      .join(broadcast(valueShards(df, keyCol, n)), "v")
      .select(col(idCol), col("shard"))
}
