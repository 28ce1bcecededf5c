package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization — split each user's event sequence into sessions at
  * inactivity gaps; the standard clickstream / training-data grouping
  * the reference's metrics consumers aggregate towards (status streams
  * per time window) and a first-class LLM-pipeline operator here.
  *
  * Scale design: ONE hash shuffle on the user key. The gap-detect lag
  * and the running session counter share the same window partitioning
  * and ordering, so Catalyst plans a single Exchange + Sort and runs
  * both functions in one WindowExec pass; per-session aggregation
  * afterwards reuses the same hash partitioning (AQE coalesces, no
  * second wide exchange of the raw events). No driver state, no
  * collect — a 100 TB clickstream sessionizes in two stages.
  *
  * Streaming face: the same semantics come built in as
  * `session_window(ts, gap)` in a watermarked `groupBy` — see
  * [[graft.streaming.EventStreams]].
  */
object Sessions {

  /** Tag each event with its 1-based `session_seq` per user. A new
    * session starts when the gap to the previous event exceeds
    * `gapMinutes`. `orderCol` breaks timestamp ties deterministically
    * (idempotent replay / engine-portable oracles need a total order).
    */
  def sessionize(events: DataFrame, userCol: String = "user_id",
                 tsCol: String = "ts", orderCol: String = "event_id",
                 gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(orderCol))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // epoch-second truncation on both engines: floor(ts) - floor(prev).
    // NTZ has no direct long cast; the intermediate TZ cast offsets both
    // terms identically, so the difference is TZ-independent.
    val sec: Column => Column = c => c.cast("timestamp").cast("long")
    val gapSec = sec(col(tsCol)) - sec(lag(col(tsCol), 1).over(byUser))
    events
      .withColumn("__new_session",
        when(gapSec.isNull || gapSec > gapMinutes * 60L, 1).otherwise(0))
      .withColumn("session_seq", sum(col("__new_session")).over(running))
      .drop("__new_session")
  }

  /** Per-session rollup: event count, span, value total. The value sum
    * accumulates in DECIMAL so partial-aggregation order can't flip
    * last-ulp bits vs a single-threaded oracle. */
  def sessionStats(events: DataFrame, userCol: String = "user_id",
                   tsCol: String = "ts", orderCol: String = "event_id",
                   gapMinutes: Int = 30, valueCol: String = "value"): DataFrame =
    sessionize(events, userCol, tsCol, orderCol, gapMinutes)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("total_value"))
}
