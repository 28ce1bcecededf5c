package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus — lets measurement
  * tooling ([[graft.tools.QueryProfile]]) drain queued listener events
  * DETERMINISTICALLY between queries instead of sleeping a heuristic
  * 120 ms and hoping the async bus caught up (ADVICE r16: counters
  * were reset while the bus could still be delivering the previous
  * query's events). Same sanctioned third-party-extension pattern as
  * [[org.apache.spark.sql.graft.ColumnBridge]]. */
object ListenerBridge {
  /** Block until every queued listener event has been delivered, or
    * `timeoutMillis` elapses (best-effort: a timeout degrades to the
    * old heuristic behavior rather than failing the measurement). */
  def drain(sc: SparkContext, timeoutMillis: Long = 5000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: Throwable => () }
}
