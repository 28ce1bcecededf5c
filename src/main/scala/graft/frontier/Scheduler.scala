package graft.frontier

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.{MetadataOps, Status}

/** Re-fetch scheduling as pure column expressions.
  *
  * `DefaultScheduler` (`core/.../persistence/DefaultScheduler.java:34,
  * 56-97`): nextFetchDate = now + interval(status), defaults FETCHED
  * 1440 min / FETCH_ERROR 120 / ERROR 44640; interval `-1` ⇒ never
  * (null). Per-metadata-kv custom intervals (config regex
  * `fetchInterval(.STATUS)?.key=value`) compile to extra WHEN branches.
  *
  * `AdaptiveScheduler` (`core/.../persistence/AdaptiveScheduler.java:
  * 121-318`): signature-compare — unchanged content (signature ==
  * signatureOld, or HTTP 304) grows the interval ×(1+incr) up to max;
  * changed content shrinks ×(1−decr) down to min. Operates on promoted
  * `signature` / `fetch_interval` columns.
  *
  * Being column expressions, schedulers run inside the merge's
  * whole-stage codegen — no per-row function calls.
  */
final case class DefaultScheduler(
    fetchedMins: Int = 1440,
    fetchErrorMins: Int = 120,
    errorMins: Int = 44640,
    customs: Seq[DefaultScheduler.CustomInterval] = Nil) {

  private def plusMins(now: Column, mins: Int): Column =
    if (mins < 0) lit(null).cast("timestamp_ntz") // -1 => never re-fetch
    else now + make_dt_interval(lit(0), lit(0), lit(mins), lit(0))

  /** nextFetchDate(status, metadata, now). Custom metadata-driven
    * intervals take precedence (first match wins), then per-status
    * defaults; DISCOVERED is due immediately. */
  def nextFetchDate(status: Column, metadata: Column, now: Column): Column = {
    val base =
      when(status === Status.Fetched, plusMins(now, fetchedMins))
        .when(status === Status.FetchError, plusMins(now, fetchErrorMins))
        .when(status === Status.Error, plusMins(now, errorMins))
        .when(status === Status.Redirection, plusMins(now, fetchedMins))
        .otherwise(now.cast("timestamp_ntz")) // DISCOVERED: due now
    customs.foldRight(base) { (c, acc) =>
      val hit = get(MetadataOps.mdValues(metadata, c.key), lit(0)) === c.value &&
        c.forStatus.map(s => status === s).getOrElse(lit(true))
      when(hit, plusMins(now, c.mins)).otherwise(acc)
    }
  }
}

object DefaultScheduler {
  /** `fetchInterval(.STATUS)?.key=value = mins` config rows. */
  final case class CustomInterval(key: String, value: String, mins: Int,
                                  forStatus: Option[String] = None)
}

/** AdaptiveScheduler column logic over promoted signature columns. */
final case class AdaptiveScheduler(
    defaultMins: Int = 1440,
    minMins: Int = 60,
    maxMins: Int = 10080,
    incRate: Double = 0.5,
    decRate: Double = 0.5) {

  /** New fetch interval given previous interval and change detection
    * (`AdaptiveScheduler.java:140-318`). */
  def newIntervalMins(prevMins: Column, unchanged: Column): Column = {
    val prev = coalesce(prevMins, lit(defaultMins))
    when(unchanged, least(prev * (1.0 + incRate), lit(maxMins.toDouble)))
      .otherwise(greatest(prev * (1.0 - decRate), lit(minMins.toDouble)))
  }

  /** Content unchanged: same signature as previous fetch, or HTTP 304. */
  def unchanged(signature: Column, signatureOld: Column, httpCode: Column): Column =
    (signature.isNotNull && signature === signatureOld) || httpCode === 304

  def nextFetchDate(now: Column, intervalMins: Column): Column =
    now + make_dt_interval(lit(0), lit(0), lit(0), (intervalMins * 60.0).cast("long").cast("double"))
}
