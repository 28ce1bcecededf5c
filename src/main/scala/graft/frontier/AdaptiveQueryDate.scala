package graft.frontier

import java.sql.Timestamp

/** Adaptive frontier query date — the spout's backlog-digging state
  * (`external/opensearch/.../persistence/AggregationSpout.java:306-363`,
  * SURVEY §3.2/§4 "adaptive work discovery"): the frontier query
  * filters `next_fetch_date <= queryDate`, and
  *
  *   - while polls return FULL batches the query date stays FROZEN, so
  *     consecutive polls keep draining the backlog at that horizon
  *     instead of being flooded by newly-due URLs (the busy crawler
  *     never starves old work);
  *   - an EMPTY poll resets the date to now (nothing left behind the
  *     frozen horizon — jump forward);
  *   - a partial batch, or `resetAfterMs` elapsed since the date was
  *     frozen (reference default 120 s), also resets to now, bounding
  *     how stale the horizon can get.
  *
  * Driver-side state between triggers (one instance per standing
  * query, e.g. captured by the foreachBatch closure) — exactly the
  * disposition SURVEY §4 assigns it. Not thread-safe; streaming
  * triggers are sequential.
  */
final class AdaptiveQueryDate(resetAfterMs: Long = 120000L) extends Serializable {
  private var frozen: Option[Timestamp] = None
  private var frozenAtMs: Long = 0L
  private var lastIssued: Timestamp = _

  /** The date to query with at `nowMs`. */
  def queryDate(nowMs: Long = System.currentTimeMillis()): Timestamp = {
    lastIssued = frozen match {
      case Some(d) if nowMs - frozenAtMs < resetAfterMs => d
      case _ =>
        frozen = None
        new Timestamp(nowMs)
    }
    lastIssued
  }

  /** Record a poll outcome: `selected` rows out of a `limit`-row cap,
    * polled at `nowMs` with the date returned by [[queryDate]]. */
  def observe(selected: Long, limit: Long,
              nowMs: Long = System.currentTimeMillis()): Unit =
    if (selected >= limit) {
      // full batch: freeze at the date that PRODUCED it — observe runs
      // after a whole fetch iteration, and freezing at observe-time
      // would let everything that became due during the iteration leak
      // into the "frozen" horizon. Keep the first freeze time so
      // resetAfterMs bounds total staleness, not per-poll staleness.
      if (frozen.isEmpty) {
        frozen = Some(Option(lastIssued).getOrElse(new Timestamp(nowMs)))
        frozenAtMs = nowMs
      }
    } else {
      frozen = None // empty or partial: jump to now on the next poll
    }

  /** Visible for tests/metrics: is the horizon currently frozen? */
  def isFrozen: Boolean = frozen.isDefined
}
