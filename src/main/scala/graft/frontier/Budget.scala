package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fetch-budget apportionment across hosts — the planning face of the
  * reference's per-queue refill: HybridSpout asks each queue for up to
  * `bucket size` URLs per poll and the buffer throttles hosts against
  * each other (`external/opensearch/.../HybridSpout.java:146-216`,
  * URLBuffer family). Given per-host due counts and a global per-cycle
  * budget B, allocate integer quotas proportional to queue sizes with
  * the LARGEST-REMAINDER (Hamilton) method: base = B·n div N, then the
  * leftover B − Σbase slots go to the largest remainders (ties to the
  * smaller key). Exact integer arithmetic, fully deterministic — a SQL
  * oracle reproduces every quota — and Σquota = B exactly whenever
  * B ≤ N (before the per-host n cap).
  *
  * Scale: the input is the per-host QUEUE TABLE (one row per host —
  * 10⁵-10⁷ at web scale, dim-table-sized), so the 1-row total/leftover
  * aggregates ride back as broadcasts and the remainder ranking is one
  * window over host rows. The corpus/frontier itself is never touched:
  * callers aggregate due counts first (one shuffle over status-filtered
  * rows), which is the whole point — budget planning costs one
  * aggregation no matter how deep the queues are.
  */
object Budget {

  /** Returns (keyCol, nCol, quota). Quotas are capped at the host's own
    * due count (a queue cannot absorb more than it holds), so when
    * B > N every host simply gets its full queue. */
  def allocate(due: DataFrame, keyCol: String, nCol: String,
               budget: Long): DataFrame = {
    require(budget >= 0, s"negative budget: $budget")
    val a = due.select(col(keyCol).as("key"), col(nCol).cast("long").as("n"))
    // 1-row total
    val tot = a.agg(coalesce(sum("n"), lit(0L)).as("total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("key"))
    // REAL overflow guard: budget * n must fit a BIGINT or quotas
    // silently wrap negative. assert_true raises on the violating row;
    // the IF keeps the guard inside codegen (CaseWhen branches are
    // lazy, so the assert only evaluates when the bound is breached).
    // Negative due counts are invalid input (a queue cannot hold a
    // negative number of URLs) and would also wrap budget*n for
    // extreme values, so the guard is two-sided: 0 <= n <= maxSafeN.
    val maxSafeN = if (budget == 0L) Long.MaxValue else Long.MaxValue / budget
    val prod = s"IF(n BETWEEN 0 AND ${maxSafeN}L, $budget * n, " +
      s"CAST(assert_true(false, concat('Budget.allocate overflow/invalid due count ', " +
      s"CAST(n AS STRING), ': must be in [0, ${maxSafeN}] for budget $budget')) AS BIGINT))"
    val based = a.crossJoin(tot)
      .withColumn("base", when(col("total") === 0L, 0L)
        .otherwise(expr(s"($prod) div total")))
      .withColumn("rem", when(col("total") === 0L, 0L)
        .otherwise(expr(s"($prod) % total")))
    val leftover = based.agg((lit(budget) - coalesce(sum("base"), lit(budget)))
      .as("leftover"))
    based.crossJoin(leftover)
      // host-count-sized single-partition window: the input is the
      // queue table, not the frontier — bounded by design (see header)
      .withColumn("rn", row_number().over(w))
      .withColumn("quota", least(
        col("base") + when(col("rn") <= col("leftover"), 1L).otherwise(0L),
        col("n")))
      .select(col("key").as(keyCol), col("n").as(nCol), col("quota"))
  }
}
