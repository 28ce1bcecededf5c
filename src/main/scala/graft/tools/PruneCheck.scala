package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-harness honesty guard: flags queries whose operators Catalyst
  * DELETES when the action is `df.count()` — a count re-optimizes with
  * zero required columns, so a row-preserving window/join tail (as-of
  * join, semdedup best-in-cluster window, quota allocation) prunes away
  * and the "benchmark" times a parquet metadata count. Found q37, q57,
  * q87, q92 mis-measured this way (round 16); Bench now executes
  * `queryExecution.toRdd.count()` which keeps the full output schema.
  * Run after adding queries: any PRUNED line means the query would lie
  * under a count() action. Usage: runMain graft.tools.PruneCheck [sfDir]
  */
object PruneCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var flagged = 0
    for (q <- graft.SparkEntry.queries.keys.toSeq.sorted) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val underCount = df.groupBy().count().queryExecution.optimizedPlan.toString
      val full = df.queryExecution.optimizedPlan.toString
      val windowLost = full.contains("Window") && !underCount.contains("Window")
      val joinLost = full.contains("Join") && !underCount.contains("Join")
      // a count plan with NO per-row operator left (no filter/window/
      // join/generate/expand/aggregate-below-the-count) is a parquet
      // row-count: the vectorized reader returns batch cardinalities
      // without decoding a single column — the "timing" is metadata.
      val metadataOnly = Seq("Filter", "Window", "Join", "Generate", "Expand",
          "LogicalRDD" /* eager pre-computed work, count is honest */,
          "MapPartitions", "DeserializeToObject" /* opaque to pruning */)
        .forall(op => !underCount.contains(op)) &&
        "Aggregate".r.findAllIn(underCount).size <= 1 &&
        underCount.contains("Relation")
      if (windowLost || joinLost || metadataOnly) {
        flagged += 1
        println(s"PRUNED $q windowLost=$windowLost joinLost=$joinLost metadataCount=$metadataOnly")
      }
    }
    println(s"done — $flagged flagged (informational; Bench's toRdd action is immune)")
    spark.stop()
  }
}
