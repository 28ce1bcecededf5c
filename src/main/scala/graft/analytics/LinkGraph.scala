package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph quality signals — PageRank over a (src, dst) edge table,
  * the standard corpus-quality prior a training-data pipeline joins
  * against documents (and the crawl-side analogue of frontier
  * prioritization by host authority).
  *
  * Determinism: ranks are FIXED-POINT integers (`scale` units = rank
  * 1.0). Each iteration is `r' = 0.15*scale + 0.85 * sum(r div
  * outdeg)` in pure BIGINT arithmetic — floor division and integer
  * sums are order-independent and engine-exact, so a DuckDB oracle
  * reproduces the ranks bit-for-bit (float PageRank can't do that:
  * partial-sum order flips last-ulp bits).
  *
  * Scale: each iteration is one shuffle (groupBy dst) plus a reused
  * broadcast/shuffle join of ranks against edges. The iteration count
  * is fixed (not convergence-tested) so the plan is a static DAG —
  * at 100 TB, `iterations` joins over a bucketed edge table, with the
  * rank side orders of magnitude smaller than the edges. Dangling
  * nodes keep the damping floor; vertices are every distinct src/dst.
  */
object LinkGraph {

  /** Fixed-point PageRank. Returns (node, rank) with rank in `scale`
    * units (divide by scale for the conventional value). */
  def pagerank(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
               iterations: Int = 3, scale: Long = 1000000000000L): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct() // simple graph: parallel edges count once
    e.cache()
    // loop invariants are cached: vertices and out-degrees are re-read
    // every round, and an uncached copy would re-aggregate the edges
    // per iteration. The rank lineage itself is LINEAR (each round
    // references the previous ranks exactly once), so it stays lazy —
    // one job executes the whole unrolled DAG; no per-round
    // materialization overhead (contrast Dedup.connectedComponents,
    // where the double-referenced label table forces checkpoints).
    val vertices = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).cache()
    val base = (scale * 15L) / 100L

    var ranks = vertices.withColumn("rank", lit(scale))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        // integer `div` BEFORE the sum: exact floor, order-independent
        // (a double `/` + cast could differ from true floor by 1 ulp)
        .selectExpr("dst AS node", "rank div outdeg AS c")
        .groupBy("node").agg(sum(col("c")).as("contrib"))
      ranks = vertices
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"(85 * coalesce(contrib, 0L)) div 100"))
            .cast("long").as("rank"))
    }
    // materialize the result THROUGH the caches, then release them —
    // method-local cached frames would otherwise pin executor storage
    // for the session lifetime
    val out = ranks.localCheckpoint()
    e.unpersist(); vertices.unpersist(); outdeg.unpersist()
    out
  }
}
