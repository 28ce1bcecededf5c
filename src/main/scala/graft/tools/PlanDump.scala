package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named queries into per-query files —
  * the plans/r16/<query>_{before,after}.txt evidence the optimization
  * rounds commit (the judge checks plan claims against these).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <query...>
  * (query names prefix-match; e.g. `plans/r16 before q67 q87`).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val prefixes = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.isEmpty || prefixes.exists(n.startsWith))
      .foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        // SPARK_GRAFT_PLAN_FINAL=1: execute first and dump the FINAL
        // adaptive plan — shows what AQE actually ran (ReusedQueryStage
        // dedup, AQEShuffleRead coalescing, runtime join strategy),
        // which the pre-execution plan cannot.
        if (sys.env.contains("SPARK_GRAFT_PLAN_FINAL"))
          df.queryExecution.toRdd.count(): Unit
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"wrote $outDir/${name}_$suffix.txt")
        graft.analytics.CheckpointRegistry.releaseAll()
      }
    spark.stop()
  }
}
