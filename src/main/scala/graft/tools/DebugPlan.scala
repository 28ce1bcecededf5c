package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/profile dump for perf work: runs one named stage of the
  * dedup pipeline at a given SF dir and prints the final adaptive
  * executed plan plus wall time per sub-stage. Not part of the driver
  * contract. Usage: runMain graft.tools.DebugPlan <sfDir> <what>
  */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = args.lift(1).getOrElse("q22")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm footers

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    what match {
      case "q22" =>
        val df = graft.analytics.Dedup.lshCandidatePairs(docs, "doc_id", "text", "source")
        time("q22 run1")(df.count()); time("q22 run2")(df.collect().length)
        println(df.queryExecution.executedPlan.toString)
      case "collapse" =>
        val reps = graft.analytics.Dedup.digestReps(docs, "doc_id", "text", "source")
        time("digestReps run1")(reps.count()); time("digestReps run2")(reps.count())
        println(reps.queryExecution.executedPlan.toString)
      case q if graft.SparkEntry.queries.contains(q) =>
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        time(s"$q run1")(df.count()); time(s"$q run2")(df.count())
        // what the BENCH actually executes (count may eliminate sorts):
        println("== count-plan ==")
        println(df.groupBy().count().queryExecution.executedPlan.toString)
        println("== result-plan ==")
        println(df.queryExecution.executedPlan.toString)
      case _ => println(s"unknown: $what")
    }
    spark.stop()
  }
}
