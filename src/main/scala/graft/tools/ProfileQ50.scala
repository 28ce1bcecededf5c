package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q49/q50 timing (not part of the library
  * surface; run manually via `runMain graft.tools.ProfileQ50`).
  * Runs each query 3x in one JVM and prints the per-run times — the
  * minimum is the signal on a noisy host. */
object ProfileQ50 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("profile-q50").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val qs = graft.SparkEntry.queries
    for (name <- Seq("q49_pagerank", "q50_neardup_components")) {
      val ts = (1 to 3).map(_ => time(qs(name)(spark, dir).collect()))
      println(f"PROF $name runs=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f s")
    }
    spark.stop()
  }
}
