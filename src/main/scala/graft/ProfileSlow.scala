package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: run named queries twice each to split first-run
  * (codegen + planning) cost from steady-state execution cost.
  * Usage: runMain graft.ProfileSlow q04_partition_key q21_minhash_sig ...
  */
object ProfileSlow {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime(); fn(spark, sfDir).count()
      val t1 = System.nanoTime(); fn(spark, sfDir).count()
      val t2 = System.nanoTime()
      println(f"PROFILE $name%-28s first=${(t1 - t0) / 1e9}%7.2f second=${(t2 - t1) / 1e9}%7.2f")
    }
    spark.stop()
  }
}
