package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev probe: explain + run ONE SparkEntry query with per-stage wall/CPU
  * timings — the "which stage is the 100 s" tool for scale-run forensics.
  *
  * Usage: runMain graft.tools.ProbeQ <queryName> <sfDir> [reps]
  */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", cpus.toInt * 8)
      .config("spark.ui.enabled", "false")
    // extra confs for A/B probes, e.g.
    // SPARK_GRAFT_EXTRA_CONF="spark.io.compression.codec=zstd"
    // tolerant parse: skip empty segments (trailing ';'), reject
    // valueless pairs with a named error. '=' may appear in the value
    // (limit-2 split); ';' inside a value is unsupported by the format.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.trim.nonEmpty => builder.config(k.trim, v.trim)
          case _ => sys.error(s"ProbeQ: malformed SPARK_GRAFT_EXTRA_CONF segment '$kv' (want key=value)")
        }
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val m = si.taskMetrics
        println(f"[stage ${si.stageId}%3d] ${si.name.take(60)}%-60s tasks=${si.numTasks}%4d wall=${wall}%8.2fs " +
          f"cpu=${m.executorCpuTime / 1e9}%9.2fs run=${m.executorRunTime / 1e3}%9.2fs " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e9}%7.2fg shufR=${m.shuffleReadMetrics.totalBytesRead / 1e9}%7.2fg " +
          f"spill=${m.diskBytesSpilled / 1e9}%7.2fg in=${m.inputMetrics.bytesRead / 1e9}%7.2fg")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).explain("formatted")
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[probe] $name rep=$r rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
