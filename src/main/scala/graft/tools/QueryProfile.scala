package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query cost breakdown for the bench suite — where does the time
  * go: DataFrame CONSTRUCTION (incl. eager probes/merges), the timed
  * action, driver-side planning vs executor task time, and how many
  * jobs/stages/tasks a query schedules. Guide §1/§7: measure first,
  * and split "driver is busy" from "executors are busy".
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.QueryProfile q50 q85
  * (prefix match; default = whole suite). Prints one line per query:
  * total/construct/action seconds, jobs, stages, tasks, executor task
  * seconds (sum), and the driver gap (total − max(task span)).
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2).max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", (cpus.toInt * 8).toString))
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_CODEC", "zstd"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // AtomicLongs + a deterministic bus drain (ADVICE r16): the old
    // @volatile-with-`+=` counters were reset on the main thread while
    // the ASYNC listener bus could still be delivering the previous
    // query's events (the 120 ms sleep was a heuristic), so metrics
    // could bleed between queries/reps.
    import java.util.concurrent.atomic.AtomicLong
    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    val taskNanos = new AtomicLong(0L)
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val detail = sys.env.contains("SPARK_GRAFT_PROFILE_STAGES")
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet(): Unit
      override def onJobEnd(je: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(): Unit
        tasks.addAndGet(sc.stageInfo.numTasks): Unit
        if (detail) {
          val si = sc.stageInfo
          val ms = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
          val exec = si.taskMetrics.executorRunTime
          val cpu = si.taskMetrics.executorCpuTime / 1000000L
          stageRows.add(f"    stage ${si.stageId}%4d ${si.numTasks}%5d tasks ${ms.getOrElse(-1L)}%6d ms wall ${exec}%7d ms run ${cpu}%7d ms cpu  ${si.name.take(70)}")
        }
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) taskNanos.addAndGet(te.taskInfo.duration * 1000000L): Unit
    }
    spark.sparkContext.addSparkListener(listener)

    // same warmup as Bench so first-query numbers are comparable
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()
      spark.read.parquet(s"$sfDir/documents.parquet").count()
    } catch { case _: Throwable => () }

    val only = if (args.nonEmpty) Some(args.toSeq) else None
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    println(f"${"query"}%-34s ${"total"}%7s ${"constr"}%7s ${"action"}%7s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"taskSec"}%8s")
    names.foreach { name =>
      val best = (1 to reps).map { _ =>
        // deterministic drain BEFORE the reset: no event from the
        // previous query/rep can land after the counters are zeroed
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0L); stageRows.clear()
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val t2 = System.nanoTime()
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        graft.analytics.CheckpointRegistry.releaseAll()
        spark.catalog.clearCache()
        (t2 - t0, t1 - t0, t2 - t1, jobs.get, stages.get, tasks.get, taskNanos.get)
      }.minBy(_._1)
      println(f"$name%-34s ${best._1 / 1e9}%7.2f ${best._2 / 1e9}%7.2f ${best._3 / 1e9}%7.2f ${best._4}%5d ${best._5}%6d ${best._6}%6d ${best._7 / 1e9}%8.2f")
      if (detail) stageRows.forEach(r => println(r))
    }
    spark.stop()
  }
}
