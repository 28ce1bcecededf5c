package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Seen, Timing}

/** Structured Streaming specs driven by MemoryStream — windowed counts
  * with watermark, TTL dedup state, per-key EMA state. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed status counts over a stream with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "status")
    val q = EventStreams.statusCountsWindowed(df, "ts", "status", "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()

    input.addData(
      (ts("2024-01-01 00:01:00"), "FETCHED"),
      (ts("2024-01-01 00:02:00"), "FETCHED"),
      (ts("2024-01-01 00:03:00"), "DISCOVERED"),
      (ts("2024-01-01 00:07:00"), "FETCHED"),
      // late watermark-advancing event so the first window closes
      (ts("2024-01-01 01:00:00"), "FETCHED"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_counts").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString, r.getAs[String]("status")) -> r.getAs[Long]("n"))
      .toMap
    assert(rows(("2024-01-01 00:00:00.0", "FETCHED")) == 2L)
    assert(rows(("2024-01-01 00:00:00.0", "DISCOVERED")) == 1L)
    assert(rows(("2024-01-01 00:05:00.0", "FETCHED")) == 1L)
  }

  test("streaming sessionization: session_window closes at the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.sessionStatsStream(df, gap = "30 minutes", watermark = "30 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    input.addData(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:10:00"), 2.0), // same session (10-min gap)
      (1L, ts("2024-01-01 01:00:00"), 4.0), // 50-min gap -> new session
      (2L, ts("2024-01-01 00:05:00"), 8.0),
      // far-future event advances the watermark so earlier sessions close
      (9L, ts("2024-01-01 09:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sessions").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start").toString) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))))
      .toMap
    // user 1, first session: 2 events merged, value 3.0, closed at gap
    assert(rows((1L, "2024-01-01 00:00:00.0")) == ((2L, 3.0)))
    assert(rows((1L, "2024-01-01 01:00:00.0")) == ((1L, 4.0)))
    assert(rows((2L, "2024-01-01 00:05:00.0")) == ((1L, 8.0)))
  }

  test("stateful URL dedup drops repeats across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Seen]
    val q = EventStreams.dedupStream(input.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    input.addData(Seen("http://a.com/1", ts("2024-01-01 00:00:00")),
                  Seen("http://a.com/1", ts("2024-01-01 00:00:01")),
                  Seen("http://a.com/2", ts("2024-01-01 00:00:02")))
    q.processAllAvailable()
    // second batch: repeat of /1 and a new url
    input.addData(Seen("http://a.com/1", ts("2024-01-01 00:10:00")),
                  Seen("http://a.com/3", ts("2024-01-01 00:10:01")))
    q.processAllAvailable()
    q.stop()

    val urls = spark.table("dedup_out").as[Seen].collect().map(_.url).sorted
    assert(urls.toSeq == Seq("http://a.com/1", "http://a.com/2", "http://a.com/3"))
  }

  test("dropDuplicatesWithinWatermark dedup: repeats inside the horizon drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Seen]
    val q = EventStreams.dedupWithinWatermark(input.toDF(), "url", "ts",
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("wm_dedup_out")
      .outputMode("append").start()

    input.addData(Seen("http://a.com/1", ts("2024-01-01 00:00:00")),
                  Seen("http://a.com/1", ts("2024-01-01 00:00:05")),
                  Seen("http://a.com/2", ts("2024-01-01 00:00:06")))
    q.processAllAvailable()
    // repeat of /1 arrives within the watermark horizon -> dropped
    input.addData(Seen("http://a.com/1", ts("2024-01-01 00:05:00")),
                  Seen("http://a.com/3", ts("2024-01-01 00:05:01")))
    q.processAllAvailable()
    q.stop()

    val urls = spark.table("wm_dedup_out").as[Seen].collect().map(_.url).sorted
    assert(urls.toSeq == Seq("http://a.com/1", "http://a.com/2", "http://a.com/3"))
  }

  test("per-key EMA state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Timing]
    val q = EventStreams.processingTimeEma(input.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("ema_out")
      .outputMode("append").start()

    input.addData(Timing("h1", 100.0))
    q.processAllAvailable()
    input.addData(Timing("h1", 200.0))
    q.processAllAvailable()
    q.stop()

    val emas = spark.table("ema_out").as[Timing].collect().map(t => t.ms)
    assert(emas.toSeq == Seq(100.0, 150.0)) // 0.5*200 + 0.5*100
  }

  test("crawl startStream runs micro-batches via foreachBatch") {
    import java.nio.file.Files
    val dir = {
      val tmp = Files.createTempDirectory("site")
      for (f <- Seq("index.html", "a.html", "b.html", "redir.html", "target.html")) {
        val in = getClass.getClassLoader.getResourceAsStream(s"site/$f")
        Files.copy(in, tmp.resolve(f)); in.close()
      }
      tmp
    }
    val store = new graft.frontier.FrontierStore(
      Files.createTempDirectory("frontier").toString)
    val chain = new graft.filters.UrlFilterChain(Seq(
      new graft.filters.BasicUrlNormalizer(), new graft.filters.SelfUrlFilter(),
      graft.filters.RegexUrlFilter.parse(Seq("+."))))
    graft.streaming.CrawlTopology.seed(spark, store, Seq(s"file://$dir/index.html"), chain)

    val docsOut = Files.createTempDirectory("docs").toString + "/docs"
    val q = graft.streaming.CrawlTopology.startStream(spark, store,
      new graft.fetch.ProtocolFactory(), chain,
      intervalMs = 200,
      checkpointDir = Files.createTempDirectory("ckpt").toString,
      docsOut = docsOut, crawlDelayMs = 0, respectRobots = false)
    // let triggers fire until progress is visible (poll with a hard
    // deadline — a fixed sleep flakes when the suite JVM is busy)
    def fetchedCount(): Long = store.statusCounts(spark).collect()
      .collectFirst { case r if r.getString(0) == "FETCHED" => r.getLong(1) }
      .getOrElse(0L)
    val deadline = System.currentTimeMillis() + 60000
    while (fetchedCount() < 2L && System.currentTimeMillis() < deadline)
      Thread.sleep(500)
    q.stop()
    assert(fetchedCount() >= 2L,
      s"stream crawl made no progress: ${store.statusCounts(spark).collect().toSeq}")
  }

  test("crawl stream restart from checkpoint: no duplicate docs (idempotent merge)") {
    import java.nio.file.Files
    val dir = {
      val tmp = Files.createTempDirectory("site")
      for (f <- Seq("index.html", "a.html", "b.html", "redir.html", "target.html")) {
        val in = getClass.getClassLoader.getResourceAsStream(s"site/$f")
        Files.copy(in, tmp.resolve(f)); in.close()
      }
      tmp
    }
    val store = new graft.frontier.FrontierStore(
      Files.createTempDirectory("frontier").toString)
    val chain = new graft.filters.UrlFilterChain(Seq(
      new graft.filters.BasicUrlNormalizer(), new graft.filters.SelfUrlFilter(),
      graft.filters.RegexUrlFilter.parse(Seq("+."))))
    graft.streaming.CrawlTopology.seed(spark, store, Seq(s"file://$dir/index.html"), chain)

    val ckpt = Files.createTempDirectory("ckpt").toString
    val docsOut = Files.createTempDirectory("docs").toString + "/docs"
    def fetchedCount(): Long = store.statusCounts(spark).collect()
      .collectFirst { case r if r.getString(0) == "FETCHED" => r.getLong(1) }
      .getOrElse(0L)
    // condition-wait instead of a fixed sleep: a wall-clock window flakes
    // when the suite JVM is busy (only 1 page completes in 5 s under load)
    def run(targetFetched: Long): Unit = {
      val q = graft.streaming.CrawlTopology.startStream(spark, store,
        new graft.fetch.ProtocolFactory(), chain,
        intervalMs = 200, checkpointDir = ckpt, docsOut = docsOut,
        crawlDelayMs = 0, respectRobots = false)
      val deadline = System.currentTimeMillis() + 120000
      while (fetchedCount() < targetFetched && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      q.stop()
    }
    run(2) // first run: crawls at least the seed + one discovered page
    run(4) // restart from the same checkpoint + frontier; finishes the site

    // every doc url appears exactly once: FETCHED pages are not due
    // again, and the sha256-keyed merge is idempotent across restarts
    val docs = spark.read.parquet(docsOut)
    val urls = docs.collect().map(_.getAs[String]("url")).toSeq
    assert(urls.nonEmpty)
    assert(urls.distinct.length == urls.length, s"duplicate docs: $urls")
    val statuses = store.statusCounts(spark).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses.getOrElse("FETCHED", 0L) >= 4L, statuses.toString)
  }
}
