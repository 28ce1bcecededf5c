package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway inner-leg profiler for ContentStore.split. */
object ProfileQ100b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.sql.Timestamp
    def leg[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"LEG $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f"); r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val t0 = Timestamp.valueOf("2026-06-01 00:00:00")
      val t1 = Timestamp.valueOf("2026-06-02 00:00:00")
      val asOf = Timestamp.valueOf("2026-06-02 01:00:00")
      val path = Scratch.dir("graft_q100p_").toString
      val cs = new graft.fetch.ContentStore(path)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"),
          concat(lit("https://c"), (col("doc_id") % 10).cast("string"),
            lit(".example.com/a/"), col("doc_id").cast("string")).as("url"))
      leg("store1") {
        cs.store(docs.where(col("doc_id") % 2 === 0).select(col("url"),
          encode(col("text"), "UTF-8").as("content"),
          lit(t0).cast("timestamp_ntz").as("fetch_time")))
      }
      leg("store2") {
        cs.store(docs.where(col("doc_id") % 4 === 0).select(col("url"),
          encode(concat(col("text"), lit("v2")), "UTF-8").as("content"),
          lit(t1).cast("timestamp_ntz").as("fetch_time")))
      }
      val batch = docs.where(col("doc_id") % 3 === 0).select(col("url"))
      val keyed = leg("keyed") { batch.withColumn("url_sha256", sha2(col("url"), 256)) }
      val shards = leg("shards_collect") {
        keyed.select(substring(col("url_sha256"), 1, 2).as("s"))
          .distinct().collect().map(_.getString(0))
      }
      println(s"  nshards=${shards.length}")
      val rawDf = leg("raw_read") {
        spark.read.schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("url_sha256", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.types.StructField("fetch_time", org.apache.spark.sql.types.TimestampNTZType),
          org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.StringType))))
          .parquet(path)
      }
      leg("raw_count") { rawDf.where(col("shard").isin(shards.toSeq: _*)).count() }
      val (hits, misses) = leg("split_full") {
        cs.split(spark, batch, maxAgeMs = Some(2L * 3600 * 1000), asOfMs = asOf.getTime)
      }
      leg("result") {
        hits.select(col("url"), lit("hit").as("kind"),
            md5(col("content")).as("digest"), col("cached_at"))
          .unionByName(misses.select(col("url"), lit("miss").as("kind"),
            lit(null).cast("string").as("digest"),
            lit(null).cast("timestamp_ntz").as("cached_at")))
          .orderBy("url").count()
      }
    }
    spark.stop()
  }
}
