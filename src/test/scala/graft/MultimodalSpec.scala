package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, framing, decode batch shape, the
  * media→embedding→ANN bridge, and size-aware partitioning. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("media table schema and deterministic framing") {
    val media = Multimodal.mediaFromDocuments(docs)
    // field names + types must match the declared contract
    // (nullability differs — derived columns carry their own flags)
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.map(f => f.name -> f.dataType.simpleString).toSeq
    assert(shape(media.schema) == shape(Multimodal.mediaSchema))
    val fs = Multimodal.frameSample(media, everyNth = 3).collect()
    assert(fs.nonEmpty)
    fs.foreach { r =>
      val n = r.getAs[Long]("n_frames")
      val sampled = r.getAs[Int]("sampled_frames")
      assert(sampled == (if (n <= 0) 0 else ((n - 1) / 3 + 1)))
    }
  }

  test("decodePartitions: one feature row per media row, codec stubbed") {
    val media = Multimodal.mediaFromDocuments(docs)
    val out = Multimodal.decodePartitions(spark, media)
    assert(out.count() == media.count())
    val r = out.where(col("n_frames") > 0).head()
    val mean = r.getAs[Double]("mean_feature")
    assert(mean > 0 && mean < 256) // mean byte value of utf-8 text
  }

  test("pseudo-embeddings are unit vectors and feed the ANN operators") {
    val media = Multimodal.mediaFromDocuments(docs)
    val emb = Multimodal.pseudoEmbeddings(media, dim = 16)
    emb.cache()
    assert(emb.count() == media.count())
    val norms = emb.select(
      sqrt(aggregate(transform(col("embedding"), x => x.cast("double") * x),
        lit(0.0), (a, b) => a + b)).as("n")).collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))

    // the full pipeline shape: media -> embed -> bucketed near-dup
    val pairs = graft.analytics.Similarity.nearDupPairs(
      emb, "media_id", "embedding", dim = 16, numPlanes = 4, topN = 5)
    assert(pairs.count() == 5)
    emb.unpersist()
  }

  test("size-aware repartition sizes task count by byte volume") {
    val media = Multimodal.mediaFromDocuments(docs)
    val total = media.select(sum(length(col("bytes")))).head().getLong(0)
    val target = total / 7 + 1 // force ~7 partitions
    val parts = Multimodal.sizeAwareRepartition(media, target)
      .rdd.getNumPartitions
    assert(parts >= 6 && parts <= 8, s"got $parts partitions")
    assert(Multimodal.sizeAwareRepartition(media, Long.MaxValue).rdd.getNumPartitions == 1)
  }
}
