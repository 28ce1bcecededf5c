package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Dedup, Similarity}

/** Skew defenses in the dedup pair generators: a degenerate input
  * (many identical / boilerplate docs) must complete with a BOUNDED
  * pair count instead of N²/2 rows — the hot-bucket cap in
  * lshCandidatePairs and the document-frequency prune in jaccardPairs. */
class DedupSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def boilerplate(n: Int) =
    (1 to n).map(i => (i.toLong, "all rights reserved copyright notice page", "web"))
      .toDF("doc_id", "text", "source")

  test("lshCandidatePairs: 1k identical docs produce ZERO pairs under the cap, not 500k") {
    val docs = boilerplate(1000)
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", "source", maxBucket = 100)
    assert(pairs.count() === 0L)
  }

  test("lshCandidatePairs: cap leaves small buckets untouched") {
    // 50 identical docs + 2 distinct docs; bucket of 50 is under the cap
    val docs = boilerplate(50)
      .union(Seq((9001L, "entirely unrelated text about gardens", "web"),
                 (9002L, "another text mentioning ships and sails", "web"))
        .toDF("doc_id", "text", "source"))
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", "source", maxBucket = 100)
    assert(pairs.count() === 50L * 49 / 2) // the identical cluster, all pairs
    val capped = Dedup.lshCandidatePairs(docs, "doc_id", "text", "source", maxBucket = 10)
    assert(capped.count() === 0L) // same cluster over a tighter cap: dropped
  }

  test("jaccardPairs: ubiquitous tokens are pruned from the join; pair count bounded") {
    // every doc shares the boilerplate tokens (df = 1000 > maxDf); only
    // the two docs sharing a RARE token may pair up
    val docs = (1 to 1000).map { i =>
      val rare = if (i <= 2) " zyzzyva" else s" unique$i"
      (i.toLong, s"all rights reserved notice$rare", "web")
    }.toDF("doc_id", "text", "source")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", "source",
      minJaccard = 0.0, maxDf = 100).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getAs[Long]("a") === 1L && pairs.head.getAs[Long]("b") === 2L)
    // denominator still counts pruned tokens: |A|=|B|=5, inter=1 (zyzzyva)
    assert(math.abs(pairs.head.getAs[Double]("jaccard") - 1.0 / 9.0) < 1e-12)
  }

  test("nearDupPairs: 1k degenerate embeddings (one collapsed bucket) produce ZERO pairs under the cap") {
    // an embedding model collapsing boilerplate to one point — all 1000
    // vectors land in the same hyperplane bucket; without the cap the
    // within-bucket self-join emits 499 500 pairs
    val vecs = (1 to 1000).map(i => (i.toLong, Array.fill(8)(0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      dim = 8, numPlanes = 6, topN = 1000000, maxBucket = 100)
    assert(pairs.count() === 0L)
  }

  test("nearDupPairs: cap leaves small buckets untouched") {
    // 20 identical vectors (one bucket of 20, under the cap) must still
    // pair up fully: 20*19/2 pairs, all cosine 1.0
    val vecs = (1 to 20).map(i => (i.toLong, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      dim = 8, numPlanes = 6, topN = 1000000, maxBucket = 100)
    assert(pairs.count() === 20L * 19 / 2)
    val capped = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      dim = 8, numPlanes = 6, topN = 1000000, maxBucket = 10)
    assert(capped.count() === 0L)
  }

  test("jaccardPairs: prune is a no-op when no token exceeds maxDf") {
    val docs = Seq(
      (1L, "red green blue", "web"),
      (2L, "red green yellow", "web"),
      (3L, "cyan magenta black", "web")).toDF("doc_id", "text", "source")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", "source",
      minJaccard = 0.3).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getAs[Double]("jaccard") === 0.5) // {red,green} / 4
  }
}
