package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{BpeTrainer, Decontaminate, Dsir, Sharding}

/** Semantic checks for the round-9 training-data operators: DSIR
  * importance weights, BPE merge induction, embedding decontamination,
  * histogram range sharding. Hash-exact correctness runs via the
  * DuckDB oracle (q67–q70); these pin the operator SEMANTICS on
  * synthetic micro-corpora where the right answer is computable by
  * hand. */
class TrainingOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("Dsir ranks target-vocabulary docs above off-target docs") {
    // target rows use vocabulary {aa bb}, the rest {zz yy}; a corpus
    // doc written purely in target vocabulary must outscore one that
    // shares no tokens with the target slice.
    val docs = Seq(
      (1L, "aa bb aa bb", true), (2L, "aa bb bb aa", true),
      (3L, "aa bb aa bb", false),   // target-like, not in target slice
      (4L, "zz yy zz yy", false), (5L, "zz yy yy zz", false)
    ).toDF("doc_id", "text", "is_t")
    val top = Dsir.importanceTopK(docs, "doc_id", "text",
      col("is_t"), buckets = 64, k = 5).collect()
    val score = top.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(score(3) > score(4) && score(3) > score(5))
    // equal texts score equally regardless of slice membership
    assert(score(1) == score(3))
  }

  test("BpeTrainer learns the dominant pair first, LTR non-overlap") {
    // "abab" x3 + "ab" x2: pair (a,b) occurs 2*3+2 = 8 times, (b,a)
    // only 3. Round 1 must merge (a,b); round 2 merges (ab,ab) from
    // the 3 "abab" words (count 3) vs nothing else.
    val docs = Seq((1L, "abab abab abab ab ab")).toDF("doc_id", "text")
    val m = BpeTrainer.trainMerges(docs, "text", rounds = 2)
      .orderBy("round").collect()
    assert(m(0).getString(3) == "ab" && m(0).getLong(4) == 8L)
    assert(m(1).getString(3) == "abab" && m(1).getLong(4) == 3L)
  }

  test("BpeTrainer merge is left-to-right non-overlapping") {
    // "aaa": pairs (a,a) x2 -> merge (a,a). LTR gives tokens [aa, a],
    // so round 2 sees pair (aa,a) once per word.
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m = BpeTrainer.trainMerges(docs, "text", rounds = 2)
      .orderBy("round").collect()
    assert(m(0).getString(1) == "a" && m(0).getString(2) == "a")
    assert(m(1).getString(1) == "aa" && m(1).getString(2) == "a"
      && m(1).getLong(4) == 2L)
  }

  test("BpeTrainer.encodeTopK applies the learned merges to the corpus") {
    // after 2 rounds ((a,b) then (ab,ab)): "abab" -> [abab], "ab" -> [ab]
    val docs = Seq((1L, "abab abab abab ab ab")).toDF("doc_id", "text")
    val enc = BpeTrainer.encodeTopK(docs, "text", rounds = 2, k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(enc.toSeq == Seq("abab" -> 3L, "ab" -> 2L))
  }

  test("crossDedup drops exactly the reference-corpus digests") {
    val ref = Seq((10L, "seen text"), (11L, "other seen")).toDF("doc_id", "text")
    val nw = Seq((1L, "seen text"), (2L, "fresh text"), (3L, "fresh text"))
      .toDF("doc_id", "text")
    val kept = graft.analytics.Dedup.crossDedup(nw, ref, "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L, 3L)) // within-new dups are NOT dropped
  }

  test("embedHits flags only above-threshold cosines, counts evals") {
    val ev = Seq((100L, Array(1f, 0f)), (101L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(1f, 0f)),     // cos 1.0 with eval 100, 0.0 with 101
      (2L, Array(1f, 1f)),     // cos ~0.707 with both
      (3L, Array(-1f, 0f))     // negative vs 100, 0 vs 101 — no hit
    ).toDF("vec_id", "embedding")
    val hits = Decontaminate.embedHits(corpus, ev, "vec_id", "embedding", 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(hits(1) == ((1L, 100L)))
    assert(hits(2) == ((2L, 100L)))
    assert(!hits.contains(3L))
  }

  test("Sharding balances shards up to value granularity, keeps ranges") {
    // 100 docs with distinct lengths 1..100 into 4 shards of 25
    val docs = (1L to 100L).map(i => (i, i)).toDF("doc_id", "n_chars")
    val stats = Sharding.rangeShardStats(docs, "n_chars", 4)
      .orderBy("shard").collect()
    assert(stats.length == 4)
    assert(stats.forall(_.getLong(1) == 25L))
    // contiguous, non-overlapping ranges
    val ranges = stats.map(r => (r.getLong(3), r.getLong(4)))
    assert(ranges.sliding(2).forall { case Array(a, b) => a._2 < b._1 })
    // equal key values always share a shard (granularity guarantee)
    val dup = (1L to 10L).map(i => (i, 7L)) ++ Seq((11L, 1L), (12L, 2L))
    val a = Sharding.assignShards(dup.toDF("doc_id", "n_chars"),
      "doc_id", "n_chars", 4)
    assert(a.where(col("doc_id") <= 10L).select("shard")
      .distinct().count() == 1)
  }
}
