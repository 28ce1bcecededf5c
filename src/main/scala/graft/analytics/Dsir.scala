package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR-style): score each
  * corpus document by how target-like its hashed n-gram features are,
  * so a training-data draw can up-weight documents resembling a small
  * high-quality target distribution (the published method trains two
  * hashed bag-of-ngrams LMs and ranks by their log-likelihood ratio;
  * the reference crawler has no counterpart — this is a training-data
  * extension of the pipeline).
  *
  * Determinism: the published formulation sums float log-ratios, which
  * is not engine-portable (summation order). Here the per-bucket weight
  * is the INTEGER ratio in parts-per-million,
  * `floor((target_count+1) * 1e6 / (corpus_count+1))` — add-one
  * smoothed, all BIGINT, so the per-doc score (a sum of longs) is
  * bit-identical on any engine at any parallelism. Ranking by the
  * ratio sum is order-equivalent to ranking by a monotone score family
  * of the same counts; what matters for selection is the ordering, and
  * THIS ordering is reproducible.
  *
  * Scale shape (100 TB corpus): two corpus passes, both map-heavy.
  * Pass 1 aggregates token-bucket counts — the working set is the
  * bucket table (`buckets` rows, ≤ a few thousand), reached via
  * map-side partial aggregation, so the exchange carries at most
  * `partitions × buckets` fixed-width rows. Pass 2 re-explodes tokens
  * and joins the bucket table back BROADCAST (pinned — the corpus side
  * must never be a build side, the q53 argument) and the per-doc sum
  * partial-aggregates map-side: every token of a doc lives in the same
  * input row, so the exchange carries ~one row per document. The final
  * top-k is `TakeOrderedAndProject` — per-partition heaps merged on
  * the driver, k rows, never a global sort. Derive-then-apply with a
  * tiny broadcast middle is the [[Sampling.temperatureSample]] shape,
  * feature-hashed edition.
  */
object Dsir {

  /** 0..buckets-1 feature bucket of one token (portable md5 family,
    * seed 77; h32 is non-negative so plain `%` agrees across engines). */
  private def bucket(w: Column, buckets: Int): Column =
    Dedup.seededHash(77, w) % buckets

  /** Mirror of [[bucket]] as DuckDB SQL over a token expression. */
  def bucketSql(tokExpr: String, buckets: Int): String =
    s"(CAST(concat('0x', substring(md5(concat('77:', $tokExpr)), 1, 8)) AS BIGINT) % $buckets)"

  /** Per-document importance scores against the target slice:
    * (doc_id, n_tokens, score), top `k` by (score DESC, doc_id).
    * `targetPred` marks the target-distribution rows (they stay in the
    * corpus denominator — DSIR's source distribution is the corpus
    * itself). Docs with zero tokens never appear. */
  def importanceTopK(corpus: DataFrame, idCol: String, textCol: String,
                     targetPred: Column, buckets: Int = 4096,
                     k: Int = 20): DataFrame = {
    val toks = corpus.select(
        col(idCol).cast("long").as("doc_id"),
        targetPred.as("is_target"),
        explode(Dedup.words(col(textCol))).as("w"))
      .select(col("doc_id"), col("is_target"),
        bucket(col("w"), buckets).as("bkt"))
    val cnts = toks.groupBy("bkt").agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("tcnt"),
      count(lit(1)).as("scnt"))
    val lut = cnts.select(col("bkt"),
      expr("(tcnt + 1) * 1000000 div (scnt + 1)").as("wgt"))
    toks.join(broadcast(lut), "bkt")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("wgt").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
