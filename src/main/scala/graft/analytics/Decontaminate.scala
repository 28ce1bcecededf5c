package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag corpus
  * documents that share word n-grams with an evaluation/benchmark set
  * (the standard overlap check run before LLM training — published as
  * 13-gram dedup in public model reports; the reference crawler has no
  * counterpart, this is the training-data extension of the pipeline).
  *
  * Scale notes (100 TB corpus): the benchmark side is an eval set —
  * megabytes, not terabytes, by contract — so its distinct-gram table
  * carries an explicit broadcast hint and the corpus side stays
  * map-only (tokenize → shingle → explode) until the per-doc
  * aggregation, which shuffles HIT rows only (corpus rows with no
  * benchmark overlap die in the join). Without the hint, size
  * estimation is free to build the EXPLODED CORPUS side instead
  * (observed at sf0.1: BuildLeft on the corpus grams) — harmless on a
  * laptop, an OOM at 100 TB. The hint pins the build side to the one
  * input that does not grow with the corpus.
  * Shingling is the native one-pass
  * [[graft.functions.DistinctShinglesExpr]] with [[Dedup.words]]'
  * single-space split semantics, so the DuckDB oracle reproduces every
  * gram byte-for-byte.
  */
object Decontaminate {

  /** Per-corpus-doc n-gram overlap against `bench`:
    * (doc_id, n_hits, n_shingles, contamination, first_match) with
    * contamination = n_hits / n_shingles over DISTINCT k-word shingles
    * and first_match = the smallest benchmark id owning a shared gram.
    * Docs shorter than k words have no shingles and never appear. */
  def ngramHits(corpus: DataFrame, bench: DataFrame, idCol: String,
                textCol: String, k: Int): DataFrame = {
    // native single-pass shingling: the column-algebra form re-runs
    // the tokenize subtree per transform element (O(words²)/doc
    // interpreted — 21 s at sf0.1 vs sub-second with the expression)
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol).cast("long").as("doc_id"),
        graft.functions.TextHashExpressions
          .distinctShingles(col(textCol), k).as("gs"))
    val benchGrams = grams(bench)
      .select(explode(col("gs")).as("g"), col("doc_id"))
      .groupBy("g").agg(min("doc_id").as("bench_id"))
    val corpusGrams = grams(corpus)
      .select(col("doc_id"), size(col("gs")).as("n_shingles"),
        explode(col("gs")).as("g"))
    corpusGrams.join(broadcast(benchGrams), "g")
      .groupBy("doc_id", "n_shingles")
      .agg(count(lit(1)).as("n_hits"), min("bench_id").as("first_match"))
      .select(col("doc_id"), col("n_hits"), col("n_shingles"),
        (col("n_hits").cast("double") / col("n_shingles").cast("double"))
          .as("contamination"),
        col("first_match"))
  }
}
