package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Brute-force cosine top-k is the correctness baseline: broadcast the
  * (small) query set against the full corpus — a map-only pass over the
  * big side, no shuffle of the corpus, so it scales linearly with
  * executors. The LSH variant (random ±1 hyperplanes → bit buckets)
  * is the scale path: bucket assignment is a map-only pass and search
  * touches only same-bucket candidates.
  *
  * Dot products fold left-to-right in double precision on both engines
  * (Spark `aggregate`, DuckDB `list_reduce`), so cosines are
  * bit-identical for the oracle — IEEE ops are deterministic given
  * identical operation order.
  */
object Similarity {

  /** Left-fold dot product of two ARRAY<DOUBLE> vectors — native
    * codegen'd expression ([[graft.functions.DotDExpr]]): the
    * candidate-pair hot loop stays primitive, no interpreted lambdas. */
  def dotD(a: Column, b: Column): Column =
    graft.functions.VecExpressions.dotD(a, b)

  /** Pre-normalize: each component divided by the row's L2 norm, so the
    * pair stage is a single dot product per pair (norms are computed
    * once per row, not once per pair). One native pass per row; the
    * float→double cast is a codegen'd Cast, and the fold order matches
    * the portable left-to-right spec the oracles use.
    *
    * Rows with a zero or non-finite norm are DROPPED: cosine is
    * undefined for them. The rejection is a single pass — the native
    * normalize itself returns NULL for such vectors (the norm is
    * already in hand mid-pass), so the filter is a plain IS NOT NULL
    * predicate with no second walk over the components. The SQL
    * oracles reach the identical exclusion through `NOT isnan(cosine)`
    * — their unguarded 0/0 division makes exactly these rows NaN. */
  def normalized(df: DataFrame, idCol: String, vecCol: String,
                 outId: String, outVec: String): DataFrame =
    df.select(col(idCol).as(outId),
      graft.functions.VecExpressions
        .l2Normalize(col(vecCol).cast("array<double>")).as(outVec))
      .where(col(outVec).isNotNull)

  /** Brute-force cosine top-k: for each query vector (`queries` must be
    * small — it is broadcast), the k nearest corpus vectors by cosine,
    * self-matches excluded. Ties broken by corpus id. Map-only over the
    * corpus + one window shuffle on q_id (tiny output side).
    *
    * Zero-norm / non-finite vectors are rejected inside the native
    * normalize ([[normalized]] keeps only non-null unit vectors), so
    * every pair reaching the dot product is finite and no NaN cosine
    * can exist to squat a `desc` top-k slot (Spark sorts NaN above
    * every real). The SQL oracles reach the same exclusion through
    * `NOT isnan(cosine)` on their unguarded 0/0 division. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val q = normalized(queries, idCol, vecCol, "q_id", "q_vec")
    // Widen the corpus side: a compact corpus (one parquet row group)
    // otherwise serializes the nested-loop join, every dot product,
    // and the 40M-row sort under the partial WindowGroupLimit onto ONE
    // core — measured 130 s -> 8 s at sf10. widen() is a no-op when
    // the input already splits across the cluster.
    val c = graft.plans.InputWidth
      .widen(normalized(corpus, idCol, vecCol, "c_id", "c_vec"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), dotD(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("q_id"), col("c_id"), col("cosine"), col("rnk"))
  }

  /** Random-hyperplane LSH bucket id (`numPlanes` bits) per vector —
    * the IVF-style coarse quantizer: map-only, no shuffle. Native
    * expression; the deterministic ±1 sign matrix (+1 when the first
    * hex char of md5("j:i") is even — engine-portable, reproduced by
    * the DuckDB oracle) is computed once per JVM, not per row. */
  def lshBucket(vecCol: Column, dim: Int, numPlanes: Int): Column =
    graft.functions.VecExpressions.lshBucket(vecCol.cast("array<double>"), dim, numPlanes)

  /** Bucket histogram — the partition-balance view an IVF index needs. */
  def lshBucketHistogram(corpus: DataFrame, idCol: String, vecCol: String,
                         dim: Int, numPlanes: Int): DataFrame =
    corpus.select(lshBucket(col(vecCol), dim, numPlanes).as("bucket"), col(idCol))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("min_id"))

  /** IVF-style ANN search with multi-probe: the corpus is coarsely
    * quantized into hyperplane buckets (map-only); each query probes its
    * own bucket plus the `nprobe - 1` neighboring cells across its
    * lowest-margin planes (the standard multi-probe LSH recall boost —
    * probing neighbors costs far less than adding tables). The probe
    * set is tiny (queries × nprobe rows) so it BROADCASTS: the search
    * is one map pass over the corpus touching only probed buckets — on
    * a bucket-partitioned corpus table the non-probed partitions prune
    * at the scan. Returns top-k per query by cosine among candidates. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, numPlanes: Int, k: Int,
              nprobe: Int): DataFrame = {
    val c = graft.plans.InputWidth
      .widen(normalized(corpus, idCol, vecCol, "c_id", "c_vec"))
      .withColumn("bucket", lshBucket(col("c_vec"), dim, numPlanes))
    val q = normalized(queries, idCol, vecCol, "q_id", "q_vec")
      .select(col("q_id"), col("q_vec"),
        explode(graft.functions.VecExpressions
          .multiProbeBuckets(col("q_vec"), dim, numPlanes, nprobe)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), dotD(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("q_id"), col("c_id"), col("cosine"), col("rnk"))
  }

  /** Embedding near-dup candidates, LSH-bucketed: pairwise cosine is
    * computed only WITHIN a hyperplane bucket — the scale path (the
    * bucket join replaces the full cross product; more planes ⇒ smaller
    * buckets ⇒ fewer pairs). Returns the global top-N pairs by cosine.
    *
    * `maxBucket` bounds the WORST case the planes can't: a LARGE
    * degenerate embedding mass (a model collapsing boilerplate to one
    * point) lands one bucket with N rows → N²/2 pairs. Buckets holding
    * more than `maxBucket` vectors are dropped BEFORE the self-join
    * (same defense as [[Dedup.lshCandidatePairs]]); members of such a
    * bucket are verbatim-duplicate-shaped clusters that exact dedup on
    * the embedding bytes catches more cheaply. The cap's window
    * partitions on the join key, so it rides the join's own exchange —
    * no extra shuffle. Zero-norm / non-finite vectors are dropped by
    * [[normalized]] BEFORE bucketing, so they neither count toward a
    * bucket's `maxBucket` population nor reach the pair stage — and
    * the q32 oracle mirrors that by filtering `nr > 0 AND
    * isfinite(nr)` in its normalize CTE, keeping the bucket census
    * bit-identical in the degenerate edge case. */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   dim: Int, numPlanes: Int, topN: Int,
                   maxBucket: Int = 1024): DataFrame = {
    val n = graft.plans.InputWidth
      .widen(normalized(corpus, idCol, vecCol, "id", "nv"))
      .withColumn("bucket", lshBucket(col("nv"), dim, numPlanes))
      .withColumn("bkn", count(lit(1)).over(Window.partitionBy(col("bucket"))))
      .where(col("bkn") <= maxBucket).drop("bkn")
    // rename AFTER the self-join so both children stay canonically
    // identical: ReuseExchange runs the normalize + bucket + cap-window
    // side once and the second side reads its shuffle files — see
    // Dedup.lshCandidatePairs for why this is a guard, not a fix
    n.as("l").join(n.as("r"), Seq("bucket"))
      .where(col("l.id") < col("r.id"))
      .select(col("bucket"), col("l.id").as("a"), col("r.id").as("b"),
        dotD(col("l.nv"), col("r.nv")).as("cosine"))
      .orderBy(col("cosine").desc, col("a"), col("b"))
      .limit(topN)
  }
}
