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

  /** Left-fold dot product of two float vectors in double precision. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Left-fold L2 norm. */
  def normD(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Pre-normalize: each component divided by the row's L2 norm, so the
    * pair stage is a single dot product per pair (norms are computed
    * once per row, not once per pair). */
  def normalized(df: DataFrame, idCol: String, vecCol: String,
                 outId: String, outVec: String): DataFrame =
    df.select(col(idCol).as(outId), col(vecCol).as("v"))
      .withColumn("nrm", normD(col("v")))
      .select(col(outId), transform(col("v"), x => x.cast("double") / col("nrm")).as(outVec))

  /** Brute-force cosine top-k: for each query vector (`queries` must be
    * small — it is broadcast), the k nearest corpus vectors by cosine,
    * self-matches excluded. Ties broken by corpus id. Map-only over the
    * corpus + one window shuffle on q_id (tiny output side). */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val q = normalized(queries, idCol, vecCol, "q_id", "q_vec")
    val c = normalized(corpus, idCol, vecCol, "c_id", "c_vec")
    val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), dotD(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("q_id"), col("c_id"), col("cosine"), col("rnk"))
  }

  /** Deterministic ±1 hyperplane component for (plane j, dim i):
    * +1 when the first hex char of md5("j:i") is even. Engine-portable. */
  private def planeSign(j: Int, i: Column): Column =
    when(
      (instr(lit("0123456789abcdef"),
        substring(md5(concat(lit(s"$j:"), i.cast("string"))), 1, 1)) - 1) % 2 === 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** Random-hyperplane LSH bucket id (`numPlanes` bits) per vector —
    * the IVF-style coarse quantizer: map-only, no shuffle. */
  def lshBucket(vecCol: Column, dim: Int, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { j =>
      val dot = aggregate(
        zip_with(vecCol, sequence(lit(1), lit(dim)),
          (x, i) => x.cast("double") * planeSign(j, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, shiftleft(lit(1), j)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Bucket histogram — the partition-balance view an IVF index needs. */
  def lshBucketHistogram(corpus: DataFrame, idCol: String, vecCol: String,
                         dim: Int, numPlanes: Int): DataFrame =
    corpus.select(lshBucket(col(vecCol), dim, numPlanes).as("bucket"), col(idCol))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("min_id"))

  /** Embedding near-dup candidates, LSH-bucketed: pairwise cosine is
    * computed only WITHIN a hyperplane bucket — the scale path (the
    * bucket join replaces the full cross product; more planes ⇒ smaller
    * buckets ⇒ fewer pairs). Returns the global top-N pairs by cosine. */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   dim: Int, numPlanes: Int, topN: Int): DataFrame = {
    val n = normalized(corpus, idCol, vecCol, "id", "nv")
      .withColumn("bucket", lshBucket(col("nv"), dim, numPlanes))
    val l = n.select(col("bucket"), col("id").as("a"), col("nv").as("va"))
    val r = n.select(col("bucket"), col("id").as("b"), col("nv").as("vb"))
    l.join(r, Seq("bucket")).where(col("a") < col("b"))
      .select(col("bucket"), col("a"), col("b"), dotD(col("va"), col("vb")).as("cosine"))
      .orderBy(col("cosine").desc, col("a"), col("b"))
      .limit(topN)
  }
}
