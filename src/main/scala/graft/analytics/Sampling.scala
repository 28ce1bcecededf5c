package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data draws. `df.sample()` uses a
  * per-partition RNG — resplitting the input changes the sample, which
  * breaks reproducible dataset builds and engine-portable verification.
  * Here the keep/drop decision is a pure function of the row's id
  * (Knuth multiplicative hash, plain BIGINT arithmetic any engine can
  * evaluate identically), so the same row set comes out at any
  * parallelism, on any engine, on every run.
  *
  * Scale design: map-only. The predicate is a codegen'd scan filter —
  * no shuffle, no RNG state, and column pruning/pushdown still apply.
  * Sampling 0.1% of 100 TB never materializes the other 99.9%.
  */
object Sampling {

  /** 0..9999 bucket from a numeric id:
    * `(pmod(id, 2^31-1) * 2654435761) mod 10000`.
    * The id is first reduced modulo the Mersenne prime 2^31-1 so the
    * multiply can NEVER overflow BIGINT — a raw web-corpus id exceeds
    * 2^33 (a 100 TB crawl holds >10^10 URLs) and `id * 2654435761`
    * would silently wrap; `(2^31-2) * 2654435761 < 2^63` by a 1.6×
    * margin. The prime reduction keeps sequential AND strided id
    * families spread; for ids below 2^31-1 the reduction is the
    * identity, so the bucket equals the unreduced form (id = 2^31-1
    * itself reduces to 0, and ids in [2^31-1, ~3.47e9] — where the
    * unreduced multiply had not yet overflowed — now map to different
    * buckets than the pre-reduction formula gave; sample MEMBERSHIP in
    * that id range shifted when the reduction landed, by design: one
    * stable formula over the whole id domain beats a piecewise one).
    * The odd multiplier is Knuth's 2^32 golden-ratio constant. */
  def bucket(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(2147483647L)) * lit(2654435761L), lit(10000L))

  /** Mirror of [[bucket]] as portable SQL (DuckDB/ANSI). */
  def bucketSql(idExpr: String): String =
    s"((((($idExpr % 2147483647) + 2147483647) % 2147483647) * 2654435761) % 10000 + 10000) % 10000"

  /** Keep each stratum at its own rate (fraction in [0,1]); strata not
    * listed keep `defaultRate`. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate): Column) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.where(bucket(col(idCol)) < rate * 10000)
  }

  /** Budgeted draw: per group, keep documents in the deterministic
    * id-hash order until the group's SIZE budget (tokens/chars) fills
    * — "give me ~1B tokens per language, drawn uniformly" as one
    * operator. The draw order is the 0..9999 [[bucket]] hash of the
    * id (a deterministic shuffle), so the kept set is a uniform draw
    * reproducible at any parallelism.
    *
    * Scale shape — the q70 histogram argument: a per-group
    * running-sum window over the CORPUS would sort every group's rows
    * in one partition (languages are few and huge — maximal skew).
    * Instead the corpus collapses to its (group, bucket) size
    * histogram (≤ groups×10⁴ rows, map-side partials), the running
    * sum runs over THAT, and the kept (group, bucket) pairs broadcast
    * back as a map-only join filter. Budget fill is exact at bucket
    * granularity — the last kept bucket may overshoot by one bucket's
    * mass (~1/10⁴ of the group), the same granularity bound a range
    * partitioner gives. All BIGINT, engine-exact. */
  def budgetDraw(df: DataFrame, groupCol: String, idCol: String,
                 sizeCol: String, budget: Long): DataFrame = {
    val withB = df.withColumn("__bkt", bucket(col(idCol)))
    val hist = withB
      .groupBy(col(groupCol), col("__bkt"))
      .agg(sum(col(sizeCol).cast("long")).as("__s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("__bkt")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val keep = hist
      .select(col(groupCol), col("__bkt"),
        (sum("__s").over(w) - col("__s")).as("__cum_before"))
      .where(col("__cum_before") < budget)
      .select(col(groupCol), col("__bkt"))
    withB.join(broadcast(keep), Seq(groupCol, "__bkt")).drop("__bkt")
  }

  /** Temperature (size-aware) downsampling: each group keeps rate
    * `min(1, sqrt(cap / n_g))` — the XLM-R-style flattening rule that
    * tempers over-represented sources while leaving small groups
    * intact. Rates are DERIVED from the data (one count aggregate),
    * then quantized to basis points of the same 0..9999 id-hash bucket
    * [[stratifiedSample]] uses, so the draw stays deterministic at any
    * parallelism. The rate chain is engine-exact: `cap/n`, `sqrt`, and
    * `10000·x` are each single correctly-rounded IEEE ops evaluated
    * identically everywhere, and `floor` pins the result to a long —
    * the [[Clustering]] determinism argument, float edition.
    *
    * Scale shape: the count table is group-cardinality-sized (languages
    * / sources — small by contract), so it broadcasts (pinned, the q53
    * argument: the corpus side must never be the build side) and the
    * keep predicate stays a map-side filter over the corpus — no
    * corpus shuffle, pruning/pushdown intact. */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
                        cap: Long): DataFrame = {
    val rates = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        least(lit(10000L),
          floor(lit(10000.0) *
            sqrt(lit(cap.toDouble) / col("__n").cast("double"))).cast("long"))
          .as("__rate_bp"))
    df.join(broadcast(rates), groupCol)
      .where(bucket(col(idCol)) < col("__rate_bp"))
      .drop("__rate_bp")
  }
}
