package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data builds: concatenate documents in
  * a deterministic order and chop the token stream into fixed-budget
  * sequences (the standard concat-then-chunk packing used to fill
  * context windows; a doc whose tokens straddle a boundary is split
  * across the two sequences).
  *
  * Everything is integer window arithmetic over a per-group running
  * token count: `seq_id = floor(start_offset / budget)`. ONE shuffle
  * on the group key; the per-sequence rollup reuses the same
  * partitioning (the sequence key is a function of the group's
  * ordering), so at 100 TB packing costs a single exchange of
  * (id, token-count) pairs — the text itself never moves until the
  * final gather by sequence.
  */
object Packing {

  /** Assign each doc its sequence id + start offset within the packed
    * token stream of its group. `orderCol` fixes the concatenation
    * order (deterministic builds). */
  def assignSequences(df: DataFrame, groupCol: String, orderCol: String,
                      tokensCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integer `div`, not double `/` + cast: double division can land
    // one off from true floor near 2^53 cumulative tokens, and the
    // whole point of the operator is engine-exact arithmetic
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("start_offset", col("__cum") - col(tokensCol))
      .withColumn("seq_id", expr(s"start_offset div $budget"))
      .withColumn("straddles",
        // last token of the doc lands in a later sequence than the first
        expr(s"(__cum - 1) div $budget") > col("seq_id"))
      .drop("__cum")
  }

  /** Per-sequence rollup: docs starting in the sequence, their token
    * total, and how many straddle into the next sequence. */
  def packStats(df: DataFrame, groupCol: String, orderCol: String,
                tokensCol: String, budget: Int): DataFrame =
    assignSequences(df, groupCol, orderCol, tokensCol, budget)
      .groupBy(col(groupCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("seq_tokens"),
        sum(col("straddles").cast("int")).as("n_straddlers"))
}
