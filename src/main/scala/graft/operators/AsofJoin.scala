package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each probe row, the most recent state row
  * of the same key with `state.time <= probe.time`.
  *
  * Spark has no native as-of join, and the naive formulation
  * (`probe JOIN state ON key AND state.t <= probe.t`, then a
  * max-per-probe window) explodes: the range join produces one row per
  * (probe, EVERY earlier state) pair before the window prunes — at
  * 100 TB that intermediate is quadratic in per-key history. This
  * operator instead unions the two streams with a tag, sorts each key
  * partition once by (time, tag), and carries the latest state payload
  * forward with `last(_, ignoreNulls).over(running window)`:
  *
  *   - exactly ONE shuffle (hash on the key), no range-join blowup —
  *     cost is the sort of each key partition, linear in rows;
  *   - state rows sort before probe rows at equal timestamps (tag 0
  *     vs 1), giving inclusive "at or before" semantics, same as
  *     an ASOF JOIN with a `>=` condition;
  *   - the window is running (unbounded preceding → current row), so
  *     Spark evaluates it in one streaming pass per partition — no
  *     per-row rescans.
  *
  * Precondition: the state side must be unique per (key, time) — ties
  * inside the state stream would make "the" latest row ambiguous (the
  * same holds for any as-of engine; dedupe with a groupBy first).
  *
  * Both inputs must share `keyCol` and `timeCol` names; payload column
  * sets must be disjoint. Probe columns are preserved; state payload
  * columns arrive with their own names (null when no state precedes
  * the probe row — left-join semantics).
  */
object AsofJoin {
  def asofJoin(probe: DataFrame, state: DataFrame,
               keyCol: String, timeCol: String): DataFrame = {
    val pPay = probe.columns.filterNot(c => c == keyCol || c == timeCol).toSeq
    val sPay = state.columns.filterNot(c => c == keyCol || c == timeCol).toSeq
    require(pPay.intersect(sPay).isEmpty,
      s"payload columns must be disjoint: ${pPay.intersect(sPay).mkString(",")}")

    // The state payload travels as ONE struct: `last(struct, ignoreNulls)`
    // then picks the whole latest state ROW. Per-column last() would
    // resurrect stale values into columns that are genuinely NULL in the
    // latest state row, fabricating a row that never existed.
    val stateStructType = org.apache.spark.sql.types.StructType(
      sPay.map(c => state.schema(state.schema.fieldIndex(c))))
    val taggedState = state.select(
      (col(keyCol) +: col(timeCol).as("__t") +: lit(0).as("__tag") +:
        pPay.map(c => lit(null).cast(probe.schema(c).dataType).as(c))) :+
        struct(sPay.map(col): _*).as("__state"): _*)
    val taggedProbe = probe.select(
      (col(keyCol) +: col(timeCol).as("__t") +: lit(1).as("__tag") +:
        pPay.map(col)) :+ lit(null).cast(stateStructType).as("__state"): _*)

    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedState.unionByName(taggedProbe)
      .withColumn("__asof", last(col("__state"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select((col(keyCol) +: col("__t").as(timeCol) +: pPay.map(col)) ++
        sPay.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
