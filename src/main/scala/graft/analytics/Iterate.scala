package graft.analytics

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.InternalBridge

/** Materialization helper for iterative operators (PageRank, connected
  * components). Each round's output is referenced more than once by the
  * next round, so without lineage truncation round N would re-execute
  * round N-1 twice (exponential re-execution). `Dataset.localCheckpoint`
  * truncates, but gives no handle to free the blocks — stale round
  * tables then pin block-manager memory until GC. This checkpoints at
  * the RDD level and RETURNS the handle, so the loop can unpersist
  * round N-1 as soon as round N is materialized.
  *
  * The checkpoint stays on the INTERNAL row path: `queryExecution.toRdd`
  * streams the operator's own UnsafeRows, so the stored blocks are the
  * compact Tungsten binary format and re-entry through
  * `internalCreateDataFrame` is a LogicalRDD with zero conversion — no
  * external `Row` boxing, no encoder round-trip, and downstream rounds
  * stay inside whole-stage codegen. (`df.rdd` would deserialize every
  * row to a boxed `Row` and Java-serialize those — a several-fold
  * memory multiplier on a 10^10-row label table.) The `_.copy()` is
  * required: toRdd's iterators reuse one UnsafeRow buffer per
  * partition, and persisting uncopied references would alias every
  * stored row to the last one read — the same copy `Dataset.checkpoint`
  * itself performs.
  */
private[analytics] object Iterate {

  /** Mark `df` for local checkpointing on the UnsafeRow path and return
    * (frame, rdd handle). NOT eager: the caller must run an action that
    * touches EVERY partition (count / full aggregate — on the returned
    * FRAME or the handle, either materializes the same RDD) before
    * unpersisting the previous round's handle — a partial action
    * (isEmpty/limit) would leave the checkpoint incomplete and later
    * recomputation would hit the freed parent blocks. */
  def checkpoint(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val rdd = InternalBridge.toInternalRdd(df).map(_.copy())
    rdd.localCheckpoint()
    (InternalBridge.internalCreateDataFrame(df.sparkSession, rdd, df.schema), rdd)
  }
}

/** Test/profiling access to [[Iterate]] (package-private otherwise). */
object IterateAccess {
  def checkpoint(df: org.apache.spark.sql.DataFrame) = Iterate.checkpoint(df)
}

/** Registry for checkpoint RDDs that BACK RETURNED frames — the
  * final-round label checkpoint of an iterative loop, the
  * digest→component map — which cannot be freed inside the operator
  * (the caller hasn't consumed the result yet) and would otherwise pin
  * block-manager memory for the session, accumulating across repeated
  * invocations.
  *
  * Callers (benchmark loops, long-lived services) call [[releaseAll]]
  * AFTER fully consuming an operator's result. A localCheckpoint's
  * lineage is truncated, so a released frame must NOT be re-used —
  * re-computation would hit the freed blocks. Thread-safe; releasing
  * is idempotent. */
object CheckpointRegistry {
  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[RDD[_]]()

  private[analytics] def retain(h: RDD[_]): Unit = live.add(h)

  /** Unpersist every retained checkpoint. Returns how many were freed. */
  def releaseAll(): Int = {
    var n = 0
    var h = live.poll()
    while (h != null) {
      try h.unpersist(blocking = false)
      catch { case _: Exception => () }
      n += 1
      h = live.poll()
    }
    n
  }
}
