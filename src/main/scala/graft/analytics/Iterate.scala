package graft.analytics

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}

/** Materialization helper for iterative operators (PageRank, connected
  * components). Each round's output is referenced more than once by the
  * next round, so without lineage truncation round N would re-execute
  * round N-1 twice (exponential re-execution). `Dataset.localCheckpoint`
  * truncates, but gives no handle to free the blocks — stale round
  * tables then pin block-manager memory until GC. This checkpoints at
  * the RDD level and RETURNS the handle, so the loop can unpersist
  * round N-1 as soon as round N is materialized.
  */
private[analytics] object Iterate {

  /** Mark `df` for local checkpointing and return (frame, rdd handle).
    * NOT eager: the caller must run an action that touches EVERY
    * partition (count / full aggregate) before unpersisting the
    * previous round's handle — a partial action (isEmpty/limit) would
    * leave the checkpoint incomplete and later recomputation would hit
    * the freed parent blocks. */
  def checkpoint(df: DataFrame): (DataFrame, RDD[Row]) = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }
}
