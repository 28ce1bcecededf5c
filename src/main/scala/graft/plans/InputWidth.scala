package graft.plans

import org.apache.spark.sql.DataFrame

/** Input-width repair for CPU-dense scans.
  *
  * Parquet parallelism is bounded by ROW GROUPS, not bytes: Spark cuts
  * byte-range splits, but a row group is read whole by whichever split
  * holds its midpoint, so a compact table (one file written in one
  * pass = one row group) funnels every row through ONE task no matter
  * how many empty splits surround it. For scans feeding heavy per-row
  * work (binary parse, 128-perm MinHash, winnowing) that pins the
  * whole map stage to a single core while 31 idle — measured 32 s for
  * q43 at sf10 against ~1 s of actual per-core work.
  *
  * [[widen]] inserts a round-robin repartition ONLY when the physical
  * input cannot feed every core, so it is free at cluster scale:
  *
  *  - not a file scan (or >= `width` files): untouched, and no footer
  *    is ever read — a 100 TB table with thousands of files exits on
  *    the file count alone;
  *  - fewer files than `width`: read just those footers (bounded by
  *    `width` driver-side reads) and count row groups; >= `width` row
  *    groups still split fine — untouched;
  *  - fewer row groups than `width`: repartition(width). The one
  *    corpus shuffle this costs is bounded by the input size, which by
  *    construction is small enough to have produced few row groups —
  *    and the call sites all burn far more CPU per row than a shuffle
  *    moves per row.
  *
  * Non-parquet files are treated as splittable (no widening): text
  * sources split by line and their per-row cost profile differs.
  */
object InputWidth {

  /** `df` must be the scan-stage frame (before joins/aggregates) —
    * `inputFiles` unions all scans in the plan, so widening a joined
    * frame would mis-place the repartition. `width` defaults to the
    * session's `spark.sql.shuffle.partitions`. */
  def widen(df: DataFrame, width: Int = -1): DataFrame =
    if (isNarrow(df, width)) df.repartition(resolveWidth(df, width)) else df

  /** True when `df`'s physical input cannot feed `width` cores (see
    * [[widen]]'s criteria). Exposed so operators that must NOT widen a
    * corpus-sized frame (e.g. a collapse join-back streaming full
    * text) can instead repartition a small DERIVED frame only when the
    * scan is actually starved. */
  def isNarrow(df: DataFrame, width: Int = -1): Boolean = {
    val w = resolveWidth(df, width)
    val files =
      try df.inputFiles
      catch { case _: Exception => Array.empty[String] }
    !(files.isEmpty || files.length >= w) &&
      countRowGroupsUpTo(df, files, w) < w
  }

  private def resolveWidth(df: DataFrame, width: Int): Int =
    if (width > 0) width
    else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** Total parquet row groups across `files`, short-circuiting at
    * `limit`; any unreadable/non-parquet file counts as `limit`
    * (assume splittable, never widen on a guess). */
  private def countRowGroupsUpTo(df: DataFrame, files: Array[String],
                                 limit: Int): Int = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    var total = 0
    val it = files.iterator
    while (total < limit && it.hasNext) {
      val f = it.next()
      total +=
        (try {
          if (!f.endsWith(".parquet")) limit
          else {
            val in = org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(new org.apache.hadoop.fs.Path(f), conf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try r.getRowGroups.size() finally r.close()
          }
        } catch { case _: Exception => limit })
    }
    total
  }
}
