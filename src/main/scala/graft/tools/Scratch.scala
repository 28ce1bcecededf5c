package graft.tools

import java.nio.file.{Files, Path}

/** Per-process scratch directories for queries that must round-trip
  * through a real on-disk store (q88 WARC, q94/q96 FrontierStore).
  *
  * `createTempDirectory` alone leaks a full WARC copy / frontier
  * parquet store per invocation: lazy DataFrame evaluation means the
  * caller cannot delete the dir when it returns (the scan happens at
  * action time), so every correctness run left shards in the tmpdir.
  * Instead all scratch dirs nest under ONE per-process root that a
  * single JVM shutdown hook deletes recursively — uniqueness per
  * invocation is preserved (no cross-run interleaving, no
  * double-append on rerun), and the process cleans up after itself.
  */
object Scratch {
  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(r.toFile)))
    r
  }

  /** A fresh unique directory under the process scratch root. Preflights
    * free space: a store-backed face writing into a near-full disk fails
    * as silent corruption or an unexplained task death (both observed in
    * round 13 on a 99%-full host) — a named refusal here beats either. */
  def dir(prefix: String): Path = {
    graft.Disk.preflight(s"scratch dir '$prefix'")
    Files.createTempDirectory(root, prefix)
  }

  /** Reclaim ALL scratch dirs now instead of at JVM exit — bench
    * inter-query hygiene (VERDICT r14 what's-wrong #2: a 94-query
    * campaign accumulates every store-backed query's scratch — WARC
    * shards, frontier stores — monotonically, and three rows died of
    * disk exhaustion at 7.1 GB free). Safe ONLY at a query boundary:
    * each query creates its own fresh dir and its action has completed
    * by then; a rep re-running the query allocates a new dir. */
  def sweepAll(): Unit = {
    val kids = root.toFile.listFiles()
    if (kids != null) kids.foreach(deleteRec)
  }

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(): Unit
  }
}
