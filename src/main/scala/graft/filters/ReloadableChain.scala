package graft.filters

import java.nio.file.{Files, Paths}

/** Hot-reloading URL filter chain — the OpenSearch
  * `JSONURLFilterWrapper` idea (`external/opensearch/.../filtering/
  * JSONURLFilterWrapper.java:68`: a filter whose JSON config refreshes
  * from an external store while the topology runs) re-expressed for a
  * file/object-store config: the chain is rebuilt from the JSON file
  * whenever its modification time changes, checked at most once per
  * `checkEveryMs`.
  *
  * Driver-side: construct once, call `current()` at the top of every
  * micro-batch and use the returned immutable chain for that whole
  * batch — a batch never sees a config change mid-flight, matching
  * the reference's "reload between polls" granularity. A broken edit
  * keeps the last good chain (config errors must not kill a standing
  * crawl). */
final class ReloadableUrlFilterChain(path: String, checkEveryMs: Long = 10000L) {
  @volatile private var chain: UrlFilterChain = load().getOrElse(new UrlFilterChain(Seq.empty))
  @volatile private var loadedMtime: Long = mtime()
  @volatile private var lastCheckMs: Long = Long.MinValue / 2 // first call always checks

  private def mtime(): Long =
    try Files.getLastModifiedTime(Paths.get(path)).toMillis
    catch { case _: Exception => -1L }

  private def load(): Option[UrlFilterChain] =
    try Some(FilterConfig.urlFilterChain(
      new String(Files.readAllBytes(Paths.get(path)), "UTF-8")))
    catch { case _: Exception => None }

  /** The chain to use for this batch, reloading if the file changed. */
  def current(nowMs: Long = System.currentTimeMillis()): UrlFilterChain = {
    if (nowMs - lastCheckMs >= checkEveryMs) {
      lastCheckMs = nowMs
      val m = mtime()
      if (m != loadedMtime) {
        load().foreach { c => chain = c; loadedMtime = m }
      }
    }
    chain
  }
}
