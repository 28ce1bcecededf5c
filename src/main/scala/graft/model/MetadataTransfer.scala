package graft.model

/** Metadata projection across crawl hops — `MetadataTransfer`
  * (`core/.../util/MetadataTransfer.java:124-180`): which metadata keys
  * follow a URL to its outlinks (`metadata.transfer` list), which
  * persist into the status store (`metadata.persist`), depth increment
  * and the originating-URL trail (`url.path` append, `trackPath`,
  * `trackDepth`). Wildcard `"pfx.*"` entries match key prefixes, like
  * the indexer mapping globs.
  */
final case class MetadataTransfer(
    // NOTE: isSitemap/isFeed are deliberately NOT transferred — they
    // mark how THIS url was discovered (set explicitly per outlink by
    // the parse branches); inheriting them would mislabel every child
    // of a sitemap/feed page (reference default metadata.transfer is
    // empty, crawler-default.yaml)
    transferKeys: Seq[String] = Seq("max.depth"),
    persistKeys: Seq[String] = Seq("depth", "url.path", "signature", "signatureOld",
      "fetch.error.count", "fetchInterval"),
    trackPath: Boolean = true,
    trackDepth: Boolean = true,
    maxPathLength: Int = 10) extends Serializable {

  private def keep(keys: Seq[String])(md: Map[String, Seq[String]]): Map[String, Seq[String]] = {
    val (globs, exacts) = keys.partition(_.endsWith(".*"))
    val prefixes = globs.map(_.dropRight(1))
    md.filter { case (k, _) => exacts.contains(k) || prefixes.exists(k.startsWith) }
  }

  /** Metadata for an outlink discovered on `sourceUrl`
    * (`getMetaForOutlink`): transfer-listed keys + depth+1 + path. */
  def forOutlink(sourceUrl: String, md: Map[String, Seq[String]]): Map[String, Seq[String]] = {
    val base = keep(transferKeys)(md)
    val withDepth =
      if (!trackDepth) base
      else {
        val d = md.get("depth").flatMap(_.headOption).flatMap(_.toIntOption).getOrElse(0)
        base + ("depth" -> Seq((d + 1).toString))
      }
    if (!trackPath) withDepth
    else {
      val path = (md.getOrElse("url.path", Seq.empty) :+ sourceUrl).takeRight(maxPathLength)
      withDepth + ("url.path" -> path)
    }
  }

  /** Metadata persisted into the status table (`filter`). */
  def forStatus(md: Map[String, Seq[String]]): Map[String, Seq[String]] =
    keep(persistKeys ++ transferKeys)(md)
}
