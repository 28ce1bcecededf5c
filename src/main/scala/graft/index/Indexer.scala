package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.MetadataOps

/** The indexer as a compiled projection — `AbstractIndexerBolt`
  * (`core/.../indexing/AbstractIndexerBolt.java:46,191-299`): the
  * `indexer.md.mapping` spec (metadata key → alias, `[i]` value index,
  * `key.*` glob), text-field trimming (`indexer.text.maxlength`),
  * canonical-URL handling and the `indexer.md.filter` k=v gate — all of
  * which compile to a `select(...)` + `filter(...)`, i.e. a SELECT
  * clause Catalyst prunes columns through. The noindex gate honors the
  * robots meta directive carried by the parse stage.
  */
final case class IndexerMapping(
    /** metadata key (optionally `key[i]` or `key.*`) → output alias. */
    mdMapping: Seq[(String, String)] = Nil,
    textMaxLength: Int = -1,
    urlFieldName: String = "url",
    textFieldName: String = "text",
    /** require metadata k=v to index (indexer.md.filter). */
    mdFilter: Option[(String, String)] = None,
    honorNoindex: Boolean = true,
    /** index under rel=canonical when same paid-level domain
      * (`AbstractIndexerBolt.java:264-299`). */
    useCanonical: Boolean = true) {

  private val idxRe = "^(.*)\\[(\\d+)\\]$".r

  private def mdColumn(md: Column, spec: String): Column = spec match {
    case idxRe(key, i) => element_at(MetadataOps.mdValues(md, key), i.toInt + 1)
    case g if g.endsWith(".*") => MetadataOps.mdPrefix(md, g.dropRight(1))
    case key => MetadataOps.mdFirst(md, key)
  }

  /** Compile to the projection DataFrame. Input needs url/text/metadata
    * (+ noindex when honored). */
  def apply(docs: DataFrame): DataFrame = {
    val gated0 = if (honorNoindex) docs.where(!coalesce(col("noindex"), lit(false))) else docs
    val gated = mdFilter match {
      // ANY value matches (AbstractIndexerBolt.filterDocument): a doc
      // tagged collection=[sports, news] passes a news gate
      case Some((k, v)) =>
        gated0.where(array_contains(
          coalesce(MetadataOps.mdValues(col("metadata"), k), array()), v))
      case None => gated0
    }
    val textCol =
      if (textMaxLength > 0) substring(col("text"), 1, textMaxLength) else col("text")
    // canonical resolution with the same-PLD guard
    val urlCol =
      if (useCanonical && docs.columns.contains("canonical")) {
        import graft.functions.CrawlFunctions.{hostCol, pldCol}
        when(col("canonical").isNotNull &&
             pldCol(hostCol(col("canonical"))) === pldCol(hostCol(col("url"))),
          col("canonical")).otherwise(col("url"))
      } else col("url")
    val cols =
      urlCol.as(urlFieldName) +:
      textCol.as(textFieldName) +:
      mdMapping.map { case (spec, alias) => mdColumn(col("metadata"), spec).as(alias) }
    gated.select(cols: _*)
  }
}
