package graft.parse

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.filters.UrlFilterChain
import graft.functions.Urls
import graft.model.Status

/** The parse stage: content rows → (1 parsed doc row ∪ N outlink status
  * rows ∪ optional redirect row) — `JSoupParserBolt` + `SiteMapParserBolt`
  * + `FeedParserBolt` as one flatMap (Catalyst Generator semantics,
  * SURVEY §2.4). Branch selection is the reference's content sniff:
  * sitemap/feed clues first, else HTML.
  *
  * Outlinks pass the URL filter chain at emission, exactly like
  * `StatusEmitterBolt.java:85-113`, and carry `depth`+1 metadata
  * (`MetadataTransfer.getMetaForOutlink`, `core/.../util/MetadataTransfer
  * .java:124-145`).
  *
  * Map-only: no shuffle here; the status rows shuffle once inside the
  * subsequent frontier merge.
  */
object ParseStage {

  val outputSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),       // source page
    StructField("kind", StringType, nullable = false),      // doc | outlink | redirect
    StructField("status", StringType, nullable = true),     // for outlink/redirect rows
    StructField("target_url", StringType, nullable = true), // outlink target
    StructField("anchor", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("noindex", BooleanType, nullable = false),
    StructField("canonical", StringType, nullable = true),  // rel=canonical, resolved
    StructField("signature", StringType, nullable = true),  // md5 of text (MD5SignatureParseFilter)
    StructField("metadata", MapType(StringType, ArrayType(StringType), valueContainsNull = false),
      nullable = true)))

  /** Parse FETCHED content rows (FetchStage output schema).
    * `parseFilters` runs the §2.6 enrichment chain on each HTML doc
    * (signature, domain, mime tag, XPath/LD-JSON extraction, extra
    * outlinks). */
  def parse(fetched: DataFrame,
            filterChain: UrlFilterChain = UrlFilterChain.default(),
            parseFilters: ParseFilterChain = ParseFilterChain.default,
            maxOutlinksPerPage: Int = 100,
            sitemapMaxHoursSinceModified: Option[Int] = None): DataFrame = {
    // sitemap.filter.hours.since.modified (`SiteMapParserBolt.java:96-180`)
    val lastModCutoffMs = sitemapMaxHoursSinceModified
      .map(h => System.currentTimeMillis() - h.toLong * 3600 * 1000)
    val enc = org.apache.spark.sql.Encoders.row(outputSchema)
    fetched
      .where(col("status") === Status.Fetched && col("content").isNotNull)
      .select(col("url"), col("content"), col("content_type"), col("metadata"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val url = r.getString(0)
          val content = r.getAs[Array[Byte]](1)
          val ctype = Option(r.getString(2)).getOrElse("")
          // values arrive as mutable.ArraySeq — convert to immutable Seq
          val md: Map[String, Seq[String]] =
            if (r.isNullAt(3)) Map.empty
            else r.getMap[String, scala.collection.Seq[String]](3).toMap
              .map { case (k, v) => k -> v.toSeq }
          val depth = md.get("depth").flatMap(_.headOption).flatMap(_.toIntOption).getOrElse(0)
          val outlinkMd = md + ("depth" -> Seq((depth + 1).toString)) +
            ("url.path" -> Seq(url))

          def outlinkRows(targets: Seq[(String, String)], extraMd: Map[String, Seq[String]]) =
            targets
              .flatMap { case (t, anchor) =>
                filterChain(t, Some(url), outlinkMd).map(normalized => (normalized, anchor))
              }
              .distinct.take(maxOutlinksPerPage)
              .map { case (t, anchor) =>
                Row(url, "outlink", Status.Discovered, t, anchor,
                  null, null, false, null, null, outlinkMd ++ extraMd)
              }

          val isSitemap = md.get("isSitemap").exists(_.contains("true")) ||
            SitemapParser.sniff(content)
          val isFeed = !isSitemap && (md.get("isFeed").exists(_.contains("true")) ||
            FeedParser.sniff(content))

          val decoded = Charsets.decode(content, Option(ctype).filter(_.nonEmpty))

          if (isSitemap) {
            val entries = SitemapParser.parse(decoded)
              .filter(e => lastModCutoffMs.forall(cut =>
                e.lastMod.forall(lm => SitemapParser.parseLastMod(lm).forall(_ >= cut))))
            entries.flatMap { e =>
              val entryMd =
                (if (e.isSubSitemap) Map("isSitemap" -> Seq("true"))
                 else Map.empty[String, Seq[String]]) +
                  ("sitemap.source" -> Seq("true")) ++ // SitemapUrlFilter exemption
                  e.media.map { case (k, v) => s"sitemap.$k" -> v } // extensions
              outlinkRows(Seq((e.url, "")), entryMd)
            }
          } else if (isFeed) {
            val entries = FeedParser.parse(decoded)
            outlinkRows(entries.map(e => (e.url, e.title.getOrElse(""))),
              Map("isFeed" -> Seq("true")))
          } else {
            val parsed = HtmlParser.parse(decoded, url)
            val ctx = parseFilters(ParseContext(url, content, parsed,
              md + ("parse.Content-Type" -> Seq(ctype))))
            val signature = ctx.metadata.get("signature").flatMap(_.headOption)
              .getOrElse(Urls.md5Hex(parsed.text)) // MD5SignatureParseFilter.java:48
            val docRow =
              Row(url, "doc", null, null, null,
                parsed.title.orNull, parsed.text, parsed.noindex,
                parsed.canonicalUrl.orNull, signature, ctx.metadata)
            val redirectRow = parsed.metaRefreshUrl.map { target =>
              Row(url, "redirect", Status.Redirection, target, null,
                null, null, false, null, null, md)
            }
            val links = HtmlParser.followableLinks(parsed).map(l => (l.url, l.anchor)) ++
              ctx.extraOutlinks.map(u => (u, ""))
            Seq(docRow) ++ redirectRow.toSeq ++ outlinkRows(links, Map.empty)
          }
        }
      }(enc)
  }
}
