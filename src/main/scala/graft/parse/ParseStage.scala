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
            sitemapMaxHoursSinceModified: Option[Int] = None,
            metadataTransfer: graft.model.MetadataTransfer =
              graft.model.MetadataTransfer()): DataFrame = {
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
          // MetadataTransfer.getMetaForOutlink: transfer-listed keys
          // only (NOT the parent's full map — fetch.*, cookies, parse
          // flags must not leak to children), depth+1, url trail
          val outlinkMd = metadataTransfer.forOutlink(url, md)

          def outlinkRows(targets: Seq[(String, String)], extraMd: Map[String, Seq[String]]) = {
            val withExtra = outlinkMd ++ extraMd
            targets
              .flatMap { case (t, anchor) =>
                // the chain must see extraMd too: SitemapUrlFilter's
                // exemption flag rides there
                filterChain(t, Some(url), withExtra).map(normalized => (normalized, anchor))
              }
              .distinctBy(_._1) // dedup by URL: anchors must not eat the outlink cap
              .take(maxOutlinksPerPage)
              .map { case (t, anchor) =>
                Row(url, "outlink", Status.Discovered, t, anchor,
                  null, null, false, null, null, withExtra)
              }
          }

          val decoded = Charsets.decode(content, Option(ctype).filter(_.nonEmpty))

          // Branch routing: the content SNIFF is authoritative; a
          // discovery-time flag (isSitemap on sub-sitemaps, isFeed on
          // feed items) only commits to that branch when the parse
          // actually yields entries — a flagged URL that serves HTML
          // falls through to the HTML parse, like the reference's
          // bolt chain where an unparseable input passes to the next
          // bolt instead of vanishing.
          val sniffSitemap = SitemapParser.sniff(content)
          val flagSitemap = md.get("isSitemap").exists(_.contains("true"))
          val sniffFeed = FeedParser.sniff(content)
          val flagFeed = md.get("isFeed").exists(_.contains("true"))

          // parseOption: None = not parseable as that format at all —
          // even a positive sniff then falls through to the HTML parse
          // (an HTML page with "<urlset" in its first 300 bytes must
          // not vanish); Some(entries) commits to the branch when the
          // sniff agreed or entries actually came out
          lazy val sitemapEntries: Option[Seq[SitemapParser.SitemapEntry]] =
            if (sniffSitemap || flagSitemap)
              SitemapParser.parseOption(decoded).map(_
                .filter(e => lastModCutoffMs.forall(cut =>
                  e.lastMod.forall(lm => SitemapParser.parseLastMod(lm).forall(_ >= cut))))
                .distinctBy(_.url)) // a <loc> repeated 1000x is one entry
            else None
          lazy val feedEntries: Option[Seq[FeedParser.FeedEntry]] =
            if (sniffFeed || flagFeed) FeedParser.parseOption(decoded) else None

          if (sitemapEntries.exists(es => sniffSitemap || es.nonEmpty)) {
            sitemapEntries.get.flatMap { e =>
              val entryMd =
                (if (e.isSubSitemap) Map("isSitemap" -> Seq("true"))
                 else Map.empty[String, Seq[String]]) +
                  ("sitemap.source" -> Seq("true")) ++ // SitemapUrlFilter exemption
                  e.media.map { case (k, v) => s"sitemap.$k" -> v } // extensions
              outlinkRows(Seq((e.url, "")), entryMd)
            }
          } else if (feedEntries.exists(es => sniffFeed || es.nonEmpty)) {
            outlinkRows(feedEntries.get.map(e => (e.url, e.title.getOrElse(""))),
              Map("isFeed" -> Seq("true")))
          } else if (
            // RedirectionBolt shunt (`external/tika/.../RedirectionBolt
            // .java:63-76`): html-mime docs go to the HTML parse, the
            // rest to the binary (Tika-branch) parse. Magic bytes win
            // over the declared mime; a text/* body that actually
            // opens with markup stays on the HTML path (Tika's own
            // detector would call it html too).
            BinaryParser.isPdf(content) || BinaryParser.isRtf(content) ||
            (BinaryParser.supports(ctype, content) &&
              !decoded.take(512).trim.startsWith("<"))) {
            BinaryParser.parse(content, ctype, Some(ctype)) match {
              case Right(bp) =>
                val baseMd = md ++
                  bp.metadata.map { case (k, v) => s"parse.$k" -> v } +
                  ("parse.Content-Type" -> Seq(ctype)) ++
                  bp.title.map(t => "parse.title" -> Seq(t))
                // binary docs run the SAME §2.6 enrichment chain as
                // HTML ones (Tika ParserBolt calls parseFilters.filter,
                // `ParserBolt.java:280-286`) — domain/lang/signature/
                // collection taggers must see every doc, whatever its
                // format; the DOM-less filters operate on the
                // extracted text via a synthetic parse
                val synthetic = HtmlParser.ParsedHtml(
                  bp.title, bp.text, Nil, Set.empty, None, None, None)
                val ctx = parseFilters(ParseContext(url, content, synthetic,
                  baseMd, decoded = bp.text))
                // same signature convention as the HTML branch
                // (MD5SignatureParseFilter.java:48)
                val signature = ctx.metadata.get("signature").flatMap(_.headOption)
                  .getOrElse(Urls.md5Hex(bp.text))
                val docRow = Row(url, "doc", null, null, null,
                  bp.title.orNull, bp.text, false, null, signature, ctx.metadata)
                val links = bp.outlinks.map(u => (u, "")) ++
                  ctx.extraOutlinks.map(u => (u, ""))
                Seq(docRow) ++ outlinkRows(links, Map.empty)
              case Left(err) =>
                // ParserBolt.handleException (`external/tika/.../
                // ParserBolt.java:337-354`): the page itself becomes an
                // ERROR status row; the merge's precedence ladder lets
                // it out-rank the fetch stage's FETCHED row.
                Seq(Row(url, "error", Status.Error, null, null, null, null,
                  false, null, null,
                  md + ("error.source" -> Seq("PARSE"))
                     + ("error.message" -> Seq(err))))
            }
          } else {
            val parsed = HtmlParser.parse(decoded, url)
            val ctx = parseFilters(ParseContext(url, content, parsed,
              md + ("parse.Content-Type" -> Seq(ctype)), decoded = decoded))
            val signature = ctx.metadata.get("signature").flatMap(_.headOption)
              .getOrElse(Urls.md5Hex(parsed.text)) // MD5SignatureParseFilter.java:48
            val docRow =
              Row(url, "doc", null, null, null,
                parsed.title.orNull, parsed.text, parsed.noindex,
                parsed.canonicalUrl.orNull, signature, ctx.metadata)
            // redirect targets go through the SAME filter chain as
            // outlinks — an unnormalized or excluded target must not
            // sneak into the frontier via a meta refresh
            // the redirect row carries the TRANSFERRED metadata (depth
            // incremented, no fetch-state leak) — the same map the
            // filter chain judged the target with; a meta-refresh chain
            // must consume depth budget like any other hop
            val redirectRow = parsed.metaRefreshUrl
              .flatMap(t => filterChain(t, Some(url), outlinkMd))
              .map { target =>
                Row(url, "redirect", Status.Redirection, target, null,
                  null, null, false, null, null, outlinkMd)
              }
            val links = HtmlParser.followableLinks(parsed).map(l => (l.url, l.anchor)) ++
              ctx.extraOutlinks.map(u => (u, ""))
            Seq(docRow) ++ redirectRow.toSeq ++ outlinkRows(links, Map.empty)
          }
        }
      }(enc)
  }
}
