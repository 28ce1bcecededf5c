package graft.parse

import java.util.Locale
import scala.util.matching.Regex

import graft.functions.Urls

/** Dependency-free HTML parsing for the parse stage — the semantics of
  * `JSoupParserBolt` (`core/.../bolt/JSoupParserBolt.java:75,168-430`)
  * re-implemented over regex scanning (no JSoup on this classpath):
  * `a[href]` extraction with base-href resolution and nofollow logic
  * (253-318), robots meta directives, meta-refresh redirect detection,
  * title + text extraction, charset sniff from meta.
  *
  * Regex HTML scanning is deliberately conservative: it under-extracts
  * on pathological markup but never throws, which is the right trade
  * for a fetch pipeline processing arbitrary web bytes.
  */
object HtmlParser {

  final case class Link(url: String, anchor: String, nofollow: Boolean)
  final case class ParsedHtml(
      title: Option[String],
      text: String,
      links: Seq[Link],
      metaRobots: Set[String],      // noindex, nofollow, none, ...
      metaRefreshUrl: Option[String],
      charset: Option[String],
      canonicalUrl: Option[String] = None) {
    def noindex: Boolean = metaRobots.contains("noindex") || metaRobots.contains("none")
    def nofollow: Boolean = metaRobots.contains("nofollow") || metaRobots.contains("none")
  }

  private val scriptStyleRe: Regex =
    "(?is)<(script|style|noscript)\\b[^>]*>.*?</\\1>".r
  private val commentRe: Regex = "(?s)<!--.*?-->".r
  private val tagRe: Regex = "(?s)<[^>]*>".r
  private val titleRe: Regex = "(?is)<title[^>]*>(.*?)</title>".r
  private val baseRe: Regex = "(?i)<base\\b[^>]*\\bhref\\s*=\\s*[\"']?([^\"'\\s>]+)".r
  private val anchorRe: Regex = "(?is)<a\\b([^>]*)>(.*?)</a>".r
  private val hrefRe: Regex = "(?i)\\bhref\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))".r
  private val relRe: Regex = "(?i)\\brel\\s*=\\s*[\"']?([^\"'>]*)".r
  private val metaRe: Regex = "(?is)<meta\\b[^>]*>".r
  private val canonicalRe: Regex =
    "(?i)<link\\b[^>]*\\brel\\s*=\\s*[\"']?canonical[\"']?[^>]*\\bhref\\s*=\\s*[\"']?([^\"'\\s>]+)|<link\\b[^>]*\\bhref\\s*=\\s*[\"']?([^\"'\\s>]+)[\"']?[^>]*\\brel\\s*=\\s*[\"']?canonical".r
  private val nameRe: Regex = "(?i)\\bname\\s*=\\s*[\"']?([^\"'\\s>]+)".r
  private val httpEquivRe: Regex = "(?i)\\bhttp-equiv\\s*=\\s*[\"']?([^\"'\\s>]+)".r
  private val contentAttrRe: Regex = "(?i)\\bcontent\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))".r
  private val charsetAttrRe: Regex = "(?i)\\bcharset\\s*=\\s*[\"']?([^\"'\\s>;]+)".r
  private val refreshUrlRe: Regex = "(?i)url\\s*=\\s*[\"']?([^\"'\\s>;]+)".r
  private val entityMap = Map("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
  private val entityRe: Regex = "&(?:amp|lt|gt|quot|#39|apos|nbsp);".r

  /** SINGLE-pass entity decode: sequential replaces would double-decode
    * ("&amp;lt;" -> "&lt;" -> "<" when &amp; happens to run first). */
  private def unescape(s: String): String =
    if (s.indexOf('&') < 0) s
    else entityRe.replaceAllIn(s, m => Regex.quoteReplacement(entityMap(m.matched)))

  private def contentAttr(m: String): Option[String] =
    contentAttrRe.findFirstMatchIn(m).map(g =>
      Option(g.group(2)).orElse(Option(g.group(3))).getOrElse(g.group(4)))

  /** Parse an HTML document; `baseUrl` anchors relative links. */
  def parse(html: String, baseUrl: String): ParsedHtml = {
    val noComments = commentRe.replaceAllIn(html, " ")

    // meta scanning happens before tag stripping
    var robots = Set.empty[String]
    var refresh: Option[String] = None
    var charset: Option[String] = None
    for (m <- metaRe.findAllIn(noComments)) {
      val nm = nameRe.findFirstMatchIn(m).map(_.group(1).toLowerCase(Locale.ROOT))
      val he = httpEquivRe.findFirstMatchIn(m).map(_.group(1).toLowerCase(Locale.ROOT))
      if (nm.contains("robots"))
        robots ++= contentAttr(m).toSeq.flatMap(_.toLowerCase(Locale.ROOT).split(",")).map(_.trim)
      if (he.contains("refresh"))
        refresh = refresh.orElse(contentAttr(m).flatMap(c => refreshUrlRe.findFirstMatchIn(c).map(_.group(1))))
      if (charset.isEmpty)
        charset = charsetAttrRe.findFirstMatchIn(m).map(_.group(1))
    }

    val base = baseRe.findFirstMatchIn(noComments).map(_.group(1))
      .flatMap(b => Urls.resolve(baseUrl, b)).getOrElse(baseUrl)

    val links = anchorRe.findAllMatchIn(noComments).flatMap { a =>
      val attrs = a.group(1)
      val href = hrefRe.findFirstMatchIn(attrs).map(g =>
        Option(g.group(2)).orElse(Option(g.group(3))).getOrElse(g.group(4)))
      val nofollow = relRe.findFirstMatchIn(attrs)
        .exists(_.group(1).toLowerCase(Locale.ROOT).split("[\\s,]+").contains("nofollow"))
      val anchorText = tagRe.replaceAllIn(a.group(2), " ").trim
      href.map(_.trim).filter(_.nonEmpty)
        .flatMap(h => Urls.resolve(base, unescape(h)))
        .map(u => Link(u, unescape(anchorText), nofollow))
    }.toSeq

    val refreshResolved = refresh.flatMap(r => Urls.resolve(base, r))

    val title = titleRe.findFirstMatchIn(noComments)
      .map(m => unescape(tagRe.replaceAllIn(m.group(1), " ")).trim).filter(_.nonEmpty)

    val text = {
      val noScript = scriptStyleRe.replaceAllIn(noComments, " ")
      val noTags = tagRe.replaceAllIn(noScript, " ")
      unescape(noTags).replaceAll("\\s+", " ").trim
    }

    val canonical = canonicalRe.findFirstMatchIn(noComments)
      .map(m => Option(m.group(1)).getOrElse(m.group(2)))
      .flatMap(h => Urls.resolve(base, h))

    ParsedHtml(title, text, links, robots, refreshResolved, charset, canonical)
  }

  /** Outlinks to emit as DISCOVERED, honoring page-level and per-link
    * nofollow (`JSoupParserBolt.java:253-318`). */
  def followableLinks(p: ParsedHtml): Seq[Link] =
    if (p.nofollow) Nil else p.links.filterNot(_.nofollow)
}
