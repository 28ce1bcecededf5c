package graft.parse

import scala.collection.mutable.ArrayBuffer
import scala.util.Try

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** Shared StAX plumbing for the sitemap/feed parsers: a thread-local
  * XMLInputFactory (factory lookup is a ServiceLoader classpath scan),
  * coalescing text (CDATA + entity runs arrive as one chunk, matching
  * the DOM text the previous scala.xml implementation produced) and
  * XXE-hardened (no DTD, no external entities — this parses UNTRUSTED
  * crawl content).
  *
  * Why a pull parser and not scala.xml: `XML.loadString` builds a full
  * immutable DOM per document — at sf100 q95 parses 6 M sitemap docs
  * and the tree allocation dominated the suite's second-largest row
  * (48.5 s). The cursor walk extracts the same fields with per-doc
  * state of a few buffers. Local-name matching everywhere, so any
  * namespace prefix works — the `\`-operator semantics the DOM
  * version had. */
private[parse] object XmlPull {
  private val factories = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
      f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, java.lang.Boolean.TRUE)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
        java.lang.Boolean.FALSE)
      f
    }
  }

  def reader(content: String): XMLStreamReader =
    factories.get().createXMLStreamReader(new java.io.StringReader(content))

  /** Advance to the root START_ELEMENT; null when the document has none. */
  def rootLocalName(r: XMLStreamReader): String = {
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT) return r.getLocalName
    }
    null
  }

  /** Text of the current element (reader ON its START_ELEMENT), trimmed;
    * consumes through the matching END_ELEMENT. Child elements inside
    * are skipped (their text is NOT included — scala.xml's `.text`
    * would include it, but every field read this way is a leaf in the
    * formats parsed here). */
  def elementText(r: XMLStreamReader): String = {
    val sb = new java.lang.StringBuilder()
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
            if depth == 1 =>
          sb.append(r.getText)
        case _ => ()
      }
    }
    sb.toString.trim
  }

  /** Skip the current element (reader ON its START_ELEMENT) entirely. */
  def skipElement(r: XMLStreamReader): Unit = {
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ => ()
      }
    }
  }
}

/** Sitemap XML parsing — `SiteMapParserBolt`
  * (`core/.../bolt/SiteMapParserBolt.java:72,96-254`): urlset pages,
  * sitemapindex sub-sitemaps, lastmod filtering, plus the 300-byte
  * content sniff used to auto-detect sitemaps.
  */
object SitemapParser {

  /** One sitemap line. `media` carries the sitemap-extension payloads
    * the reference extracts via crawler-commons (`SiteMapParserBolt`
    * extension handling: news/image/video): kind → locations/titles. */
  final case class SitemapEntry(url: String, lastMod: Option[String],
                                isSubSitemap: Boolean,
                                media: Map[String, Seq[String]] = Map.empty)

  /** Content sniff: does this look like a sitemap? (first bytes clue,
    * `SiteMapParserBolt.java:96-126`). */
  def sniff(content: Array[Byte]): Boolean = {
    val head = new String(content.take(300), "UTF-8")
    head.contains("<urlset") || head.contains("<sitemapindex")
  }

  /** lastmod → epoch millis; supports date-only and full ISO forms. */
  def parseLastMod(s: String): Option[Long] =
    Try(java.time.OffsetDateTime.parse(s).toInstant.toEpochMilli).toOption
      .orElse(Try(java.time.Instant.parse(s).toEpochMilli).toOption)
      .orElse(Try(java.time.LocalDate.parse(s)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli).toOption)

  /** Parse urlset or sitemapindex; never throws (malformed ⇒ empty). */
  def parse(content: String): Seq[SitemapEntry] =
    parseOption(content).getOrElse(Seq.empty)

  /** None when the content is not a parseable sitemap document at all
    * (malformed XML / wrong root) — lets the parse stage fall through
    * to the HTML branch instead of silently emitting nothing;
    * Some(empty) for a VALID but empty urlset. */
  def parseOption(content: String): Option[Seq[SitemapEntry]] =
    Try {
      val r = XmlPull.reader(content)
      try {
        XmlPull.rootLocalName(r) match {
          case "urlset" => parseUrlset(r)
          case "sitemapindex" => parseIndex(r)
          case _ => null // wrong root: not a sitemap
        }
      } finally r.close()
    }.toOption.flatMap(Option(_))

  /** <urlset>: one entry per <url> with a non-empty <loc>; image /
    * video / news extension payloads collected under media (video:
    * content_locs then player_locs, the crawler-commons field order the
    * DOM version exposed). */
  private def parseUrlset(r: XMLStreamReader): Seq[SitemapEntry] = {
    val out = ArrayBuffer.empty[SitemapEntry]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT) {
        if (r.getLocalName == "url") {
          var loc: String = null
          var locSeen = false // FIRST <loc> decides, even when empty
          var lastMod: String = null
          val images = ArrayBuffer.empty[String]
          val contentLocs = ArrayBuffer.empty[String]
          val playerLocs = ArrayBuffer.empty[String]
          val news = ArrayBuffer.empty[String]
          var depth = 1
          while (depth > 0 && r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT if depth == 1 =>
                r.getLocalName match {
                  case "loc" =>
                    val t = XmlPull.elementText(r) // consumes to </loc>
                    if (!locSeen) { locSeen = true; if (t.nonEmpty) loc = t }
                  case "lastmod" =>
                    val t = XmlPull.elementText(r)
                    if (lastMod == null) lastMod = t
                  case "image" =>
                    collectChildren(r, Map("loc" -> images))
                  case "video" =>
                    collectChildren(r,
                      Map("content_loc" -> contentLocs, "player_loc" -> playerLocs))
                  case "news" =>
                    collectChildren(r, Map("title" -> news))
                  case _ => XmlPull.skipElement(r)
                }
              case XMLStreamConstants.START_ELEMENT => depth += 1
              case XMLStreamConstants.END_ELEMENT => depth -= 1
              case _ => ()
            }
          }
          if (loc != null) {
            val media = Seq(
              "image" -> images.toSeq,
              "video" -> (contentLocs.toSeq ++ playerLocs.toSeq),
              "news.title" -> news.toSeq).filter(_._2.nonEmpty).toMap
            out += SitemapEntry(loc, Option(lastMod), isSubSitemap = false,
              media = media)
          }
        } else XmlPull.skipElement(r)
      }
    }
    out.toSeq
  }

  /** <sitemapindex>: one sub-sitemap entry per <sitemap> with a
    * non-empty <loc>. */
  private def parseIndex(r: XMLStreamReader): Seq[SitemapEntry] = {
    val out = ArrayBuffer.empty[SitemapEntry]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT) {
        if (r.getLocalName == "sitemap") {
          var loc: String = null
          var locSeen = false
          var lastMod: String = null
          var depth = 1
          while (depth > 0 && r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT if depth == 1 =>
                r.getLocalName match {
                  case "loc" =>
                    val t = XmlPull.elementText(r)
                    if (!locSeen) { locSeen = true; if (t.nonEmpty) loc = t }
                  case "lastmod" =>
                    val t = XmlPull.elementText(r)
                    if (lastMod == null) lastMod = t
                  case _ => XmlPull.skipElement(r)
                }
              case XMLStreamConstants.START_ELEMENT => depth += 1
              case XMLStreamConstants.END_ELEMENT => depth -= 1
              case _ => ()
            }
          }
          if (loc != null)
            out += SitemapEntry(loc, Option(lastMod), isSubSitemap = true)
        } else XmlPull.skipElement(r)
      }
    }
    out.toSeq
  }

  /** Collect the trimmed non-empty text of the direct children of the
    * current element whose local names appear in `sinks` (reader ON the
    * parent's START_ELEMENT; consumes through its END_ELEMENT). */
  private def collectChildren(r: XMLStreamReader,
                              sinks: Map[String, ArrayBuffer[String]]): Unit = {
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if depth == 1 =>
          sinks.get(r.getLocalName) match {
            case Some(buf) =>
              val t = XmlPull.elementText(r)
              if (t.nonEmpty) buf += t
            case None => XmlPull.skipElement(r)
          }
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ => ()
      }
    }
  }
}

/** RSS/Atom feed link extraction — `FeedParserBolt`
  * (`core/.../bolt/FeedParserBolt.java:58,72-161`). */
object FeedParser {

  final case class FeedEntry(url: String, title: Option[String])

  def sniff(content: Array[Byte]): Boolean = {
    val head = new String(content.take(300), "UTF-8")
    head.contains("<rss") || head.contains("<feed") || head.contains("<rdf:RDF")
  }

  def parse(content: String): Seq[FeedEntry] =
    parseOption(content).getOrElse(Seq.empty)

  /** None = not a parseable feed (malformed / wrong root); Some(empty)
    * = valid feed with no entries. */
  def parseOption(content: String): Option[Seq[FeedEntry]] =
    Try {
      val r = XmlPull.reader(content)
      try {
        XmlPull.rootLocalName(r) match {
          case "rss" | "RDF" => parseRss(r)
          case "feed" => parseAtom(r)
          case _ => null // wrong root: not a feed
        }
      } finally r.close()
    }.toOption.flatMap(Option(_))

  /** RSS / RDF: every <item> at ANY depth (the DOM version's `\\`
    * descendant search — RDF feeds put items at the root, RSS inside
    * <channel>), first <link> + first <title> per item. */
  private def parseRss(r: XMLStreamReader): Seq[FeedEntry] = {
    val out = ArrayBuffer.empty[FeedEntry]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "item") {
        var link: String = null
        var linkSeen = false // FIRST <link> decides, even when empty
        var title: String = null
        var depth = 1
        while (depth > 0 && r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT if depth == 1 =>
              r.getLocalName match {
                case "link" =>
                  val t = XmlPull.elementText(r)
                  if (!linkSeen) { linkSeen = true; if (t.nonEmpty) link = t }
                case "title" =>
                  val t = XmlPull.elementText(r)
                  if (title == null) title = t
                case _ => XmlPull.skipElement(r)
              }
            case XMLStreamConstants.START_ELEMENT => depth += 1
            case XMLStreamConstants.END_ELEMENT => depth -= 1
            case _ => ()
          }
        }
        if (link != null) out += FeedEntry(link, Option(title))
      }
    }
    out.toSeq
  }

  /** Atom: <entry> elements that are DIRECT children of <feed> (the DOM
    * version's `\`), taking the first CONTENT link — rel absent/empty
    * or rel=alternate — so a feed listing rel=self/edit first doesn't
    * send the crawler to API endpoints (Rome's getLink preference). */
  private def parseAtom(r: XMLStreamReader): Seq[FeedEntry] = {
    val out = ArrayBuffer.empty[FeedEntry]
    var rootDepth = 1
    while (rootDepth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if rootDepth == 1 &&
            r.getLocalName == "entry" =>
          var href: String = null
          // the FIRST content link (rel absent/empty/alternate) WITH an
          // href attribute decides; if its trimmed href is empty the
          // entry drops — `.flatMap(href).headOption.filter(nonEmpty)`
          var hrefSeen = false
          var title: String = null
          var depth = 1
          while (depth > 0 && r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT if depth == 1 =>
                r.getLocalName match {
                  case "link" =>
                    val rel = attr(r, "rel")
                    val h = attr(r, "href")
                    if (!hrefSeen &&
                        (rel == null || rel.isEmpty || rel == "alternate") &&
                        h != null) {
                      hrefSeen = true
                      if (h.trim.nonEmpty) href = h.trim
                    }
                    XmlPull.skipElement(r)
                  case "title" =>
                    val t = XmlPull.elementText(r)
                    if (title == null) title = t
                  case _ => XmlPull.skipElement(r)
                }
              case XMLStreamConstants.START_ELEMENT => depth += 1
              case XMLStreamConstants.END_ELEMENT => depth -= 1
              case _ => ()
            }
          }
          if (href != null) out += FeedEntry(href, Option(title))
        case XMLStreamConstants.START_ELEMENT => rootDepth += 1
        case XMLStreamConstants.END_ELEMENT => rootDepth -= 1
        case _ => ()
      }
    }
    out.toSeq
  }

  /** Attribute by local name on the current START_ELEMENT. */
  private def attr(r: XMLStreamReader, local: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == local) return r.getAttributeValue(i)
      i += 1
    }
    null
  }
}
