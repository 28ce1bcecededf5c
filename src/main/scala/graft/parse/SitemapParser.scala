package graft.parse

import scala.util.Try
import scala.xml.XML

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
      val root = XML.loadString(content)
      root.label match {
        case "urlset" =>
          (root \ "url").flatMap { u =>
            (u \ "loc").headOption.map(_.text.trim).filter(_.nonEmpty)
              .map { loc =>
                // sitemap extensions (image/video/news); `\` matches on
                // local names so any namespace prefix works
                val images = (u \ "image" \ "loc").map(_.text.trim).filter(_.nonEmpty)
                val videos = ((u \ "video" \ "content_loc") ++ (u \ "video" \ "player_loc"))
                  .map(_.text.trim).filter(_.nonEmpty)
                val news = (u \ "news" \ "title").map(_.text.trim).filter(_.nonEmpty)
                val media = Seq(
                  "image" -> images, "video" -> videos, "news.title" -> news)
                  .filter(_._2.nonEmpty).toMap
                SitemapEntry(loc, (u \ "lastmod").headOption.map(_.text.trim),
                  isSubSitemap = false, media = media)
              }
          }
        case "sitemapindex" =>
          (root \ "sitemap").flatMap { s =>
            (s \ "loc").headOption.map(_.text.trim).filter(_.nonEmpty)
              .map(loc => SitemapEntry(loc, (s \ "lastmod").headOption.map(_.text.trim), isSubSitemap = true))
          }
        case _ => null // wrong root: not a sitemap
      }
    }.toOption.flatMap(Option(_)).map(_.toSeq)
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
      val root = XML.loadString(content)
      root.label match {
        case "rss" | "RDF" =>
          (root \\ "item").flatMap { i =>
            (i \ "link").headOption.map(_.text.trim).filter(_.nonEmpty)
              .map(l => FeedEntry(l, (i \ "title").headOption.map(_.text.trim)))
          }
        case "feed" => // Atom
          (root \ "entry").flatMap { e =>
            // the CONTENT link: rel absent or rel=alternate — a feed
            // listing rel=self/edit first must not send the crawler to
            // API endpoints (Rome's getLink preference)
            (e \ "link")
              .filter(l => l.attribute("rel").map(_.text)
                .forall(r => r.isEmpty || r == "alternate"))
              .flatMap(l => l.attribute("href").map(_.text.trim))
              .headOption.filter(_.nonEmpty)
              .map(h => FeedEntry(h, (e \ "title").headOption.map(_.text.trim)))
          }
        case _ => null // wrong root: not a feed
      }
    }.toOption.flatMap(Option(_)).map(_.toSeq)
}
