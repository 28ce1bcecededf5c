package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.{FeedParser, HtmlParser, SitemapParser}

/** Parse-stage truth tables over the HTML/sitemap/feed fixtures —
  * reference style: JSoupParserBoltTest robots-directive table +
  * link-extraction cases (SURVEY §5.1-5.2). */
class ParseSpec extends AnyFunSuite {

  private def fixture(name: String): String =
    scala.io.Source.fromResource(s"site/$name").mkString

  test("link extraction: absolute/relative/dup/nofollow/js links") {
    val p = HtmlParser.parse(fixture("index.html"), "http://site.example/index.html")
    val urls = p.links.map(_.url)
    assert(urls.contains("http://site.example/a.html"))
    assert(urls.contains("http://site.example/b.html"))
    assert(urls.contains("http://other-domain.example/x.html"))
    assert(!urls.exists(_.startsWith("javascript")))
    // duplicates kept at parse level (dedup happens at emission)
    assert(urls.count(_ == "http://site.example/a.html") == 2)
    val secret = p.links.find(_.url.endsWith("secret.html")).get
    assert(secret.nofollow)
    assert(HtmlParser.followableLinks(p).forall(!_.url.endsWith("secret.html")))
    assert(p.title.contains("Graft Test Site"))
    assert(p.text.contains("Some body text"))
    assert(!p.text.contains("<p>"))
  }

  test("robots meta truth table (JSoupParserBoltTest style)") {
    def parsed(meta: String) =
      HtmlParser.parse(s"""<html><head>$meta</head><body><a href="x.html">x</a></body></html>""",
        "http://e.com/")
    assert(!parsed("").noindex)
    assert(parsed("""<meta name="robots" content="noindex">""").noindex)
    assert(parsed("""<meta name="ROBOTS" content="NOINDEX,NOFOLLOW">""").noindex)
    assert(parsed("""<meta name="robots" content="noindex, nofollow">""").nofollow)
    assert(parsed("""<meta name="robots" content="none">""").noindex)
    assert(parsed("""<meta name="robots" content="all">""").noindex == false)
    val nf = parsed("""<meta name="robots" content="nofollow">""")
    assert(HtmlParser.followableLinks(nf).isEmpty)
  }

  test("meta-refresh redirect detected and resolved") {
    val p = HtmlParser.parse(fixture("redir.html"), "http://site.example/redir.html")
    assert(p.metaRefreshUrl.contains("http://site.example/target.html"))
  }

  test("base href changes resolution") {
    val p = HtmlParser.parse(fixture("b.html"), "http://site.example/b.html")
    assert(p.links.map(_.url).contains("http://basehost.example/sub/c.html"))
  }

  test("sitemap urlset + index + sniff") {
    val entries = SitemapParser.parse(fixture("sitemap.xml"))
    assert(entries.map(_.url) == Seq("http://site.example/s1.html", "http://site.example/s2.html"))
    assert(entries.head.lastMod.contains("2024-01-01"))
    assert(entries.forall(!_.isSubSitemap))
    val idx = SitemapParser.parse(fixture("sitemap_index.xml"))
    assert(idx.map(_.url) == Seq("http://site.example/sitemap.xml"))
    assert(idx.head.isSubSitemap)
    assert(SitemapParser.sniff(fixture("sitemap.xml").getBytes))
    assert(!SitemapParser.sniff(fixture("index.html").getBytes))
  }

  test("sitemap extensions: image/video/news payloads land in media") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
        |        xmlns:image="http://www.google.com/schemas/sitemap-image/1.1"
        |        xmlns:video="http://www.google.com/schemas/sitemap-video/1.1"
        |        xmlns:news="http://www.google.com/schemas/sitemap-news/0.9">
        |  <url>
        |    <loc>http://site.example/article.html</loc>
        |    <image:image><image:loc>http://site.example/a.jpg</image:loc></image:image>
        |    <image:image><image:loc>http://site.example/b.jpg</image:loc></image:image>
        |    <video:video><video:content_loc>http://site.example/v.mp4</video:content_loc></video:video>
        |    <news:news><news:title>Headline</news:title></news:news>
        |  </url>
        |  <url><loc>http://site.example/plain.html</loc></url>
        |</urlset>""".stripMargin
    val entries = SitemapParser.parse(xml)
    assert(entries.length == 2)
    val rich = entries.head
    assert(rich.media("image") == Seq("http://site.example/a.jpg", "http://site.example/b.jpg"))
    assert(rich.media("video") == Seq("http://site.example/v.mp4"))
    assert(rich.media("news.title") == Seq("Headline"))
    assert(entries(1).media.isEmpty)
  }

  test("rss feed links") {
    val entries = FeedParser.parse(fixture("feed.rss"))
    assert(entries.map(_.url) == Seq("http://site.example/i1.html", "http://site.example/i2.html"))
    assert(entries.head.title.contains("Item 1"))
    assert(FeedParser.sniff(fixture("feed.rss").getBytes))
  }

  test("atom feed links") {
    val atom =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |<entry><title>E1</title><link href="http://site.example/e1"/></entry>
        |</feed>""".stripMargin
    assert(FeedParser.parse(atom).map(_.url) == Seq("http://site.example/e1"))
  }

  test("malformed html/xml never throws") {
    assert(SitemapParser.parse("<<<not xml").isEmpty)
    assert(FeedParser.parse("").isEmpty)
    val p = HtmlParser.parse("<a href=", "http://e.com/")
    assert(p.links.isEmpty)
  }

  test("StAX parsers match a scala.xml DOM oracle on tricky documents") {
    import scala.xml.XML
    // DOM re-implementation of the original parser, kept as the spec
    // oracle for the StAX rewrite (entities, CDATA, prefixes, nesting)
    def domSitemap(content: String): Option[Seq[SitemapParser.SitemapEntry]] =
      scala.util.Try {
        val root = XML.loadString(content)
        root.label match {
          case "urlset" =>
            (root \ "url").flatMap { u =>
              (u \ "loc").headOption.map(_.text.trim).filter(_.nonEmpty).map { loc =>
                val images = (u \ "image" \ "loc").map(_.text.trim).filter(_.nonEmpty)
                val videos = ((u \ "video" \ "content_loc") ++ (u \ "video" \ "player_loc"))
                  .map(_.text.trim).filter(_.nonEmpty)
                val news = (u \ "news" \ "title").map(_.text.trim).filter(_.nonEmpty)
                val media = Seq("image" -> images, "video" -> videos, "news.title" -> news)
                  .filter(_._2.nonEmpty).toMap
                SitemapParser.SitemapEntry(loc, (u \ "lastmod").headOption.map(_.text.trim),
                  isSubSitemap = false, media = media)
              }
            }
          case "sitemapindex" =>
            (root \ "sitemap").flatMap { s =>
              (s \ "loc").headOption.map(_.text.trim).filter(_.nonEmpty)
                .map(l => SitemapParser.SitemapEntry(l,
                  (s \ "lastmod").headOption.map(_.text.trim), isSubSitemap = true))
            }
          case _ => null
        }
      }.toOption.flatMap(Option(_)).map(_.toSeq)
    def domFeed(content: String): Option[Seq[FeedParser.FeedEntry]] =
      scala.util.Try {
        val root = XML.loadString(content)
        root.label match {
          case "rss" | "RDF" =>
            (root \\ "item").flatMap { i =>
              (i \ "link").headOption.map(_.text.trim).filter(_.nonEmpty)
                .map(l => FeedParser.FeedEntry(l, (i \ "title").headOption.map(_.text.trim)))
            }
          case "feed" =>
            (root \ "entry").flatMap { e =>
              (e \ "link")
                .filter(l => l.attribute("rel").map(_.text)
                  .forall(r => r.isEmpty || r == "alternate"))
                .flatMap(l => l.attribute("href").map(_.text.trim))
                .headOption.filter(_.nonEmpty)
                .map(h => FeedParser.FeedEntry(h, (e \ "title").headOption.map(_.text.trim)))
            }
          case _ => null
        }
      }.toOption.flatMap(Option(_)).map(_.toSeq)

    val sitemaps = Seq(
      // entities + CDATA + namespace prefixes + nested extensions
      """<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9"
        |   xmlns:image="http://www.google.com/schemas/sitemap-image/1.1"
        |   xmlns:video="http://www.google.com/schemas/sitemap-video/1.1">
        |  <sm:url><sm:loc>http://a.example/?x=1&amp;y=2</sm:loc>
        |    <sm:lastmod> 2024-01-01 </sm:lastmod>
        |    <image:image><image:loc><![CDATA[http://a.example/i.png]]></image:loc></image:image>
        |    <video:video><video:player_loc>http://a.example/p</video:player_loc>
        |      <video:content_loc>http://a.example/c</video:content_loc></video:video>
        |  </sm:url>
        |  <sm:url><sm:loc></sm:loc><sm:loc>http://dropped.example/</sm:loc></sm:url>
        |  <sm:url><sm:loc>  http://b.example/  </sm:loc></sm:url>
        |</sm:urlset>""".stripMargin,
      "<sitemapindex><sitemap><loc>http://s.example/a.xml</loc><lastmod>x</lastmod></sitemap><sitemap><other/></sitemap></sitemapindex>",
      "<urlset></urlset>",          // valid empty
      "<html><body>no</body></html>", // wrong root
      "<urlset><url><loc>http",     // malformed
      "")
    sitemaps.foreach { doc =>
      assert(SitemapParser.parseOption(doc) == domSitemap(doc), s"sitemap doc: $doc")
    }

    val feeds = Seq(
      "<rss><channel><item><link> http://r.example/1 </link><title>t&amp;1</title></item><item><link></link></item></channel></rss>",
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"><item><link>http://rdf.example/</link></item></rdf:RDF>""",
      // Atom: rel=self first (skipped), rel-less with empty href next
      // (decides and drops), rel=alternate later must NOT resurrect it
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |  <entry><link rel="self" href="http://api.example/self"/>
        |    <link href="http://atom.example/ok"/><title>ok</title></entry>
        |  <entry><link rel="edit" href="http://api.example/e"/>
        |    <link href=""/><link rel="alternate" href="http://late.example/"/></entry>
        |  <entry><link rel="alternate" href=" http://alt.example/ "/></entry>
        |</feed>""".stripMargin,
      "<feed><entry><content><link href='http://nested.example/'/></content></entry></feed>",
      "<div>not a feed</div>",
      "<rss><channel><item><link>x")
    feeds.foreach { doc =>
      assert(FeedParser.parseOption(doc) == domFeed(doc), s"feed doc: $doc")
    }
  }
}
