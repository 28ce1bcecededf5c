package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.parse._

/** Parse-filter enrichment chain truth tables (SURVEY §2.6). */
class ParseFiltersSpec extends AnyFunSuite {

  private def ctx(html: String, url: String = "http://www.shop.example.co.uk/p/1.html",
                  md: Map[String, Seq[String]] = Map.empty) = {
    val bytes = html.getBytes("UTF-8")
    ParseContext(url, bytes, HtmlParser.parse(html, url), md)
  }

  test("Md5SignatureParseFilter: text signature + previous-signature copy") {
    val f = new Md5SignatureParseFilter()
    val c1 = f(ctx("<html><body>hello world</body></html>"))
    val sig1 = c1.metadata("signature").head
    assert(sig1.length == 32)
    // second pass copies old signature
    val c2 = f(c1.copy(html = HtmlParser.parse("<html><body>changed</body></html>", c1.url)))
    assert(c2.metadata("signatureOld").head == sig1)
    assert(c2.metadata("signature").head != sig1)
  }

  test("DebugParseFilter appends one summary line per doc, never throws") {
    val tmp = java.nio.file.Files.createTempFile("debugparse", ".log")
    val f = new DebugParseFilter(tmp.toString)
    f(ctx("<html><head><title>T</title></head><body><a href=\"x\">x</a>b</body></html>"))
    f(ctx("<html><body>two</body></html>"))
    val lines = java.nio.file.Files.readAllLines(tmp)
    assert(lines.size == 2)
    assert(lines.get(0).contains("title=T") && lines.get(0).contains("links=1"))
    // unwritable path: filter is a no-op, not a crash
    new DebugParseFilter("/nonexistent-dir/x/y.log")(ctx("<html></html>"))
  }

  test("DomainParseFilter adds host and paid-level domain") {
    val c = new DomainParseFilter()(ctx("<html></html>"))
    assert(c.metadata("host") == Seq("www.shop.example.co.uk"))
    assert(c.metadata("domain") == Seq("example.co.uk"))
  }

  test("MimeTypeNormalization maps content types to coarse tags") {
    def tag(ct: String) = new MimeTypeNormalization()(
      ctx("<html></html>", md = Map("parse.Content-Type" -> Seq(ct)))).metadata("format").head
    assert(tag("text/html; charset=utf-8") == "html")
    assert(tag("application/pdf") == "pdf")
    assert(tag("application/rss+xml") == "feed")
    assert(tag("image/png") == "image")
    assert(tag("application/x-mystery") == "other")
  }

  test("CollectionTagger include/exclude regex sets") {
    val t = new CollectionTagger(Seq(
      CollectionTagger.Collection("shop", Seq("shop\\.example".r)),
      CollectionTagger.Collection("noprod", Seq(".*".r), Seq("/p/".r))))
    val c = t(ctx("<html></html>"))
    assert(c.metadata("collections") == Seq("shop")) // noprod excluded by /p/
  }

  test("CsvToMultivalued splits configured keys") {
    val f = new CsvToMultivalued(Seq("tags"))
    val c = f(ctx("<html></html>", md = Map("tags" -> Seq("a, b,c"), "other" -> Seq("x,y"))))
    assert(c.metadata("tags") == Seq("a", "b", "c"))
    assert(c.metadata("other") == Seq("x,y"))
  }

  test("LdJsonParseFilter extracts JSON-LD fields") {
    val html =
      """<html><head><script type="application/ld+json">
        |{"@type": "Article", "headline": "Big News", "wordCount": 320}
        |</script></head><body></body></html>""".stripMargin
    val f = new LdJsonParseFilter(Map("ld.headline" -> "headline", "ld.words" -> "wordCount"))
    val c = f(ctx(html))
    assert(c.metadata("ld.headline") == Seq("Big News"))
    assert(c.metadata("ld.words") == Seq("320"))
  }

  test("XPathParseFilter evaluates over well-formed markup") {
    val xml = """<html><head><title>T</title></head><body><h1>Header One</h1></body></html>"""
    val f = new XPathParseFilter(Map("h1" -> "//h1", "missing" -> "//h9"))
    val c = f(ctx(xml))
    assert(c.metadata("h1") == Seq("Header One"))
    assert(!c.metadata.contains("missing"))
    // malformed html: silently skipped
    val bad = new XPathParseFilter(Map("x" -> "//p"))(ctx("<html><p>unclosed</html>"))
    assert(!bad.metadata.contains("x"))
  }

  test("LinkParseFilter harvests img/link attrs as extra outlinks") {
    val html = """<html><body><img src="logo.png"><link href="style.css"></body></html>"""
    val c = LinkParseFilter.default(ctx(html))
    assert(c.extraOutlinks.contains("http://www.shop.example.co.uk/p/logo.png"))
    assert(c.extraOutlinks.contains("http://www.shop.example.co.uk/p/style.css"))
  }

  test("LanguageIdParseFilter tags dominant marker language") {
    val en = new LanguageIdParseFilter()(ctx("<html><body>the cat and the dog is in the house</body></html>"))
    assert(en.metadata("lang") == Seq("en"))
    val de = new LanguageIdParseFilter()(ctx("<html><body>der hund und die katze ist nicht da</body></html>"))
    assert(de.metadata("lang") == Seq("de"))
  }

  test("chain composes in order") {
    val chain = ParseFilterChain.default
    val c = chain(ctx("<html><body>text here</body></html>",
      md = Map("parse.Content-Type" -> Seq("text/html"))))
    assert(c.metadata.contains("signature"))
    assert(c.metadata("host").nonEmpty)
    assert(c.metadata("format") == Seq("html"))
  }
}
