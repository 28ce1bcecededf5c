package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.filters.FilterConfig
import graft.parse.{HtmlParser, ParseContext}

/** JSON-config chain construction (urlfilters.json / parsefilters.json
  * shape compatibility). */
class FilterConfigSpec extends AnyFunSuite {

  test("reloadable chain: picks up config edits, keeps last good on breakage") {
    import java.nio.file.{Files, Paths}
    val f = Files.createTempFile("urlfilters", ".json")
    def write(s: String, mtimeMs: Long): Unit = {
      Files.write(f, s.getBytes)
      Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
    val t = 1700000000000L
    write("""{"urlfilters": [{"class": "RegexURLFilter", "params": {"rules": ["-\\.jpg$", "+."]}}]}""", t)
    val rc = new graft.filters.ReloadableUrlFilterChain(f.toString, checkEveryMs = 100)

    assert(rc.current(t).apply("http://e.com/a.jpg").isEmpty)
    assert(rc.current(t).apply("http://e.com/a.html").isDefined)

    // config flips to deny .html; next check after the interval reloads
    write("""{"urlfilters": [{"class": "RegexURLFilter", "params": {"rules": ["-\\.html$", "+."]}}]}""", t + 5000)
    assert(rc.current(t + 50).apply("http://e.com/a.html").isDefined) // within interval: old chain
    assert(rc.current(t + 200).apply("http://e.com/a.html").isEmpty)  // reloaded
    assert(rc.current(t + 200).apply("http://e.com/a.jpg").isDefined)

    // broken JSON: keep the last good chain
    write("{not json", t + 9000)
    assert(rc.current(t + 400).apply("http://e.com/a.html").isEmpty)
  }

  test("urlfilters.json builds a working chain") {
    val chain = FilterConfig.urlFilterChain(
      """{"urlfilters": [
        |  {"class": "BasicURLNormalizer", "params": {"queryElementsToRemove": ["sid"]}},
        |  {"class": "BasicURLFilter", "params": {"maxLength": 100}},
        |  {"class": "SelfURLFilter"},
        |  {"class": "MaxDepthFilter", "params": {"maxDepth": 3}},
        |  {"class": "RegexURLFilter", "params": {"rules": ["-\\.jpg$", "+^https?://"]}}
        |]}""".stripMargin)
    assert(chain("HTTP://E.com:80/a?sid=1&b=2#f").contains("http://e.com/a?b=2"))
    assert(chain("http://e.com/x.jpg").isEmpty)
    assert(chain("http://e.com/" + "y" * 200).isEmpty)
    assert(chain("http://e.com/a", None, Map("depth" -> Seq("5"))).isEmpty)
  }

  test("FastURLFilter scoped config") {
    val chain = FilterConfig.urlFilterChain(
      """{"urlfilters": [
        |  {"class": "FastURLFilter", "params": {
        |    "hosts": {"www.e.com": ["-/private.*"]},
        |    "domains": {"e.com": ["+/public.*", "-.*"]},
        |    "global": ["+.*"]}}
        |]}""".stripMargin)
    assert(chain("http://www.e.com/private/x").isEmpty)
    assert(chain("http://sub.e.com/public/x").isDefined)
    assert(chain("http://sub.e.com/other").isEmpty)
    assert(chain("http://other.org/x").isDefined)
  }

  test("FastURLFilter metadata: scope config (FastURLFilter.java:141-143)") {
    val chain = FilterConfig.urlFilterChain(
      """{"urlfilters": [
        |  {"class": "FastURLFilter", "params": {
        |    "metadata": {"key=value": ["-.+"], "novalue": ["-.+"]}}}
        |]}""".stripMargin)
    // scope fires only when the parent metadata carries key=value
    assert(chain("http://somedomain.net/", None, Map("key" -> Seq("value"))).isEmpty)
    assert(chain("http://somedomain.net/").isDefined)
    // value compare is case-insensitive; a value-less constraint never matches
    assert(chain("http://somedomain.net/", None, Map("key" -> Seq("VALUE"))).isEmpty)
    assert(chain("http://somedomain.net/", None, Map("novalue" -> Seq("x"))).isDefined)
  }

  // the reference's own test fixture, verbatim
  // (core/src/test/resources/fast.urlfilter.json)
  private val referenceFastFixture =
    """{
      |  "rules" : [ {
      |    "scope" : "GLOBAL",
      |    "patterns" : [ "DenyPathQuery \\.jpg" ]
      |  }, {
      |    "scope" : "domain:stormcrawler.net",
      |    "patterns" : [ "AllowPath /bla/", "DenyPath .+" ]
      |  }, {
      |    "scope" : "metadata:key=value",
      |    "patterns" : [ "DenyPath .+" ]
      |  } ]
      |}""".stripMargin

  test("FastURLFilter: reference-native fast.urlfilter.json parses unmodified") {
    // FilterConfig.fastUrlFilter takes the reference FILE content verbatim
    // (single-field-object unwrap included — FastURLFilter.java:113-118);
    // assertions mirror FastURLFilterTest.java:41-68
    val f = FilterConfig.fastUrlFilter(referenceFastFixture)
    assert(f("http://www.somedomain.com/image.jpg", None, Map.empty).isEmpty) // testImagesFilter
    assert(f("http://stormcrawler.net/", None, Map.empty).isEmpty)            // testDomainNotAllowed
    assert(f("http://stormcrawler.net/bla/", None, Map.empty).isDefined)
    assert(f("http://somedomain.net/", None, Map("key" -> Seq("value"))).isEmpty) // testMD
    assert(f("http://somedomain.net/", None, Map.empty).isDefined)
    // the same scope array embeds as params.rules inside urlfilters.json
    val chain = FilterConfig.urlFilterChain(
      s"""{"urlfilters": [{"class": "FastURLFilter", "params": $referenceFastFixture}]}""")
    assert(chain("http://www.somedomain.com/image.jpg").isEmpty)
    assert(chain("http://stormcrawler.net/bla/").isDefined)
    // Path vs PathQuery through the parsed config: the GLOBAL
    // DenyPathQuery \.jpg catches a query-only jpg hit…
    assert(chain("http://other.org/page?img=.jpg").isEmpty)
    // …while the domain DenyPath .+ never fires on query alone: a
    // pathless URL has the EMPTY path haystack (.+ needs one char)
    assert(chain("http://stormcrawler.net?x=1").isDefined)
    // on actual read of the fixture from the reference tree (when
    // present), the same truth table holds — proves drop-in parity
    val p = java.nio.file.Paths.get(
      "/root/reference/core/src/test/resources/fast.urlfilter.json")
    if (java.nio.file.Files.isReadable(p)) {
      val g = FilterConfig.fastUrlFilter(
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      assert(g("http://www.somedomain.com/image.jpg", None, Map.empty).isEmpty)
      assert(g("http://stormcrawler.net/bla/", None, Map.empty).isDefined)
      assert(g("http://somedomain.net/", None, Map("key" -> Seq("value"))).isEmpty)
    }
  }

  test("parsefilters.json builds the enrichment chain") {
    val chain = FilterConfig.parseFilterChain(
      """{"parsefilters": [
        |  {"class": "MD5SignatureParseFilter"},
        |  {"class": "DomainParseFilter"},
        |  {"class": "MimeTypeNormalization", "params": {"key": "fmt"}},
        |  {"class": "CollectionTagger", "params": {"collections": [
        |     {"name": "shop", "includePatterns": ["shop\\."]}]}}
        |]}""".stripMargin)
    val html = "<html><body>text</body></html>"
    val ctx = chain(ParseContext("http://www.shop.example.com/p", html.getBytes,
      HtmlParser.parse(html, "http://www.shop.example.com/p"),
      Map("parse.Content-Type" -> Seq("text/html"))))
    assert(ctx.metadata("signature").head.length == 32)
    assert(ctx.metadata("domain") == Seq("example.com"))
    assert(ctx.metadata("fmt") == Seq("html"))
    assert(ctx.metadata("collections") == Seq("shop"))
  }

  test("unknown class fails loudly") {
    intercept[RuntimeException] {
      FilterConfig.urlFilterChain("""{"urlfilters": [{"class": "Nope"}]}""")
    }
  }
}
