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
