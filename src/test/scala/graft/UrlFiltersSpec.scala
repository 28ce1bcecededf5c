package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.filters._

/** Filter-chain truth tables (reference style: FastURLFilterTest,
  * MaxDepthFilterTest, MetadataFilterTest — SURVEY §5.3). */
class UrlFiltersSpec extends AnyFunSuite {
  private val noMd = Map.empty[String, Seq[String]]

  test("BasicUrlFilter drops long URLs and repeated path elements") {
    val f = new BasicUrlFilter(maxLength = 64, maxPathRepetition = 2)
    assert(f("http://e.com/a", None, noMd).isDefined)
    assert(f("http://e.com/" + "x" * 100, None, noMd).isEmpty)
    assert(f("http://e.com/a/a/a/b", None, noMd).isEmpty)
    assert(f("http://e.com/a/a/b", None, noMd).isDefined)
  }

  test("SelfUrlFilter drops self-links") {
    val f = new SelfUrlFilter
    assert(f("http://e.com/a", Some("http://e.com/a"), noMd).isEmpty)
    assert(f("http://e.com/b", Some("http://e.com/a"), noMd).isDefined)
    assert(f("http://e.com/a", None, noMd).isDefined)
  }

  test("MaxDepthFilter: global and per-URL max.depth override") {
    val f = new MaxDepthFilter(2)
    assert(f("u", None, Map("depth" -> Seq("1"))).isDefined)
    assert(f("u", None, Map("depth" -> Seq("2"))).isEmpty)
    assert(f("u", None, Map("depth" -> Seq("3"), "max.depth" -> Seq("5"))).isDefined)
    assert(new MaxDepthFilter(-1)("u", None, Map("depth" -> Seq("99"))).isDefined)
  }

  test("HostUrlFilter keeps same-domain outlinks") {
    val f = new HostUrlFilter(ignoreOutsideDomain = true)
    assert(f("http://a.e.com/x", Some("http://b.e.com/y"), noMd).isDefined)
    assert(f("http://other.org/x", Some("http://b.e.com/y"), noMd).isEmpty)
  }

  test("MetadataFilter requires configured k=v") {
    val f = new MetadataFilter(Map("isFeed" -> "true"))
    assert(f("u", None, Map("isFeed" -> Seq("true"))).isDefined)
    assert(f("u", None, noMd).isEmpty)
  }

  test("SitemapUrlFilter: plain links drop once a host's sitemaps were found") {
    val f = new SitemapUrlFilter()
    // no sitemap found yet: everything passes
    assert(f("http://e.com/a", None, noMd).isDefined)
    // sitemaps found: plain-link (HTML) discoveries drop ...
    assert(f("http://e.com/a", None, Map("sitemap.found" -> Seq("true"))).isEmpty)
    // ... but sub-sitemap discoveries pass ...
    assert(f("http://e.com/sitemap.xml", None,
      Map("sitemap.found" -> Seq("true"), "isSitemap" -> Seq("true"))).isDefined)
    // ... and so do the urlset CONTENT urls (ParseStage tags them)
    assert(f("http://e.com/page.html", None,
      Map("sitemap.found" -> Seq("true"), "sitemap.source" -> Seq("true"))).isDefined)
  }

  test("RegexUrlFilter: ordered +/- rules, first match wins, no match drops") {
    val f = RegexUrlFilter.parse(Seq(
      "# comment",
      "-\\.jpg$",
      "+^https?://good\\.",
      "-."))
    assert(f("https://good.com/a", None, noMd).isDefined)
    assert(f("https://good.com/a.jpg", None, noMd).isEmpty)
    assert(f("https://bad.com/a", None, noMd).isEmpty)
  }

  test("FastUrlFilter: scoped rules, first matching scope wins") {
    val f = new FastUrlFilter(
      hostRules = Map("www.e.com" -> Seq((false, "/private".r))),
      domainRules = Map("e.com" -> Seq((true, "/public".r), (false, ".*".r))),
      globalRules = Seq((true, ".*".r)))
    assert(f("http://www.e.com/private/x", None, noMd).isEmpty)
    assert(f("http://www.e.com/public", None, noMd).isDefined)   // host scope has no match -> domain
    assert(f("http://sub.e.com/other", None, noMd).isEmpty)      // domain deny
    assert(f("http://other.org/x", None, noMd).isDefined)        // global allow
  }

  // mirrors the reference's FastURLFilterTest + fast.urlfilter.json
  // fixture: GLOBAL "DenyPathQuery \.jpg", domain:stormcrawler.net
  // "AllowPath /bla/" then "DenyPath .+", metadata:key=value "DenyPath .+"
  // (core/src/test/resources/fast.urlfilter.json)
  test("FastUrlFilter: metadata: scope — reference FastURLFilterTest truth table") {
    val f = new FastUrlFilter(
      hostRules = Map.empty,
      domainRules = Map("stormcrawler.net" -> Seq((true, "^/bla/".r), (false, ".+".r))),
      globalRules = Seq((false, "\\.jpg".r)),
      metadataRules = Seq(FastUrlFilter.MdScope("key", "value", Seq((false, ".+".r)))))
    // testImagesFilter: global deny
    assert(f("http://www.somedomain.com/image.jpg", None, noMd).isEmpty)
    // testDomainNotAllowed: domain deny / allow
    assert(f("http://stormcrawler.net/", None, noMd).isEmpty)
    assert(f("http://stormcrawler.net/bla/", None, noMd).isDefined)
    // testMD: metadata-scoped deny fires only when the parent metadata
    // carries key=value
    assert(f("http://somedomain.net/", None, Map("key" -> Seq("value"))).isEmpty)
    assert(f("http://somedomain.net/", None, noMd).isDefined)
    // value comparison is case-INsensitive (FastURLFilter.java:233)
    assert(f("http://somedomain.net/", None, Map("key" -> Seq("VaLuE"))).isEmpty)
    // key must match exactly; other keys don't trigger the scope
    assert(f("http://somedomain.net/", None, Map("other" -> Seq("value"))).isDefined)
  }

  test("FastUrlFilter: reference scope-evaluation details") {
    // an Allow match does NOT short-circuit later scopes (checkScope
    // returns true only for DENY — FastURLFilter.java:252-268): host
    // allow, then global deny => removed
    val f = new FastUrlFilter(
      hostRules = Map("www.e.com" -> Seq((true, "^/x".r))),
      domainRules = Map.empty,
      globalRules = Seq((false, "^/x".r)))
    assert(f("http://www.e.com/x", None, noMd).isEmpty)
    // ... but within a scope the first match decides THAT scope: the
    // domain allow shadows the domain deny for matching paths
    val g = new FastUrlFilter(Map.empty,
      Map("e.com" -> Seq((true, "^/keep".r), (false, ".+".r))), Nil)
    assert(g("http://www.e.com/keep/1", None, noMd).isDefined)
    assert(g("http://www.e.com/drop", None, noMd).isEmpty)
    // domain rules try EVERY hostname suffix rightmost-first
    // (FastURLFilter.java:215-222), not just the paid-level domain
    val h = new FastUrlFilter(Map.empty, Map("com" -> Seq((false, "/spam".r))), Nil)
    assert(h("http://a.b.example.com/spam/x", None, noMd).isEmpty)
    assert(h("http://a.b.example.org/spam/x", None, noMd).isDefined)
    // value-less metadata constraint ("metadata:key") never matches —
    // reference MDScope.value null semantics (FastURLFilter.java:292-306)
    val m = new FastUrlFilter(Map.empty, Map.empty, Nil,
      Seq(FastUrlFilter.MdScope("key", null, Seq((false, ".+".r)))))
    assert(m("http://e.com/x", None, Map("key" -> Seq("anything"))).isDefined)
  }

  test("RegexUrlNormalizer applies substitutions to fixpoint") {
    val n = new RegexUrlNormalizer(Seq(("&utm_[^&]+".r, ""), ("//+".r, "/")))
    assert(n("http:/a//b?x=1&utm_src=z", None, noMd).contains("http:/a/b?x=1"))
  }

  test("chain: fold with None short-circuit (URLFilters.java:109-126)") {
    val chain = UrlFilterChain.default()
    assert(chain("HTTP://E.com:80/a#f").contains("http://e.com/a"))
    assert(chain("http://e.com/pic.jpg").isEmpty)      // regex deny
    assert(chain("http://e.com/a", Some("http://e.com/a")).isEmpty) // self link
    assert(chain("garbage").isEmpty)                   // normalizer drops
  }
}
