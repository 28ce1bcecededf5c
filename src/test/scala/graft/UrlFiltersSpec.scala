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

  // PathQuery-verb rules (match path+"?"+query) — the historical
  // haystack for all rules before the Path/PathQuery split
  private def allowPQ(p: String) = FastUrlFilter.Rule(allow = true, pathOnly = false, p.r)
  private def denyPQ(p: String) = FastUrlFilter.Rule(allow = false, pathOnly = false, p.r)
  private def allowPath(p: String) = FastUrlFilter.Rule(allow = true, pathOnly = true, p.r)
  private def denyPath(p: String) = FastUrlFilter.Rule(allow = false, pathOnly = true, p.r)

  test("FastUrlFilter: scoped rules, first matching scope wins") {
    val f = new FastUrlFilter(
      hostRules = Map("www.e.com" -> Seq(denyPQ("/private"))),
      domainRules = Map("e.com" -> Seq(allowPQ("/public"), denyPQ(".*"))),
      globalRules = Seq(allowPQ(".*")))
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
      domainRules = Map("stormcrawler.net" -> Seq(allowPath("/bla/"), denyPath(".+"))),
      globalRules = Seq(denyPQ("\\.jpg")),
      metadataRules = Seq(FastUrlFilter.MdScope("key", "value", Seq(denyPath(".+")))))
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
      hostRules = Map("www.e.com" -> Seq(allowPQ("^/x"))),
      domainRules = Map.empty,
      globalRules = Seq(denyPQ("^/x")))
    assert(f("http://www.e.com/x", None, noMd).isEmpty)
    // ... but within a scope the first match decides THAT scope: the
    // domain allow shadows the domain deny for matching paths
    val g = new FastUrlFilter(Map.empty,
      Map("e.com" -> Seq(allowPQ("^/keep"), denyPQ(".+"))), Nil)
    assert(g("http://www.e.com/keep/1", None, noMd).isDefined)
    assert(g("http://www.e.com/drop", None, noMd).isEmpty)
    // domain rules try EVERY hostname suffix rightmost-first
    // (FastURLFilter.java:215-222), not just the paid-level domain
    val h = new FastUrlFilter(Map.empty, Map("com" -> Seq(denyPQ("/spam"))), Nil)
    assert(h("http://a.b.example.com/spam/x", None, noMd).isEmpty)
    assert(h("http://a.b.example.org/spam/x", None, noMd).isDefined)
    // value-less metadata constraint ("metadata:key") never matches —
    // reference MDScope.value null semantics (FastURLFilter.java:292-306)
    val m = new FastUrlFilter(Map.empty, Map.empty, Nil,
      Seq(FastUrlFilter.MdScope("key", null, Seq(denyPQ(".+")))))
    assert(m("http://e.com/x", None, Map("key" -> Seq("anything"))).isDefined)
  }

  test("FastUrlFilter: Path vs PathQuery haystacks diverge (FastURLFilter.java:253-262)") {
    // *Path rules see getPath() ONLY; *PathQuery rules see path+"?"+query.
    // Anchored rules are where the distinction bites.
    val dp = new FastUrlFilter(Map.empty, Map.empty, Seq(denyPath("r$")))
    assert(dp("http://h.com/xr?q=1", None, noMd).isEmpty)   // path "/xr" ends in r -> deny
    assert(dp("http://h.com/xa?q=r", None, noMd).isDefined) // query never in a Path haystack
    val dpq = new FastUrlFilter(Map.empty, Map.empty, Seq(denyPQ("r$")))
    assert(dpq("http://h.com/xr?q=1", None, noMd).isDefined) // haystack "/xr?q=1" doesn't end in r
    assert(dpq("http://h.com/xr", None, noMd).isEmpty)       // no query: haystack == path (no "?")
    assert(dpq("http://h.com/xa?q=r", None, noMd).isEmpty)   // query IS in a PathQuery haystack
    // the fixture's classic: DenyPath \.jpg misses a query-only hit,
    // DenyPathQuery catches it
    val img = new FastUrlFilter(Map.empty, Map.empty, Seq(denyPath("\\.jpg")))
    assert(img("http://h.com/a?f=.jpg", None, noMd).isDefined)
    val imgQ = new FastUrlFilter(Map.empty, Map.empty, Seq(denyPQ("\\.jpg")))
    assert(imgQ("http://h.com/a?f=.jpg", None, noMd).isEmpty)
    // fragment is never part of either haystack (java.net.URL getPath/getQuery)
    assert(imgQ("http://h.com/a#x.jpg", None, noMd).isDefined)
    // a pathless URL yields the EMPTY path, not "/" (java.net.URL)
    val root = new FastUrlFilter(Map.empty, Map.empty, Seq(denyPath("^/")))
    assert(root("http://h.com", None, noMd).isDefined)
    assert(root("http://h.com/", None, noMd).isEmpty)
    // unparseable URL is removed (FastURLFilter.java:172-176)
    assert(dp("notaurl", None, noMd).isEmpty)
  }

  test("FastUrlFilter.rule: reference verb parsing (FastURLFilter.java:329-346)") {
    val r1 = FastUrlFilter.rule("DenyPathQuery \\.jpg")
    assert(!r1.allow && !r1.pathOnly && r1.re.regex == "\\.jpg")
    val r2 = FastUrlFilter.rule("AllowPath /bla/")
    assert(r2.allow && r2.pathOnly && r2.re.regex == "/bla/")
    // verb prefix is case-insensitive; pattern is trimmed
    val r3 = FastUrlFilter.rule("denypath   .+  ")
    assert(!r3.allow && r3.pathOnly && r3.re.regex == ".+")
    intercept[IllegalArgumentException](FastUrlFilter.rule("Nuke .*"))
    intercept[IllegalArgumentException](FastUrlFilter.rule("DenyPath")) // no space+pattern
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
