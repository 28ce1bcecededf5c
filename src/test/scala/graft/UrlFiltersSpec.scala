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
