package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fetch.RobotRules

/** Robots semantics (RobotRulesParser reference: `core/.../protocol/
  * RobotRulesParser.java`, `HttpRobotRulesParserTest`). */
class RobotsSpec extends AnyFunSuite {

  val robots =
    """# comment
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/open.html
      |Crawl-delay: 2
      |
      |User-agent: graft-crawler
      |Disallow: /graft-only/
      |""".stripMargin

  test("wildcard group: longest match wins, allow beats disallow on tie+") {
    val r = RobotRules.parse(robots, "some-other-bot")
    assert(!r.isAllowed("/private/x.html"))
    assert(r.isAllowed("/private/open.html"))
    assert(r.isAllowed("/public/x.html"))
    assert(r.crawlDelayMs.contains(2000L))
  }

  test("specific group overrides wildcard group") {
    val r = RobotRules.parse(robots, "graft-crawler/0.1")
    assert(!r.isAllowed("/graft-only/x"))
    assert(r.isAllowed("/private/x.html")) // wildcard rules replaced
    assert(r.crawlDelayMs.isEmpty)
  }

  test("empty disallow allows everything") {
    val r = RobotRules.parse("User-agent: *\nDisallow:\n", "bot")
    assert(r.isAllowed("/anything"))
  }

  test("deny all") {
    val r = RobotRules.parse("User-agent: *\nDisallow: /\n", "bot")
    assert(!r.isAllowed("/"))
    assert(!r.isAllowed("/x"))
  }

  test("sitemap directives are global and deduped") {
    val r = RobotRules.parse(
      """User-agent: other
        |Disallow: /
        |Sitemap: https://e.com/a.xml
        |
        |User-agent: *
        |Allow: /
        |Sitemap: https://e.com/b.xml
        |Sitemap: https://e.com/a.xml
        |""".stripMargin, "bot")
    // collected from all groups, in order, deduped
    assert(r.sitemaps == Seq("https://e.com/a.xml", "https://e.com/b.xml"))
  }
}
