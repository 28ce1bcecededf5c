package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.MetadataTransfer

/** MetadataTransfer semantics (`core/.../util/MetadataTransfer.java:
  * 124-180`): transfer whitelist, depth++, url.path trail, persist
  * projection with globs. */
class MetadataTransferSpec extends AnyFunSuite {
  private val mt = MetadataTransfer()

  test("forOutlink: transfer keys only, depth incremented, path appended") {
    val md = Map(
      "isSitemap" -> Seq("true"), // discovery marker: NOT transferred
      "max.depth" -> Seq("7"),
      "depth" -> Seq("2"),
      "secret" -> Seq("x"),
      "url.path" -> Seq("http://a.com/"))
    val out = mt.forOutlink("http://a.com/page", md)
    assert(!out.contains("isSitemap")) // would mislabel children as sitemaps
    assert(out("max.depth") == Seq("7"))
    assert(out("depth") == Seq("3"))
    assert(out("url.path") == Seq("http://a.com/", "http://a.com/page"))
    assert(!out.contains("secret"))
  }

  test("forOutlink: missing depth starts at 1, path bounded") {
    val out = mt.forOutlink("http://a.com/", Map.empty)
    assert(out("depth") == Seq("1"))
    assert(out("url.path") == Seq("http://a.com/"))
    val longPath = Map("url.path" -> (1 to 20).map(i => s"u$i"))
    val bounded = mt.forOutlink("last", longPath)
    assert(bounded("url.path").length == 10)
    assert(bounded("url.path").last == "last")
  }

  test("forStatus: persist projection with glob support") {
    val custom = MetadataTransfer(persistKeys = Seq("depth", "fetch.*"))
    val md = Map(
      "depth" -> Seq("1"),
      "fetch.statusCode" -> Seq("200"),
      "fetch.loadingTime" -> Seq("12"),
      "tmp" -> Seq("z"))
    val out = custom.forStatus(md)
    assert(out.keySet == Set("depth", "fetch.statusCode", "fetch.loadingTime"))
  }
}
