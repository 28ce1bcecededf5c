package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fetch.{DelegatorProtocol, Protocol, ProtocolResponse}

/** DelegatorProtocol routing: metadata gates AND-ed with URL regex,
  * first match wins, gateless rule is the catch-all. */
class DelegatorProtocolSpec extends AnyFunSuite {

  private def tagged(tag: String): Protocol = new Protocol {
    def fetch(url: String, metadata: Map[String, Seq[String]]): ProtocolResponse =
      ProtocolResponse(tag.getBytes, 200, Map.empty)
  }
  private def body(r: ProtocolResponse) = new String(r.content)

  import DelegatorProtocol.Rule

  test("metadata gate routes; catch-all takes the rest; order decides ties") {
    val p = new DelegatorProtocol(Seq(
      Rule(tagged("render"), metadataEquals = Map("js" -> "true")),
      Rule(tagged("pdfbox"), urlPattern = Some("\\.pdf$".r)),
      Rule(tagged("plain"))))

    assert(body(p.fetch("http://a.com/x", Map("js" -> Seq("true")))) == "render")
    assert(body(p.fetch("http://a.com/doc.pdf", Map.empty)) == "pdfbox")
    assert(body(p.fetch("http://a.com/x", Map("js" -> Seq("false")))) == "plain")
    assert(body(p.fetch("http://a.com/x", Map.empty)) == "plain")
    // first match wins: js=true also ends in .pdf -> render (rule order)
    assert(body(p.fetch("http://a.com/doc.pdf", Map("js" -> Seq("true")))) == "render")
  }

  test("all metadata gates must match; regex AND metadata compose") {
    val p = new DelegatorProtocol(Seq(
      Rule(tagged("special"), urlPattern = Some("^https://secure\\.".r),
        metadataEquals = Map("a" -> "1", "b" -> "2")),
      Rule(tagged("plain"))))
    val both = Map("a" -> Seq("1"), "b" -> Seq("2"))
    assert(body(p.fetch("https://secure.example.com/", both)) == "special")
    assert(body(p.fetch("http://plain.example.com/", both)) == "plain")
    assert(body(p.fetch("https://secure.example.com/", Map("a" -> Seq("1")))) == "plain")
  }

  test("no matching rule yields an error response, not an exception") {
    val p = new DelegatorProtocol(Seq(
      Rule(tagged("only"), metadataEquals = Map("k" -> "v"))))
    val r = p.fetch("http://a.com/", Map.empty)
    assert(r.statusCode == -1)
  }
}
