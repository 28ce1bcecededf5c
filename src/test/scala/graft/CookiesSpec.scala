package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fetch.Cookies

/** CookieConverter truth table: expiry, domain suffix, path prefix,
  * secure gating (`core/.../util/CookieConverter.java` semantics). */
class CookiesSpec extends AnyFunSuite {

  private val now = 1700000000000L // 2023-11-14

  test("host-only cookies need a matching origin; header joins with '; '") {
    val sc = Seq("a=1", "b=2")
    val origin = Some("example.com")
    assert(Cookies.header(sc, "http://example.com/x", now, origin).contains("a=1; b=2"))
    // unknown origin: host-only cookies are withheld (no cross-host leak)
    assert(Cookies.header(sc, "http://example.com/x", now).isEmpty)
    // different host than the origin: withheld
    assert(Cookies.header(sc, "http://other.com/x", now, origin).isEmpty)
  }

  test("expired cookies drop; future expiry passes") {
    val sc = Seq(
      "old=1; Expires=Wed, 01-Jan-2020 00:00:00 GMT",
      "new=2; Expires=Thu, 01 Jan 2093 00:00:00 GMT")
    assert(Cookies.applicable(sc, "http://example.com/", now,
      originHost = Some("example.com")) == Seq("new=2"))
  }

  test("domain gate: suffix match including subdomains, reject others") {
    val sc = Seq("d=1; Domain=.example.com")
    assert(Cookies.applicable(sc, "http://www.example.com/", now) == Seq("d=1"))
    assert(Cookies.applicable(sc, "http://example.com/", now) == Seq("d=1"))
    assert(Cookies.applicable(sc, "http://evil-example.com/", now).isEmpty)
    assert(Cookies.applicable(sc, "http://other.org/", now).isEmpty)
  }

  test("path gate: prefix match") {
    val sc = Seq("p=1; Path=/shop")
    val o = Some("e.com")
    assert(Cookies.applicable(sc, "http://e.com/shop/cart", now, o) == Seq("p=1"))
    assert(Cookies.applicable(sc, "http://e.com/about", now, o).isEmpty)
  }

  test("secure gate: https only") {
    val sc = Seq("s=1; Secure")
    val o = Some("e.com")
    assert(Cookies.applicable(sc, "https://e.com/", now, o) == Seq("s=1"))
    assert(Cookies.applicable(sc, "http://e.com/", now, o).isEmpty)
  }

  test("malformed entries are skipped, valid ones survive") {
    val sc = Seq("notacookie", "ok=1; HttpOnly; SameSite=Lax")
    val o = Some("e.com")
    assert(Cookies.applicable(sc, "http://e.com/", now, o) == Seq("ok=1"))
    assert(Cookies.header(Seq("x"), "http://e.com/", now, o).isEmpty)
    assert(Cookies.header(Seq("a=1"), "::bad url::", now, o).isEmpty)
  }
}
