package graft.fetch

import java.net.URI
import java.time.ZonedDateTime
import java.time.format.DateTimeFormatter
import java.util.Locale

/** Set-Cookie → request-Cookie conversion (the reference's
  * `core/.../util/CookieConverter.java`): given the `set-cookie`
  * strings remembered in metadata from an earlier response, build the
  * `Cookie` header value applicable to a target URL, honoring the
  * RFC 6265 attributes that gate applicability — Expires, Domain
  * (suffix match), Path (prefix match), and Secure (https only).
  * Pure function: unit-testable without any network. */
object Cookies {

  private val expiresFormats = Seq(
    DateTimeFormatter.RFC_1123_DATE_TIME,
    DateTimeFormatter.ofPattern("EEE, dd-MMM-yyyy HH:mm:ss zzz", Locale.US))

  private def parseExpires(v: String): Option[Long] =
    expiresFormats.view.flatMap { f =>
      try Some(ZonedDateTime.parse(v.trim, f).toInstant.toEpochMilli)
      catch { case _: Exception => None }
    }.headOption

  /** The `name=value` pairs of the given set-cookie strings that apply
    * to `targetUrl` at time `nowMs`, in input order.
    *
    * `originHost` is the host that SET the cookies (carried alongside
    * them in metadata). Per RFC 6265, a cookie without a `Domain`
    * attribute is host-only: it applies exactly to the origin host.
    * When the origin is unknown (None), domain-less cookies are
    * withheld entirely — metadata can travel across hosts through the
    * crawl graph, and leaking one site's session cookie to another is
    * worse than re-fetching without it. */
  def applicable(setCookies: Seq[String], targetUrl: String,
                 nowMs: Long = System.currentTimeMillis(),
                 originHost: Option[String] = None): Seq[String] = {
    val uri =
      try URI.create(targetUrl)
      catch { case _: Exception => return Seq.empty }
    val host = Option(uri.getHost).getOrElse("").toLowerCase(Locale.ROOT)
    val path = Option(uri.getPath).filter(_.nonEmpty).getOrElse("/")
    val https = "https".equalsIgnoreCase(uri.getScheme)

    setCookies.flatMap { sc =>
      val parts = sc.split(";").map(_.trim)
      if (parts.isEmpty || !parts(0).contains('=')) None
      else {
        val nameValue = parts(0)
        val attrs = parts.drop(1).map { a =>
          val i = a.indexOf('=')
          if (i < 0) (a.toLowerCase(Locale.ROOT), "")
          else (a.substring(0, i).trim.toLowerCase(Locale.ROOT), a.substring(i + 1).trim)
        }.toMap
        val fresh = attrs.get("expires").flatMap(parseExpires).forall(_ >= nowMs)
        val domainOk = attrs.get("domain") match {
          case Some(d) =>
            val dom = d.stripPrefix(".").toLowerCase(Locale.ROOT)
            host == dom || host.endsWith("." + dom)
          case None => // host-only cookie: exact origin match required
            originHost.exists(_.equalsIgnoreCase(host))
        }
        val pathOk = attrs.get("path").forall(p => path.startsWith(p))
        val secureOk = !attrs.contains("secure") || https
        if (fresh && domainOk && pathOk && secureOk) Some(nameValue) else None
      }
    }
  }

  /** `Cookie` header value, or None when nothing applies. */
  def header(setCookies: Seq[String], targetUrl: String,
             nowMs: Long = System.currentTimeMillis(),
             originHost: Option[String] = None): Option[String] = {
    val cs = applicable(setCookies, targetUrl, nowMs, originHost)
    if (cs.isEmpty) None else Some(cs.mkString("; "))
  }
}
