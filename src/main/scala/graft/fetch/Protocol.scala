package graft.fetch

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.time.Duration
import scala.jdk.CollectionConverters._

/** Per-scheme pluggable fetch, mirroring the reference's `Protocol`
  * interface + `ProtocolFactory` (`core/.../protocol/Protocol.java:39`,
  * `ProtocolFactory.java:123`). Implementations are instantiated lazily
  * once per executor (JVM-singleton objects / lazy vals) — never
  * serialized per task.
  */
final case class ProtocolResponse(
    content: Array[Byte],
    statusCode: Int,
    headers: Map[String, Seq[String]]) {
  def header(name: String): Option[String] =
    headers.collectFirst { case (k, vs) if k.equalsIgnoreCase(name) && vs.nonEmpty => vs.head }
}

trait Protocol extends Serializable {
  /** Fetch one URL. Never throws: failures become status-code responses
    * (-1 = transport error), so the fetch stage stays total.
    *
    * JS-rendering seam: a selenium/playwright-style protocol
    * (`external/playwright/.../HttpProtocol.java:51`, `core/.../
    * protocol/selenium/RemoteDriverProtocol.java:133`) plugs in HERE —
    * implement this trait around a headless-browser pool (executor-
    * local, lazily initialized like [[HttpProtocol]]'s client) and
    * route tagged URLs to it with a [[DelegatorProtocol]] rule such as
    * `Rule(renderingProtocol, metadataEquals = Map("js" -> "true"))`.
    * Nothing else in the fetch stage changes: politeness, robots, and
    * status routing are protocol-agnostic. */
  def fetch(url: String, metadata: Map[String, Seq[String]]): ProtocolResponse
}

/** `file://` fetch for tests and local corpora
  * (`core/.../protocol/file/FileProtocol.java:27`). */
object FileProtocol extends Protocol {
  def fetch(url: String, metadata: Map[String, Seq[String]]): ProtocolResponse = {
    try {
      val path = Paths.get(new URI(url).getPath)
      if (!Files.exists(path)) ProtocolResponse(Array.empty, 404, Map.empty)
      else {
        val bytes = Files.readAllBytes(path)
        val mime =
          if (url.endsWith(".html") || url.endsWith(".htm")) "text/html"
          else if (url.endsWith(".xml")) "application/xml"
          else if (url.endsWith(".rss")) "application/rss+xml"
          else if (url.endsWith(".txt")) "text/plain"
          else if (url.endsWith(".pdf")) "application/pdf"
          else if (url.endsWith(".rtf")) "application/rtf"
          else if (url.endsWith(".docx"))
            "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
          else if (url.endsWith(".odt")) "application/vnd.oasis.opendocument.text"
          else "application/octet-stream"
        ProtocolResponse(bytes, 200, Map("Content-Type" -> Seq(mime)))
      }
    } catch {
      case _: Exception => ProtocolResponse(Array.empty, -1, Map.empty)
    }
  }
}

/** HTTP(S) via the JDK 17 HttpClient — GET (or HEAD when the URL's
  * metadata carries `http.method.head`, like `httpclient/HttpProtocol
  * .java:209` / `okhttp/HttpProtocol.java:387`) with content-limit
  * trim, optional If-Modified-Since, custom request headers, and an
  * optional forward proxy — fixed (`okhttp/HttpProtocol.java:78`) or a
  * per-request-rotating pool (`core/.../proxy/MultiProxyManager.java:38`);
  * redirects are NOT followed (the crawl loop handles REDIRECTION
  * statuses itself, like `okhttp/HttpProtocol.java:287-437`). */
final class HttpProtocol(
    contentLimit: Int = 1 << 20,
    connectTimeoutMs: Int = 10000,
    requestTimeoutMs: Int = 30000,
    userAgent: String = "graft-crawler/0.1",
    extraHeaders: Map[String, String] = Map.empty,
    useCookies: Boolean = true,
    proxyHost: Option[String] = None,
    proxyPort: Int = 8080,
    proxyPool: Seq[String] = Nil) extends Protocol {

  @transient private lazy val client: HttpClient = {
    val b = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NEVER)
      .connectTimeout(Duration.ofMillis(connectTimeoutMs))
    if (proxyPool.nonEmpty) b.proxy(rotatingSelector)
    else proxyHost.foreach(h => b.proxy(java.net.ProxySelector.of(
      new java.net.InetSocketAddress(h, proxyPort))))
    b.build()
  }

  /** Round-robin over a `host:port` proxy pool — MultiProxyManager
    * semantics (`core/.../proxy/MultiProxyManager.java:38-76`: rotate
    * per request, not per host, so load spreads even when one site
    * dominates the fetch batch). Takes precedence over the fixed
    * `proxyHost` when non-empty. */
  // validated EAGERLY: a malformed pool entry must fail construction,
  // not surface as a silent -1 on every fetch (the lazy client is only
  // touched inside fetch's catch-all, which would swallow the error)
  private val parsedProxyPool: IndexedSeq[(String, Int)] =
    proxyPool.map { hp =>
      val i = hp.lastIndexOf(':')
      val portOk = i > 0 && i < hp.length - 1 && hp.substring(i + 1).forall(_.isDigit)
      require(portOk, s"proxyPool entry must be host:port, got '$hp'")
      val port = hp.substring(i + 1).toInt
      require(port > 0 && port <= 65535, s"proxyPool port out of range in '$hp'")
      (hp.substring(0, i), port)
    }.toIndexedSeq

  @transient private lazy val rotatingSelector: java.net.ProxySelector = {
    val parsed = parsedProxyPool.map { case (h, p) =>
      new java.net.Proxy(java.net.Proxy.Type.HTTP, new java.net.InetSocketAddress(h, p))
    }
    val next = new java.util.concurrent.atomic.AtomicInteger(0)
    new java.net.ProxySelector {
      override def select(uri: java.net.URI): java.util.List[java.net.Proxy] =
        java.util.Collections.singletonList(
          parsed(Math.floorMod(next.getAndIncrement(), parsed.size)))
      override def connectFailed(uri: java.net.URI,
                                 sa: java.net.SocketAddress,
                                 ioe: java.io.IOException): Unit = ()
    }
  }

  def fetch(url: String, metadata: Map[String, Seq[String]]): ProtocolResponse = {
    try {
      val useHead = metadata.get("http.method.head").exists(_.exists(_.equalsIgnoreCase("true")))
      val b = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(requestTimeoutMs))
        .header("User-Agent", userAgent)
      if (useHead) b.method("HEAD", HttpRequest.BodyPublishers.noBody()) else b.GET()
      metadata.get("last-modified").flatMap(_.headOption)
        .foreach(v => b.header("If-Modified-Since", v))
      // cookies remembered from earlier responses (CookieConverter
      // semantics: domain/path/expiry/secure gates against this URL)
      if (useCookies)
        metadata.get("set-cookie").filter(_.nonEmpty)
          .flatMap(scs => Cookies.header(scs, url,
            originHost = metadata.get("set-cookie.origin").flatMap(_.headOption)))
          .foreach(v => b.header("Cookie", v))
      extraHeaders.foreach { case (k, v) => b.header(k, v) }
      val t0 = System.nanoTime()
      val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
      val ms = (System.nanoTime() - t0) / 1000000
      val body = resp.body()
      val trimmed = if (body.length > contentLimit) body.take(contentLimit) else body
      val hdrs = resp.headers().map().asScala.map { case (k, v) => k -> v.asScala.toSeq }.toMap
      ProtocolResponse(trimmed, resp.statusCode(),
        hdrs + ("fetch.loadingTime" -> Seq(ms.toString)))
    } catch {
      case _: Exception => ProtocolResponse(Array.empty, -1, Map.empty)
    }
  }
}

/** Routes each URL to one of several protocols by scheme — the simple
  * core of `DelegatorProtocol` (`core/.../protocol/DelegatorProtocol
  * .java:70`). */
final class ProtocolFactory(http: Protocol = new HttpProtocol()) extends Serializable {
  def forUrl(url: String): Protocol =
    if (url.startsWith("file:")) FileProtocol else http
  def fetch(url: String, metadata: Map[String, Seq[String]]): ProtocolResponse =
    forUrl(url).fetch(url, metadata)
}

/** Full `DelegatorProtocol` semantics (`core/.../protocol/
  * DelegatorProtocol.java:70`): an ordered rule list, each pairing a
  * protocol with optional gates — ALL configured metadata key=value
  * pairs must be present and a URL regex (if any) must find a match.
  * First matching rule wins; a rule with no gates is the catch-all.
  * Useful for e.g. routing `js=true`-tagged URLs to a rendering
  * protocol while everything else takes the plain HTTP path. */
object DelegatorProtocol {
  final case class Rule(protocol: Protocol,
                        urlPattern: Option[scala.util.matching.Regex] = None,
                        metadataEquals: Map[String, String] = Map.empty)
      extends Serializable {
    def matches(url: String, metadata: Map[String, Seq[String]]): Boolean =
      urlPattern.forall(_.findFirstIn(url).isDefined) &&
        metadataEquals.forall { case (k, v) => metadata.get(k).exists(_.contains(v)) }
  }
}

final class DelegatorProtocol(rules: Seq[DelegatorProtocol.Rule]) extends Protocol {
  require(rules.nonEmpty, "DelegatorProtocol needs at least one rule")
  def fetch(url: String, metadata: Map[String, Seq[String]]): ProtocolResponse =
    rules.find(_.matches(url, metadata)) match {
      case Some(r) => r.protocol.fetch(url, metadata)
      case None    => ProtocolResponse(Array.empty, -1,
        Map("fetch.error" -> Seq("no protocol rule matched")))
    }
}
