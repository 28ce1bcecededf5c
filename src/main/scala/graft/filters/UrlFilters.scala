package graft.filters

import java.util.Locale
import scala.util.matching.Regex

import graft.functions.Urls

/** The URL filter/normalizer chain.
  *
  * Chain semantics follow the reference (`core/.../filtering/URLFilters
  * .java:109-126`): an ordered fold where each filter maps
  * `url -> Some(url') | None` and `None` short-circuits (drop). Applied at
  * every outlink emission (`StatusEmitterBolt.java:85-113`) and standalone
  * on the status stream (`URLFilterBolt.java:65-95`).
  *
  * Each filter is a pure function `(targetUrl, sourceUrl, metadata) =>
  * Option[String]`, so the whole chain compiles to ONE composed Scala
  * function usable as a single UDF — one function call per row, no
  * UDF-soup. The SQL-expressible members (length cap, regex rules) are
  * additionally expressible as column predicates for pushdown-friendly
  * batch paths.
  */
trait UrlFilter extends Serializable {
  def apply(url: String, sourceUrl: Option[String], md: Map[String, Seq[String]]): Option[String]
}

/** Drop overly long URLs / repeated path elements
  * (`core/.../filtering/basic/BasicURLFilter.java:29`). */
final class BasicUrlFilter(maxLength: Int = 1024, maxPathRepetition: Int = 3) extends UrlFilter {
  def apply(url: String, src: Option[String], md: Map[String, Seq[String]]): Option[String] = {
    if (url.length > maxLength) return None
    if (maxPathRepetition > 0) {
      val pathStart = url.indexOf('/', url.indexOf("://") + 3)
      if (pathStart > 0) {
        val segs = url.substring(pathStart).takeWhile(c => c != '?' && c != '#').split('/').filter(_.nonEmpty)
        val counts = segs.groupBy(identity).view.mapValues(_.length)
        if (counts.exists(_._2 > maxPathRepetition)) return None
      }
    }
    Some(url)
  }
}

/** Drop self-links (`filtering/basic/SelfURLFilter.java:28`). */
final class SelfUrlFilter extends UrlFilter {
  def apply(url: String, src: Option[String], md: Map[String, Seq[String]]): Option[String] =
    if (src.exists(_.equalsIgnoreCase(url))) None else Some(url)
}

/** Drop when depth metadata exceeds the max; per-URL override via
  * `max.depth` (`filtering/depth/MaxDepthFilter.java:35-…`). */
final class MaxDepthFilter(maxDepth: Int = -1) extends UrlFilter {
  def apply(url: String, src: Option[String], md: Map[String, Seq[String]]): Option[String] = {
    val depth = md.get("depth").flatMap(_.headOption).flatMap(_.toIntOption).getOrElse(0)
    val limit = md.get("max.depth").flatMap(_.headOption).flatMap(_.toIntOption).getOrElse(maxDepth)
    if (limit >= 0 && depth >= limit) None else Some(url)
  }
}

/** Keep only same host / same paid-level domain as the source
  * (`filtering/host/HostURLFilter.java:41-…`). */
final class HostUrlFilter(ignoreOutsideHost: Boolean = false, ignoreOutsideDomain: Boolean = true)
    extends UrlFilter {
  def apply(url: String, src: Option[String], md: Map[String, Seq[String]]): Option[String] =
    src match {
      case None => Some(url)
      case Some(s) =>
        (Urls.host(url), Urls.host(s)) match {
          case (Some(th), Some(sh)) =>
            if (ignoreOutsideHost && th != sh) None
            else if (ignoreOutsideDomain && Urls.paidLevelDomain(th) != Urls.paidLevelDomain(sh)) None
            else Some(url)
          case _ => None
        }
    }
}

/** Drop unless metadata contains a configured k=v
  * (`filtering/metadata/MetadataFilter.java:33-…`). */
final class MetadataFilter(required: Map[String, String]) extends UrlFilter {
  def apply(url: String, src: Option[String], md: Map[String, Seq[String]]): Option[String] =
    if (required.forall { case (k, v) => md.get(k).exists(_.contains(v)) }) Some(url) else None
}

/** SitemapFilter (`filtering/sitemap/SitemapFilter.java:47,63-…`): once
  * sitemaps have been discovered for a host, discoveries that did NOT
  * come from sitemap parsing are dropped — sitemap coverage is
  * authoritative. The found flag (`sitemap.found=true`) is frontier
  * state the operator propagates into outlink metadata (e.g. via
  * MetadataTransfer) once a host's sitemap has been fetched; sitemap-
  * derived discoveries carry `sitemap.source=true` (every urlset/index
  * entry — ParseStage tags them) or `isSitemap=true` (sub-sitemaps)
  * and always pass. */
final class SitemapUrlFilter(foundKey: String = "sitemap.found") extends UrlFilter {
  def apply(url: String, src: Option[String], md: Map[String, Seq[String]]): Option[String] = {
    val found = md.get(foundKey).exists(_.contains("true"))
    val fromSitemap = md.get("sitemap.source").exists(_.contains("true")) ||
      md.get("isSitemap").exists(_.contains("true"))
    if (found && !fromSitemap) None else Some(url)
  }
}

/** Nutch-style ordered `+`/`-` regex rules; first match wins, no match =>
  * drop (`filtering/regex/RegexURLFilterBase.java:152`). */
final class RegexUrlFilter(rules: Seq[(Boolean, Regex)]) extends UrlFilter {
  def apply(url: String, src: Option[String], md: Map[String, Seq[String]]): Option[String] = {
    for ((accept, re) <- rules)
      if (re.findFirstIn(url).isDefined) return if (accept) Some(url) else None
    None
  }
}

object RegexUrlFilter {
  /** Parse the reference's `default-regex-filters.txt` line format:
    * lines starting with '+' accept, '-' reject, '#' comment. */
  def parse(lines: Seq[String]): RegexUrlFilter = {
    val rules = lines.flatMap { l =>
      val t = l.trim
      if (t.isEmpty || t.startsWith("#")) None
      else if (t.startsWith("+")) Some((true, t.drop(1).trim.r))
      else if (t.startsWith("-")) Some((false, t.drop(1).trim.r))
      else None
    }
    new RegexUrlFilter(rules)
  }

  /** Reference's default rules (conceptually `core/src/main/resources/
    * default-regex-filters.txt`): drop non-http protocols, common binary
    * extensions and infinite-loop query patterns; accept the rest. */
  val default: RegexUrlFilter = parse(Seq(
    "-(?i)\\.(?:gif|jpg|jpeg|png|ico|css|sit|eps|wmf|zip|ppt|mpg|gz|rpm|tgz|mov|exe|bmp|js)$",
    "-[?*!@=]",
    "+^https?://"
  ))
}

/** Scoped Allow/Deny rules: host: / domain: / metadata: / GLOBAL scopes,
  * tried in that order (`filtering/regex/FastURLFilter.java:44-69,
  * 201-249`). Reference semantics (the CODE, which its javadoc
  * understates): within a scope the FIRST matching rule decides that
  * scope — a Deny match removes the URL and ends evaluation; an Allow
  * match (or no match) means "this scope does not deny" and evaluation
  * CONTINUES to later scopes (`checkScope` returns true only for DENY —
  * `FastURLFilter.java:252-268`). Domain rules are tried against EVERY
  * suffix of the hostname, rightmost component first
  * (`FastURLFilter.java:215-222`); metadata scopes key on parent-URL
  * metadata k=v with the value compared case-insensitively, evaluated
  * after host/domain and before GLOBAL (`FastURLFilter.java:226-243`).
  *
  * Haystack semantics (`FastURLFilter.java:253-262`): `*Path` rules
  * match against `URL.getPath()` ONLY; `*PathQuery` rules match against
  * path + "?" + query, the "?"+query appended only when a query is
  * present. The fragment is never part of either haystack, and a URL
  * with no path component yields the empty string (java.net.URL
  * behavior), not "/". A URL java.net.URL cannot parse is removed
  * (`FastURLFilter.java:172-176` — MalformedURLException => null).
  */
final class FastUrlFilter(
    hostRules: Map[String, Seq[FastUrlFilter.Rule]],
    domainRules: Map[String, Seq[FastUrlFilter.Rule]],
    globalRules: Seq[FastUrlFilter.Rule],
    metadataRules: Seq[FastUrlFilter.MdScope] = Nil) extends UrlFilter {
  import FastUrlFilter.Rule

  /** True iff the scope's first matching rule is a deny; each rule picks
    * its own haystack by verb (`FastURLFilter.java:253-266`). */
  private def denies(rules: Seq[Rule], path: String, pathQuery: String): Boolean =
    rules.collectFirst {
      case r if r.re.findFirstIn(if (r.pathOnly) path else pathQuery).isDefined => !r.allow
    }.getOrElse(false)

  def apply(url: String, src: Option[String], md: Map[String, Seq[String]]): Option[String] = {
    val u =
      try new java.net.URL(url)
      catch { case _: java.net.MalformedURLException => return None }
    val h = u.getHost
    val path = u.getPath // "" for a pathless URL; fragment excluded
    val pathQuery = if (u.getQuery == null) path else path + "?" + u.getQuery
    if (hostRules.get(h).exists(denies(_, path, pathQuery))) return None
    // domain scopes: every hostname suffix, rightmost component first
    // ("com", "example.com", "a.example.com" for host a.example.com)
    val parts = h.split("\\.")
    var suffix = ""
    var i = parts.length - 1
    while (i >= 0) {
      suffix = if (suffix.isEmpty) parts(i) else parts(i) + "." + suffix
      if (domainRules.get(suffix).exists(denies(_, path, pathQuery))) return None
      i -= 1
    }
    // metadata scopes (after host/domain, before GLOBAL), keyed on
    // parent-URL metadata k=v; the value compares case-insensitively.
    // A value-less scope (no '=' in the constraint) never matches —
    // reference behavior (MDScope.value null, equalsIgnoreCase false).
    for (sc <- metadataRules)
      if (sc.value != null &&
          md.getOrElse(sc.key, Nil).exists(_.equalsIgnoreCase(sc.value)) &&
          denies(sc.rules, path, pathQuery)) return None
    if (denies(globalRules, path, pathQuery)) None else Some(url)
  }
}

object FastUrlFilter {
  /** One scoped rule. The reference's four verbs
    * (`FastURLFilter.java:317-324`): Allow/Deny crossed with Path (match
    * `getPath()` only) vs PathQuery (match path+"?"+query). */
  final case class Rule(allow: Boolean, pathOnly: Boolean, re: Regex)

  // verb prefixes in the reference's enum order; matched case-insensitively
  // with a trailing space, pattern = rest of the line trimmed
  // (`FastURLFilter.java:329-346` — Rule(String line))
  private val verbs = Seq(
    ("denypath ", false, true),
    ("denypathquery ", false, false),
    ("allowpath ", true, true),
    ("allowpathquery ", true, false))

  /** Parse a reference pattern line, e.g. `"DenyPathQuery \\.jpg"`. The
    * reference leaves an unknown verb as a null-typed rule that NPEs at
    * filter time; we fail fast at parse time instead. */
  def rule(line: String): Rule = {
    val lc = line.toLowerCase(java.util.Locale.ROOT)
    verbs.collectFirst {
      case (p, allow, pathOnly) if lc.startsWith(p) =>
        Rule(allow, pathOnly, line.substring(p.length).trim.r)
    }.getOrElse(throw new IllegalArgumentException(
      s"invalid FastURLFilter rule (expected Allow|Deny + Path|PathQuery verb): $line"))
  }

  /** A `metadata:key=value` scope (`FastURLFilter.java` MDScope). */
  final case class MdScope(key: String, value: String, rules: Seq[Rule])
}

/** sed-style regex substitutions (`filtering/regex/RegexURLNormalizer
  * .java:58`): every rule applied in order, repeatedly until fixpoint
  * (bounded). */
final class RegexUrlNormalizer(rules: Seq[(Regex, String)], maxPasses: Int = 4) extends UrlFilter {
  def apply(url: String, src: Option[String], md: Map[String, Seq[String]]): Option[String] = {
    var cur = url
    var pass = 0
    var changed = true
    while (changed && pass < maxPasses) {
      val next = rules.foldLeft(cur) { case (u, (re, sub)) => re.replaceAllIn(u, sub) }
      changed = next != cur
      cur = next
      pass += 1
    }
    if (cur.isEmpty) None else Some(cur)
  }
}

/** BasicURLNormalizer as a chain member. */
final class BasicUrlNormalizer(removeParams: Set[String] = Urls.defaultRemovedParams) extends UrlFilter {
  def apply(url: String, src: Option[String], md: Map[String, Seq[String]]): Option[String] =
    Urls.normalize(url, removeParams)
}

/** The composed chain — ordered fold with None short-circuit
  * (`URLFilters.java:109-126`). */
final class UrlFilterChain(filters: Seq[UrlFilter]) extends Serializable {
  def apply(url: String, sourceUrl: Option[String] = None,
            md: Map[String, Seq[String]] = Map.empty): Option[String] = {
    var cur = url
    for (f <- filters) {
      f(cur, sourceUrl, md) match {
        case Some(next) => cur = next
        case None       => return None
      }
    }
    Some(cur)
  }
}

object UrlFilterChain {
  /** Default chain mirroring the archetype's `urlfilters.json`: normalize
    * first, then cheap predicates, then regex rules. */
  def default(maxDepth: Int = -1): UrlFilterChain = new UrlFilterChain(Seq(
    new BasicUrlNormalizer(),
    new BasicUrlFilter(),
    new SelfUrlFilter(),
    new MaxDepthFilter(maxDepth),
    RegexUrlFilter.default
  ))
}
