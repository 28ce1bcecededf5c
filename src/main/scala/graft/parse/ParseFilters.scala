package graft.parse

import java.io.ByteArrayInputStream
import java.util.Locale
import javax.xml.parsers.DocumentBuilderFactory
import javax.xml.xpath.{XPathConstants, XPathFactory}

import scala.util.Try
import scala.util.matching.Regex

import com.fasterxml.jackson.databind.ObjectMapper

import graft.functions.Urls

/** Parse-filter chain — per-document enrichment (SURVEY §2.6,
  * `core/.../parse/ParseFilters.java`): each filter maps a parsed doc to
  * added metadata (and possibly extra outlinks). Ordered fold, like the
  * URL filter chain but enriching instead of dropping.
  *
  * Runs inside the parse flatMap (map-only, executor-local); filters are
  * pure functions of (url, rawBytes, parsedDoc).
  */
final case class ParseContext(
    url: String,
    content: Array[Byte],
    html: HtmlParser.ParsedHtml,
    metadata: Map[String, Seq[String]],
    extraOutlinks: Seq[String] = Nil,
    // the charset-aware decode ParseStage already performed — filters
    // must use this, not re-decode the bytes as hard-coded UTF-8 (a
    // windows-1251 page would yield mojibake JSON-LD / link urls)
    decoded: String = "") {
  /** Decoded text: the pre-computed decode, or a UTF-8 fallback for
    * contexts built directly in tests. */
  def decodedText: String =
    if (decoded.nonEmpty) decoded
    else if (content != null && content.nonEmpty) new String(content, "UTF-8")
    else ""
}

trait ParseFilter extends Serializable {
  def apply(ctx: ParseContext): ParseContext
}

/** Evaluate XPath expressions over the DOM, store results in metadata —
  * `XPathFilter` (`core/.../parse/filter/XPathFilter.java:55`). Uses the
  * JDK DOM+XPath stack; HTML must be close enough to XML (the reference
  * uses a DOM produced by the HTML parser — here we best-effort parse
  * and silently skip on failure, which filters must tolerate). */
final class XPathParseFilter(exprs: Map[String, String]) extends ParseFilter {
  @transient private lazy val xpath = XPathFactory.newInstance().newXPath()
  @transient private lazy val builderFactory = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    f
  }

  def apply(ctx: ParseContext): ParseContext = {
    val added = Try {
      val doc = builderFactory.newDocumentBuilder()
        .parse(new ByteArrayInputStream(ctx.content))
      exprs.flatMap { case (key, expr) =>
        val nodes = xpath.compile(expr)
          .evaluate(doc, XPathConstants.NODESET)
          .asInstanceOf[org.w3c.dom.NodeList]
        val values = (0 until nodes.getLength).map(i => nodes.item(i).getTextContent.trim)
          .filter(_.nonEmpty)
        if (values.isEmpty) None else Some(key -> values)
      }
    }.getOrElse(Map.empty)
    ctx.copy(metadata = ctx.metadata ++ added)
  }
}

/** Extract JSON-LD blocks (`script type=application/ld+json`) into
  * metadata — `LDJsonParseFilter` (`parse/filter/LDJsonParseFilter
  * .java:41`). Configured as jsonPath-ish `key -> field` of the
  * top-level object. */
final class LdJsonParseFilter(fields: Map[String, String]) extends ParseFilter {
  @transient private lazy val mapper = new ObjectMapper()
  private val blockRe: Regex =
    "(?is)<script[^>]*type\\s*=\\s*[\"']application/ld\\+json[\"'][^>]*>(.*?)</script>".r

  def apply(ctx: ParseContext): ParseContext = {
    val html = ctx.decodedText
    val added = blockRe.findAllMatchIn(html).flatMap { m =>
      Try {
        val node = mapper.readTree(m.group(1))
        fields.flatMap { case (mdKey, jsonField) =>
          val v = node.path(jsonField)
          if (v.isMissingNode || v.isNull) None
          else Some(mdKey -> Seq(if (v.isTextual) v.asText() else v.toString))
        }
      }.getOrElse(Map.empty)
    }.toMap
    ctx.copy(metadata = ctx.metadata ++ added)
  }
}

/** Extra outlinks from XPath patterns (img/src etc.) — `LinkParseFilter`
  * (`parse/filter/LinkParseFilter.java:53`); here regex-driven attribute
  * harvesting resolved against the page URL. */
final class LinkParseFilter(attrRes: Seq[Regex]) extends ParseFilter {
  def apply(ctx: ParseContext): ParseContext = {
    val html = ctx.decodedText
    val found = attrRes.flatMap(_.findAllMatchIn(html).map(_.group(1)))
      .flatMap(h => Urls.resolve(ctx.url, h))
    ctx.copy(extraOutlinks = (ctx.extraOutlinks ++ found).distinct)
  }
}

object LinkParseFilter {
  /** img/src + link/href harvesting. */
  def default: LinkParseFilter = new LinkParseFilter(Seq(
    "(?i)<img\\b[^>]*\\bsrc\\s*=\\s*[\"']([^\"']+)[\"']".r,
    "(?i)<link\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']+)[\"']".r))
}

/** Page signature md5(text | content | url) with optional copy of the
  * previous signature — `MD5SignatureParseFilter`
  * (`parse/filter/MD5SignatureParseFilter.java:48`). */
final class Md5SignatureParseFilter(useText: Boolean = true,
                                    keyName: String = "signature",
                                    keyNameCopy: Option[String] = Some("signatureOld"))
    extends ParseFilter {
  def apply(ctx: ParseContext): ParseContext = {
    val basis =
      if (useText && ctx.html.text.nonEmpty) ctx.html.text
      else if (ctx.content.nonEmpty) ctx.decodedText
      else ctx.url
    val copied = for {
      copyKey <- keyNameCopy.toSeq
      prev <- ctx.metadata.get(keyName).toSeq
    } yield copyKey -> prev
    ctx.copy(metadata = ctx.metadata ++ copied + (keyName -> Seq(Urls.md5Hex(basis))))
  }
}

/** Tag documents by URL include/exclude regex sets — `CollectionTagger`
  * (`parse/filter/CollectionTagger.java:67`, JSON format lines 50-66). */
final class CollectionTagger(collections: Seq[CollectionTagger.Collection],
                             key: String = "collections") extends ParseFilter {
  def apply(ctx: ParseContext): ParseContext = {
    val tags = collections.collect {
      case c if c.includes.exists(_.findFirstIn(ctx.url).isDefined) &&
                !c.excludes.exists(_.findFirstIn(ctx.url).isDefined) => c.name
    }
    if (tags.isEmpty) ctx
    else ctx.copy(metadata = ctx.metadata + (key -> tags))
  }
}
object CollectionTagger {
  final case class Collection(name: String, includes: Seq[Regex], excludes: Seq[Regex] = Nil)
}

/** Add host + paid-level-domain metadata — `DomainParseFilter`
  * (`parse/filter/DomainParseFilter.java:31`). */
final class DomainParseFilter extends ParseFilter {
  def apply(ctx: ParseContext): ParseContext =
    Urls.host(ctx.url) match {
      case Some(h) => ctx.copy(metadata = ctx.metadata +
        ("host" -> Seq(h)) + ("domain" -> Seq(Urls.paidLevelDomain(h))))
      case None => ctx
    }
}

/** Split a CSV metadata value into multi-values —
  * `CommaSeparatedToMultivaluedMetadata` (`parse/filter/
  * CommaSeparatedToMultivaluedMetadata.java:34`). */
final class CsvToMultivalued(keys: Seq[String]) extends ParseFilter {
  def apply(ctx: ParseContext): ParseContext = {
    val updated = keys.foldLeft(ctx.metadata) { (md, k) =>
      md.get(k) match {
        case Some(vs) => md + (k -> vs.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
        case None => md
      }
    }
    ctx.copy(metadata = updated)
  }
}

/** Mime → coarse format tag — `MimeTypeNormalization`
  * (`parse/filter/MimeTypeNormalization.java:31`). */
final class MimeTypeNormalization(key: String = "format") extends ParseFilter {
  private val mapping = Seq(
    "html" -> "html", "xhtml" -> "html", "pdf" -> "pdf", "msword" -> "doc",
    "officedocument" -> "doc", "rss" -> "feed", "atom" -> "feed",
    "xml" -> "xml", "json" -> "json", "image/" -> "image", "text/plain" -> "text")
  def apply(ctx: ParseContext): ParseContext = {
    val mime = ctx.metadata.get("parse.Content-Type").flatMap(_.headOption)
      .getOrElse("").toLowerCase(Locale.ROOT)
    val tag = mapping.collectFirst { case (m, t) if mime.contains(m) => t }.getOrElse("other")
    ctx.copy(metadata = ctx.metadata + (key -> Seq(tag)))
  }
}

/** Language ID over extracted text — LanguageID parse filter
  * (`external/langid/.../LanguageID.java:54`: n-gram detector, keep the
  * prediction only above a probability threshold). Uses the shared
  * trigram-profile + script-range model ([[graft.functions.LangIdOps]];
  * inventory in [[graft.functions.LangProfiles]]); no tag when the
  * detector says `und` or confidence is below `minConf`. */
final class LanguageIdParseFilter(key: String = "lang", minConf: Double = 0.0)
    extends ParseFilter {
  def apply(ctx: ParseContext): ParseContext = {
    val (lang, conf) = graft.functions.LangIdOps.detect(ctx.html.text)
    if (lang == "und" || conf < minConf) ctx
    else ctx.copy(metadata = ctx.metadata + (key -> Seq(lang)))
  }
}

/** Dump each parsed document's representation to a local file — the
  * reference's `DebugParseFilter` (`core/.../parse/filter/
  * DebugParseFilter.java:33`: serializes the DOM to a dump file).
  * Debug-only by design: executor-local append, one line per doc
  * (url, title, text length, link count, metadata keys). Never part
  * of a default chain. */
final class DebugParseFilter(path: String) extends ParseFilter {
  def apply(ctx: ParseContext): ParseContext = {
    val line = s"${ctx.url}\ttitle=${ctx.html.title.getOrElse("")}" +
      s"\ttext_len=${ctx.html.text.length}\tlinks=${ctx.html.links.size}" +
      s"\tmd=${ctx.metadata.keys.toSeq.sorted.mkString(",")}\n"
    // append, executor-local (same file semantics as the reference's
    // OutputStream member); failures must never kill the parse
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), line,
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Exception => () }
    ctx
  }
}

/** Ordered enrichment fold (`ParseFilters.filter`). */
final class ParseFilterChain(filters: Seq[ParseFilter]) extends Serializable {
  def apply(ctx: ParseContext): ParseContext = filters.foldLeft(ctx)((c, f) => f(c))
}
object ParseFilterChain {
  def default: ParseFilterChain = new ParseFilterChain(Seq(
    new Md5SignatureParseFilter(), new DomainParseFilter(), new MimeTypeNormalization()))
}
