package graft.parse

import java.nio.charset.{Charset, StandardCharsets}
import java.util.Locale
import scala.util.Try

/** Charset identification — `CharsetIdentification`
  * (`core/.../util/CharsetIdentification.java:39`): priority order is
  * BOM, then Content-Type header, then `<meta charset>` / http-equiv in
  * the first bytes, then UTF-8 default (the ICU4J statistical pass is
  * out of scope — UTF-8-default covers the modern web).
  */
object Charsets {

  private val metaCharsetRe =
    "(?i)<meta[^>]{0,200}charset\\s*=\\s*[\"']?([A-Za-z0-9_-]+)".r

  def fromBom(bytes: Array[Byte]): Option[Charset] =
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb &&
        (bytes(2) & 0xff) == 0xbf) Some(StandardCharsets.UTF_8)
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      Some(StandardCharsets.UTF_16BE)
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      Some(StandardCharsets.UTF_16LE)
    else None

  def fromContentType(contentType: String): Option[Charset] =
    Option(contentType).flatMap { ct =>
      val i = ct.toLowerCase(Locale.ROOT).indexOf("charset=")
      if (i < 0) None
      else Try(Charset.forName(ct.substring(i + 8)
        .takeWhile(c => c != ';' && c != ' ')
        .trim.stripPrefix("\"").stripSuffix("\"").stripPrefix("'").stripSuffix("'")))
        .toOption // RFC allows charset=\"utf-8\" — quotes are not part of the name
    }

  def fromMeta(head: String): Option[Charset] =
    metaCharsetRe.findFirstMatchIn(head)
      .flatMap(m => Try(Charset.forName(m.group(1))).toOption)

  /** Detect and decode: BOM > header > meta tag > UTF-8. */
  def decode(bytes: Array[Byte], contentType: Option[String]): String = {
    val cs = fromBom(bytes)
      .orElse(contentType.flatMap(fromContentType))
      .orElse(fromMeta(new String(bytes.take(1024), StandardCharsets.ISO_8859_1)))
      .getOrElse(StandardCharsets.UTF_8)
    val skip = if (fromBom(bytes).contains(StandardCharsets.UTF_8)) 3
               else if (fromBom(bytes).isDefined) 2 else 0
    new String(bytes, skip, bytes.length - skip, cs)
  }
}
