package graft.parse

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

import scala.collection.mutable.ArrayBuffer

/** Binary-document parsing — the Tika branch of the reference
  * (`external/tika/.../ParserBolt.java:152-354`): non-HTML content is
  * turned into text + outlinks + `parse.*` metadata and re-joins the
  * same downstream flow as HTML docs. The container has no Tika, so
  * this is a dependency-light extractor for the formats the tests and
  * pipeline exercise:
  *
  *   - PDF: object/stream scan, FlateDecode via `java.util.zip`,
  *     BT..ET content-stream text operators (Tj/TJ/'/"), /URI link
  *     annotations, /Title metadata, page count.
  *   - RTF: group/control-word walk (`\par`/`\line`/`\tab`, `\'hh`,
  *     `\uN`), destination groups skipped, `{\info{\title ...}}`.
  *   - Plain text (text mimes and lookalikes): charset-aware decode.
  *
  * Anything else is a parse failure, which the parse stage converts to
  * an ERROR status row exactly like `ParserBolt.handleException`
  * (STATUS_ERROR_SOURCE / STATUS_ERROR_MESSAGE metadata).
  *
  * Everything here is executor-local, allocation-bounded by the fetch
  * stage's content limit, and runs inside the parse `mapPartitions` —
  * map-only at any scale.
  */
object BinaryParser {

  final case class BinaryParse(
      text: String,
      title: Option[String],
      outlinks: Seq[String],
      /** extracted doc properties, already `parse.`-prefixed by caller */
      metadata: Map[String, Seq[String]])

  // ---- sniffing ------------------------------------------------------

  private def startsWith(b: Array[Byte], p: String): Boolean =
    b.length >= p.length && p.indices.forall(i => b(i) == p.charAt(i).toByte)

  def isPdf(content: Array[Byte]): Boolean = startsWith(content, "%PDF-")
  def isRtf(content: Array[Byte]): Boolean = startsWith(content, "{\\rtf")
  /** ZIP local-file-header magic — DOCX/ODT are ZIP containers. */
  def isZip(content: Array[Byte]): Boolean =
    content.length >= 4 && content(0) == 'P' && content(1) == 'K' &&
      content(2) == 3 && content(3) == 4

  /** Does the mime type (or the content's magic bytes) route to this
    * parser rather than the HTML one? Mirrors the RedirectionBolt
    * shunt (`external/tika/.../RedirectionBolt.java:63-76`): html goes
    * to JSoup, everything else to Tika. */
  def supports(mime: String, content: Array[Byte]): Boolean = {
    val m = mime.toLowerCase
    if (m.contains("html") || m.contains("xhtml")) false
    else isPdf(content) || isRtf(content) || isZip(content) ||
      Ole2.isOle2(content) || isImage(content) ||
      m.contains("pdf") || m.contains("rtf") || m.startsWith("text/") ||
      m.startsWith("image/") ||
      m.contains("officedocument") || m.contains("opendocument") ||
      m.contains("msword") || m.contains("ms-excel") || m.contains("ms-powerpoint")
  }

  /** PNG/GIF/BMP/JPEG magic + plausible header (O(1) sniff). */
  def isImage(content: Array[Byte]): Boolean =
    graft.multimodal.ImageHeaders.parseMeta(content).isDefined

  /** Image payloads extract no text; the parse yields the typed
    * metadata a training-pipeline filter consumes — `image.mime` /
    * `image.width` / `image.height` from the real header bytes
    * ([[graft.multimodal.ImageHeaders]]) — the same facts the
    * reference's Tika path emits for any mimetype it detects
    * (`external/tika/.../ParserBolt.java:74`). Codecs beyond the four
    * public header layouts (e.g. webp) fall through to the
    * declared-mime mismatch error like every other unparseable
    * binary. */
  def parseImage(content: Array[Byte]): Either[String, BinaryParse] =
    graft.multimodal.ImageHeaders.parseMeta(content) match {
      case Some((mime, w, h)) =>
        Right(BinaryParse("", None, Nil, Map(
          "format" -> Seq("image"),
          "image.mime" -> Seq(mime),
          "image.width" -> Seq(w.toString),
          "image.height" -> Seq(h.toString))))
      case None => Left("unrecognized image payload")
    }

  /** Dispatch on magic bytes first (the server's Content-Type lies
    * often enough that Tika sniffs too), then the declared mime. */
  def parse(content: Array[Byte], mime: String,
            declaredCharset: Option[String] = None): Either[String, BinaryParse] = {
    val m = mime.toLowerCase
    if (content == null || content.isEmpty) Left("empty content")
    else if (isPdf(content)) parsePdf(content)
    else if (isRtf(content)) parseRtf(content)
    else if (isZip(content)) parseZipContainer(content)
    else if (Ole2.isOle2(content)) Ole2.parse(content)
    else if (isImage(content)) parseImage(content)
    else if (m.contains("pdf") || m.contains("rtf") || m.contains("officedocument") ||
             m.contains("opendocument") || m.contains("msword") ||
             m.contains("ms-excel") || m.contains("ms-powerpoint") ||
             m.startsWith("image/"))
      Left("content did not match declared type " + m)
    else if (m.startsWith("text/") || looksTextual(content))
      Right(BinaryParse(Charsets.decode(content, declaredCharset).trim, None, Nil,
        Map("format" -> Seq("text"))))
    else Left("unsupported content type " + (if (m.isEmpty) "(unknown)" else m))
  }

  /** Control-byte ratio test for "is this actually text". */
  private[parse] def looksTextual(b: Array[Byte]): Boolean = {
    if (b.isEmpty) return false
    var ctrl = 0
    val n = math.min(b.length, 4096)
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x09 || (c > 0x0d && c < 0x20)) ctrl += 1
      i += 1
    }
    ctrl.toDouble / n < 0.02
  }

  // ---- PDF -----------------------------------------------------------

  def parsePdf(content: Array[Byte]): Either[String, BinaryParse] = {
    try {
      val streams = pdfStreams(content)
      val text = streams.iterator
        .map(extractContentText)
        .filter(_.nonEmpty)
        .mkString("\n")
      // raw (non-stream) regions: annotations, info dict, page objects
      val raw = new String(content, StandardCharsets.ISO_8859_1)
      val links = uriAnnotations(raw, content)
      val title = pdfTitle(raw, content)
      val pages = "/Type\\s*/Page[^s]".r.findAllIn(raw).length
      val md = Map("format" -> Seq("pdf")) ++
        (if (pages > 0) Map("pages" -> Seq(pages.toString)) else Map.empty)
      Right(BinaryParse(text, title, links, md))
    } catch {
      case e: Exception => Left("pdf parse error: " + e.getMessage)
    }
  }

  /** All stream payloads, FlateDecode'd when the enclosing dict says
    * so. The scan keys off stream/endstream keywords rather than the
    * xref table — resilient to the truncated/garbled PDFs a crawler
    * actually meets (Tika does the same recovery scan). */
  private val streamKwRe = ">>\\s*stream(?:\r\n|\n|\r)".r
  private val lengthRe = "/Length\\s+(\\d+)(?![\\s]*0\\s+R)".r

  /** Forward scan for `>> stream` keywords (the payload itself may
    * contain the bytes s-t-r-e-a-m — a backward search from
    * `endstream` would land inside it). The payload extent comes from
    * a literal /Length when the dict has one, else the next
    * `endstream`. */
  private def pdfStreams(content: Array[Byte]): Seq[Array[Byte]] = {
    val raw = new String(content, StandardCharsets.ISO_8859_1)
    val out = ArrayBuffer.empty[Array[Byte]]
    for (m <- streamKwRe.findAllMatchIn(raw)) {
      val s = m.end // first payload byte
      // enclosing dict: walk back over balanced << >> from the >> that
      // ends at the keyword (nested /DecodeParms dicts must not fool
      // the search for the opening <<)
      val dictEnd = m.start + 2
      var depth = 1
      var i = m.start
      while (i > 0 && depth > 0) {
        i -= 1
        if (i >= 1 && raw.charAt(i) == '<' && raw.charAt(i - 1) == '<') { depth -= 1; i -= 1 }
        else if (i >= 1 && raw.charAt(i) == '>' && raw.charAt(i - 1) == '>') { depth += 1; i -= 1 }
      }
      val dict = raw.substring(math.max(i, 0), dictEnd)
      val e = lengthRe.findFirstMatchIn(dict).map(_.group(1).toInt) match {
        case Some(len) if s + len <= raw.length => s + len
        case _ =>
          // no usable /Length: trust the delimiter, trimming its EOL
          var e0 = raw.indexOf("endstream", s)
          if (e0 < 0) e0 = raw.length
          if (e0 > s && raw.charAt(e0 - 1) == '\n') e0 -= 1
          if (e0 > s && raw.charAt(e0 - 1) == '\r') e0 -= 1
          e0
      }
      if (e > s) {
        val data = java.util.Arrays.copyOfRange(content, s, e)
        val payload =
          if (dict.contains("/FlateDecode")) inflate(data) else Some(data)
        payload.foreach(out += _)
      }
    }
    out.toSeq
  }

  private def inflate(data: Array[Byte],
                      maxOut: Int = 64 << 20): Option[Array[Byte]] = {
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val buf = new java.io.ByteArrayOutputStream(data.length * 4)
      val chunk = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(chunk)
        if (n > 0) {
          // deflate-bomb guard, same bound as the ZIP container walk:
          // the fetch limit caps the COMPRESSED size, this caps the
          // inflated side (~1000:1 max ratio makes 1MB → 1GB possible)
          if (buf.size() + n > maxOut) return None
          buf.write(chunk, 0, n)
        } else if (n == 0 && inf.needsDictionary()) return None
      }
      inf.end()
      Some(buf.toByteArray)
    } catch { case _: Exception => None }
  }

  /** Text-showing operators from a decoded content stream. Strings
    * shown by Tj / ' / " / TJ are concatenated; Td/TD/T* line moves
    * between shows become newlines (BodyContentHandler-ish layout). */
  private[parse] def extractContentText(stream: Array[Byte]): String = {
    val s = stream
    val sb = new StringBuilder
    val operands = ArrayBuffer.empty[String] // string operands since last operator
    var inText = false
    var pendingNewline = false
    var i = 0

    def emit(str: String): Unit = {
      if (pendingNewline && sb.nonEmpty) sb.append('\n')
      pendingNewline = false
      sb.append(str)
    }

    while (i < s.length) {
      val c = s(i).toChar
      c match {
        case '(' =>
          val (str, next) = literalString(s, i)
          operands += str; i = next
        case '<' if i + 1 < s.length && s(i + 1).toChar == '<' =>
          i += 2 // dict open — no strings of interest at this level
        case '<' =>
          val (str, next) = hexString(s, i)
          operands += str; i = next
        case '%' => // comment to EOL
          while (i < s.length && s(i) != '\n') i += 1
        case ch if ch.isWhitespace || ch == '[' || ch == ']' || ch == '>' =>
          i += 1
        case _ =>
          val start = i
          while (i < s.length && !s(i).toChar.isWhitespace &&
                 !"()<>[]{}/%".contains(s(i).toChar)) i += 1
          if (i == start) { i += 1 } // lone delimiter: skip
          else {
            val tok = new String(s, start, i - start, StandardCharsets.ISO_8859_1)
            tok match {
              case "BT" => inText = true; operands.clear()
              case "ET" => inText = false; operands.clear()
              case "Tj" | "'" | "\"" if inText =>
                operands.foreach(emit); operands.clear()
              case "TJ" if inText =>
                operands.foreach(emit); operands.clear()
              case "Td" | "TD" | "T*" if inText =>
                pendingNewline = true; operands.clear()
              case t if t.headOption.exists(h => h.isLetter || h == '"' || h == '\'') =>
                operands.clear() // any other operator consumes its operands
              case _ => // a number: operand, keep strings
            }
          }
      }
    }
    sb.result()
  }

  /** `( ... )` literal with nesting + escapes → decoded string. Returns
    * (text, indexAfterClose). */
  private def literalString(s: Array[Byte], open: Int): (String, Int) = {
    val bytes = new java.io.ByteArrayOutputStream()
    var depth = 1
    var i = open + 1
    while (i < s.length && depth > 0) {
      val c = s(i).toChar
      if (c == '\\' && i + 1 < s.length) {
        val e = s(i + 1).toChar
        e match {
          case 'n' => bytes.write('\n'); i += 2
          case 'r' => bytes.write('\r'); i += 2
          case 't' => bytes.write('\t'); i += 2
          case 'b' => bytes.write('\b'); i += 2
          case 'f' => bytes.write('\f'); i += 2
          case '(' | ')' | '\\' => bytes.write(e); i += 2
          case '\r' => i += (if (i + 2 < s.length && s(i + 2) == '\n') 3 else 2) // continuation
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0; var n = 0; i += 1
            while (n < 3 && i < s.length && s(i) >= '0' && s(i) <= '7') {
              v = v * 8 + (s(i) - '0'); i += 1; n += 1
            }
            bytes.write(v & 0xff)
          case other => bytes.write(other); i += 2
        }
      } else {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        if (depth > 0) bytes.write(s(i))
        i += 1
      }
    }
    (decodePdfString(bytes.toByteArray), i)
  }

  /** `< hex >` string → decoded string. Returns (text, indexAfterClose). */
  private def hexString(s: Array[Byte], open: Int): (String, Int) = {
    val hex = new StringBuilder
    var i = open + 1
    while (i < s.length && s(i).toChar != '>') {
      val c = s(i).toChar
      if (!c.isWhitespace) hex.append(c)
      i += 1
    }
    val h = if (hex.length % 2 == 1) hex.append('0').result() else hex.result()
    val bytes = new Array[Byte](h.length / 2)
    var k = 0
    while (k < bytes.length) {
      bytes(k) = Integer.parseInt(h.substring(k * 2, k * 2 + 2), 16).toByte
      k += 1
    }
    (decodePdfString(bytes), i + 1)
  }

  /** PDF text string: UTF-16BE with BOM, else PDFDocEncoding (treated
    * as Latin-1 — identical over the printable range). */
  private def decodePdfString(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      new String(b, 2, b.length - 2, StandardCharsets.UTF_16BE)
    else new String(b, StandardCharsets.ISO_8859_1)

  /** `/URI (...)` or `/URI <hex>` link-annotation targets, in document
    * order, deduped. */
  /** `bytes` is the original content (raw was decoded from it with
    * ISO-8859-1, so indices line up byte-for-byte) — re-encoding the
    * whole document per annotation would allocate doc-size copies in
    * the parse hot path. */
  private def uriAnnotations(raw: String, bytes: Array[Byte]): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var from = 0
    while ({ from = raw.indexOf("/URI", from); from >= 0 }) {
      var i = from + 4
      while (i < raw.length && raw.charAt(i).isWhitespace) i += 1
      if (i < raw.length && raw.charAt(i) == '(') {
        val (str, _) = literalString(bytes, i)
        if (str.nonEmpty) out += str
      } else if (i < raw.length && raw.charAt(i) == '<' &&
                 i + 1 < raw.length && raw.charAt(i + 1) != '<') {
        val (str, _) = hexString(bytes, i)
        if (str.nonEmpty) out += str
      }
      from += 4
    }
    out.distinct.toSeq
  }

  private def pdfTitle(raw: String, bytes: Array[Byte]): Option[String] = {
    var from = 0
    while ({ from = raw.indexOf("/Title", from); from >= 0 }) {
      var i = from + 6
      while (i < raw.length && raw.charAt(i).isWhitespace) i += 1
      if (i < raw.length && (raw.charAt(i) == '(' ||
          (raw.charAt(i) == '<' && i + 1 < raw.length && raw.charAt(i + 1) != '<'))) {
        val (str, _) =
          if (raw.charAt(i) == '(') literalString(bytes, i) else hexString(bytes, i)
        if (str.nonEmpty) return Some(str)
      }
      from += 6
    }
    None
  }

  // ---- DOCX / ODT (ZIP + XML) ---------------------------------------

  /** Inflate a ZIP container to (entryName → bytes) with a total-size
    * cap (zip-bomb guard — the fetch content limit bounds the
    * compressed size, this bounds the inflated side). */
  private def zipEntries(content: Array[Byte],
                         maxTotal: Int = 64 << 20): Map[String, Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(content))
    val out = Map.newBuilder[String, Array[Byte]]
    var total = 0L
    var entry = zin.getNextEntry
    while (entry != null) {
      if (!entry.isDirectory) {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = zin.read(chunk)
        while (n > 0 && total < maxTotal) {
          buf.write(chunk, 0, n); total += n; n = zin.read(chunk)
        }
        if (total >= maxTotal) throw new java.io.IOException("zip inflation cap exceeded")
        out += entry.getName -> buf.toByteArray
      }
      entry = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  /** Dispatch a ZIP container: OOXML (word/document.xml) → DOCX,
    * ODF (content.xml + odt mimetype) → ODT. */
  def parseZipContainer(content: Array[Byte]): Either[String, BinaryParse] = {
    try {
      val entries = zipEntries(content)
      if (entries.contains("word/document.xml")) parseDocx(entries)
      else if (entries.contains("content.xml")) parseOdt(entries)
      else Left("unsupported zip container (" +
        entries.keys.take(3).mkString(", ") + ", ...)")
    } catch {
      case e: Exception => Left("zip parse error: " + e.getMessage)
    }
  }

  private val wParaRe = "(?s)<w:p[ >].*?</w:p>|<w:p/>".r
  private val wRunRe = "(?s)<w:t(?:\\s[^>]*)?>(.*?)</w:t>|<w:tab/>|<w:br/>".r
  private val dcTitleRe = "(?s)<dc:title(?:\\s[^>]*)?>(.*?)</dc:title>".r
  private val relExtRe =
    "<Relationship\\b[^>]*TargetMode=\"External\"[^>]*/?>".r
  private val relTargetRe = "Target=\"([^\"]*)\"".r

  /** OOXML wordprocessing text: `<w:t>` runs concatenated per `<w:p>`
    * paragraph (newline-joined), `<w:tab/>`/`<w:br/>` preserved;
    * title from docProps/core.xml; outlinks from the document's
    * external relationships (hyperlink targets). Mirrors what Tika's
    * OOXML parser surfaces into text/Link handlers. */
  private def parseDocx(entries: Map[String, Array[Byte]]): Either[String, BinaryParse] = {
    val doc = new String(entries("word/document.xml"), StandardCharsets.UTF_8)
    val paras = wParaRe.findAllIn(doc).map { p =>
      wRunRe.findAllMatchIn(p).map { m =>
        m.matched match {
          case "<w:tab/>" => "\t"
          case "<w:br/>" => "\n"
          case _ => xmlUnescape(m.group(1))
        }
      }.mkString
    }.toSeq
    val title = entries.get("docProps/core.xml")
      .map(b => new String(b, StandardCharsets.UTF_8))
      .flatMap(x => dcTitleRe.findFirstMatchIn(x).map(m => xmlUnescape(m.group(1))))
      .filter(_.nonEmpty)
    val links = entries.get("word/_rels/document.xml.rels")
      .map(b => new String(b, StandardCharsets.UTF_8))
      .map(x => relExtRe.findAllIn(x).flatMap(r =>
        relTargetRe.findFirstMatchIn(r).map(m => xmlUnescape(m.group(1)))).toSeq)
      .getOrElse(Nil)
    Right(BinaryParse(paras.mkString("\n"), title, links.distinct,
      Map("format" -> Seq("docx"), "paragraphs" -> Seq(paras.size.toString))))
  }

  private val tParaRe = "(?s)<text:p[ >].*?</text:p>|<text:p/>".r
  private val tInnerRe = "(?s)<text:tab/>|<text:line-break/>|<[^>]+>".r

  /** ODF text: `<text:p>` paragraphs from content.xml with tabs/breaks
    * preserved and all other markup stripped; title from meta.xml. */
  private def parseOdt(entries: Map[String, Array[Byte]]): Either[String, BinaryParse] = {
    val doc = new String(entries("content.xml"), StandardCharsets.UTF_8)
    val paras = tParaRe.findAllIn(doc).map { p =>
      val body = p.replaceFirst("(?s)^<text:p[^>]*>", "").replaceFirst("</text:p>$", "")
      xmlUnescape(tInnerRe.replaceAllIn(body, m => m.matched match {
        case "<text:tab/>" => "\t"
        case "<text:line-break/>" => "\n"
        case _ => ""
      }))
    }.toSeq
    val title = entries.get("meta.xml")
      .map(b => new String(b, StandardCharsets.UTF_8))
      .flatMap(x => dcTitleRe.findFirstMatchIn(x).map(m => xmlUnescape(m.group(1))))
      .filter(_.nonEmpty)
    Right(BinaryParse(paras.mkString("\n"), title, Nil,
      Map("format" -> Seq("odt"), "paragraphs" -> Seq(paras.size.toString))))
  }

  private val entRe = "&(amp|lt|gt|quot|apos|#x?[0-9a-fA-F]+);".r

  private[parse] def xmlUnescape(s: String): String =
    if (s.indexOf('&') < 0) s
    else entRe.replaceAllIn(s, m => scala.util.matching.Regex.quoteReplacement(
      m.group(1) match {
        case "amp" => "&"
        case "lt" => "<"
        case "gt" => ">"
        case "quot" => "\""
        case "apos" => "'"
        case num =>
          // numeric refs: supplementary-plane codepoints need a
          // surrogate PAIR (toChar truncates U+1F600 to a wrong BMP
          // char); out-of-range/unparseable refs stay as-is rather
          // than failing the whole document
          val cp = try {
            if (num.startsWith("#x") || num.startsWith("#X"))
              Integer.parseInt(num.drop(2), 16)
            else Integer.parseInt(num.drop(1))
          } catch { case _: NumberFormatException => -1 }
          if (cp >= 0 && Character.isValidCodePoint(cp))
            new String(Character.toChars(cp))
          else m.matched
      }))

  // ---- RTF -----------------------------------------------------------

  /** Destination groups whose payload is not body text. `\info` is
    * walked (for `\title`), the rest are skipped wholesale. */
  private val rtfSkipDests = Set(
    "fonttbl", "colortbl", "stylesheet", "pict", "header", "footer",
    "headerl", "headerr", "footerl", "footerr", "ftnsep", "ftnsepc")

  def parseRtf(content: Array[Byte]): Either[String, BinaryParse] = {
    try {
      val s = new String(content, StandardCharsets.ISO_8859_1)
      val text = new StringBuilder
      var title: Option[String] = None
      var i = 0
      var depth = 0
      // per-depth: is this subtree skipped / inside \info / inside \title
      var skipDepth = -1   // when >= 0, skip until depth drops below it
      var infoDepth = -1
      var titleDepth = -1
      val titleBuf = new StringBuilder
      var ucSkip = 1       // \ucN: bytes to skip after \uN

      def sink: Option[StringBuilder] =
        if (titleDepth >= 0) Some(titleBuf)
        else if (skipDepth >= 0 || infoDepth >= 0) None
        else Some(text)

      while (i < s.length) {
        val c = s.charAt(i)
        c match {
          case '{' => depth += 1; i += 1
          case '}' =>
            if (titleDepth >= 0 && depth <= titleDepth) {
              title = Some(titleBuf.result().trim).filter(_.nonEmpty); titleDepth = -1
            }
            if (infoDepth >= 0 && depth <= infoDepth) infoDepth = -1
            if (skipDepth >= 0 && depth <= skipDepth) skipDepth = -1
            depth -= 1; i += 1
          case '\\' if i + 1 < s.length =>
            val n = s.charAt(i + 1)
            if (n == '\'' && i + 3 < s.length) {
              val v = Integer.parseInt(s.substring(i + 2, i + 4), 16)
              sink.foreach(_.append(v.toChar))
              i += 4
            } else if (n == '*') {
              // {\*\dest ...}: optional destination — skip whole group
              if (skipDepth < 0) skipDepth = depth
              i += 2
            } else if (n.isLetter) {
              val start = i + 1
              var j = start
              while (j < s.length && s.charAt(j).isLetter) j += 1
              val word = s.substring(start, j)
              var numStr = ""
              if (j < s.length && (s.charAt(j) == '-' || s.charAt(j).isDigit)) {
                val ns = j
                j += 1
                while (j < s.length && s.charAt(j).isDigit) j += 1
                numStr = s.substring(ns, j)
              }
              if (j < s.length && s.charAt(j) == ' ') j += 1 // delimiter space
              word match {
                case "par" | "line" | "sect" | "page" => sink.foreach(_.append('\n'))
                case "tab" => sink.foreach(_.append('\t'))
                case "emdash" => sink.foreach(_.append('—'))
                case "endash" => sink.foreach(_.append('–'))
                case "uc" => ucSkip = if (numStr.nonEmpty) numStr.toInt else 1
                case "u" =>
                  val cp = numStr.toInt
                  sink.foreach(_.append((if (cp < 0) cp + 65536 else cp).toChar))
                  // skip ucSkip fallback chars; a \'hh escape counts as
                  // ONE fallback character (Word emits \uN\'3f), other
                  // control words / group delimiters end the fallback
                  var skipped = 0
                  var more = true
                  while (skipped < ucSkip && j < s.length && more) {
                    s.charAt(j) match {
                      case '\\' if j + 3 < s.length && s.charAt(j + 1) == '\'' =>
                        j += 4; skipped += 1
                      case '\\' | '{' | '}' => more = false
                      case _ => j += 1; skipped += 1
                    }
                  }
                case "info" => if (infoDepth < 0) infoDepth = depth
                case "title" if infoDepth >= 0 =>
                  titleDepth = depth; titleBuf.clear()
                case d if rtfSkipDests(d) => if (skipDepth < 0) skipDepth = depth
                case _ => // formatting control word: no text
              }
              i = j
            } else { // \\, \{, \}
              sink.foreach(_.append(n)); i += 2
            }
          case '\r' | '\n' => i += 1 // raw newlines are not text in RTF
          case ch =>
            sink.foreach(_.append(ch)); i += 1
        }
      }
      // body text is NOT trimmed: extraction must be byte-exact w.r.t.
      // the document so round-trip oracles can compare verbatim
      Right(BinaryParse(text.result(), title, Nil, Map("format" -> Seq("rtf"))))
    } catch {
      case e: Exception => Left("rtf parse error: " + e.getMessage)
    }
  }
}
