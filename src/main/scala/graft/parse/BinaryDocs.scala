package graft.parse

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Deterministic synthetic binary documents — the test/bench corpus
  * generator for the Tika-branch plumbing (`BinaryParser`). Real crawl
  * content arrives as bytes from the fetch stage; these builders make
  * well-formed PDF/RTF bytes from text so the extract path can be
  * round-trip-verified at any scale (same role as `Multimodal.FakeCodec`
  * for media). Pure functions of their arguments — no clock, no RNG —
  * so DuckDB-side oracles can compare against the original text.
  */
object BinaryDocs {

  /** One-page PDF 1.4 with the text in a single content stream, a /Title
    * info entry, and one /URI link annotation per outlink. Text lines
    * (split on \n) become separate Td/Tj shows. Non-Latin1 lines are
    * written as UTF-16BE hex strings (the spec's Unicode form).
    *
    * @param compress gzip-deflate the content stream (/FlateDecode) —
    *   what real generators emit; `false` covers the uncompressed path.
    */
  def makePdf(text: String, title: Option[String] = None,
              links: Seq[String] = Nil, compress: Boolean = true): Array[Byte] = {
    val content = {
      val sb = new StringBuilder("BT\n/F1 12 Tf\n72 720 Td\n")
      val lines = text.split("\n", -1)
      lines.zipWithIndex.foreach { case (line, idx) =>
        if (idx > 0) sb.append("0 -14 Td\n")
        sb.append(pdfString(line)).append(" Tj\n")
      }
      sb.append("ET\n").result()
    }.getBytes(StandardCharsets.ISO_8859_1)
    val (streamBytes, filter) =
      if (compress) (deflate(content), "/Filter /FlateDecode ") else (content, "")

    val objs = scala.collection.mutable.ArrayBuffer.empty[String]
    // object numbers: 1 catalog, 2 pages, 3 page, 4 contents, 5 font,
    // 6 info, 7.. link annotations
    val annotRefs = links.indices.map(i => s"${7 + i} 0 R").mkString(" ")
    val annots = if (links.nonEmpty) s"/Annots [$annotRefs] " else ""
    objs += "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    objs += "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    objs += ("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      s"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> $annots>>\nendobj\n")
    objs += (s"4 0 obj\n<< /Length ${streamBytes.length} $filter>>\nstream\n" +
      new String(streamBytes, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n")
    objs += ("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n" +
      "endobj\n")
    objs += ("6 0 obj\n<< " +
      title.map(t => s"/Title ${pdfString(t)} ").getOrElse("") +
      "/Producer (graft) >>\nendobj\n")
    links.zipWithIndex.foreach { case (u, i) =>
      objs += (s"${7 + i} 0 obj\n<< /Type /Annot /Subtype /Link " +
        s"/Rect [72 ${700 - 14 * i} 300 ${714 - 14 * i}] " +
        s"/A << /S /URI /URI ${pdfString(u)} >> /Border [0 0 0] >>\nendobj\n")
    }

    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    val offsets = objs.map { o => val off = out.size(); w(o); off }
    val xref = out.size()
    w(f"xref\n0 ${objs.length + 1}%d\n0000000000 65535 f \n")
    offsets.foreach(off => w(f"$off%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R /Info 6 0 R >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  /** PDF string literal for `s`: escaped `(...)` when Latin-1-safe,
    * else a BOM'd UTF-16BE hex string. */
  private def pdfString(s: String): String =
    if (s.forall(c => c >= 0x20 && c < 0x7f)) {
      val esc = s.flatMap {
        case '\\' => "\\\\"
        case '(' => "\\("
        case ')' => "\\)"
        case c => c.toString
      }
      s"($esc)"
    } else {
      val b = s.getBytes(StandardCharsets.UTF_16BE)
      val hex = new StringBuilder("<FEFF")
      b.foreach(x => hex.append(f"${x & 0xff}%02X"))
      hex.append('>').result()
    }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Minimal RTF 1.x document: font table, optional `{\info{\title}}`,
    * body with `\par` per line and `\u`/`\'` escapes for non-ASCII. */
  def makeRtf(text: String, title: Option[String] = None): Array[Byte] = {
    val sb = new StringBuilder("{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Helvetica;}}")
    title.foreach(t => sb.append("{\\info{\\title ").append(rtfEscape(t)).append("}}"))
    sb.append("\\f0\\fs24 ")
    text.split("\n", -1).zipWithIndex.foreach { case (line, i) =>
      if (i > 0) sb.append("\\par ")
      sb.append(rtfEscape(line))
    }
    sb.append('}')
    sb.result().getBytes(StandardCharsets.ISO_8859_1)
  }

  private def rtfEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case c @ ('\\' | '{' | '}') => sb.append('\\').append(c)
      case '\t' => sb.append("\\tab ")
      case c if c < 0x80 => sb.append(c)
      case c if c < 0x100 => sb.append(f"\\'${c.toInt}%02x")
      case c => sb.append(s"\\u${c.toInt}?")
    }
    sb.result()
  }
}
