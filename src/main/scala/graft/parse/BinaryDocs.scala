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

  /** Minimal OOXML wordprocessing document: one `<w:p>` per text line
    * (tabs/newlines-in-line as `<w:tab/>`), optional dc:title core
    * properties, and one external hyperlink relationship per link. */
  def makeDocx(text: String, title: Option[String] = None,
               links: Seq[String] = Nil): Array[Byte] = {
    val paras = text.split("\n", -1).map { line =>
      val runs = line.split("\t", -1).map(seg =>
        s"""<w:r><w:t xml:space="preserve">${xmlEscape(seg)}</w:t></w:r>""")
        .mkString("<w:r><w:tab/></w:r>")
      s"<w:p>$runs</w:p>"
    }.mkString
    val document =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"
         |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<w:body>$paras</w:body></w:document>""".stripMargin
    val rels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |${links.zipWithIndex.map { case (u, i) =>
             s"""<Relationship Id="rIdLink$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/hyperlink" Target="${xmlEscape(u)}" TargetMode="External"/>"""
           }.mkString("\n")}
         |</Relationships>""".stripMargin
    val core =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties"
         |  xmlns:dc="http://purl.org/dc/elements/1.1/">
         |${title.map(t => s"<dc:title>${xmlEscape(t)}</dc:title>").getOrElse("")}
         |</cp:coreProperties>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
        |</Types>""".stripMargin
    zip(Seq(
      "[Content_Types].xml" -> contentTypes,
      "word/document.xml" -> document,
      "word/_rels/document.xml.rels" -> rels,
      "docProps/core.xml" -> core))
  }

  /** Minimal ODF text document: `<text:p>` per line in content.xml,
    * optional dc:title in meta.xml. */
  def makeOdt(text: String, title: Option[String] = None): Array[Byte] = {
    val paras = text.split("\n", -1).map(line =>
      s"<text:p>${xmlEscape(line).replace("\t", "<text:tab/>")}</text:p>").mkString
    val content =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
         |  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
         |<office:body><office:text>$paras</office:text></office:body>
         |</office:document-content>""".stripMargin
    val meta =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<office:document-meta xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
         |  xmlns:dc="http://purl.org/dc/elements/1.1/">
         |<office:meta>${title.map(t => s"<dc:title>${xmlEscape(t)}</dc:title>").getOrElse("")}</office:meta>
         |</office:document-meta>""".stripMargin
    zip(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.text",
      "content.xml" -> content,
      "meta.xml" -> meta))
  }

  private def zip(entries: Seq[(String, String)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    entries.foreach { case (name, body) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    out.toByteArray
  }

  private def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case '\'' => "&apos;"
    case c => c.toString
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
