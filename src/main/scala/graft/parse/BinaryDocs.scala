package graft.parse

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

import scala.collection.mutable.ArrayBuffer

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

  // ---- OLE2 / CFBF (legacy .doc / .xls / .ppt) -----------------------

  /** Minimal-but-valid CFBF container writer (MS-CFB v3, 512-byte
    * sectors): streams under the 4096 cutoff go through the mini
    * stream + miniFAT exactly as real writers emit them, larger ones
    * through the FAT — so [[Ole2]]'s both read paths are exercised by
    * round-trip fixtures. Layout: [FAT streams][mini stream][miniFAT]
    * [directory][FAT]; header DIFAT only (no DIFAT chain — fixture
    * files stay far below 109 FAT sectors). */
  def makeCfbf(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val SS = 512
    val MS = 64
    def pad(b: Array[Byte], unit: Int): Array[Byte] =
      java.util.Arrays.copyOf(b, ((b.length + unit - 1) / unit).max(1) * unit)
    val (small, big) = streams.partition(_._2.length < 4096)

    val mini = new ByteArrayOutputStream()
    val miniFat = scala.collection.mutable.ArrayBuffer.empty[Int]
    val miniStart = scala.collection.mutable.Map.empty[String, Int]
    for ((name, bytes) <- small) {
      miniStart(name) = miniFat.length
      val padded = pad(bytes, MS)
      val n = padded.length / MS
      mini.write(padded)
      for (i <- 1 until n) miniFat += miniFat.length + 1
      miniFat += 0xfffffffe
    }
    val miniBytes = pad(mini.toByteArray, SS)

    // sector ids, in layout order
    var next = 0
    val bigStart = big.map { case (name, bytes) =>
      val s = next; next += pad(bytes, SS).length / SS; name -> s
    }.toMap
    val miniSector = next; next += miniBytes.length / SS
    val miniFatBytes = pad(miniFat.toArray.flatMap(le4), SS)
    val miniFatSector = next; next += miniFatBytes.length / SS

    // directory: root + one entry per stream, padded to a sector
    val dirEntries = new ByteArrayOutputStream()
    def entry(name: String, objType: Int, start: Int, size: Long,
              child: Int): Unit = {
      val e = new Array[Byte](128)
      val nm = name.getBytes(StandardCharsets.UTF_16LE)
      System.arraycopy(nm, 0, e, 0, math.min(nm.length, 62))
      put2(e, 64, nm.length + 2)
      e(66) = objType.toByte
      e(67) = 1 // black
      put4(e, 68, -1); put4(e, 72, -1); put4(e, 76, child)
      put4(e, 116, start)
      put4(e, 120, size.toInt)
      dirEntries.write(e)
    }
    entry("Root Entry", 5, miniSector, mini.size().toLong,
      if (streams.nonEmpty) 1 else -1)
    for ((name, bytes) <- streams)
      entry(name, 2,
        if (bytes.length < 4096) miniStart(name) else bigStart(name),
        bytes.length.toLong, -1)
    val dirBytes = pad(dirEntries.toByteArray, SS)
    val dirSector = next; next += dirBytes.length / SS

    // FAT covers everything incl. itself (fixpoint over its own size)
    var fatSectors = 1
    var settled = false
    while (!settled) {
      val total = next + fatSectors
      val need = (total * 4 + SS - 1) / SS
      if (need == fatSectors) settled = true else fatSectors = need
    }
    val fatStart = next
    val totalSectors = next + fatSectors
    val fat = Array.fill(fatSectors * (SS / 4))(0xffffffff)
    def chainOf(start: Int, nSec: Int): Unit = {
      for (i <- 0 until nSec - 1) fat(start + i) = start + i + 1
      fat(start + nSec - 1) = 0xfffffffe
    }
    for ((name, bytes) <- big) chainOf(bigStart(name), pad(bytes, SS).length / SS)
    chainOf(miniSector, miniBytes.length / SS)
    chainOf(miniFatSector, miniFatBytes.length / SS)
    chainOf(dirSector, dirBytes.length / SS)
    for (i <- 0 until fatSectors) fat(fatStart + i) = 0xfffffffd

    val header = new Array[Byte](SS)
    val magic = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
    for (i <- 0 until 8) header(i) = magic(i).toByte
    put2(header, 24, 0x3e); put2(header, 26, 3) // minor/major version
    put2(header, 28, 0xfffe) // little-endian marker
    put2(header, 30, 9) // 512-byte sectors
    put2(header, 32, 6) // 64-byte mini sectors
    put4(header, 44, fatSectors)
    put4(header, 48, dirSector)
    put4(header, 56, 4096) // mini cutoff
    put4(header, 60, if (miniFat.nonEmpty) miniFatSector else -2)
    put4(header, 64, miniFatBytes.length / SS)
    put4(header, 68, -2); put4(header, 72, 0) // no DIFAT chain
    for (i <- 0 until 109)
      put4(header, 76 + i * 4, if (i < fatSectors) fatStart + i else -1)

    val out = new ByteArrayOutputStream()
    out.write(header)
    for ((name, bytes) <- big) out.write(pad(bytes, SS))
    out.write(miniBytes)
    out.write(miniFatBytes)
    out.write(dirBytes)
    out.write(fat.flatMap(le4))
    require(out.size() == SS * (1 + totalSectors))
    out.toByteArray
  }

  private def le4(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def put2(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def put4(b: Array[Byte], o: Int, v: Int): Unit =
    System.arraycopy(le4(v), 0, b, o, 4)

  /** Legacy Word 97 `.doc`: FIB + UTF-16LE text pieces in the
    * WordDocument stream, CLX piece table in 0Table. The WordDocument
    * stream is padded past the mini cutoff (as in real files), the
    * 0Table stays under it — one fixture exercises both CFBF read
    * paths. With `splitCompressed` (ASCII text only) the text is split
    * into a CP1252-compressed piece plus a UTF-16 piece to cover both
    * PCD encodings. */
  def makeDoc(text: String, splitCompressed: Boolean = false): Array[Byte] = {
    val fibLen = 1024
    val pieces: Seq[(String, Boolean)] = // (text, compressed)
      if (splitCompressed && text.forall(_ < 0x80) && text.length >= 2) {
        val mid = text.length / 2
        Seq(text.substring(0, mid) -> true, text.substring(mid) -> false)
      } else Seq(text -> false)

    val wd = new ByteArrayOutputStream()
    wd.write(new Array[Byte](fibLen))
    val pcds = pieces.map { case (t, compressed) =>
      val off = fibLen + (wd.size() - fibLen)
      val bytes =
        if (compressed) t.getBytes(StandardCharsets.ISO_8859_1)
        else t.getBytes(StandardCharsets.UTF_16LE)
      wd.write(bytes)
      val fc = if (compressed) (off * 2) | 0x40000000 else off
      (t.length, fc)
    }
    val wdBytes = java.util.Arrays.copyOf(wd.toByteArray, math.max(wd.size(), 4096))
    // FIB: wIdent, nFib, whichTbl=0 (0Table); variable blobs sized as
    // Word 97 writes them (csw=14, cslw=22, cbRgFcLcb=93)
    put2(wdBytes, 0, 0xa5ec)
    put2(wdBytes, 2, 0x00c1)
    put2(wdBytes, 10, 0)
    var o = 32
    put2(wdBytes, o, 14); o += 2 + 14 * 2
    put2(wdBytes, o, 22); o += 2 + 22 * 4
    put2(wdBytes, o, 93); o += 2
    val fcClxOff = o + 33 * 8

    // 0Table: CLX = Pcdt only (no Prcs)
    val n = pcds.length
    val plcLen = (n + 1) * 4 + n * 8
    val tbl = new Array[Byte](5 + plcLen)
    tbl(0) = 2
    put4(tbl, 1, plcLen)
    var cp = 0
    pcds.zipWithIndex.foreach { case ((nChars, _), i) =>
      put4(tbl, 5 + i * 4, cp); cp += nChars
    }
    put4(tbl, 5 + n * 4, cp)
    pcds.zipWithIndex.foreach { case ((_, fc), i) =>
      val pcd = 5 + (n + 1) * 4 + i * 8
      put2(tbl, pcd, 0)
      put4(tbl, pcd + 2, fc)
      put2(tbl, pcd + 6, 0)
    }
    put4(wdBytes, fcClxOff, 0)
    put4(wdBytes, fcClxOff + 4, tbl.length)
    makeCfbf(Seq("WordDocument" -> wdBytes, "0Table" -> tbl))
  }

  /** Legacy Excel `.xls`: BIFF8 Workbook with the text as the single
    * SST entry, UTF-16 form (one record — real files split at 8 KB,
    * see [[makeXlsSst]]). */
  def makeXls(text: String): Array[Byte] = makeXlsSst(Seq(text))

  /** BIFF8 Workbook with an SST of `texts`, split into SST + Continue
    * records whenever a record would exceed `maxPayload` (the real
    * BIFF limit is 8224 bytes; small values force splits for tests).
    * Splits follow MS-XLS: only at character boundaries, with the
    * continuation fragment restating its grbit byte; headers
    * (cch/flags) never split. Strings are written UTF-16 (wide). */
  def makeXlsSst(texts: Seq[String], maxPayload: Int = 8224): Array[Byte] = {
    require(maxPayload >= 16, "maxPayload too small for any SST structure")
    require(texts.forall(_.length <= 0xffff), "cch is u16: string too long")
    val records = ArrayBuffer.empty[ByteArrayOutputStream]
    var cur = new ByteArrayOutputStream()
    records += cur
    def room = maxPayload - cur.size()
    def newRecord(): Unit = { cur = new ByteArrayOutputStream(); records += cur }
    def atomic(bytes: Array[Byte]): Unit = {
      if (room < bytes.length) newRecord()
      cur.write(bytes)
    }
    val head = new Array[Byte](8)
    put4(head, 0, texts.size); put4(head, 4, texts.size) // cstTotal, cstUnique
    cur.write(head)
    for (t <- texts) {
      val hdr = new Array[Byte](3)
      put2(hdr, 0, t.length)
      hdr(2) = 1 // fHighByte: UTF-16
      atomic(hdr)
      val chars = t.getBytes(StandardCharsets.UTF_16LE)
      var off = 0
      while (off < chars.length) {
        if (room < 2) { newRecord(); cur.write(1) } // fragment grbit: wide
        val k = math.min(chars.length - off, (room / 2) * 2)
        cur.write(chars, off, k)
        off += k
      }
    }
    val wb = new ByteArrayOutputStream()
    def rec(id: Int, payload: Array[Byte]): Unit = {
      val h = new Array[Byte](4); put2(h, 0, id); put2(h, 2, payload.length)
      wb.write(h); wb.write(payload)
    }
    rec(0x0809, new Array[Byte](16)) // BOF
    records.zipWithIndex.foreach { case (r, i) =>
      rec(if (i == 0) 0x00fc else 0x003c, r.toByteArray)
    }
    rec(0x000a, Array.emptyByteArray) // EOF
    makeCfbf(Seq("Workbook" -> wb.toByteArray))
  }

  /** Legacy PowerPoint `.ppt`: a Document container holding one text
    * atom per line — UTF-16LE TextCharsAtom for lines with non-Latin-1
    * characters, 8-bit TextBytesAtom otherwise (as real writers emit),
    * each wrapped in its own nested container (slide-shaped nesting,
    * so the reader's recursive walk is exercised). */
  def makePpt(text: String): Array[Byte] = {
    def record(verInst: Int, typ: Int, payload: Array[Byte]): Array[Byte] = {
      val r = new Array[Byte](8 + payload.length)
      put2(r, 0, verInst); put2(r, 2, typ); put4(r, 4, payload.length)
      System.arraycopy(payload, 0, r, 8, payload.length)
      r
    }
    val slides = text.split("\n", -1).map { line =>
      val atom =
        if (line.forall(_ < 0x100))
          record(0x0000, 0x0fa8, line.getBytes(StandardCharsets.ISO_8859_1))
        else
          record(0x0000, 0x0fa0, line.getBytes(StandardCharsets.UTF_16LE))
      record(0x000f, 0x03ee, atom) // Slide container
    }
    val doc = record(0x000f, 0x03e8, slides.flatten.toArray) // Document
    makeCfbf(Seq("PowerPoint Document" -> doc))
  }

  // ---- images --------------------------------------------------------
  // Minimal image payloads: a valid header carrying real dimensions,
  // no pixel data (the parse stage measures headers only —
  // `graft.multimodal.ImageHeaders`). Byte-compatible with the
  // column-algebra builders in `Multimodal.mediaFromDocuments`.

  private def hexBytes(s: String): Array[Byte] =
    s.grouped(2).map(java.lang.Integer.parseInt(_, 16).toByte).toArray
  private def be16h(v: Int): String = f"$v%04X"
  private def be32h(v: Int): String = f"$v%08X"
  private def le16h(v: Int): String = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X"
  private def le32h(v: Int): String =
    le16h(v & 0xffff) + le16h((v >>> 16) & 0xffff)

  /** PNG signature + IHDR (8-bit truecolor, CRC zeroed). */
  def makePng(w: Int, h: Int): Array[Byte] =
    hexBytes("89504E470D0A1A0A" + "0000000D" + "49484452" +
      be32h(w) + be32h(h) + "0802000000" + "00000000")

  /** GIF89a logical screen descriptor. */
  def makeGif(w: Int, h: Int): Array[Byte] =
    hexBytes("474946383961" + le16h(w) + le16h(h) + "F70000")

  /** BMP file header + BITMAPINFOHEADER (24-bit). */
  def makeBmp(w: Int, h: Int): Array[Byte] =
    hexBytes("424D" + "00000000" + "00000000" + "36000000" + "28000000" +
      le32h(w) + le32h(h) + "0100" + "1800" + "0" * 48)

  /** JPEG SOI + JFIF APP0 + SOF0 frame header (3 components). */
  def makeJpeg(w: Int, h: Int): Array[Byte] =
    hexBytes("FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" + "00" +
      "0001" + "0001" + "0000" + "FFC0" + "0011" + "08" +
      be16h(h) + be16h(w) + "03" + "011100" + "021101" + "031101")
}
