package graft.parse

import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

/** OLE2 / CFBF ("compound file") parsing for the legacy binary Office
  * formats — pre-OOXML `.doc`/`.xls`/`.ppt`, which the reference
  * handles through Tika (`external/tika/.../ParserBolt.java:152-354`).
  * The container format is public (MS-CFB), as are the payloads
  * (MS-DOC, MS-XLS, MS-PPT); this implements the subset a crawler
  * needs: find the payload stream, extract its text.
  *
  * Container: a FAT filesystem-in-a-file. 512-byte header (magic
  * D0CF11E0A1B11AE1), sector chains in the FAT (FAT sector ids from
  * the header's 109-entry DIFAT array, then the DIFAT chain), a
  * directory of 128-byte entries (UTF-16LE names), and a MINI stream:
  * streams smaller than the cutoff (4096) live in 64-byte mini sectors
  * inside the root entry's stream, chained by the miniFAT.
  *
  * Payloads:
  *   - `.doc` (WordDocument stream): FIB → CLX piece table in the
  *     0Table/1Table stream → text pieces (CP1252 when the piece's
  *     fCompressed bit is set, UTF-16LE otherwise).
  *   - `.xls` (Workbook stream): BIFF8 record walk, text from the SST
  *     (shared-string table), including strings spanning Continue
  *     records (fresh grbit per character fragment, rich-run/ext
  *     payloads skipped across boundaries).
  *   - `.ppt` (PowerPoint Document stream): recursive record walk,
  *     text from TextCharsAtom (UTF-16LE) / TextBytesAtom (latin-1).
  *
  * Everything is executor-local and allocation-bounded by the fetch
  * content limit, like the rest of [[BinaryParser]].
  */
object Ole2 {

  private val Magic = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte)

  def isOle2(content: Array[Byte]): Boolean =
    content.length >= 8 && (0 until 8).forall(i => content(i) == Magic(i))

  // little-endian readers (bounds-checked: a truncated crawl capture
  // must fail the parse, not throw out of the executor)
  private def u16(b: Array[Byte], o: Int): Int =
    if (o + 2 > b.length) -1 else (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    if (o + 4 > b.length) -1L
    else ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt

  private final val EndOfChain = 0xfffffffe
  private final val FreeSect = 0xffffffff

  private final case class DirEntry(name: String, objType: Int,
                                    startSector: Int, size: Long)

  /** Parsed container: directory plus a stream reader. */
  private final class Cfbf(content: Array[Byte]) {
    private val sectorShift = u16(content, 30)
    require(sectorShift >= 7 && sectorShift <= 12, s"bad sector shift $sectorShift")
    private val sectorSize = 1 << sectorShift
    private val miniShift = u16(content, 32)
    private val miniSize = 1 << (if (miniShift > 0) miniShift else 6)
    private val miniCutoff = u32(content, 56)
    private val maxSector = (content.length - 512) / sectorSize

    private def sectorAt(id: Int): Int = 512 + id * sectorSize

    // FAT sector list: 109 ids in the header DIFAT, then DIFAT chain
    private val fat: Array[Int] = {
      val fatSectors = ArrayBuffer.empty[Int]
      var i = 0
      while (i < 109) {
        val s = i32(content, 76 + i * 4)
        if (s >= 0 && s < maxSector) fatSectors += s
        i += 1
      }
      var difat = i32(content, 68)
      // bound by the FILE, not the header's count: a crafted header
      // declaring 2^32 DIFAT sectors (or a self-referencing chain)
      // must terminate — a file physically cannot hold more DIFAT
      // sectors than it has sectors
      val difatCap = math.min(u32(content, 72), maxSector.toLong) + 4
      var guard = 0
      while (difat >= 0 && difat < maxSector && guard < difatCap) {
        val base = sectorAt(difat)
        var j = 0
        while (j < sectorSize / 4 - 1) {
          val s = i32(content, base + j * 4)
          if (s >= 0 && s < maxSector) fatSectors += s
          j += 1
        }
        difat = i32(content, base + sectorSize - 4)
        guard += 1
      }
      val entries = new Array[Int](fatSectors.length * (sectorSize / 4))
      var k = 0
      for (fs <- fatSectors) {
        val base = sectorAt(fs)
        var j = 0
        while (j < sectorSize / 4) {
          entries(k) = i32(content, base + j * 4); k += 1; j += 1
        }
      }
      entries
    }

    private def chain(start: Int, cap: Int): Seq[Int] = {
      val out = ArrayBuffer.empty[Int]
      var s = start
      while (s >= 0 && s < fat.length && out.length < cap) {
        out += s
        s = fat(s)
      }
      out.toSeq
    }

    /** Read a regular (FAT) stream. */
    private def readFatStream(start: Int, size: Long): Array[Byte] = {
      val out = new Array[Byte](math.min(size, content.length.toLong).toInt)
      var written = 0
      for (s <- chain(start, maxSector + 1) if written < out.length) {
        val n = math.min(sectorSize, out.length - written)
        val base = sectorAt(s)
        if (base + n <= content.length) {
          System.arraycopy(content, base, out, written, n)
          written += n
        }
      }
      out
    }

    val dir: Seq[DirEntry] = {
      // size by the chain, not the file: the directory is typically one
      // sector, and a whole-file-sized buffer would double per-document
      // memory on a large capture
      val start = i32(content, 48)
      val dirBytes = readFatStream(start,
        chain(start, maxSector + 1).length.toLong * sectorSize)
      val out = ArrayBuffer.empty[DirEntry]
      var o = 0
      while (o + 128 <= dirBytes.length) {
        val nameLen = u16(dirBytes, o + 64) // bytes incl. terminator
        if (nameLen >= 2 && nameLen <= 64) {
          val name = new String(dirBytes, o, nameLen - 2, StandardCharsets.UTF_16LE)
          val objType = dirBytes(o + 66) & 0xff
          if (objType == 1 || objType == 2 || objType == 5)
            out += DirEntry(name, objType, i32(dirBytes, o + 116), u32(dirBytes, o + 120))
        }
        o += 128
      }
      out.toSeq
    }

    // the mini stream is the ROOT entry's stream; miniFAT chains
    // 64-byte sectors inside it
    private lazy val miniStream: Array[Byte] =
      dir.find(_.objType == 5).map(r => readFatStream(r.startSector, r.size))
        .getOrElse(Array.emptyByteArray)
    private lazy val miniFat: Array[Int] = {
      val start = i32(content, 60)
      val bytes = readFatStream(start, u32(content, 64) * sectorSize)
      val out = new Array[Int](bytes.length / 4)
      var i = 0
      while (i < out.length) { out(i) = i32(bytes, i * 4); i += 1 }
      out
    }

    private def readMiniStream(start: Int, size: Long): Array[Byte] = {
      val out = new Array[Byte](math.min(size, miniStream.length.toLong).toInt)
      var written = 0
      var s = start
      var guard = 0
      while (s >= 0 && s < miniFat.length && written < out.length && guard <= miniFat.length) {
        val base = s * miniSize
        val n = math.min(miniSize, out.length - written)
        if (base + n <= miniStream.length) {
          System.arraycopy(miniStream, base, out, written, n)
          written += n
        }
        s = miniFat(s)
        guard += 1
      }
      out
    }

    /** Read a named stream, routing small streams through the mini
      * stream per the header cutoff. */
    def stream(name: String): Option[Array[Byte]] =
      dir.find(e => e.objType == 2 && e.name == name).map { e =>
        if (e.size < miniCutoff) readMiniStream(e.startSector, e.size)
        else readFatStream(e.startSector, e.size)
      }

    def hasStream(name: String): Boolean =
      dir.exists(e => e.objType == 2 && e.name == name)
  }

  /** Parse any recognized OLE2 payload to text. */
  def parse(content: Array[Byte]): Either[String, BinaryParser.BinaryParse] =
    try {
      if (!isOle2(content)) Left("not an OLE2 container")
      else {
        val cf = new Cfbf(content)
        if (cf.hasStream("WordDocument")) parseWord(cf)
        else if (cf.hasStream("Workbook") || cf.hasStream("Book")) parseXls(cf)
        else if (cf.hasStream("PowerPoint Document")) parsePpt(cf)
        else Left("OLE2 container holds no recognized payload stream (" +
          cf.dir.filter(_.objType == 2).map(_.name).mkString(", ") + ")")
      }
    } catch {
      case e: Exception => Left("OLE2 parse failure: " + e.getMessage)
    }

  // ---- .doc (MS-DOC: FIB + CLX piece table) --------------------------

  private def parseWord(cf: Cfbf): Either[String, BinaryParser.BinaryParse] = {
    val wd = cf.stream("WordDocument").get
    if (u16(wd, 0) != 0xa5ec) return Left(".doc FIB magic mismatch")
    val flags = u16(wd, 0x000a)
    val whichTbl = if ((flags & 0x0200) != 0) "1Table" else "0Table"
    val table = cf.stream(whichTbl)
      .orElse(cf.stream(if (whichTbl == "1Table") "0Table" else "1Table"))
      .getOrElse(return Left(s".doc table stream $whichTbl missing"))

    // FIB variable blobs: base(32) | csw, fibRgW | cslw, fibRgLw |
    // cbRgFcLcb, fibRgFcLcb. fcClx/lcbClx are pair 33 of FibRgFcLcb97.
    var o = 32
    val csw = u16(wd, o); o += 2 + csw * 2
    val cslw = u16(wd, o); o += 2 + cslw * 4
    val cb = u16(wd, o); o += 2
    if (cb < 34) return Left(s".doc FIB too small (cbRgFcLcb=$cb)")
    val fcClx = u32(wd, o + 33 * 8).toInt
    val lcbClx = u32(wd, o + 33 * 8 + 4).toInt
    if (lcbClx <= 0 || fcClx < 0 || fcClx + lcbClx > table.length)
      return Left(".doc CLX out of range")

    // CLX: Prc blocks (clxt=1, u16 size) then the Pcdt (clxt=2)
    var c = fcClx
    val end = fcClx + lcbClx
    while (c < end && (table(c) & 0xff) == 1) c += 3 + u16(table, c + 1)
    if (c >= end || (table(c) & 0xff) != 2) return Left(".doc CLX has no piece table")
    val lcbPlc = u32(table, c + 1).toInt
    val plc = c + 5
    if (lcbPlc < 4 || plc + lcbPlc > end) return Left(".doc piece table truncated")
    val nPieces = (lcbPlc - 4) / 12
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nPieces) {
      val cpStart = u32(table, plc + i * 4)
      val cpEnd = u32(table, plc + (i + 1) * 4)
      val pcd = plc + (nPieces + 1) * 4 + i * 8
      val fcRaw = u32(table, pcd + 2)
      val compressed = (fcRaw & 0x40000000L) != 0
      val fc = (fcRaw & 0x3fffffffL).toInt
      val nChars = (cpEnd - cpStart).toInt
      if (nChars > 0 && nChars < (1 << 26)) {
        if (compressed) {
          val off = fc / 2
          if (off + nChars <= wd.length)
            sb.append(new String(wd, off, nChars, StandardCharsets.ISO_8859_1))
        } else {
          if (fc + nChars * 2 <= wd.length)
            sb.append(new String(wd, fc, nChars * 2, StandardCharsets.UTF_16LE))
        }
      }
      i += 1
    }
    // Word stores paragraph marks as CR and cell marks as BEL;
    // normalize to newlines / spaces like the HTML path
    val text = sb.toString.replace('\r', '\n').replace('\u0007', '\n')
      .replaceAll("[\u0000-\u0008\u000b\u000c\u000e-\u001f]", " ").trim
    Right(BinaryParser.BinaryParse(text, None, Nil,
      Map("format" -> Seq("doc"), "pieces" -> Seq(nPieces.toString))))
  }

  // ---- .xls (BIFF8 SST) ----------------------------------------------

  /** BIFF8 SST extraction with Continue-record support: records cap at
    * ~8 KB, so any real spreadsheet's shared-string table spans
    * Continue (0x003C) records. Per MS-XLS, splits happen only at
    * character boundaries, rich-run/ext payloads continue verbatim,
    * and character data resuming in a Continue restates its grbit
    * (the encoding may flip between fragments). The walk is a cursor
    * over the SST+Continues span list; any structural inconsistency
    * stops cleanly with whatever was extracted so far. */
  private def parseXls(cf: Cfbf): Either[String, BinaryParser.BinaryParse] = {
    val wb = cf.stream("Workbook").orElse(cf.stream("Book")).get
    // locate the SST record and its trailing Continue records
    var o = 0
    var spans = Vector.empty[(Int, Int)] // payload [start, end)
    while (o + 4 <= wb.length && spans.isEmpty) {
      val id = u16(wb, o)
      val len = u16(wb, o + 2)
      if (len < 0) o = wb.length
      else if (id == 0x00fc) {
        spans = Vector((o + 4, math.min(o + 4 + len, wb.length)))
        var q = o + 4 + len
        var cont = true
        while (cont && q + 4 <= wb.length && u16(wb, q) == 0x003c) {
          val l2 = u16(wb, q + 2)
          if (l2 < 0) cont = false
          else { spans :+= ((q + 4, math.min(q + 4 + l2, wb.length))); q += 4 + l2 }
        }
      } else o += 4 + len
    }
    if (spans.isEmpty) return Left(".xls Workbook has no SST record")

    var si = 0
    var p = spans(0)._1
    def left: Int = spans(si)._2 - p
    def hop(): Boolean =
      if (si + 1 < spans.length) { si += 1; p = spans(si)._1; true } else false
    // structure headers never split across records (MS-XLS 2.1.4)
    def ensure(n: Int): Boolean = { while (left == 0 && hop()) {}; left >= n }
    def rdU8(): Int = { val v = wb(p) & 0xff; p += 1; v }
    def rdU16(): Int = { val v = u16(wb, p); p += 2; v }
    def rdU32(): Long = { val v = u32(wb, p); p += 4; v }

    if (!ensure(8)) return Left(".xls SST header truncated")
    rdU32() // cstTotal
    val cstUnique = rdU32()
    val strings = ArrayBuffer.empty[String]
    var ok = true
    var i = 0L
    while (ok && i < cstUnique && i < (1L << 22)) {
      if (!ensure(3)) ok = false
      else {
        val cch = rdU16()
        val flFull = rdU8() // bit0 fHighByte, bit2 fExtSt, bit3 fRichSt
        var wide = (flFull & 0x01) != 0
        var cRun = 0
        var cbExt = 0L
        if ((flFull & 0x08) != 0) { if (ensure(2)) cRun = rdU16() else ok = false }
        if (ok && (flFull & 0x04) != 0) { if (ensure(4)) cbExt = rdU32() else ok = false }
        if (ok) {
          val sb = new java.lang.StringBuilder
          var n = cch
          while (ok && n > 0) {
            if (left == 0) {
              // fragment resumes in the next Continue with a fresh grbit
              if (!hop() || left < 1) ok = false
              else wide = (rdU8() & 0x01) != 0
            }
            if (ok) {
              val per = if (wide) 2 else 1
              val k = math.min(n, left / per)
              if (k <= 0) ok = false // odd dangling byte: corrupt
              else {
                sb.append(new String(wb, p, k * per,
                  if (wide) StandardCharsets.UTF_16LE else StandardCharsets.ISO_8859_1))
                p += k * per
                n -= k
              }
            }
          }
          // rich runs (4 B each) and ext blocks continue verbatim —
          // skip across span boundaries without re-reading grbits
          var skip = cRun.toLong * 4 + cbExt
          while (ok && skip > 0) {
            if (left == 0) { if (!hop()) ok = false }
            else { val k = math.min(skip, left.toLong).toInt; p += k; skip -= k }
          }
          if (ok) strings += sb.toString
        }
        i += 1
      }
    }
    if (strings.isEmpty) Left(".xls Workbook has no extractable SST strings")
    else Right(BinaryParser.BinaryParse(strings.mkString("\n").trim, None, Nil,
      Map("format" -> Seq("xls"), "sst_strings" -> Seq(strings.length.toString))))
  }

  // ---- .ppt (PowerPoint text atoms) ----------------------------------

  private def parsePpt(cf: Cfbf): Either[String, BinaryParser.BinaryParse] = {
    val ps = cf.stream("PowerPoint Document").get
    val out = ArrayBuffer.empty[String]
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var o = from
      while (o + 8 <= to && depth < 32) {
        val verInst = u16(ps, o)
        val typ = u16(ps, o + 2)
        val len = u32(ps, o + 4).toInt
        if (len < 0 || o + 8 + len > to) return
        if ((verInst & 0x0f) == 0x0f) walk(o + 8, o + 8 + len, depth + 1) // container
        else if (typ == 0x0fa0 && len >= 2) // TextCharsAtom, UTF-16LE
          out += new String(ps, o + 8, len, StandardCharsets.UTF_16LE)
        else if (typ == 0x0fa8 && len >= 1) // TextBytesAtom, 8-bit
          out += new String(ps, o + 8, len, StandardCharsets.ISO_8859_1)
        o += 8 + len
      }
    }
    walk(0, ps.length, 0)
    if (out.isEmpty) Left(".ppt document has no text atoms")
    else Right(BinaryParser.BinaryParse(
      out.mkString("\n").replace('\r', '\n').trim, None, Nil,
      Map("format" -> Seq("ppt"), "text_atoms" -> Seq(out.length.toString))))
  }
}
