package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real image-header parsing for the multimodal `image` branch: PNG
  * (IHDR), GIF (logical screen descriptor), BMP (BITMAPINFOHEADER /
  * BITMAPCOREHEADER), and JPEG (marker walk to the first SOF frame
  * header) — the four formats are fully public byte layouts, so
  * `width`/`height`/`mime` come from the actual payload bytes with no
  * codec library. This is what a training-data pipeline filters on
  * (min-resolution gates, aspect-ratio buckets); full pixel DECODE
  * remains behind the [[Multimodal.FakeCodec]] stub boundary.
  *
  * Reference anchor: the reference ships binary content to Tika for
  * type detection (`external/tika/.../ParserBolt.java:145`); here the
  * sniff-and-measure is a native per-row expression instead of a
  * library call.
  */
object ImageHeaders {

  /** Parse a payload's image header: InternalRow(mime, width, height),
    * or null when the bytes are not a recognizable/plausible image.
    * Total work is O(1) for PNG/GIF/BMP and O(#markers) for JPEG —
    * never proportional to payload size. */
  def parseRow(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    @inline def be32(i: Int): Long = (be16(i).toLong << 16) | be16(i + 2)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Long = (le16(i + 2).toLong << 16) | le16(i)
    def row(mime: String, w: Long, h: Long): InternalRow =
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(mime), w.toInt, h.toInt))
      else null

    // PNG: 8-byte signature, then the IHDR chunk must come first —
    // width/height are big-endian u32 at offsets 16/20
    if (b.length >= 24 &&
        u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      row("image/png", be32(16), be32(20))
    // GIF87a / GIF89a: screen width/height are little-endian u16 at 6/8
    else if (b.length >= 10 &&
        b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      row("image/gif", le16(6), le16(8))
    // BMP: 14-byte file header then a DIB header whose size field
    // discriminates the layout; height may be negative (top-down rows)
    else if (b.length >= 22 && b(0) == 'B' && b(1) == 'M') {
      val dib = le32(14)
      if (dib >= 40 && b.length >= 26)
        row("image/bmp", le32(18), math.abs(le32(22).toInt).toLong)
      else if (dib == 12) // OS/2 BITMAPCOREHEADER: u16 fields
        row("image/bmp", le16(18), le16(20))
      else null
    }
    // JPEG: walk the marker stream from SOI to the first frame header
    // (SOF0..SOF15 minus DHT/JPG/DAC); height/width are big-endian u16
    // at +5/+7 inside the SOF segment
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(i) != 0xff) return null // lost marker sync: not a JPEG
        val m = u8(i + 1)
        if (m == 0xff) i += 1 // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
        else if (m == 0xd9 || m == 0xda) return null // EOI/SOS before any SOF
        else {
          val len = be16(i + 2)
          if (len < 2) return null
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (i + 8 >= b.length) return null
            return row("image/jpeg", be16(i + 7), be16(i + 5))
          }
          i += 2 + len
        }
      }
      null
    } else null
  }

  /** `image_meta(bytes)` → struct(mime, width, height), NULL for
    * non-image payloads. */
  def imageMeta(bytes: Column): Column =
    ColumnBridge.column(ImageMetaExpr(ColumnBridge.expression(bytes)))

  /** JVM-facing variant of [[parseRow]] for the parse stage's binary
    * branch: (mime, width, height), or None when not a recognizable
    * image. Same byte walk — the expression and the parse stage can
    * never disagree about a payload. */
  def parseMeta(b: Array[Byte]): Option[(String, Int, Int)] = {
    val r = parseRow(b)
    if (r == null) None
    else Some((r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))
  }
}

/** Native expression wrapper: stays inside whole-stage codegen (the
  * generated code calls the static parser, same pattern as
  * [[graft.functions.LangIdExpr]]). */
case class ImageMetaExpr(child: Expression) extends UnaryExpression {
  private val ops = "graft.multimodal.ImageHeaders$.MODULE$"
  // analysis-time type check: image_meta over a non-binary column is a
  // clean AnalysisException, not a runtime ClassCastException
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"image_meta requires BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageHeaders.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = $ops.parseRow($c);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
    code
  }

  override protected def withNewChildInternal(newChild: Expression): ImageMetaExpr =
    copy(child = newChild)
  override def prettyName: String = "image_meta"
}
