package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Product-quantization primitives (see
  * [[graft.analytics.Similarity.pqTopK]]): the query-side distance
  * lookup table and the code-side table lookup sum. Same exact-integer
  * geometry as [[KmeansOps]] — every distance is long arithmetic over
  * `floor(x * 2^20)`-quantized components, so codebooks, codes, and
  * approximate distances are bit-identical across engines and
  * partitionings.
  */
object PqOps {

  /** LUT[s][j] = squared L2 distance between query subvector s and
    * codebook entry j of subspace s. `books(s)(j)` is a `subDim`-long
    * centroid; the query rides in as the full quantized vector. */
  def lut(qv: ArrayData, books: Array[Array[Array[Long]]]): GenericArrayData = {
    val m = books.length
    val out = new Array[Any](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      val k = book.length
      val subDim = if (k > 0) book(0).length else 0
      val row = new Array[Long](k)
      var j = 0
      while (j < k) {
        val cent = book(j)
        var d = 0L
        var i = 0
        while (i < subDim) {
          val diff = qv.getLong(off + i) - cent(i)
          d += diff * diff
          i += 1
        }
        row(j) = d
        j += 1
      }
      out(s) = new GenericArrayData(row)
      off += subDim
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Approximate squared distance = Σ_s LUT[s][codes[s]]. */
  def dist(lut: ArrayData, codes: ArrayData): Long = {
    val m = codes.numElements()
    var d = 0L
    var s = 0
    while (s < m) {
      d += lut.getArray(s).getLong(codes.getInt(s))
      s += 1
    }
    d
  }
}

/** `pq_lut(qv)` → ARRAY<ARRAY<BIGINT>> (m × kCodes) against plan-time
  * codebooks (codegen reference object — computed once per query ROW;
  * the query side is small by contract, the corpus side never sees
  * this expression). */
case class PqLutExpr(child: Expression, books: Array[Array[Array[Long]]])
    extends UnaryExpression {
  private val ops = "graft.functions.PqOps$.MODULE$"
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def nullSafeEval(a: Any): Any =
    PqOps.lut(a.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "long[][][]")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ops.lut($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_lut"
}

/** `pq_dist(lut, codes)` → BIGINT — the scan-side hot loop: m array
  * loads + adds per candidate, no float math, no codebook access. */
case class PqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private val ops = "graft.functions.PqOps$.MODULE$"
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    PqOps.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ops.dist($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqDistExpr =
    copy(left = l, right = r)
  override def prettyName: String = "pq_dist"
}

object PqFunctions {
  def pqLut(qv: Column, books: Array[Array[Array[Long]]]): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(qv), books))

  def pqDist(lut: Column, codes: Column): Column =
    ColumnBridge.column(
      PqDistExpr(ColumnBridge.expression(lut), ColumnBridge.expression(codes)))
}
