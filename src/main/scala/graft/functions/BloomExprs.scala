package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter build/probe primitives for prefiltered joins.
  *
  * The scale problem these solve (see
  * [[graft.analytics.Decontaminate.ngramHitsBloom]]): a broadcast hash
  * join needs the whole build side resident per executor — fine for an
  * eval set of thousands of grams, impossible when the filter side has
  * grown to hundreds of millions of keys (a full benchmark-suite gram
  * table at ~50 bytes/key is tens of GB as a hash relation). A Bloom
  * filter over the same keys is `m` BITS total (one long[] of
  * `2^log2Bits / 64` words — 128 KiB at the default 2^20), rides into
  * the probe task as a codegen reference object exactly like
  * [[KmeansAssignExpr]]'s centroid matrix, and answers "definitely
  * absent" with zero false negatives — so a map-only `where` on the
  * probe side drops ~all non-matching rows BEFORE the shuffle, and the
  * exact join that follows (over survivors only) removes the false
  * positives. The result is hash-identical to the plain join by
  * construction; only the bytes that cross the wire change.
  *
  * This mirrors what Spark's own `InjectRuntimeFilter` builds for
  * selective joins, but as an explicit, deterministic operator surface:
  * the bit pattern depends only on the key set (set-bit union is
  * commutative), never on partitioning or row order.
  *
  * Hashing: double hashing `pos_i = (h1 + i*h2) mod m` (Kirsch &
  * Mitzenmacher's standard construction) over two independent-seed
  * XXH64 runs of the UTF-8 bytes; `m` is a power of two so the mod is a
  * mask. Build ([[BloomPositionsExpr]]) and probe
  * ([[BloomContainsExpr]]) share [[BloomOps]], so agreement is by
  * construction and no oracle ever needs to reproduce the hash — the
  * final answer is defined by the EXACT confirm join.
  */
object BloomOps {
  private final val Seed1 = 42L
  private final val Seed2 = 0x5bd1e995L

  /** The `numHash` bit positions of `s` in a `2^log2Bits`-bit filter. */
  def positions(s: UTF8String, numHash: Int, log2Bits: Int): GenericArrayData = {
    val mask = (1 << log2Bits) - 1
    val h1 = XXH64.hashUTF8String(s, Seed1)
    val h2 = XXH64.hashUTF8String(s, Seed2)
    val out = new Array[Int](numHash)
    var i = 0
    while (i < numHash) {
      out(i) = ((h1 + i.toLong * h2) & mask).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** True iff every bit position of `s` is set in `bits` — possibly a
    * false positive, never a false negative. */
  def contains(s: UTF8String, bits: Array[Long], numHash: Int, log2Bits: Int): Boolean = {
    val mask = (1 << log2Bits) - 1
    val h1 = XXH64.hashUTF8String(s, Seed1)
    val h2 = XXH64.hashUTF8String(s, Seed2)
    var i = 0
    while (i < numHash) {
      val p = ((h1 + i.toLong * h2) & mask).toInt
      if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Assemble the bit array from collected set positions (driver-side;
    * bounded by `2^log2Bits` positions = the filter's own size). */
  def buildBits(positions: Array[Int], log2Bits: Int): Array[Long] = {
    val bits = new Array[Long]((1 << log2Bits) >>> 6)
    var i = 0
    while (i < positions.length) {
      val p = positions(i)
      bits(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
    bits
  }
}

/** `bloom_positions(s)` → ARRAY<INT> — the build-side leg: explode +
  * distinct + a bounded collect gives the driver the set-bit list. */
case class BloomPositionsExpr(child: Expression, numHash: Int, log2Bits: Int)
    extends UnaryExpression {
  private val ops = "graft.functions.BloomOps$.MODULE$"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    BloomOps.positions(a.asInstanceOf[UTF8String], numHash, log2Bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ops.positions($a, $numHash, $log2Bits);")

  override protected def withNewChildInternal(newChild: Expression): BloomPositionsExpr =
    copy(child = newChild)
  override def prettyName: String = "bloom_positions"
}

/** `bloom_contains(s)` against a plan-time bit array (codegen reference
  * object — NOT a join side, NOT an array literal in generated source).
  * The probe is `numHash` XXH64 runs + bit tests inside whole-stage
  * codegen; a filter on it is map-only. */
case class BloomContainsExpr(child: Expression, bits: Array[Long],
                             numHash: Int, log2Bits: Int)
    extends UnaryExpression {
  private val ops = "graft.functions.BloomOps$.MODULE$"
  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any): Any =
    BloomOps.contains(a.asInstanceOf[UTF8String], bits, numHash, log2Bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ops.contains($a, $ref, $numHash, $log2Bits);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpr =
    copy(child = newChild)
  override def prettyName: String = "bloom_contains"
}

/** Column-API face, mirroring [[VecExpressions]]. */
object BloomFunctions {
  def bloomPositions(c: Column, numHash: Int, log2Bits: Int): Column =
    ColumnBridge.column(
      BloomPositionsExpr(ColumnBridge.expression(c), numHash, log2Bits))

  def bloomContains(c: Column, bits: Array[Long], numHash: Int, log2Bits: Int): Column =
    ColumnBridge.column(
      BloomContainsExpr(ColumnBridge.expression(c), bits, numHash, log2Bits))
}
