package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature computation as a native Catalyst
  * expression.
  *
  * The column-algebra formulation (explode shingles → md5 → groupBy min,
  * mirroring the reference's signature idea `MD5SignatureParseFilter
  * .java:48` generalized to shingles) is correct but pays for itself
  * twice at scale: the explode materializes one row per shingle (a 50×
  * row blowup before the aggregation), and the nested higher-order
  * functions building the shingle array are CodegenFallback — Catalyst's
  * CollapseProject happily re-inlines that interpreted subtree into every
  * consumer, multiplying the work again. This expression does the whole
  * signature in ONE pass per document inside whole-stage codegen:
  * split → k-shingle → one md5 per shingle → running min of each 32-bit
  * md5 chunk. No shuffle, no explode, no interpreted lambdas — the
  * per-document cost is exactly `numShingles` digests, and the operator
  * is embarrassingly parallel (the property that matters at 100 TB:
  * signatures cost one map pass over the corpus, full stop).
  *
  * Semantics are engine-portable and match the DuckDB oracles:
  * words = single-space split with empty tokens dropped; shingle i =
  * words[i..i+k-1] joined by ' '; hash j of a shingle = the j-th
  * 8-hex-char chunk of md5(shingle) read as an unsigned 32-bit int
  * (`CAST('0x'||substr(md5(s),1+8j,8) AS BIGINT)`); the signature is the
  * element-wise min. Returns NULL when the document yields no tokens
  * (shorter than k words), matching the explode formulation where such
  * documents vanish before the aggregation.
  */
object TextHashOps {
  private val hexDigits = "0123456789abcdef".toCharArray

  /** MinHash signature: array of `numHashes` (≤4) unsigned-32-bit mins,
    * or null when the text has fewer than k words. `distinct` hashes
    * each distinct unigram once (the unigram-MinHash used for LSH
    * banding) — only meaningful with k == 1. */
  def minhashChunks(text: UTF8String, k: Int, numHashes: Int, distinct: Boolean): ArrayData = {
    if (text == null) return null
    val raw = text.toString.split(' ')
    var nw = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) { raw(nw) = raw(i); nw += 1 }; i += 1 }
    if (nw < k) return null
    val md = MessageDigest.getInstance("MD5")
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val seen = if (distinct && k == 1) new java.util.HashSet[String]() else null
    val sb = new java.lang.StringBuilder()
    var s = 0
    while (s <= nw - k) {
      sb.setLength(0)
      var o = 0
      while (o < k) { if (o > 0) sb.append(' '); sb.append(raw(s + o)); o += 1 }
      val tok = sb.toString
      if (seen == null || seen.add(tok)) {
        val d = md.digest(tok.getBytes(StandardCharsets.UTF_8))
        var j = 0
        while (j < numHashes) {
          val v = ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
            ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        md.reset()
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}

/** `minhash_sig(text)` with foldable k/numHashes/distinct baked in at
  * construction — they come from the operator call site, not the data. */
case class MinhashChunksExpr(child: Expression, k: Int, numHashes: Int,
                             distinct: Boolean) extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 4, "one md5 yields 4 chunks")
  private val ops = "graft.functions.TextHashOps$.MODULE$"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // short docs have no signature

  override def nullSafeEval(input: Any): Any =
    TextHashOps.minhashChunks(input.asInstanceOf[UTF8String], k, numHashes, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = $ops.minhashChunks(${c.value}, $k, $numHashes, $distinct);
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashChunksExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object TextHashExpressions {
  def minhashSig(text: Column, k: Int, numHashes: Int, distinct: Boolean = false): Column =
    ColumnBridge.column(MinhashChunksExpr(ColumnBridge.expression(text), k, numHashes, distinct))
}
