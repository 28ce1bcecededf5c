package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Top-k rows per group as a NATIVE AGGREGATE — the scale-correct
  * replacement for the `row_number() over (partition by g order by …)
  * where rank <= k` idiom. The window formulation SORTS the whole
  * frame inside each partition (WindowGroupLimit trims the window's
  * OUTPUT, not the sort): at sf1000 q46's exploded-term frame is
  * ~10⁹ rows and the two window sorts spilled past the machine's free
  * disk and killed the query. This aggregate keeps a fixed ≤k-entry
  * buffer per group, combines map-side (partial top-k shuffles at
  * most k rows per group per map partition), and never sorts anything
  * larger than k — hash aggregation end to end.
  *
  * Ordering is the TF-IDF-shaped rank the q46 oracle mirrors:
  * tf DESC, df ASC, term ASC — a TOTAL order over a group's entries
  * (terms are distinct within a group by construction upstream), so
  * partial/final decomposition cannot change the winner set.
  */
case class TopKTermsAgg(term: Expression, tf: Expression, df: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[TopKTermsAgg.Entry]] {
  require(k > 0, "top-k needs k > 0")

  import TopKTermsAgg.Entry

  override def children: Seq[Expression] = Seq(term, tf, df)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("df", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[Entry] = ArrayBuffer.empty

  /** a strictly better than b under (tf DESC, df ASC, term ASC). */
  private def better(aTf: Long, aDf: Long, aTerm: UTF8String, b: Entry): Boolean =
    aTf > b.tf || (aTf == b.tf &&
      (aDf < b.df || (aDf == b.df && aTerm.compareTo(b.term) < 0)))

  private def insert(buf: ArrayBuffer[Entry], t: UTF8String, tfv: Long, dfv: Long): Unit =
    if (buf.length < k) {
      // clone: the UTF8String points into a reused unsafe-row buffer
      buf += Entry(t.clone(), tfv, dfv)
    } else {
      // k is small (3 for q46): linear worst-scan beats heap overhead
      var wi = 0
      var i = 1
      while (i < buf.length) {
        if (better(buf(wi).tf, buf(wi).df, buf(wi).term, buf(i))) wi = i
        i += 1
      }
      if (better(tfv, dfv, t, buf(wi))) buf(wi) = Entry(t.clone(), tfv, dfv)
    }

  override def update(buf: ArrayBuffer[Entry], input: InternalRow): ArrayBuffer[Entry] = {
    val t = term.eval(input).asInstanceOf[UTF8String]
    if (t != null) {
      val tfv = tf.eval(input)
      val dfv = df.eval(input)
      if (tfv != null && dfv != null)
        insert(buf, t, tfv.asInstanceOf[Long], dfv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Entry], other: ArrayBuffer[Entry]): ArrayBuffer[Entry] = {
    other.foreach(e => insert(buf, e.term, e.tf, e.df))
    buf
  }

  override def eval(buf: ArrayBuffer[Entry]): Any = {
    val sorted = buf.sortWith((a, b) => better(a.tf, a.df, a.term, b))
    new GenericArrayData(sorted.map(e =>
      new GenericInternalRow(Array[Any](e.term, e.tf, e.df)): Any).toArray)
  }

  override def serialize(buf: ArrayBuffer[Entry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { e =>
      out.writeLong(e.tf); out.writeLong(e.df)
      val tb = e.term.getBytes
      out.writeInt(tb.length); out.write(tb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Entry] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new ArrayBuffer[Entry](n)
    var i = 0
    while (i < n) {
      val tfv = in.getLong; val dfv = in.getLong
      val tb = new Array[Byte](in.getInt); in.get(tb)
      buf += Entry(UTF8String.fromBytes(tb), tfv, dfv)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKTermsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKTermsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKTermsAgg =
    copy(term = c(0), tf = c(1), df = c(2))
  override def prettyName: String = "topk_terms"
}

object TopKTermsAgg {
  final case class Entry(term: UTF8String, tf: Long, df: Long)

  /** Column API: array<struct<term,tf,df>> of the group's top-k by
    * (tf DESC, df ASC, term ASC), best first. */
  def topKTerms(term: Column, tf: Column, df: Column, k: Int): Column =
    ColumnBridge.column(TopKTermsAgg(
      ColumnBridge.expression(term),
      ColumnBridge.expression(tf.cast("long")),
      ColumnBridge.expression(df.cast("long")), k).toAggregateExpression())
}

/** Min-k rows per group by (ord ASC, str ASC) as a native aggregate —
  * the frontier-selection shape: "the k earliest-due URLs per host"
  * without sorting the host's whole queue. The window spelling
  * (`row_number over (partition by key order by due, url) <= k`)
  * local-sorts every row under the WindowGroupLimit (measured 26 s
  * warm at sf1000's 10⁹ rows, 1.5 µs/row); this buffer touches each
  * row with one long compare and shuffles ≤k entries per group per
  * map partition.
  *
  * `ord` must evaluate to a Long-backed type (long / timestamp /
  * timestamp_ntz / int / date — Catalyst physically stores all of
  * these as integral values); the output struct field keeps the
  * input's logical type. `str` is evaluated LAZILY — only when the
  * row's ord survives the worst-entry gate — so a computed string
  * (e.g. a URL concat) costs nothing on the ~all rows that lose: at
  * 25 M rows per host and k=3, the string is built ~never.
  *
  * Multiset semantics match row_number exactly: ties within the top-k
  * are kept (rows equal on (ord, str) are indistinguishable in the
  * output), and a full buffer only evicts on STRICT improvement, so
  * arrival order can't change the result. Null ord rows are skipped
  * (the window's nulls-first would rank them — callers here never
  * produce null order keys; documented contract).
  */
case class MinKByOrdStrAgg(ord: Expression, str: Expression, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[MinKByOrdStrAgg.Entry]] {
  require(k > 0, "min-k needs k > 0")

  import MinKByOrdStrAgg.Entry

  private def ordIsLongBacked(dt: DataType): Boolean = dt match {
    case LongType | TimestampType | TimestampNTZType | IntegerType | DateType => true
    case _ => false
  }
  // type check must wait for analysis — at construction `ord` may still
  // be an unresolved attribute (dataType NullType)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!ordIsLongBacked(ord.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ord must be long-backed (long/timestamp/timestamp_ntz/int/date), got ${ord.dataType}")
    else if (str.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"str must be string, got ${str.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(ord, str)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", ord.dataType, nullable = false),
    StructField("s", StringType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[Entry] = ArrayBuffer.empty

  /** (aL, aS) strictly smaller than b under (ord ASC, s ASC). */
  private def smaller(aL: Long, aS: UTF8String, b: Entry): Boolean =
    aL < b.l || (aL == b.l && aS.compareTo(b.s) < 0)

  /** index of the LARGEST (worst) entry in a full buffer. */
  private def worstIdx(buf: ArrayBuffer[Entry]): Int = {
    var wi = 0
    var i = 1
    while (i < buf.length) {
      if (smaller(buf(wi).l, buf(wi).s, buf(i))) wi = i
      i += 1
    }
    wi
  }

  override def update(buf: ArrayBuffer[Entry], input: InternalRow): ArrayBuffer[Entry] = {
    val o = ord.eval(input)
    if (o != null) {
      val l = o match {
        case x: Long => x
        case x: Int => x.toLong
      }
      if (buf.length < k) {
        val s = str.eval(input).asInstanceOf[UTF8String]
        if (s != null) buf += Entry(l, s.clone())
      } else {
        val wi = worstIdx(buf)
        val w = buf(wi)
        // ord-first gate: the string is NOT evaluated unless the row
        // can still win on the tie-break (l == w.l) or wins outright.
        if (l < w.l) {
          val s = str.eval(input).asInstanceOf[UTF8String]
          if (s != null) buf(wi) = Entry(l, s.clone())
        } else if (l == w.l) {
          val s = str.eval(input).asInstanceOf[UTF8String]
          if (s != null && s.compareTo(w.s) < 0) buf(wi) = Entry(l, s.clone())
        }
      }
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Entry], other: ArrayBuffer[Entry]): ArrayBuffer[Entry] = {
    other.foreach { e =>
      if (buf.length < k) buf += e
      else {
        val wi = worstIdx(buf)
        if (smaller(e.l, e.s, buf(wi))) buf(wi) = e
      }
    }
    buf
  }

  override def eval(buf: ArrayBuffer[Entry]): Any = {
    val sorted = buf.sortWith((a, b) => smaller(a.l, a.s, b))
    // the output struct declares `ord` with the INPUT's logical type —
    // int/date are physically Int in Catalyst rows, so a boxed Long here
    // would make the downstream getInt throw ClassCastException.
    val intBacked = ord.dataType match {
      case IntegerType | DateType => true
      case _ => false
    }
    new GenericArrayData(sorted.map { e =>
      val o: Any = if (intBacked) e.l.toInt else e.l
      new GenericInternalRow(Array[Any](o, e.s)): Any
    }.toArray)
  }

  override def serialize(buf: ArrayBuffer[Entry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { e =>
      out.writeLong(e.l)
      val sb = e.s.getBytes
      out.writeInt(sb.length); out.write(sb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Entry] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new ArrayBuffer[Entry](n)
    var i = 0
    while (i < n) {
      val l = in.getLong
      val sb = new Array[Byte](in.getInt); in.get(sb)
      buf += Entry(l, UTF8String.fromBytes(sb))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKByOrdStrAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKByOrdStrAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinKByOrdStrAgg =
    copy(ord = c(0), str = c(1))
  override def prettyName: String = "min_k_by_ord_str"
}

object MinKByOrdStrAgg {
  final case class Entry(l: Long, s: UTF8String)

  /** Column API: array<struct<ord,s>> of the group's k smallest rows
    * by (ord ASC, s ASC), smallest first. */
  def minKByOrdStr(ord: Column, str: Column, k: Int): Column =
    ColumnBridge.column(MinKByOrdStrAgg(
      ColumnBridge.expression(ord),
      ColumnBridge.expression(str), k).toAggregateExpression())
}
