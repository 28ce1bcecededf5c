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
