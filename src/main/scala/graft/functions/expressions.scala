package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot URL scalar functions —
  * the "optional niceties" of SURVEY §4: null-safe codegen instead of
  * Scala-UDF boxing. `doGenCode` emits a static call into
  * [[UrlExprOps]], so the expression stays inside whole-stage codegen:
  * one JVM call per row, no encoder round-trip, no closure capture —
  * measurably cheaper than a UDF at 100 TB scan scale.
  */
object UrlExprOps {
  /** UTF8String-native normalize; null = drop (filter semantics). */
  def normalize(url: UTF8String): UTF8String =
    if (url == null) null
    else Urls.normalize(url.toString).map(UTF8String.fromString).orNull

  def partitionKey(url: UTF8String, mode: UTF8String): UTF8String =
    if (url == null) null
    else Urls.partitionKey(url.toString, if (mode == null) "byHost" else mode.toString)
      .map(UTF8String.fromString).orNull
}

/** `normalize_url(url)` — BasicURLNormalizer as a Catalyst expression. */
case class NormalizeUrlExpr(child: Expression) extends UnaryExpression {
  private val ops = "graft.functions.UrlExprOps$.MODULE$"

  override def dataType: DataType = StringType
  override def nullable: Boolean = true // malformed urls normalize to null

  override def nullSafeEval(input: Any): Any =
    UrlExprOps.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = $ops.normalize(${c.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeUrlExpr =
    copy(child = newChild)
  override def prettyName: String = "normalize_url"
}

/** `partition_key(url, mode)` — URLPartitioner as a Catalyst expression;
  * the mode argument is typically a foldable literal, so constant
  * folding keeps the mode branch out of the per-row loop. */
case class PartitionKeyExpr(left: Expression, right: Expression) extends BinaryExpression {
  private val ops = "graft.functions.UrlExprOps$.MODULE$"

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(url: Any, mode: Any): Any =
    UrlExprOps.partitionKey(url.asInstanceOf[UTF8String], mode.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${l.isNull}) {
          ${ev.value} = $ops.partitionKey(${l.value}, ${r.isNull} ? null : ${r.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "partition_key"
}

/** JVM side of [[TransferKeysExpr]] — one static call per row from
  * generated code. */
object MetadataExprOps {
  /** Kept keys of a metadata map under the MetadataTransfer whitelist
    * (exact keys + prefix globs, `MetadataTransfer.java:151-180`),
    * sorted (UTF8String binary order — array_sort's string semantics)
    * and comma-joined. Empty map / nothing kept → empty string, the
    * same as array_join over an empty array. */
  def keptKeys(m: org.apache.spark.sql.catalyst.util.MapData,
               exact: Array[UTF8String],
               prefixes: Array[UTF8String]): UTF8String = {
    val keys = m.keyArray()
    val n = m.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val k = keys.getUTF8String(i)
      var keep = false
      var j = 0
      while (!keep && j < exact.length) { if (k == exact(j)) keep = true; j += 1 }
      j = 0
      while (!keep && j < prefixes.length) {
        if (k.startsWith(prefixes(j))) keep = true; j += 1
      }
      if (keep) kept.add(k.clone()) // detach from the reused row buffer
      i += 1
    }
    java.util.Collections.sort(kept)
    UTF8String.concatWs(UTF8String.fromString(","),
      kept.toArray(new Array[UTF8String](kept.size())): _*)
  }
}

/** `transfer_kept_keys(md)` — the MetadataTransfer key projection
  * (whitelist exact keys + prefix globs over an open key set) folded
  * into ONE codegen'd call per row. The relational spelling
  * (`array_join(array_sort(map_keys(map_filter(md, λ))))`) evaluates
  * the λ per map entry through the INTERPRETED higher-order-function
  * path — at corpus scale that interpretation cost was q18's whole
  * profile (51 s at sf100, the suite's largest row). Bit-identical
  * output (spec-asserted truth table vs the relational form). */
case class TransferKeysExpr(child: Expression,
                            exact: Seq[String],
                            prefixes: Seq[String]) extends UnaryExpression {
  private val ops = "graft.functions.MetadataExprOps$.MODULE$"
  private lazy val exactU = exact.map(UTF8String.fromString).toArray
  private lazy val prefixesU = prefixes.map(UTF8String.fromString).toArray

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MetadataExprOps.keptKeys(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData],
      exactU, prefixesU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ex = ctx.addReferenceObj("transferExact", exactU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val px = ctx.addReferenceObj("transferPrefixes", prefixesU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        UTF8String ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ops.keptKeys(${c.value}, $ex, $px);
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): TransferKeysExpr =
    copy(child = newChild)
  override def prettyName: String = "transfer_kept_keys"
}

/** Column-API and SQL registration. */
object UrlExpressions {
  def normalizeUrl(c: Column): Column =
    ColumnBridge.column(NormalizeUrlExpr(ColumnBridge.expression(c)))
  def partitionKey(c: Column, mode: String): Column =
    ColumnBridge.column(PartitionKeyExpr(ColumnBridge.expression(c),
      Literal(UTF8String.fromString(mode), StringType)))
  def transferKeptKeys(md: Column, exact: Seq[String],
                       prefixes: Seq[String]): Column =
    ColumnBridge.column(TransferKeysExpr(ColumnBridge.expression(md),
      exact, prefixes))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_url_native", exprs => NormalizeUrlExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "partition_key_native", exprs => PartitionKeyExpr(exprs.head, exprs(1)), "built-in")
    TextVecRegistry.register(spark)
  }
}

/** SQL names for the text-hash and vector expressions. Count/size
  * arguments (shingle k, plane counts, …) must be foldable literals —
  * they select the compiled form of the expression, they are not data. */
object TextVecRegistry {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[functions] val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> { exprs =>
      MinhashChunksExpr(exprs.head, intLit(exprs(1), "k"),
        intLit(exprs(2), "numHashes"),
        exprs.lift(3).exists { case Literal(b: Boolean, _) => b; case _ => false })
    },
    "simhash16" -> { exprs => SimHash16Expr(exprs.head) },
    "winnow_fp" -> { exprs =>
      WinnowFpExpr(exprs.head, intLit(exprs(1), "shingleK"), intLit(exprs(2), "window"))
    },
    "dot_d" -> { exprs => DotDExpr(exprs.head, exprs(1)) },
    "l2_normalize" -> { exprs => L2NormalizeExpr(exprs.head) },
    "lsh_bucket" -> { exprs =>
      LshBucketExpr(exprs.head, intLit(exprs(1), "dim"), intLit(exprs(2), "numPlanes"))
    },
    "multi_probe_buckets" -> { exprs =>
      MultiProbeBucketsExpr(exprs.head, intLit(exprs(1), "dim"),
        intLit(exprs(2), "numPlanes"), intLit(exprs(3), "nprobe"))
    })

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** SparkSessionExtensions entry point:
  * `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("normalize_url_native"),
      new ExpressionInfo(classOf[NormalizeUrlExpr].getName, "normalize_url_native"),
      (exprs: Seq[Expression]) => NormalizeUrlExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("partition_key_native"),
      new ExpressionInfo(classOf[PartitionKeyExpr].getName, "partition_key_native"),
      (exprs: Seq[Expression]) => PartitionKeyExpr(exprs.head, exprs(1))))
    TextVecRegistry.all.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[MinhashChunksExpr].getName, name),
        builder))
    }
  }
}
