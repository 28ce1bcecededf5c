package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{UrlExpressions, GraftExtensions}

/** Native Catalyst expression specs: same semantics as the Scala layer,
  * and codegen actually engages (no CodegenFallback). */
class ExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("normalize_url expression via Column API") {
    import spark.implicits._
    val df = Seq(
      "HTTP://WWW.Example.COM:80/Path#frag",
      "http://e.com/p?a=1&sid=x",
      "garbage",
      null
    ).toDF("url")
    val out = df.select(UrlExpressions.normalizeUrl($"url").as("n")).collect().map(_.getString(0))
    assert(out(0) == "http://www.example.com/Path")
    assert(out(1) == "http://e.com/p?a=1")
    assert(out(2) == null)
    assert(out(3) == null)
  }

  test("partition_key expression matches the Scala layer") {
    import spark.implicits._
    val df = Seq("https://news.example.co.uk/x").toDF("url")
    val host = df.select(UrlExpressions.partitionKey($"url", "byHost")).head().getString(0)
    val dom  = df.select(UrlExpressions.partitionKey($"url", "byDomain")).head().getString(0)
    assert(host == "news.example.co.uk")
    assert(dom == "example.co.uk")
  }

  test("SQL registration + whole-stage codegen engages") {
    UrlExpressions.register(spark)
    val out = spark.sql(
      "SELECT normalize_url_native('HTTP://A.com:80/x#f') AS n, " +
      "partition_key_native('http://sub.a.com/x', 'byDomain') AS k")
      .collect().head
    assert(out.getString(0) == "http://a.com/x")
    assert(out.getString(1) == "a.com")

    // codegen path: a range-sourced plan (not constant-foldable) with
    // the expression must stay inside WholeStageCodegen (CodegenFallback
    // would split the Project out of the codegen span)
    import org.apache.spark.sql.functions.{concat, lit, col}
    val df = spark.range(10)
      .select(UrlExpressions.normalizeUrl(
        concat(lit("HTTP://A.com:80/p/"), col("id"))).as("n"))
    // '*(n)' prefix in simpleString == inside a WholeStageCodegen span
    val hasWsc = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc, df.queryExecution.executedPlan.toString)
    val vals = df.collect().map(_.getString(0))
    assert(vals(3) == "http://a.com/p/3")
  }

  test("extensions class applies cleanly; registration works on a cloned session") {
    // getOrCreate in a shared-JVM test suite returns the existing
    // session, so withExtensions can't be observed end-to-end here —
    // assert the injector itself and the registry path on a session
    // clone instead.
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    val s2 = spark.newSession()
    UrlExpressions.register(s2)
    val r = s2.sql("SELECT normalize_url_native('http://E.com/a#b') AS n").collect().head
    assert(r.getString(0) == "http://e.com/a")
  }
}
