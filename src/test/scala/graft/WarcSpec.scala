package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** WARC write → read roundtrip (WARCSpout / WARCHdfsBolt semantics). */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("roundtrip: content rows -> gzipped WARC -> content rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warc").toString
    val rows = Seq(
      ("http://a.example/x.html", 200, "<html>Hello A</html>".getBytes, "text/html"),
      ("http://b.example/y.html", 404, "not found".getBytes, "text/plain"),
      ("http://c.example/z.bin", 200, Array.tabulate(300)(_.toByte), "application/octet-stream"))
      .toDF("url", "http_code", "content", "content_type")

    Warc.write(rows.repartition(2), dir)

    val back = Warc.read(spark, dir)
    val got = back.collect().map(r =>
      r.getAs[String]("url") -> (r.getAs[Int]("http_code"),
        new String(r.getAs[Array[Byte]]("content").take(12), "ISO-8859-1"))).toMap
    assert(got.keySet == Set("http://a.example/x.html", "http://b.example/y.html",
      "http://c.example/z.bin"))
    assert(got("http://a.example/x.html")._1 == 200)
    assert(got("http://a.example/x.html")._2.startsWith("<html>Hello"))
    assert(got("http://b.example/y.html")._1 == 404)
    // binary payload length preserved
    val binRow = back.where(col("url") === "http://c.example/z.bin").collect().head
    assert(binRow.getAs[Array[Byte]]("content").length == 300)
    assert(binRow.getAs[String]("content_type") == "application/octet-stream")
  }

  test("warc record parser: record framing and http split") {
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nBODY").getBytes
    val (code, headers, body) = Warc.parseHttpResponse(payload)
    assert(code == 200)
    assert(headers("Content-Type") == "text/html")
    assert(new String(body) == "BODY")
    // payload without header split
    val (c2, h2, b2) = Warc.parseHttpResponse("just bytes".getBytes)
    assert(c2 == 200 && h2.isEmpty && new String(b2) == "just bytes")
  }
}
