package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP `_bulk` implementation of the [[IndexSink]] contract — the
  * OpenSearch/Elasticsearch wire shape of the reference's indexer bolt
  * (`external/opensearch/.../bolt/IndexerBolt.java:71,198-242`, which
  * feeds a BulkProcessor; `DeletionBolt.java:58` for deletes). NDJSON
  * action+source pairs POSTed to `<endpoint>/_bulk`, document id =
  * sha256(url), `create` vs `index` action mirroring the reference's
  * `indexer.create` flag.
  *
  * Scale shape: everything up to the socket is codegen'd column work —
  * the action line and the JSON source document are built with
  * `concat`/`to_json` inside the executor plan, so the
  * `foreachPartition` loop only concatenates prepared strings into
  * `batchSize`-row NDJSON bodies and POSTs them (one connection per
  * batch, executor-local, no driver involvement — the same
  * fan-out-by-partition shape as the reference's per-bolt
  * BulkProcessor connections).
  *
  * A bulk response with `"errors":true` (or a non-2xx status) throws,
  * failing the Spark task so the batch is retried — bulk indexing is
  * idempotent by doc id, so replay is safe (the reference relies on
  * the same property when a bolt restarts mid-batch).
  */
final class HttpBulkIndexSink(
    endpoint: String,
    index: String = "content",
    create: Boolean = false,
    batchSize: Int = 500,
    connectTimeoutMs: Int = 30000,
    readTimeoutMs: Int = 60000) extends IndexSink {

  private def jsonStr(c: org.apache.spark.sql.Column) =
    // to_json of a one-field struct, shorn of the wrapper — produces a
    // correctly escaped JSON string scalar for embedding in the action
    regexp_replace(to_json(struct(c.as("v"))), "^\\{\"v\":|\\}$", "")

  def indexBatch(docs: DataFrame): Unit = {
    val verb = if (create) "create" else "index"
    val action = concat(
      lit(s"""{"$verb":{"_index":"$index","_id":"""),
      jsonStr(sha2(col("url"), 256)), lit("}}"))
    val source = to_json(struct(docs.columns.map(col).toIndexedSeq: _*))
    val prepared = docs.select(
      concat(action, lit("\n"), source, lit("\n")).as("line"))
    post(prepared)
  }

  def deleteBatch(urls: DataFrame): Unit = {
    val prepared = urls.select(concat(
      lit(s"""{"delete":{"_index":"$index","_id":"""),
      jsonStr(sha2(col("url"), 256)), lit("}}\n")).as("line"))
    post(prepared)
  }

  private def post(lines: DataFrame): Unit = {
    val (ep, bs) = (endpoint.stripSuffix("/"), batchSize)
    val (cto, rto) = (connectTimeoutMs, readTimeoutMs)
    lines.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      rows.grouped(bs).foreach { batch =>
        val body = batch.map(_.getString(0)).mkString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val conn = java.net.URI.create(s"$ep/_bulk").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        try {
          // a hung or half-open endpoint must FAIL the task (engaging
          // the retry semantics documented above), not block it forever
          conn.setConnectTimeout(cto)
          conn.setReadTimeout(rto)
          conn.setRequestMethod("POST")
          conn.setRequestProperty("Content-Type", "application/x-ndjson")
          conn.setDoOutput(true)
          conn.setFixedLengthStreamingMode(body.length)
          val os = conn.getOutputStream
          try { os.write(body); os.flush() } finally os.close()
          val code = conn.getResponseCode
          if (code < 200 || code >= 300)
            sys.error(s"bulk indexing failed: HTTP $code from $ep/_bulk")
          val resp = new String(conn.getInputStream.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          // minimal errors check: the bulk contract reports per-item
          // failures under a top-level "errors" flag
          if (resp.replaceAll("\\s", "").contains("\"errors\":true"))
            sys.error(s"bulk indexing reported item errors: ${resp.take(500)}")
        } finally conn.disconnect()
      }
    }
  }
}
