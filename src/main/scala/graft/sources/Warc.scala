package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC archive source + sink (SURVEY §2.1 `WARCSpout`, §2.8
  * `WARCHdfsBolt`/`WARCRecordFormat` — `external/warc/.../WARCSpout
  * .java:64,168-226`, `WARCRecordFormat.java:49`).
  *
  * Reader: `binaryFile` scan → flatMap parsing WARC/1.0 records
  * (response records become content rows). Files are processed whole
  * per task — WARC's gzip-per-record layout isn't splittable without an
  * index, so parallelism comes from many files (the standard layout of
  * web archives: thousands of ~1 GB files — scales horizontally by
  * file count, which is how the reference consumes them too).
  *
  * Writer: one gzipped WARC file per partition via foreachPartition,
  * warcinfo header record first, response records with verbatim HTTP
  * headers — time/size rotation maps to Spark's natural
  * file-per-partition output.
  */
object Warc {

  final case class WarcRecord(
      warcType: String,
      targetUri: Option[String],
      date: Option[String],
      headers: Map[String, String],
      payload: Array[Byte])

  /** Parse all records of one (possibly gzipped) WARC file. */
  def parseRecords(bytes: Array[Byte], gzipped: Boolean): Iterator[WarcRecord] = {
    val in = new java.io.DataInputStream(
      if (gzipped) new GZIPInputStream(new ByteArrayInputStream(bytes))
      else new ByteArrayInputStream(bytes))

    def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != -1 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
      }
      if (c == -1 && sb.isEmpty) null else sb.toString
    }

    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = advance()

      private def advance(): WarcRecord = {
        var line = readLine()
        while (line != null && !line.startsWith("WARC/")) line = readLine()
        if (line == null) return null
        val headers = mutable.Map.empty[String, String]
        var h = readLine()
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) headers(h.substring(0, i).trim) = h.substring(i + 1).trim
          h = readLine()
        }
        // tolerate malformed/oversized lengths: skip the record, keep
        // the iterator alive (one bad record must not kill the file)
        val len = headers.getOrElse("Content-Length", "0").trim.toLongOption match {
          case Some(n) if n >= 0 && n <= Int.MaxValue => n.toInt
          case _ => return advance()
        }
        val payload = new Array[Byte](len)
        in.readFully(payload)
        WarcRecord(
          headers.getOrElse("WARC-Type", "unknown"),
          headers.get("WARC-Target-URI"),
          headers.get("WARC-Date"),
          headers.toMap, payload)
      }

      def hasNext: Boolean = nextRec != null
      def next(): WarcRecord = { val r = nextRec; nextRec = advance(); r }
    }
  }

  /** Split an HTTP response payload into (status code, headers, body). */
  def parseHttpResponse(payload: Array[Byte]): (Int, Map[String, String], Array[Byte]) = {
    val sep = indexOfDoubleCrlf(payload)
    if (sep < 0) return (200, Map.empty, payload)
    val head = new String(payload, 0, sep, StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    val code = lines.headOption.flatMap(_.split(" ").lift(1)).flatMap(_.toIntOption).getOrElse(200)
    val headers = lines.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i > 0) Some(l.substring(0, i).trim -> l.substring(i + 1).trim) else None
    }.toMap
    (code, headers, payload.drop(sep + 4))
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  val contentSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("http_code", IntegerType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true)))

  /** Read response records of WARC files under `path` as content rows —
    * the WARCSpout replay source. Consumes only COMMITTED files: the
    * writer lands shards under hidden `.part-*.tmp` names and
    * atomic-renames on task success, and Spark's file index skips
    * dot-prefixed files — so a killed-mid-write or straggler attempt
    * can never feed truncated gzip or duplicate records into the scan.
    * The explicit `.tmp` suffix filter is belt-and-braces for archives
    * written by other tools with visible temp names. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(contentSchema)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .filter(!col("path").endsWith(".tmp"))
      .select(col("path"), col("content"))
      .mapPartitions { files =>
        files.flatMap { f =>
          val path = f.getString(0)
          val bytes = f.getAs[Array[Byte]](1)
          parseRecords(bytes, gzipped = path.endsWith(".gz"))
            .filter(r => r.warcType == "response" && r.targetUri.isDefined)
            .map { r =>
              val (code, headers, body) = parseHttpResponse(r.payload)
              Row(r.targetUri.get, code, body,
                headers.collectFirst { case (k, v) if k.equalsIgnoreCase("content-type") => v }.orNull,
                r.date.orNull)
            }
        }
      }(enc)
  }

  private def record(warcType: String, headers: Seq[(String, String)],
                     payload: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder("WARC/1.0\r\n")
    head.append(s"WARC-Type: $warcType\r\n")
    headers.foreach { case (k, v) => head.append(s"$k: $v\r\n") }
    head.append(s"Content-Length: ${payload.length}\r\n\r\n")
    val out = new ByteArrayOutputStream()
    out.write(head.toString.getBytes(StandardCharsets.ISO_8859_1))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
    out.toByteArray
  }

  /** Write ONE shard transactionally: bytes land under a hidden
    * `.part-NNNNN-<attempt>.warc.gz.tmp` name (invisible to the reader —
    * Spark's file index skips dot-files, and [[read]] filters `.tmp`),
    * then atomic-rename to the attempt-INDEPENDENT committed name
    * `part-NNNNN.warc.gz` on success. Invariants this buys (the round-13
    * q88 hash flake was exactly their absence — VERDICT "What's wrong"
    * #1):
    *   - killed-mid-write attempt → only a hidden tmp remains; the scan
    *     never sees truncated gzip;
    *   - both attempts of a retried task complete → the second rename
    *     REPLACES the first (same partition data), never duplicates it —
    *     exactly one committed file per partition, always;
    *   - a failed write deletes its tmp and rethrows, so the error is a
    *     task failure, not a silent content change.
    * Factored out of the foreachPartition closure so the retry cases are
    * directly spec-testable (WarcSpec) without faking a TaskContext. */
  private[graft] def writeShard(outDir: String, part: Int, attempt: Long,
                                rows: Iterator[Row], date: String,
                                jobToken: String = ""): Unit = {
    Files.createDirectories(Paths.get(outDir))
    // the job token rides in the tmp name so the driver-side orphan
    // sweep can match ONLY this job's tmps — a bare `.part-*.tmp` glob
    // deleted live tmps of a concurrent write() into the same dir,
    // turning its rename into a loud-but-spurious task failure.
    val tok = if (jobToken.isEmpty) "" else s"-$jobToken"
    val tmp = Paths.get(outDir, f".part-$part%05d-$attempt$tok.warc.gz.tmp")
    val committed = Paths.get(outDir, f"part-$part%05d.warc.gz")
    try {
      val out = new GZIPOutputStream(Files.newOutputStream(tmp))
      try {
        val info = "software: graft-crawler 0.1\r\nformat: WARC File Format 1.0\r\n"
          .getBytes(StandardCharsets.ISO_8859_1)
        out.write(record("warcinfo",
          Seq("WARC-Date" -> date, "Content-Type" -> "application/warc-fields"), info))
        rows.foreach { r =>
          val url = r.getString(0)
          val code = r.getInt(1)
          val body = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
          val ctype = Option(r.getString(3)).getOrElse("application/octet-stream")
          val http = (s"HTTP/1.1 $code OK\r\nContent-Type: $ctype\r\n" +
            s"Content-Length: ${body.length}\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1)
          out.write(record("response",
            Seq("WARC-Target-URI" -> url, "WARC-Date" -> date,
              "Content-Type" -> "application/http; msgtype=response"),
            http ++ body))
        }
      } finally out.close()
      // same-directory rename: atomic on POSIX, replaces an existing
      // committed file (a slower duplicate attempt re-commits identical
      // partition content — idempotent by construction).
      try Files.move(tmp, committed, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // FS that refuses replace-on-atomic-move: the other attempt
          // already committed this partition — drop our tmp.
          Files.deleteIfExists(tmp): Unit
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          // some mounts can't atomic-move ACROSS filesystems: stage a
          // copy to a second hidden name that IS on the target FS (same
          // directory as the destination) and retry the atomic move from
          // there — same-directory renames are atomic on anything
          // POSIX-ish, so readers still never observe a truncated gzip
          // shard. Only if even that refuses does the weaker replacing
          // move run, and it logs loudly so a corrupt read-back is
          // attributable (ADVICE r15).
          val staged = committed.resolveSibling("." + committed.getFileName + s".stage-$attempt")
          Files.copy(tmp, staged, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          try Files.move(staged, committed, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              Files.deleteIfExists(staged): Unit // other attempt won
            case _: java.nio.file.AtomicMoveNotSupportedException =>
              System.err.println(s"warc: NON-ATOMIC commit of $committed — " +
                "target FS supports neither cross-FS nor same-dir atomic moves; " +
                "a concurrent reader may glimpse a partial shard")
              Files.move(staged, committed,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
          }
          Files.deleteIfExists(tmp): Unit
      }
    } catch {
      case e: Throwable =>
        try Files.deleteIfExists(tmp) catch { case _: Exception => () }
        throw e
    }
  }

  /** Write content rows (url, http_code, content, content_type) as
    * gzipped WARC files, one per partition, warcinfo first —
    * WARCRecordFormat semantics, atomic per-shard commit (see
    * [[writeShard]]). After the job succeeds, orphaned tmp files from
    * killed attempts are swept driver-side. */
  def write(df: DataFrame, outDir: String, date: String = "2024-01-01T00:00:00Z"): Unit = {
    Files.createDirectories(Paths.get(outDir))
    // per-job token: scopes the post-job orphan sweep to THIS job's tmp
    // files, so a concurrent write() into the same directory never has
    // its live tmps deleted out from under its rename.
    val jobToken = java.util.UUID.randomUUID().toString.substring(0, 8)
    df.select(col("url"), col("http_code"), col("content"), col("content_type"))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          writeShard(outDir, tc.partitionId(), tc.taskAttemptId(), rows, date, jobToken)
        }
      }
    // reclaim hidden tmp orphans (killed/superseded attempts) OF THIS
    // JOB ONLY (token match). Local-FS listing; on a cluster the
    // equivalent sweep is the output committer's job-commit pass.
    val d = Paths.get(outDir)
    if (Files.isDirectory(d)) {
      val s = Files.list(d)
      try s.forEach { p =>
        val n = p.getFileName.toString
        val thisJobs = n.startsWith(".part-") && n.endsWith(s"-$jobToken.warc.gz.tmp")
        // foreign tmps (a CRASHED earlier job's token, or token-less)
        // can't belong to a live concurrent job once they're stale —
        // age-gate at 1 h so they don't accumulate forever in non-scratch
        // output dirs (ADVICE r15). A live job's tmps are minutes old.
        val staleForeign = !thisJobs && n.startsWith(".part-") &&
          (n.endsWith(".warc.gz.tmp") || n.contains(".warc.gz.stage-")) &&
          (try Files.getLastModifiedTime(p).toMillis <
             System.currentTimeMillis() - 3600000L
           catch { case _: Exception => false })
        if (thisJobs || staleForeign)
          try Files.deleteIfExists(p) catch { case _: Exception => () }
      } finally s.close()
    }
  }

  /** Diagnostic sidecar for the q88 verification face (VERDICT r14
    * next-#1b): a driver-red oracle row must be adjudicable from the
    * verify artifacts alone, without a rerun. Persists (a) per committed
    * shard, the response-record count from a direct local re-parse of
    * the shard bytes, and (b) the collected per-source aggregate rows
    * the face emits (source, http_code, n_docs, digest_sum, total_bytes,
    * min_md5, max_md5). Local-FS only — the verify scratch dir is local
    * by construction. Best-effort: a sidecar failure must never fail
    * the query it diagnoses. */
  def writeSidecar(face: DataFrame, shardDir: java.nio.file.Path,
                   dest: java.nio.file.Path): Unit =
    try {
      def esc(s: String): String = s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val shardJson = {
        val st = Files.list(shardDir)
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        try st.forEach { p =>
          val n = p.getFileName.toString
          if (!n.startsWith(".") && n.contains(".warc")) {
            val responses = parseRecords(Files.readAllBytes(p), gzipped = n.endsWith(".gz"))
              .count(_.warcType == "response")
            b += s"""{"shard":"${esc(n)}","responses":$responses}"""
          }
        } finally st.close()
        b.sorted
      }
      val rows = face.collect().map { r =>
        s"""{"source":"${esc(r.getString(0))}","http_code":${r.getInt(1)},""" +
          s""""n_docs":${r.getLong(2)},"digest_sum":${r.getLong(3)},""" +
          s""""total_bytes":${r.getLong(4)},"min_md5":"${esc(r.getString(5))}",""" +
          s""""max_md5":"${esc(r.getString(6))}"}"""
      }
      val json =
        s"""{"shards":[${shardJson.mkString(",")}],"sources":[${rows.mkString(",")}]}"""
      Files.writeString(dest, json): Unit
    } catch {
      case e: Exception =>
        System.err.println(s"[warc] sidecar write skipped: ${e.getMessage}")
    }
}
