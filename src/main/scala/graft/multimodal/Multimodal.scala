package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `BINARY` columns with
  * typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing — schema, batch shape, partition-local
  * processing via `mapPartitions` over an iterator of rows (the Scala
  * analogue of `mapInPandas` batches) — is real and tested; the actual
  * codec call is STUBBED with a deterministic fake (this container has
  * no image/audio libs): "decoding" derives frame boundaries and
  * pseudo-features purely from the bytes. Swap [[FakeCodec]] for a real
  * codec without touching the pipeline.
  *
  * Scale: media rows are heavy, so stages repartition by byte-size
  * ranges upstream when skewed, and all per-row work is map-only.
  */
object Multimodal {

  /** media(id, kind, bytes, meta{mime, width, height, duration_ms}) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Deterministic fake codec — byte-derived, engine-independent. */
  object FakeCodec {
    val FrameBytes = 16
    /** "Decode" = fixed-size framing of the payload. A real impl would
      * call the codec here (`???` boundary). */
    def frameCount(payload: Array[Byte]): Int =
      if (payload == null) 0 else payload.length / FrameBytes
    /** Per-frame pseudo-feature: mean byte value of the frame. */
    def frameFeatures(payload: Array[Byte]): Seq[Double] =
      if (payload == null) Seq.empty
      else payload.grouped(FrameBytes).filter(_.length == FrameBytes)
        .map(f => f.map(b => (b & 0xff).toDouble).sum / FrameBytes).toSeq
  }

  // hex-string builders for binary assembly in column algebra:
  // unhex(lpad(hex(n))) is a big-endian byte field; the le variants
  // swap byte pairs for little-endian formats (GIF/BMP)
  private def be16hex(c: Column) = lpad(hex(c), 4, "0")
  private def be32hex(c: Column) = lpad(hex(c), 8, "0")
  private def le16hex(c: Column) = {
    val h = be16hex(c)
    concat(substring(h, 3, 2), substring(h, 1, 2))
  }
  private def le32hex(c: Column) = {
    val h = be32hex(c)
    concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2))
  }

  /** Header lengths in bytes of the four synthesized image formats
    * (PNG sig+IHDR+CRC / GIF header+LSD+flags / BMP file+full DIB
    * header / JPEG SOI+APP0+SOF0) — exported so oracles can reproduce
    * payload sizes. */
  val ImageHeaderBytes: Seq[Int] = Seq(33, 13, 54, 39)

  /** Synthesize a media table from the `documents` text — deterministic,
    * so oracle-checkable. `image`-kind payloads carry a REAL image
    * header (PNG / GIF / BMP / JPEG cycling by doc_id, dimensions a
    * documented function of doc_id) built with byte-exact column
    * algebra, then the UTF-8 text as body; `meta.width/height/mime`
    * for images come from actually PARSING those bytes back
    * ([[ImageHeaders.imageMeta]]), so the oracle's closed-form dims
    * verify the build→parse round trip. Audio/video stay opaque
    * octet-streams behind the codec stub, with the duration heuristic
    * they always had. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3).cast("int") + 1)
    val w = (lit(16) + pmod(col("doc_id") * 7, lit(1000))).cast("int")
    val h = (lit(16) + pmod(col("doc_id") * 13, lit(800))).cast("int")
    // `div` = true integer division: floor(double-div) diverges from
    // the oracle's `doc_id // 3` above 2^52 (double mantissa)
    val fmt = pmod(expr("CAST(doc_id AS BIGINT) div 3"), lit(4))
    val pngHex = concat(
      lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      be32hex(w), be32hex(h), lit("0802000000" + "00000000"))
    val gifHex = concat(lit("474946383961"), le16hex(w), le16hex(h), lit("F70000"))
    val bmpHex = concat(
      lit("424D" + "00000000" + "00000000" + "36000000" + "28000000"),
      le32hex(w), le32hex(h), lit("0100" + "1800" + "0" * 48))
    val jpgHex = concat(
      lit("FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" + "00" + "0001" + "0001" + "0000"
        + "FFC0" + "0011" + "08"),
      be16hex(h), be16hex(w), lit("03" + "011100" + "021101" + "031101"))
    val headerHex = when(fmt === 0, pngHex).when(fmt === 1, gifHex)
      .when(fmt === 2, bmpHex).otherwise(jpgHex)
    val bytes = when(kind === "image",
        concat(unhex(headerHex), col("text").cast("binary")))
      .otherwise(col("text").cast("binary"))
    val framed = docs.select(
      col("doc_id").as("media_id"), kind.as("kind"),
      bytes.as("bytes"), col("n_chars"))
    val im = ImageHeaders.imageMeta(col("bytes"))
    framed.select(
      col("media_id"), col("kind"), col("bytes"),
      when(col("kind") === "image",
        struct(
          im.getField("mime").as("mime"),
          im.getField("width").as("width"),
          im.getField("height").as("height"),
          lit(null).cast("long").as("duration_ms")))
      .otherwise(struct(
        lit("application/octet-stream").as("mime"),
        lit(null).cast("integer").as("width"),
        lit(null).cast("integer").as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms"))).as("meta"))
  }

  /** Frame-sample stage: every row → (media_id, kind, n_frames,
    * sampled frame indices). Column-algebra framing (length arithmetic)
    * keeps it codegen'd; a real decoder would move this into
    * [[decodePartitions]]. */
  def frameSample(media: DataFrame, everyNth: Int): DataFrame =
    media.select(
      col("media_id"), col("kind"), col("meta"),
      (length(col("bytes")) / FakeCodec.FrameBytes).cast("long").as("n_frames"))
      // |{0, n, 2n, ...} ∩ [0, n_frames)| in O(1) arithmetic — building
      // a sequence() per row would materialize a 67M-element array for
      // a 1 GB payload just to count every Nth index
      .withColumn("sampled_frames",
        when(col("n_frames") > 0,
          (floor((col("n_frames") - 1) / everyNth) + 1).cast("int")).otherwise(0))

  /** Pseudo-embedding stage: media bytes → a deterministic
    * `dim`-float unit vector (seeded per 32-byte chunk via the byte
    * content) — the shape of a real encoder's output, so the ANN
    * operators ([[graft.analytics.Similarity]]) compose directly:
    * media → embed → lshBucket/ivfTopK/nearDupPairs is the full
    * training-data path with only this stage's internals stubbed. */
  def pseudoEmbeddings(media: DataFrame, dim: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val v = new Array[Float](dim)
          var i = 0
          while (i < payload.length) {
            v(i % dim) += ((payload(i) & 0xff) - 127.5f) / 127.5f
            i += 1
          }
          var norm = 0.0
          var j = 0
          while (j < dim) { norm += v(j) * v(j); j += 1 }
          val n = math.sqrt(norm)
          if (n > 0) { j = 0; while (j < dim) { v(j) = (v(j) / n).toFloat; j += 1 } }
          Row(id, v.toSeq)
        }
      }(enc)
  }

  /** Size-aware repartition: media rows vary by orders of magnitude in
    * byte size, so row-count partitioning under-fills some tasks and
    * blows the memory of others. Sizes the partition count from the
    * TOTAL byte volume (one cheap agg), then hash-distributes — at
    * 100 TB this is what keeps a decode stage's tasks uniform. */
  def sizeAwareRepartition(media: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val total = media
      .select(coalesce(sum(coalesce(length(col("bytes")), lit(0))), lit(0L)))
      .head().getLong(0) // coalesce: sum() is NULL on an empty input
    val n = math.max(1, math.ceil(total.toDouble / targetBytesPerPartition).toInt)
    media.repartition(n, col("media_id"))
  }

  /** The mapPartitions decode stage — batch-shaped like mapInPandas:
    * partition iterator in, iterator of feature rows out; the codec is
    * invoked once per row inside the partition loop. */
  def decodePartitions(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("mean_feature", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val feats = FakeCodec.frameFeatures(payload)
          Row(id, FakeCodec.frameCount(payload),
            if (feats.isEmpty) null else feats.sum / feats.size)
        }
      }(enc)
  }
}
