package graft.queries

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns + typed metadata, with decode/feature-extraction as a
  * per-partition batch transform (the Scala analog of `mapInPandas`).
  *
  * The container ships no image/audio codecs, so [[StubDecoder]] is a
  * clearly-marked DETERMINISTIC FAKE — it derives "features" from the raw
  * bytes only. Everything around it is the real 100 TB plumbing: the
  * binary+metadata schema, partition-wise batched processing (one decoder
  * instance per partition, amortized over rows, never per-row init), and
  * a columnar feature output schema.
  */
object MultiModal {

  /** STUB: stands in for an image/audio decoder (no codecs in this
    * container). Deterministic pure function of the payload bytes; a real
    * deployment swaps `decode` for e.g. a JPEG decode + resize, keeping
    * the exact same signature and batching shape.
    *
    * The content hash is a polynomial rolling hash over bytes mod 1e9+7
    * (q87's engine-portable recipe) rather than Java-Long wraparound, so
    * every feature column is exact integer/IEEE arithmetic a second
    * engine can reproduce — which is what lets q90 be hash-oracled. */
  object StubDecoder {
    final case class Features(width: Int, height: Int, meanByte: Double, sha: Long)
    private val Mod = 1000000007L
    def decode(payload: Array[Byte]): Features = {
      val n = payload.length
      var sum = 0L; var h = 0L
      var i = 0
      while (i < n) { sum += (payload(i) & 0xFF); h = (h * 31 + (payload(i) & 0xFF)) % Mod; i += 1 }
      Features(width = n % 640, height = n % 480,
        meanByte = if (n == 0) 0.0 else sum.toDouble / n, sha = h)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("content_hash", LongType, nullable = false)))

  /** Binary payload table (documents' text bytes stand in for media
    * blobs) → per-partition decoded feature table. */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[Row] = {
    val payloads = t(spark, dir, "documents").select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("image/png"))
        .when(col("doc_id") % 3 === 1, lit("audio/wav"))
        .otherwise(lit("video/mp4")).as("media_type"),
      col("text").cast(BinaryType).as("payload"))
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    payloads.mapPartitions { rows =>
      // one decoder per partition — per-row init is the anti-pattern
      val decoder = StubDecoder
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val f = decoder.decode(payload)
        Row(r.getAs[Long]("doc_id"), r.getAs[String]("media_type"),
          payload.length, f.width, f.height, f.meanByte, f.sha)
      }
    }
  }

  /** q90: the multimodal feature-extraction pipeline. FULLY ORACLED via
    * the q93/q98 ASCII recipe: payloads are ASCII stand-ins, so every
    * feature the stub emits — byte length, length-derived width/height,
    * exact-integer mean, and the mod-1e9+7 rolling content hash — is
    * reproducible in DuckDB with per-character ascii() arithmetic. The
    * decoder stays a stub (no codecs in this container); the per-
    * partition batching plumbing is the part that carries to 100 TB. */
  val q90Multimodal: Q = (spark, dir) =>
    orderAll(extractFeatures(spark, dir).toDF())

  private val FrameBytes = 32
  private val MaxFrames = 8

  /** q93: frame sampling — the video flavor of the multimodal surface:
    * up to [[MaxFrames]] fixed-stride byte-slice "frames" per payload,
    * computed ENTIRELY with codegen'd expressions (sequence → posexplode
    * → substr on the binary column). The sampling plan is the part that
    * must scale — it never leaves whole-stage codegen and fans out rows
    * instead of decoding; per-frame decode would then batch through the
    * q90 per-partition path. Oracled: payloads are ASCII stand-ins, so
    * DuckDB's VARCHAR substring arithmetic mirrors the binary slicing
    * byte-for-byte. */
  val q93FrameSample: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 2) // the "video/mp4" rows of q90
      .withColumn("payload", col("text").cast(BinaryType))
    val nFrames = least(lit(MaxFrames),
      ceil(length(col("payload")).cast("double") / FrameBytes).cast("int"))
    // empty payload ⇒ nFrames = 0 ⇒ sequence(0, -1) would DESCEND (two
    // bogus frames where the oracle's range(0,0) emits none) — emit an
    // empty array instead so posexplode yields zero rows on both engines
    val offs = when(nFrames > 0,
      transform(sequence(lit(0), nFrames - 1), i => i * FrameBytes))
      .otherwise(array().cast("array<int>"))
    orderAll(d
      .select(col("doc_id"), col("payload"),
        length(col("payload")).as("n_bytes"), posexplode(offs))
      .select(col("doc_id"), col("n_bytes"),
        col("pos").as("frame_idx"), col("col").as("off"),
        length(col("payload").substr(col("col") + 1, lit(FrameBytes)))
          .as("frame_len"),
        col("payload").substr(col("col") + 1, lit(8)).cast(StringType)
          .as("frame_prefix")))
  }

  private val ResizeStride = 4

  /** q98: resize — the downsample flavor of the multimodal surface:
    * a stride-[[ResizeStride]] byte downsample of each payload (every
    * k-th byte kept), computed entirely with codegen'd expressions
    * (sequence → transform → substr → array_join), one output row per
    * payload, no fan-out. On real media the pixel-level resample runs
    * inside q90's per-partition decoder batch; the PLAN here is the
    * part that must scale. ASCII stand-in payloads make DuckDB's
    * substring arithmetic mirror the byte stride exactly — fully
    * oracled. */
  val q98MultimodalResize: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 0) // the "image/png" rows of q90
    val n = length(col("text"))
    val outN = ceil(n.cast("double") / ResizeStride).cast("int")
    // empty payload ⇒ sequence(0, -1) would descend (same trap as q93)
    val resized = when(outN > 0,
      array_join(transform(sequence(lit(0), outN - 1),
        i => col("text").substr(i * ResizeStride + 1, lit(1))), ""))
      .otherwise(lit(""))
    orderAll(d.select(col("doc_id"), n.as("n_bytes"),
      outN.as("resized_bytes"), resized.as("resized")))
  }

  val defs: Map[String, Q] = Map(
    "q90_multimodal_features" -> q90Multimodal,
    "q93_multimodal_framesample" -> q93FrameSample,
    "q98_multimodal_resize" -> q98MultimodalResize)

  val oracles: Map[String, String] = Map(
    "q90_multimodal_features" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |         ELSE 'video/mp4' END AS media_type,
        |    CAST(length(text) AS INT) AS n_bytes,
        |    list_transform(range(0, CAST(length(text) AS BIGINT)),
        |      i -> CAST(ascii(substring(text, CAST(i + 1 AS INT), 1)) AS BIGINT)) AS bytes
        |  FROM documents)
        |SELECT doc_id, media_type, n_bytes,
        |  CAST(n_bytes % 640 AS INT) AS width,
        |  CAST(n_bytes % 480 AS INT) AS height,
        |  CASE WHEN n_bytes = 0 THEN 0.0
        |       ELSE CAST(list_sum(bytes) AS DOUBLE) / n_bytes END AS mean_byte,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), bytes),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS content_hash
        |FROM f
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST""".stripMargin,
    "q98_multimodal_resize" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS INT) AS n_bytes,
         |  CAST(ceil(CAST(length(text) AS DOUBLE) / $ResizeStride) AS INT) AS resized_bytes,
         |  CASE WHEN length(text) > 0 THEN
         |    array_to_string(
         |      list_transform(
         |        range(0, CAST(ceil(CAST(length(text) AS DOUBLE) / $ResizeStride) AS BIGINT)),
         |        i -> substring(text, CAST(i * $ResizeStride + 1 AS INT), 1)),
         |      '')
         |  ELSE '' END AS resized
         |FROM documents WHERE doc_id % 3 = 0
         |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q93_multimodal_framesample" ->
      s"""WITH v AS (
         |  SELECT doc_id, text, CAST(length(text) AS INT) AS n_bytes
         |  FROM documents WHERE doc_id % 3 = 2),
         |f AS (
         |  SELECT doc_id, text, n_bytes, CAST(i AS INT) AS frame_idx,
         |    CAST(i * $FrameBytes AS INT) AS off
         |  FROM v, unnest(range(0,
         |    CAST(least($MaxFrames, ceil(CAST(n_bytes AS DOUBLE) / $FrameBytes)) AS BIGINT)))
         |    AS t(i))
         |SELECT doc_id, n_bytes, frame_idx, off,
         |  CAST(length(substring(text, off + 1, $FrameBytes)) AS INT) AS frame_len,
         |  substring(text, off + 1, 8) AS frame_prefix
         |FROM f
         |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin)
}
