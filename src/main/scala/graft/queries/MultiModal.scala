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
    * the exact same signature and batching shape. */
  object StubDecoder {
    final case class Features(width: Int, height: Int, meanByte: Double, sha: Long)
    def decode(payload: Array[Byte]): Features = {
      val n = payload.length
      var sum = 0L; var h = 0L
      var i = 0
      while (i < n) { sum += (payload(i) & 0xFF); h = h * 31 + (payload(i) & 0xFF); i += 1 }
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

  /** q90: the multimodal feature-extraction pipeline (rows-only check —
    * the stub decoder is engine-local by construction). */
  val q90Multimodal: Q = (spark, dir) =>
    orderAll(extractFeatures(spark, dir).toDF())

  val defs: Map[String, Q] = Map("q90_multimodal_features" -> q90Multimodal)
  val oracles: Map[String, String] = Map.empty
}
