package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Config parity with the reference's settings surface
  * (`settings.py:1-20`, startup validation `app.py:202-203`) and the
  * S3A mapping that carries its AWS env vars onto Spark's Hadoop
  * config. */
class SettingsSpec extends AnyFunSuite {

  private val fullEnv = Map(
    "AWS_DEFAULT_REGION" -> "us-east-1",
    "AWS_ACCESS_KEY_ID" -> "AKIAEXAMPLE",
    "AWS_SECRET_ACCESS_KEY" -> "secret",
    "AWS_ENDPOINT_URL" -> "http://minio:9000",
    "S3_BUCKET_NAME" -> "bucket",
    "S3_PATH_PREFIX" -> "incoming/csv",
    "KAFKA_BOOTSTRAP_SERVERS" -> "k1:9092",
    "KAFKA_TOPIC" -> "reclamacoes")

  test("fromEnv reads the reference's variable names and defaults") {
    val s = Settings.fromEnv(fullEnv)
    assert(s.s3BucketName.contains("bucket"))
    assert(s.kafkaBootstrapServers == "k1:9092")
    assert(s.chunkSize == 10)           // settings.py:4
    assert(s.processIntervalSec == 60)  // settings.py:5
    assert(s.retryDelaySec == 20)       // settings.py:6
    assert(s.sourceRoot == "s3a://bucket/incoming/csv")
  }

  test("validated requires the reference's startup triple (app.py:202-203)") {
    val bad = Settings.fromEnv(fullEnv - "S3_BUCKET_NAME")
    val ex = intercept[IllegalArgumentException](bad.validated)
    assert(ex.getMessage.contains("S3_BUCKET_NAME"))
    Settings.fromEnv(fullEnv).validated // must not throw
  }

  test("s3aConfigs maps every present AWS env var onto fs.s3a.*") {
    val m = Settings.fromEnv(fullEnv).s3aConfigs
    assert(m == Map(
      "spark.hadoop.fs.s3a.access.key" -> "AKIAEXAMPLE",
      "spark.hadoop.fs.s3a.secret.key" -> "secret",
      "spark.hadoop.fs.s3a.endpoint" -> "http://minio:9000",
      "spark.hadoop.fs.s3a.path.style.access" -> "true",
      "spark.hadoop.fs.s3a.endpoint.region" -> "us-east-1"))
  }

  test("s3aConfigs omits absent keys (provider-chain fallback, like boto3)") {
    val m = Settings.fromEnv(fullEnv -- Seq(
      "AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY", "AWS_ENDPOINT_URL",
      "AWS_DEFAULT_REGION")).s3aConfigs
    assert(m.isEmpty)
  }

  test("path-style access follows the custom endpoint (boto3's MinIO fallback)") {
    val withEndpoint = Settings.fromEnv(fullEnv).s3aConfigs
    assert(withEndpoint.get("spark.hadoop.fs.s3a.path.style.access").contains("true"))
    val noEndpoint = Settings.fromEnv(fullEnv - "AWS_ENDPOINT_URL").s3aConfigs
    assert(!noEndpoint.contains("spark.hadoop.fs.s3a.path.style.access"),
      "path-style must not be forced against real AWS (virtual-host default)")
  }

  test("SketchGeometry: defaults match the shipped sf0.001-0.1 geometry") {
    val g = SketchGeometry.fromEnv(Map.empty)
    assert(g == SketchGeometry.defaults)
    assert(g.minhashBands == 4)
    assert(g.simhashBands == 4)
    assert(g.srpBuckets == 256)
  }

  test("SketchGeometry: env overrides change the derived bucket counts") {
    val g = SketchGeometry.fromEnv(Map(
      "GRAFT_SRP_BITS" -> "12",
      "GRAFT_SIMHASH_BAND_BITS" -> "8",
      "GRAFT_MINHASH_K" -> "20",
      "GRAFT_MINHASH_ROWS_PER_BAND" -> "4",
      "GRAFT_SHINGLE_DF_CAP" -> "50",
      "GRAFT_BAND_OCCUPANCY_CAP" -> "200"))
    assert(g.srpBuckets == 4096, "srp bucket count must follow GRAFT_SRP_BITS")
    assert(g.simhashBands == 8)
    assert(g.minhashBands == 5)
    assert(g.shingleDfCap == 50)
    assert(g.bandOccupancyCap == 200)
  }

  test("SketchGeometry: probe radius and embedding dim are env knobs too") {
    val d = SketchGeometry.fromEnv(Map.empty)
    assert(d.srpProbeRadius == 2 && d.embeddingDim == 64)
    assert(d.srpProbeCount == 37, "default 8 bits @ radius 2 = 1+8+28 probes")
    val g = SketchGeometry.fromEnv(Map(
      "GRAFT_SRP_PROBE_RADIUS" -> "1",
      "GRAFT_EMBEDDING_DIM" -> "128"))
    assert(g.srpProbeCount == 9, "radius 1 over 8 bits = 1+8 probes")
    assert(g.embeddingDim == 128)
    assert(d.oovVocabSize == 16)
    assert(SketchGeometry.fromEnv(Map("GRAFT_OOV_VOCAB" -> "32768")).oovVocabSize == 32768)
  }

  test("SketchGeometry rejects inconsistent geometry loudly") {
    intercept[IllegalArgumentException](
      SketchGeometry.fromEnv(Map("GRAFT_MINHASH_ROWS_PER_BAND" -> "5"))) // 12 % 5 != 0
    intercept[IllegalArgumentException](
      SketchGeometry.fromEnv(Map("GRAFT_SIMHASH_BAND_BITS" -> "7"))) // 64 % 7 != 0
    intercept[IllegalArgumentException](
      SketchGeometry.fromEnv(Map("GRAFT_SRP_BITS" -> "0")))
    intercept[IllegalArgumentException]( // probing past every bit is nonsense
      SketchGeometry.fromEnv(Map("GRAFT_SRP_PROBE_RADIUS" -> "9")))
    intercept[IllegalArgumentException](
      SketchGeometry.fromEnv(Map("GRAFT_EMBEDDING_DIM" -> "0")))
    intercept[IllegalArgumentException](
      SketchGeometry.fromEnv(Map("GRAFT_OOV_VOCAB" -> "0")))
  }
}
