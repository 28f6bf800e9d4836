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
      "spark.hadoop.fs.s3a.endpoint.region" -> "us-east-1"))
  }

  test("s3aConfigs omits absent keys (provider-chain fallback, like boto3)") {
    val m = Settings.fromEnv(fullEnv -- Seq(
      "AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY", "AWS_ENDPOINT_URL",
      "AWS_DEFAULT_REGION")).s3aConfigs
    assert(m.isEmpty)
  }
}
