package graft.core

/** Env-backed runtime config mirroring the reference's settings surface
  * (`/root/reference/src/ex8_producer/settings.py:1-20`): same variable
  * names, same defaults, same required-at-startup triple
  * (`app.py:202-203`). S3 credentials map onto `spark.hadoop.fs.s3a.*`
  * when a real cluster is configured; in this sandbox paths are `file://`.
  */
final case class Settings(
    awsDefaultRegion: Option[String],
    awsAccessKeyId: Option[String],
    awsSecretAccessKey: Option[String],
    awsEndpointUrl: Option[String],
    s3BucketName: Option[String],
    s3PathPrefix: String,
    kafkaBootstrapServers: String,
    kafkaTopic: String,
    chunkSize: Int,
    processIntervalSec: Int,
    retryDelaySec: Int) {

  /** Startup validation parity with `app.py:202-203`. */
  def validated: Settings = {
    val missing = Seq(
      "S3_BUCKET_NAME" -> s3BucketName.isEmpty,
      "KAFKA_BOOTSTRAP_SERVERS" -> kafkaBootstrapServers.isEmpty,
      "KAFKA_TOPIC" -> kafkaTopic.isEmpty).collect { case (n, true) => n }
    require(missing.isEmpty, s"Missing required settings: ${missing.mkString(", ")}")
    this
  }

  /** `s3a://bucket/prefix` source root (batch or streaming). */
  def sourceRoot: String =
    s"s3a://${s3BucketName.getOrElse("")}/$s3PathPrefix"

  /** Hadoop S3A configuration derived from the reference's AWS env
    * surface (`settings.py:11-16`, consumed by the boto3 client at
    * `app.py:41-57`) — the Spark-native deployment path for the
    * `s3a://` reads behind [[sourceRoot]]. Only present values are
    * emitted: absent keys fall back to the provider-chain default
    * (instance profile etc.), matching boto3's behavior. */
  def s3aConfigs: Map[String, String] = (
    awsAccessKeyId.map("spark.hadoop.fs.s3a.access.key" -> _) ++
      awsSecretAccessKey.map("spark.hadoop.fs.s3a.secret.key" -> _) ++
      awsEndpointUrl.map("spark.hadoop.fs.s3a.endpoint" -> _) ++
      awsDefaultRegion.map("spark.hadoop.fs.s3a.endpoint.region" -> _)
  ).toMap
}

object Settings {
  /** Defaults from `settings.py:4-6,17-18`. */
  def fromEnv(env: Map[String, String] = sys.env): Settings = Settings(
    awsDefaultRegion = env.get("AWS_DEFAULT_REGION"),
    awsAccessKeyId = env.get("AWS_ACCESS_KEY_ID"),
    awsSecretAccessKey = env.get("AWS_SECRET_ACCESS_KEY"),
    awsEndpointUrl = env.get("AWS_ENDPOINT_URL"),
    s3BucketName = env.get("S3_BUCKET_NAME"),
    s3PathPrefix = env.getOrElse("S3_PATH_PREFIX", ""),
    kafkaBootstrapServers = env.getOrElse("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092"),
    kafkaTopic = env.getOrElse("KAFKA_TOPIC", "my-topic"),
    chunkSize = 10,
    processIntervalSec = 60,
    retryDelaySec = 20)
}
