package graft.core

import org.apache.spark.sql.SparkSession

/** The engine's session entry point: a SparkSession builder carrying the
  * configuration this library is designed against, plus registration of
  * the engine's SQL functions (avro_encode/avro_decode, cosine_sim).
  *
  * Scale posture defaults (overridable via `extra`):
  *  - AQE on (runtime re-plan: skew joins, coalesced shuffles) — Spark 4
  *    default, pinned explicitly because the engine's plans rely on it;
  *  - shuffle partitions sized to the local machine here; on a real
  *    cluster set it ≈ 2-3× total executor cores, and rely on AQE
  *    coalescing for the small stages;
  *  - 128 MB file split target so a 100 TB scan yields ~800 k tasks, not
  *    8 M;
  *  - UTC session timezone (oracle parity and sane event-time math).
  */
object GraftSession {

  /** RocksDB-backed streaming state — the production posture once join/
    * dedup/session state outgrows executor heap (the default HDFS-backed
    * provider keeps every state row as JVM objects on-heap; at 100 TB a
    * stream-stream join's buffer is tens of GB per executor). RocksDB
    * spills to local disk, and changelog checkpointing ships per-batch
    * deltas instead of re-uploading full SST snapshots. Flag-gated via
    * `GRAFT_STATE_STORE=rocksdb` (the reference's env-config idiom) or
    * the `largeState` builder parameter; the provider class is read per
    * query start, so a spec can also opt in via `spark.conf.set`. */
  val RocksDBProviderClass: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def stateStoreConfigs(rocksdb: Boolean): Map[String, String] =
    if (!rocksdb) Map.empty
    else Map(
      "spark.sql.streaming.stateStore.providerClass" -> RocksDBProviderClass,
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")

  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
      extra: Map[String, String] = Map.empty,
      largeState: Boolean = sys.env.get("GRAFT_STATE_STORE").contains("rocksdb"))
      : SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft-engine")
      // same wiring as spark.sql.extensions=graft.GraftExtensions —
      // as-of join strategy + engine SQL functions at session build
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
    (stateStoreConfigs(largeState) ++ extra).foldLeft(b) {
      case (bb, (k, v)) => bb.config(k, v)
    }
  }

  /** Builder pre-wired with the settings' S3A credential mapping — the
    * production path for reading the reference's `s3a://` source root.
    * (spark.hadoop.* keys are read at SparkContext creation, so this
    * must run before the first session exists.) */
  def builderFor(settings: Settings, master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
      extra: Map[String, String] = Map.empty): SparkSession.Builder =
    builder(master, shufflePartitions, settings.s3aConfigs ++ extra)

  /** Build the session and register the engine's SQL functions. A fresh
    * session gets them twice — injected by `builder()`'s
    * `withExtensions(GraftExtensions)` AND re-registered here — because
    * `getOrCreate` can also ATTACH to a pre-existing session built
    * without the extension, where only these calls provide the
    * functions. The double registration is safe precisely because every
    * `register` builder wraps the same `GraftExtensions.checkArity`
    * guard as the injected one (a round-10 review caught the unguarded
    * spelling clobbering the checked builders). */
  def getOrCreate(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
      extra: Map[String, String] = Map.empty): SparkSession = {
    val spark = builder(master, shufflePartitions, extra).getOrCreate()
    graft.ingest.AvroCodec.register(spark)
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.MinHashSignature.register(spark)
    graft.functions.SimHash64.register(spark)
    graft.functions.SortedIntersect.register(spark)
    graft.functions.SquaredL2.register(spark)
    graft.functions.BloomJoin.register(spark)
    spark
  }
}
