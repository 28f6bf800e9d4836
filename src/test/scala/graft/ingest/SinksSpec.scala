package graft.ingest

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.SparkSpec

/** Pins the Kafka sink's wiring contract WITHOUT a broker (the sandbox has
  * no spark-sql-kafka jar): [[KafkaSink.configure]] must select the
  * `kafka` source and set exactly the production option set the reference
  * publishes with (`app.py:59-69,142-158` — bootstrap servers + topic,
  * plus the checkpoint that upgrades its at-most-once to at-least-once).
  * Reflection is the only read path — DataStreamWriter exposes no getters.
  */
class SinksSpec extends SparkSpec {

  private def field[A](w: DataStreamWriter[Row], name: String): A = {
    val f = w.getClass.getDeclaredFields.find(_.getName.endsWith(name))
      .getOrElse(fail(s"DataStreamWriter has no field '$name'"))
    f.setAccessible(true)
    f.get(w).asInstanceOf[A]
  }

  /** Unbounded stand-in for the produced value frame (writeStream demands
    * a streaming Dataset; the rate source is built-in and broker-free). */
  private def valueFrame = spark.readStream.format("rate")
    .option("rowsPerSecond", "1").load()
    .selectExpr("CAST(CAST(value AS STRING) AS BINARY) AS value")

  test("KafkaSink.configure selects the kafka source with the exact production options") {
    val sink = KafkaSink("broker1:9092,broker2:9092", "reclamacoes", "/tmp/ckpt")
    val w = sink.configure(valueFrame.writeStream)
    assert(field[String](w, "source") == "kafka")
    val opts: scala.collection.Map[String, String] = field(w, "extraOptions")
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("topic") == "reclamacoes")
    assert(opts("checkpointLocation") == "/tmp/ckpt")
    assert(opts.size == 3, s"unexpected extra options: $opts")
  }

  test("starting the kafka sink here fails by resolving the kafka source (absent jar)") {
    val sink = KafkaSink("broker1:9092", "reclamacoes", tmpDir("kafka_ckpt"))
    val ex = intercept[Exception] {
      Sinks.start(valueFrame, sink)
    }
    // the failure must be source resolution (proof the format string
    // reaches lookup), not option validation
    assert(ex.getMessage != null && ex.getMessage.toLowerCase.contains("kafka"),
      s"unexpected failure: ${ex.getMessage}")
  }

  test("ParquetSink.configure routes path + checkpoint") {
    val sink = ParquetSink("/tmp/out", "/tmp/ck")
    val w = sink.configure(valueFrame.writeStream)
    assert(field[String](w, "source") == "parquet")
    val opts: scala.collection.Map[String, String] = field(w, "extraOptions")
    assert(opts("path") == "/tmp/out")
    assert(opts("checkpointLocation") == "/tmp/ck")
  }

  test("IdempotentParquetSink: a replayed batch overwrites, never duplicates") {
    import spark.implicits._
    val out = tmpDir("idem_sink")
    val sink = IdempotentParquetSink(out, tmpDir("idem_ckpt"))
    val batch1 = Seq(1L, 2L, 3L).toDF("v")
    sink.writeOne(batch1, 7L)
    sink.writeOne(batch1, 7L) // the at-least-once replay after a crash
    sink.writeOne(Seq(4L).toDF("v"), 8L)
    val back = spark.read.parquet(out)
    assert(back.count() == 4, "replayed batch duplicated rows")
    assert(back.select("v").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // batch_id surfaces as an ordinary partition column for readers
    assert(back.columns.contains("batch_id"))
    assert(back.filter($"batch_id" === 7).count() == 3)
  }

  test("IdempotentParquetSink streams end-to-end via foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val in = MemoryStream[Long](spark)
    val out = tmpDir("idem_stream")
    val sink = IdempotentParquetSink(out, tmpDir("idem_stream_ckpt"))
    val q = Sinks.start(in.toDF(), sink,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      in.addData(10L, 11L)
      q.processAllAvailable()
      in.addData(12L)
      q.processAllAvailable()
      val back = spark.read.parquet(out)
      assert(back.select("value").as[Long].collect().sorted.toSeq == Seq(10L, 11L, 12L))
      assert(back.select("batch_id").distinct().count() >= 2, "batches not isolated")
    } finally q.stop()
  }
}
