package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) table utilities — the shuffle-free join
  * story for repeated large⋈large joins on a stable key.
  *
  * Writing both sides bucketed by the join key into the same number of
  * buckets lets every subsequent join read co-located buckets and skip
  * BOTH Exchange nodes; at 100 TB with a fact table joined daily on the
  * same key, that's the single largest shuffle you can delete. Bucketing
  * goes through the session catalog (bucket metadata lives in the
  * metastore, not in parquet), hence saveAsTable.
  */
object Buckets {

  /** Write `df` as a bucketed, sorted managed table. Drops any previous
    * incarnation first: with the default in-memory catalog the table
    * entry dies with the session but its warehouse directory does not,
    * and a stale location fails CTAS validation on the next run. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — plans with zero
    * Exchange when bucket counts match. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
