package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic behind q89's no-oracle status: measures the hamming and
  * band-agreement distribution of the TRUE (exact-Jaccard ≥ 0.5)
  * near-dup pairs under the q89 simhash geometry. Output on sf0.01
  * (2026-08): 112/600 true pairs agree on zero bands with
  * maxMissedJacc = 0.9895 — i.e. no Jaccard threshold exists at which
  * the simhash candidate stage has recall 1, so q81's verified-pairs
  * oracle recipe cannot be applied to q89 (see q89DedupSimhash
  * scaladoc for the full argument). */
object Q89Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SimHash64.register(spark)
    val d0 = spark.read.parquet(s"$dir/documents.parquet")
    val toks0 = split(col("text"), " ")
    val mutated = d0.withColumn("doc_id", col("doc_id") + 1000000)
      .withColumn("text", array_join(slice(toks0, lit(1), size(toks0) - 1), " "))
    val d = d0.unionByName(mutated)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
    val sim = d.withColumn("shingles",
        array_distinct(transform(sequence(lit(1), size(col("toks")) - 2),
          i => xxhash64(element_at(col("toks"), i),
            element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)))))
      .select(col("doc_id"), expr("simhash64(shingles)").as("simhash"),
        col("shingles")).cache()
    val s1 = sim.select(col("doc_id").as("d1"), col("simhash").as("h1"),
      col("shingles").as("sh1"))
    val s2 = sim.select(col("doc_id").as("d2"), col("simhash").as("h2"),
      col("shingles").as("sh2"))
    val pairs = s1.join(s2, col("d1") < col("d2"))
      .withColumn("common", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jacc", col("common").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("common")))
      .filter(col("jacc") >= 0.5)
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
    val hist = pairs.groupBy("hamming").count().orderBy("hamming").collect()
    println("HAMMING_HIST " +
      hist.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
    val bandAgree = pairs.withColumn("agree",
      (0 until 4).map(k => when(
        shiftright(col("h1"), k * 16).bitwiseAND(lit(65535L)) ===
          shiftright(col("h2"), k * 16).bitwiseAND(lit(65535L)), 1).otherwise(0))
        .reduce(_ + _))
    val ba = bandAgree.groupBy("agree").count().orderBy("agree").collect()
    println("BAND_AGREE " +
      ba.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
    // per-threshold recall of the banded candidate set: for each jacc
    // floor, how many true pairs are missed (agree == 0)?
    val byTheta = bandAgree.select(col("jacc"), col("agree")).collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    Seq(0.5, 0.6, 0.7, 0.8, 0.9).foreach { th =>
      val above = byTheta.filter(_._1 >= th)
      val missed = above.count(_._2 == 0)
      println(s"THETA $th total=${above.length} missed=$missed " +
        s"maxMissedJacc=${byTheta.filter(_._2 == 0).map(_._1).maxOption.getOrElse(-1.0)}")
    }
    spark.stop()
  }
}
