package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The composed curation DAG must deliver every stage's contract at
  * once: gate, dedup, quota, split arithmetic, pack budget. */
class CurationSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val out = Curation.curate(spark, sf,
    minChars = 64, quotaPerLang = 40, packTokens = 256).cache()

  test("curated corpus is deduped, gated, and capped per language") {
    val rows = out.count()
    assert(rows > 0)
    assert(out.select("doc_id").distinct().count() == rows, "duplicate doc_ids")
    val maxPerLang = out.groupBy("lang").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPerLang <= 40, s"language over quota: $maxPerLang docs")
    // the gate ran: every surviving doc had >= 64 chars in the source table
    val short = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("n_chars") < 64).select(col("doc_id"))
    assert(out.join(short, Seq("doc_id"), "left_semi").count() == 0,
      "sub-minChars docs leaked through the gate")
  }

  test("split tags follow q94's deterministic bucketing") {
    val P = 1000000007L
    val bucket = pmod(pmod(pmod(col("doc_id"), lit(P)) * lit(2654435761L), lit(P)), lit(100L))
    val wrong = out.withColumn("b", bucket)
      .filter(
        (col("b") < 80 && col("split") =!= "train") ||
        (col("b") >= 80 && col("b") < 90 && col("split") =!= "val") ||
        (col("b") >= 90 && col("split") =!= "test"))
      .count()
    assert(wrong == 0, s"$wrong docs carry a split tag inconsistent with their bucket")
  }

  test("packs respect the token budget up to the one-doc overrun bound") {
    // floor-of-prefix-sum packing: a pack's total may exceed the budget
    // only by (its last doc's tokens - 1), never more
    val packs = out.groupBy("split", "source", "pack_id")
      .agg(sum("n_tokens").as("tok"), max("n_tokens").as("biggest"))
      .filter(col("tok") >= lit(256) + col("biggest"))
    assert(packs.count() == 0, "a pack overran the budget by more than one document")
  }
}
