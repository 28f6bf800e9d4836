package graft.queries

import graft.SparkSpec

/** Semantics checks for the no-oracle LLM ops (the oracled ones are
  * covered by the driver's DuckDB gate). */
class LlmOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q81 minhash-lsh finds the planted near-duplicate pairs") {
    val pairs = LlmOps.q81DedupMinhash(spark, sf)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every doc pairs with its mutated copy (id + 1e6): expect most of the
    // 500 planted pairs recovered at jaccard distance <= 0.5
    val planted = pairs.count { case (a, b) => b == a + 1000000 }
    assert(planted > 400, s"recovered only $planted/500 planted near-dup pairs")
  }

  test("q89 simhash banding finds planted near-duplicates with low hamming") {
    val pairs = LlmOps.q89DedupSimhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = pairs.count { case (a, b) => b == a + 1000000 }
    assert(planted > 350, s"recovered only $planted/500 planted simhash pairs")
  }

  test("q91 bucketed ANN agrees with the q82 brute-force baseline and recovers its top-3") {
    val brute = LlmOps.q82SimilarityTopk(spark, sf).collect()
    // every (qid, nid) the bucketed path returns must score identically
    // to the brute-force cosine for that pair
    val bruteScores = brute.map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val bucketed = LlmOps.q91SimilarityIvf(spark, sf).collect()
    assert(bucketed.nonEmpty)
    bucketed.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      bruteScores.get(key).foreach(c => assert(c == r.getDouble(3),
        s"cosine mismatch for $key"))
    }
    // documented recall: share of the brute-force top-3 pairs the
    // 256-bucket + multi-probe path recovers (SRP-LSH is approximate;
    // the floor pins it from regressing, the info line documents it)
    val top3 = brute.filter(_.getInt(1) <= 3)
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = bucketed.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = got.intersect(top3).size.toDouble / top3.size
    info(f"q91 recall vs q82 top-3: $recall%.2f (${got.intersect(top3).size}/${top3.size})")
    assert(recall >= 0.3, f"q91 recall collapsed: $recall%.2f")
  }

  test("q90 multimodal features are deterministic and complete") {
    val f1 = MultiModal.q90Multimodal(spark, sf).collect()
    val f2 = MultiModal.q90Multimodal(spark, sf).collect()
    assert(f1.length == 500)
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    assert(f1.map(_.getAs[String]("media_type")).toSet ==
      Set("image/png", "audio/wav", "video/mp4"))
  }
}
