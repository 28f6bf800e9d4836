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

  test("q91 bucketed ANN agrees with the q82 brute-force baseline on its bucket") {
    // every (qid, nid) the bucketed path returns must score identically
    // to the brute-force cosine for that pair
    val brute = LlmOps.q82SimilarityTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val bucketed = LlmOps.q91SimilarityIvf(spark, sf).collect()
    assert(bucketed.nonEmpty)
    bucketed.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      brute.get(key).foreach(c => assert(c == r.getDouble(3),
        s"cosine mismatch for $key"))
    }
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
