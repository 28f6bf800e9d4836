package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Every declared query runs and returns rows at sf0.001 (value-level
  * correctness is the driver's DuckDB gate; this pins plan validity and
  * guards against accidental key/oracle drift). */
class QueriesSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  // q42 (EXCEPT) legitimately returns 0 rows on this data.
  private val mayBeEmpty = Set("q42_except")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      assert(mayBeEmpty(name) || n > 0, s"$name returned $n rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
