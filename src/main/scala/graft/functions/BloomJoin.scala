package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's OWN runtime-filter Bloom
  * expressions (`BloomFilterAggregate` / `BloomFilterMightContain`,
  * the machinery behind `spark.sql.optimizer.runtime.bloomFilter.*`),
  * which ship in the catalyst jar but sit on the INTERNAL function
  * registry only — `expr("bloom_filter_agg(...)")` resolves to
  * UNRESOLVED_ROUTINE from user SQL. q128 wants the rewrite as an
  * explicit, plan-pinned operator rather than an optimizer heuristic,
  * so this exposes both under their stock names for the session.
  *
  * Nothing is reimplemented: the aggregate produces the standard
  * `org.apache.spark.util.sketch.BloomFilter` binary and the predicate
  * deserializes it once per task — the identical code path the
  * injected runtime filter uses, minus the cost-based gating.
  */
object BloomJoin {

  /** `bloom_filter_agg(xxhash64(key), estItems, numBits)` → binary,
    * `might_contain(bf, xxhash64(key))` → boolean. Arity is validated
    * in the builder: a wrong-arity call from SQL must surface as an
    * analysis-time error naming the expected signature, not as an
    * IndexOutOfBoundsException from `exprs(n)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg",
      exprs => {
        if (exprs.length != 3) throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`bloom_filter_agg`",
            "expectedNum" -> "3 (hashedKey, estItems, numBits)",
            "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
        new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
          .toAggregateExpression()
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain",
      exprs => {
        if (exprs.length != 2) throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`might_contain`",
            "expectedNum" -> "2 (bloomFilter, hashedKey)",
            "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
        BloomFilterMightContain(exprs(0), exprs(1))
      },
      "scala_udf")
  }
}
