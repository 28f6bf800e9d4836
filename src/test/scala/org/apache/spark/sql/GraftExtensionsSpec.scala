package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.{GraftExtensions, SparkSpec}

/** The `spark.sql.extensions=graft.GraftExtensions` contract: the
  * extension object must register the as-of planner strategy and all
  * three engine SQL functions, and the injected builders must produce
  * working expressions. Lives in the org.apache.spark.sql package
  * because the buildPlannerStrategies/registerFunctions hooks — exactly
  * what SparkSession invokes at session construction — are
  * private[sql]; the suite's shared session was already created without
  * the config, so construction-time wiring is probed directly. */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions wire the as-of strategy and the engine's SQL functions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)

    assert(ext.buildPlannerStrategies(spark).contains(graft.plans.AsOfJoinStrategy))

    val reg = ext.registerFunctions(spark.sessionState.functionRegistry)
    Seq("cosine_sim", "avro_encode", "avro_decode").foreach { f =>
      assert(reg.functionExists(FunctionIdentifier(f)), s"$f not registered")
    }

    // the injected builder must yield a working expression end-to-end
    val cos = spark.sql(
      "SELECT cosine_sim(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }
}
