package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.core.Schemas
import graft.functions.CosineSimilarity
import graft.ingest.{AvroDecodeExpression, AvroEncodeExpression}
import graft.plans.AsOfJoinStrategy

/** Cluster-installable entry point for the whole engine:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * wires the custom planner strategy (the distributed as-of join,
  * `graft.plans.AsOfJoinExec`) and the engine's SQL functions
  * (`cosine_sim`, `avro_encode`, `avro_decode`, `minhash_sig`,
  * `simhash64`, `sorted_intersect`, `squared_l2`; the reference-table
  * kernels `set_hit_count`/`set_keep_positions`/`srp_bucket` stay
  * Column-API-only — their probe tables and projection matrices are
  * driver-built values, not SQL literals) into every session of
  * the cluster — the declarative alternative to the imperative
  * `GraftSession.getOrCreate()` / `AsOfJoin.install(spark)` calls, and
  * the standard way a Spark library ships Catalyst extensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions.checkArity

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      checkArity("cosine_sim", 2)(exprs => CosineSimilarity(exprs(0), exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("avro_encode"),
      new ExpressionInfo(classOf[AvroEncodeExpression].getName, "avro_encode"),
      checkArity("avro_encode", 1)(exprs =>
        AvroEncodeExpression(exprs.head, Schemas.reclamacoesAvsc))))
    ext.injectFunction((
      FunctionIdentifier("avro_decode"),
      new ExpressionInfo(classOf[AvroDecodeExpression].getName, "avro_decode"),
      checkArity("avro_decode", 1)(exprs =>
        AvroDecodeExpression(exprs.head, Schemas.reclamacoesAvsc))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinHashSignature].getName, "minhash_sig"),
      checkArity("minhash_sig", 2)(exprs => graft.functions.MinHashSignature(
        exprs(0), graft.functions.MinHashSignature.kOf(exprs(1))))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      checkArity("simhash64", 1)(exprs => graft.functions.SimHash64(exprs.head))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect"),
      new ExpressionInfo(classOf[graft.functions.SortedIntersect].getName, "sorted_intersect"),
      checkArity("sorted_intersect", 2)(exprs =>
        graft.functions.SortedIntersect(exprs(0), exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("squared_l2"),
      new ExpressionInfo(classOf[graft.functions.SquaredL2].getName, "squared_l2"),
      checkArity("squared_l2", 2)(exprs =>
        graft.functions.SquaredL2(exprs(0), exprs(1)))))
  }
}

object GraftExtensions {

  /** Arity guard for function builders — injected here AND reused by the
    * per-function `register` methods, so a session-scoped registration
    * can never clobber an injected builder with a weaker one: a
    * wrong-arity SQL call (`minhash_sig(arr)`, `cosine_sim(a)`) surfaces
    * as the standard WRONG_NUM_ARGS AnalysisException naming the
    * function — not an IndexOutOfBoundsException escaping the
    * analyzer. */
  private[graft] def checkArity(name: String, expected: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != expected) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> expected.toString,
            "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      build(exprs)
    }
}
