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
  * `simhash64`) into every session of
  * the cluster — the declarative alternative to the imperative
  * `GraftSession.getOrCreate()` / `AsOfJoin.install(spark)` calls, and
  * the standard way a Spark library ships Catalyst extensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("avro_encode"),
      new ExpressionInfo(classOf[AvroEncodeExpression].getName, "avro_encode"),
      (exprs: Seq[Expression]) => AvroEncodeExpression(exprs.head, Schemas.reclamacoesAvsc)))
    ext.injectFunction((
      FunctionIdentifier("avro_decode"),
      new ExpressionInfo(classOf[AvroDecodeExpression].getName, "avro_decode"),
      (exprs: Seq[Expression]) => AvroDecodeExpression(exprs.head, Schemas.reclamacoesAvsc)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinHashSignature].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => graft.functions.MinHashSignature(
        exprs(0), graft.functions.MinHashSignature.kOf(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => graft.functions.SimHash64(exprs.head)))
  }
}
