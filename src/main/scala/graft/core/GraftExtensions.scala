package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.CosineSimilarity

/** Session-extension registration for the engine's native expressions —
  * the `SparkSessionExtensions` path, so `cosine_similarity` is available
  * in SQL from session construction (no per-session imperative call):
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.core.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getName,
        "cosine_similarity",
        "cosine_similarity(a, b) - cosine similarity of two float/double arrays"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    // band-containment joins become chunk-quantized equi-joins when
    // spark.graft.rangeJoin.chunkWidth is set (see plans.RangeJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
