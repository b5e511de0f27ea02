package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Deployment-grade wiring (`--conf spark.sql.extensions=graft.plans.
  * GraftExtensions`): registers the engine's native Catalyst pieces on
  * every session the cluster builds — no per-session `register` calls
  * in user code.
  *
  *  - `cosine_sim` as a permanent catalog function (codegen'd
  *    [[CosineSimilarity]])
  *  - [[BandJoinRewrite]]: optimizer rule turning naive
  *    `abs(a - b) <= c` inequality joins into binned equi-joins
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => BandJoinRewrite)
  }
}
