package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ChainDotF32, CosineSimilarity}

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
    ext.injectFunction((
      FunctionIdentifier("chain_dot_f32"),
      new ExpressionInfo(classOf[ChainDotF32].getName, "chain_dot_f32"),
      (exprs: Seq[Expression]) => ChainDotF32(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => BandJoinRewrite)

    // Text-analysis primitives as SQL functions, so `spark.sql` users
    // get the same surface as the Column API (`SELECT lang_id(text)…`).
    // Column-built trees bridge through ExpressionUtils; unresolved
    // children resolve during analysis like any builder output.
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import graft.functions.TextFunctions
    def inject1(name: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(TextFunctions.getClass.getName, name),
        (exprs: Seq[Expression]) => expression(f(column(exprs(0))))))
    inject1("lang_id", TextFunctions.langId)
    inject1("doc_fingerprint", TextFunctions.fingerprint)
    inject1("token_count", c => TextFunctions.tokenCount(c))
    inject1("rep_ratio", TextFunctions.repRatio)
    ext.injectFunction((FunctionIdentifier("quality_score"),
      new ExpressionInfo(TextFunctions.getClass.getName, "quality_score"),
      (exprs: Seq[Expression]) =>
        expression(TextFunctions.quality(column(exprs(0)), column(exprs(1))))))
  }
}
