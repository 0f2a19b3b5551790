package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: installs the engine's native
  * functions at session build time (config
  * `spark.sql.extensions=graft.functions.GraftExtensions`, set by
  * Verify/Bench/test sessions), so SQL text like `graft_dot(a, b)`
  * resolves without imperative registration — plus the
  * [[NativeFoldRewrite]] optimizer rule, so the COMPOSABLE
  * `aggregate(zip_with(...))` dot/L2 folds a user writes against the
  * plain DataFrame API silently become the codegen'd native
  * expressions (bit-identical by contract). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[L2Squared].getName, "graft_l2sq"),
      (exprs: Seq[Expression]) => L2Squared(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_between"),
      new ExpressionInfo(classOf[GraftBetween].getName, "graft_between"),
      (exprs: Seq[Expression]) => GraftBetween(exprs(0), exprs(1), exprs(2))))
    e.injectOptimizerRule(_ => NativeFoldRewrite)
    e.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
  }
}
