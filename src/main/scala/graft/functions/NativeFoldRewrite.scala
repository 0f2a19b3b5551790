package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Subtract, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the COMPOSABLE double-array folds
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y),        lit(0.0), _ + _)
  *   aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)),  lit(0.0), _ + _)
  *
  * into the native [[DotProduct]] / [[L2Squared]] expressions. The
  * rewrite is SEMANTICS-PRESERVING by the expressions' documented
  * contract (FunctionsSpec proves each leg bit-identical): identical
  * left-to-right IEEE fold; mismatched lengths → NULL (zip_with pads
  * with null and poisons the + chain — exactly the native length
  * guard); a NULL element → NULL on both forms. What changes is purely
  * physical: a primitive codegen loop instead of per-element
  * interpreted lambda dispatch — measured ~8 µs/pair → ~0.1 µs on
  * 64-dim vectors, the difference that dominates any pairwise
  * similarity join a user writes with the composable API.
  *
  * Scope is deliberately tight: DoubleType arrays, zero literal exactly
  * 0.0, merge exactly `acc + v` (same variable order), identity finish
  * — anything else (ints, different seeds, reordered operands, extra
  * arithmetic) is left untouched. Installed by [[GraftExtensions]] via
  * `injectOptimizerRule`, so every session built with the extensions
  * gets the rewrite on SQL text and DataFrame code alike. */
object NativeFoldRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** finish is the identity lambda the `aggregate` API installs. */
  private def isIdentity(e: Expression): Boolean = e match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(a: NamedLambdaVariable), _) => v.exprId == a.exprId
    case _ => false
  }

  /** merge is exactly (acc, v) => acc + v — the operand ORDER matters:
    * IEEE addition commutes in value but we only claim bit-parity for
    * the exact shape the native fold implements. */
  private def isSumMerge(e: Expression): Boolean = e match {
    case LambdaFunction(Add(acc: NamedLambdaVariable,
        v: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      acc.exprId == a.exprId && v.exprId == b.exprId
    case _ => false
  }

  private def sameVars(x: NamedLambdaVariable, y: NamedLambdaVariable,
      a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    x.exprId == a.exprId && y.exprId == b.exprId

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(body,
            Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType), merge, finish)
          if isDoubleArray(l) && isDoubleArray(r) &&
            isSumMerge(merge) && isIdentity(finish) =>
        body match {
          case Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _)
              if sameVars(x, y, a, b) =>
            DotProduct(l, r)
          case Multiply(
              Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
              Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _)
              if sameVars(x1, y1, a, b) && sameVars(x2, y2, a, b) =>
            L2Squared(l, r)
          case _ =>
            ArrayAggregate(ZipWith(l, r,
              LambdaFunction(body, Seq(a, b))),
              Literal(0.0, DoubleType), merge, finish)
        }
    }
}
