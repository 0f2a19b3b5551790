package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Range-join marker predicate: `graft_between(p, lo, hi)` ⇔
  * `lo <= p AND p <= hi` over any orderable type (the three children must
  * share one data type — no implicit coercion, so the planner-side match
  * in [[graft.plans.RangeJoinStrategy]] sees exactly the columns the user
  * wrote).
  *
  * Semantically it is nothing more than the conjunction above — `eval` and
  * `doGenCode` compute it directly, so a plan in which the strategy does
  * NOT fire (extra join predicates, outer joins, sides the wrong way
  * round) still returns correct rows through Spark's default join
  * planning. When it appears conjoined with equi-key predicates in an
  * inner join condition, [[graft.plans.RangeJoinStrategy]] plans the whole
  * join as the co-partitioned merge-sweep [[graft.plans.RangeJoinExec]]
  * instead of an equi-join that re-filters per key-group pair.
  */
case class GraftBetween(point: Expression, lo: Expression, hi: Expression)
    extends TernaryExpression with Predicate {

  override def first: Expression = point
  override def second: Expression = lo
  override def third: Expression = hi

  /** Null in any child yields NULL (join semantics drop the row). */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (lo.dataType != point.dataType || hi.dataType != point.dataType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_between expects three children of one orderable type, got " +
          s"(${point.dataType.sql}, ${lo.dataType.sql}, ${hi.dataType.sql})")
    else TypeUtils.checkForOrderingExpr(point.dataType, "graft_between")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(point.dataType)

  override protected def nullSafeEval(p: Any, l: Any, h: Any): Any =
    ordering.lteq(l, p) && ordering.lteq(p, h)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, l, h) => {
      val dt: DataType = point.dataType
      s"${ev.value} = ${ctx.genComp(dt, l, p)} <= 0 && " +
        s"${ctx.genComp(dt, p, h)} <= 0;"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(point = newFirst, lo = newSecond, hi = newThird)

  override def prettyName: String = "graft_between"
}

object GraftBetween {
  /** Session-local registration for sessions built WITHOUT
    * [[GraftExtensions]] (the L2Squared.register pattern): the function
    * resolves everywhere, and on such sessions the join simply plans
    * through Spark's default path — the marker evaluates the plain
    * conjunction, so the result is identical, just not the native sweep. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_between", exprs => GraftBetween(exprs(0), exprs(1), exprs(2)),
      "built-in")
}
