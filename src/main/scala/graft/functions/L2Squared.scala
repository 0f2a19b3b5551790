package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native squared-L2 distance over two `array<double>` columns — the
  * distance-family sibling of [[DotProduct]], built for the same reason:
  * the composable form (`aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)),
  * 0.0, _+_)`) walks interpreted lambdas per element, which dominates the
  * k-means assignment join, the PQ codeword-distance table, and the
  * k-center traversal. Same left-to-right IEEE fold as the composable
  * form and DuckDB's `list_reduce` over the same zip — bit-identical
  * results, so every L2 oracle stays green across the swap. */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Always nullable: mismatched array lengths yield NULL even when both
    * inputs are non-null (the DotProduct nullability lesson — without
    * this, non-nullable children make nullSafeCodeGen emit an assignment
    * to an undeclared `isNull`, and the stage silently falls back to
    * interpreted execution). */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq expects (array<double>, array<double>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // mismatched lengths → NULL, matching the zip_with+aggregate form
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a NULL element → NULL result, matching the composable fold (null
      // poisons the + chain); without this check interpreted eval NPEs on
      // GenericArrayData and codegen silently reads 0.0 from UnsafeArrayData
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val dd = ctx.freshName("dd")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      final double $dd = $a.getDouble($i) - $b.getDouble($i);
         |      $acc += $dd * $dd;
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}

object L2Squared {
  /** Register `graft_l2sq` in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2sq", exprs => L2Squared(exprs(0), exprs(1)), "built-in")
}
