package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) builds an
  * intermediate array object and walks interpreted lambda expressions per
  * element — measured ~8µs/pair on 64-dim vectors, which dominates any O(n²)
  * similarity join. This expression is the same left-to-right IEEE fold
  * (bit-identical results, so DuckDB-oracle comparisons still hold) as a
  * tight primitive loop over the unsafe array data: no allocation, no
  * boxing, no lambda dispatch.
  *
  * Preference order per the build rules: compose built-ins first, custom
  * `Expression` when the built-in form can't express it *efficiently* —
  * this is the latter.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Always nullable: mismatched array lengths yield NULL even when both
    * inputs are non-null. Without this override BinaryExpression derives
    * nullability from the children, and with non-nullable inputs
    * nullSafeCodeGen takes the branch that never declares `ev.isNull` —
    * the generated `isNull = true;` then references an undeclared variable,
    * the stage fails to compile, and Spark silently falls back to
    * interpreted execution (negating the codegen win). It also keeps the
    * optimizer from mis-folding IsNull/coalesce over this expression. */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // mismatched lengths → NULL, matching the zip_with+aggregate form
    // (zip_with pads the shorter side with null, poisoning the fold) —
    // never a silently-truncated partial product
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a NULL element → NULL result, matching the composable fold (null
      // poisons the + chain); without this check interpreted eval NPEs on
      // GenericArrayData and codegen silently reads 0.0 from UnsafeArrayData
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Whole-stage codegen: the same primitive loop emitted as Java, so the
    * surrounding projection/filter stage stays fused (CodegenFallback
    * would box the whole row through the interpreted path). Identical
    * left-to-right IEEE fold as [[nullSafeEval]]. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
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
         |      $acc += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Register `graft_dot` in the session's function registry (idempotent);
    * callers then use `expr("graft_dot(a, b)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
}
