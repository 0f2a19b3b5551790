package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Kernels

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct matches the composable fold bit-for-bit") {
    DotProduct.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, 0.2), Seq(0.3, 0.7))).toDF("a", "b")
    val got = df.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("folded"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, f) =>
      assert(java.lang.Double.doubleToLongBits(n) ===
        java.lang.Double.doubleToLongBits(f))
    }
  }

  test("DotProduct nulls propagate, type mismatch rejected") {
    DotProduct.register(spark)
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(call_function("graft_dot", col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
    intercept[Exception] {
      Seq(("x", 1)).toDF("a", "b")
        .select(call_function("graft_dot", col("a"), col("b"))).collect()
    }
  }

  test("DotProduct codegen compiles with NON-nullable inputs " +
    "(nullable override regression)") {
    // Without `override def nullable = true`, non-nullable children make
    // nullSafeCodeGen take the branch that never declares ev.isNull, so
    // the emitted `isNull = true;` references an undeclared variable and
    // the stage silently falls back to interpreted. CODEGEN_ONLY turns
    // that silent fallback into a hard failure.
    DotProduct.register(spark)
    withSQLConf("spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      // array(lit...) of literals is non-nullable by construction
      val df = spark.range(3).select(
        array(lit(1.0), col("id").cast("double")).as("a"),
        array(lit(2.0), lit(3.0)).as("b"),
        array(lit(1.0)).as("short"))
      assert(!df.schema("a").nullable && !df.schema("b").nullable)
      val got = df.select(
        call_function("graft_dot", col("a"), col("b")).as("dot"),
        call_function("graft_dot", col("a"), col("short")).as("mismatch"))
        .as[(Option[Double], Option[Double])].collect()
      assert(got.map(_._1).toSeq ===
        Seq(Some(2.0), Some(5.0), Some(8.0)))
      // mismatched lengths → NULL even with non-nullable inputs
      assert(got.forall(_._2.isEmpty))
      // and the planner must agree the output is nullable
      val outSchema = df.select(
        call_function("graft_dot", col("a"), col("short")).as("m")).schema
      assert(outSchema("m").nullable)
    }
  }

  test("L2Squared matches the composable fold bit-for-bit; codegen " +
    "compiles with non-nullable inputs; mismatch yields NULL") {
    L2Squared.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 6.0, 3.5)),
      (Seq(0.1, 0.2), Seq(0.3, 0.7))).toDF("a", "b")
    val got = df.select(
      call_function("graft_l2sq", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v).as("folded"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, f) =>
      assert(java.lang.Double.doubleToRawLongBits(n) ===
        java.lang.Double.doubleToRawLongBits(f))
    }
    withSQLConf("spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      val nn = spark.range(2).select(
        array(lit(1.0), col("id").cast("double")).as("a"),
        array(lit(0.0), lit(2.0)).as("b"),
        array(lit(1.0)).as("short"))
      val r = nn.select(
        call_function("graft_l2sq", col("a"), col("b")).as("d"),
        call_function("graft_l2sq", col("a"), col("short")).as("m"))
        .as[(Option[Double], Option[Double])].collect()
      assert(r.map(_._1).toSeq === Seq(Some(5.0), Some(2.0)))
      assert(r.forall(_._2.isEmpty))
    }
  }

  test("DotProduct / L2Squared: a NULL array ELEMENT yields NULL in both " +
    "interpreted and codegen modes, matching the composable fold") {
    DotProduct.register(spark)
    L2Squared.register(spark)
    // array(lit, null-cast) has containsNull = true with a null element in
    // row 0 and none in row 1
    def probe(): Seq[(Option[Double], Option[Double], Option[Double], Option[Double])] =
      spark.range(2).select(
        array(lit(1.0),
          when(col("id") === 0, lit(null).cast("double")).otherwise(lit(2.0)))
          .as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
        .select(
          call_function("graft_dot", col("a"), col("b")).as("dot"),
          call_function("graft_l2sq", col("a"), col("b")).as("l2"),
          aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
            lit(0.0), (acc, v) => acc + v).as("dot_fold"),
          aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, v) => acc + v).as("l2_fold"))
        .as[(Option[Double], Option[Double], Option[Double], Option[Double])]
        .collect().toSeq
    for (mode <- Seq("NO_CODEGEN", "CODEGEN_ONLY")) {
      withSQLConf("spark.sql.codegen.factoryMode" -> mode) {
        val Seq(withNull, clean) = probe()
        assert(withNull === ((None, None, None, None)), s"mode=$mode")
        assert(clean === ((Some(11.0), Some(8.0), Some(11.0), Some(8.0))),
          s"mode=$mode")
      }
    }
  }

  test("NativeFoldRewrite: composable dot/L2 folds optimize into the " +
    "native expressions; near-miss shapes are left alone") {
    import org.apache.spark.sql.catalyst.expressions.ArrayAggregate
    def natives(df: org.apache.spark.sql.DataFrame): (Int, Int, Int) = {
      val es = df.queryExecution.optimizedPlan.expressions
      (es.map(_.collect { case _: DotProduct => 1 }.size).sum,
        es.map(_.collect { case _: L2Squared => 1 }.size).sum,
        es.map(_.collect { case _: ArrayAggregate => 1 }.size).sum)
    }
    // id-dependent arrays: a literal fixture would be CONSTANT-FOLDED
    // away before the rewrite could be observed
    val base = spark.range(1).select(
      array(lit(1.0), col("id").cast("double") + 2.0).as("a"),
      array(lit(3.0), lit(4.0)).as("b"))
    val dot = base.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(natives(dot) === ((1, 0, 0)), "dot fold not rewritten")
    assert(dot.as[Double].head() === 11.0)
    val l2 = base.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(natives(l2) === ((0, 1, 0)), "L2 fold not rewritten")
    assert(l2.as[Double].head() === 8.0)
    // near-misses stay composable: non-zero seed; a different body
    val seeded = base.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(1.0), (acc, v) => acc + v).as("d"))
    assert(natives(seeded)._1 === 0)
    assert(seeded.as[Double].head() === 12.0)
    val maxBody = base.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(natives(maxBody) === ((0, 0, 1)), "sum-body fold must survive")
    assert(maxBody.as[Double].head() === 10.0)
    // and INT arrays are out of scope
    val ints = spark.range(1).select(
        array(lit(1L), col("id") + 2L).as("a"),
        array(lit(3L), lit(4L)).as("b"))
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("d"))
    assert(natives(ints)._1 === 0)
    assert(ints.as[Long].head() === 11L)
  }

  test("OrderedMiddleAgg (typed Aggregator) agrees with the expression form") {
    val udafCol = udaf(OrderedMiddleAgg)
    val df = Seq(("k", 1.0), ("k", 2.0), ("k", 3.0), ("k", 4.0),
      ("o", 9.0), ("o", 1.0), ("o", 5.0)).toDF("k", "v")
    val got = df.groupBy($"k").agg(
      udafCol(col("v")).as("agg"),
      Kernels.orderedMiddle(col("v")).as("expr"))
      .as[(String, Option[Double], Double)].collect()
    got.foreach { case (_, a, e) => assert(a === Some(e)) }
  }
}
