package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("saltedCountSum equals direct aggregation (skew mitigation)") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,4)")).as("total"))
      .as[(String, Long, BigDecimal)].collect().toSet
    val salted = Scale.saltedCountSum(li, Seq("l_returnflag"), "l_quantity")
      .as[(String, Long, BigDecimal)].collect().toSet
    assert(salted === direct)
  }

  test("saltedJoin equals plain equi-join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
    val sup = Tables.supplier(spark, sf).select("s_suppkey", "s_name")
    val plain = li.join(sup, $"l_suppkey" === $"s_suppkey")
      .select("l_orderkey", "s_name").as[(Long, String)].collect().sorted.toSeq
    val salted = Scale.saltedJoin(li, sup, "l_suppkey", "s_suppkey")
      .select("l_orderkey", "s_name").as[(Long, String)].collect().sorted.toSeq
    assert(salted === plain)
  }

  test("bucketed tables join with no shuffle exchange") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey", "l_quantity")
    val sup = Tables.supplier(spark, sf).select("s_suppkey", "s_acctbal")
    Scale.writeBucketed(li, "b_lineitem", Seq("l_suppkey"), 4)
    Scale.writeBucketed(sup.withColumnRenamed("s_suppkey", "l_suppkey"),
      "b_supplier", Seq("l_suppkey"), 4)
    // disable broadcast so the co-located sort-merge path is what gets planned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_supplier"), Seq("l_suppkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_supplier")
    }
  }
}
