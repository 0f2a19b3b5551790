package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("each check counts its violations; suite attaches verdicts") {
    val child = Seq(
      (Option(1L), "O", 10.0),
      (Option.empty[Long], "O", -1.0), // null fk, non-positive price
      (Option(9L), "X", 5.0)           // orphan fk, bad status
    ).toDF("fk", "status", "price")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = DataQuality.suite(Seq(
      DataQuality.nullCheck(child, "fk_null", "fk"),
      DataQuality.fkCheck(child, "fk_parent", "fk", parent, "pk"),
      DataQuality.predicateCheck(child, "price_pos", col("price") <= 0),
      DataQuality.predicateCheck(child, "status_dom",
        !col("status").isin("O")),
      DataQuality.uniqueCheck(child, "fk_unique", "fk")))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("fk_null") === ((1L, false)))
    assert(got("fk_parent") === ((1L, false))) // null fk excluded
    assert(got("price_pos") === ((1L, false)))
    assert(got("status_dom") === ((1L, false)))
    assert(got("fk_unique") === ((0L, true)))
  }

  test("uniqueCheck counts duplicated key VALUES, not extra rows") {
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val got = DataQuality.uniqueCheck(df, "k_unique", "k")
      .as[(String, Long)].head()
    assert(got === (("k_unique", 2L))) // values 1 and 3
  }

  test("neymanAllocation: hand-computed variance-optimal split, exact " +
    "budget exhaustion, zero-variance stratum starved") {
    val df = Seq(
      ("A", 0L), ("A", 10L),            // n=2, var_num=100, σ=5 → w=10e6
      ("B", 5L), ("B", 5L), ("B", 5L),  // σ=0 → w=0
      ("C", 0L), ("C", 6L)              // n=2, var_num=36, σ=3 → w=6e6
    ).toDF("lang", "v")
    val got = DataQuality.neymanAllocation(df, "lang", "v", budget = 10L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") === (("A", 2L, 10000000L, 6L)))
    assert(got("B") === (("B", 3L, 0L, 0L)))
    // C wins the largest-remainder top-up (floor 3, rem 12e6 > A's 4e6)
    assert(got("C") === (("C", 2L, 6000000L, 4L)))
    assert(got.values.map(_._4).sum === 10L, "budget not exhausted exactly")
    // degenerate: every stratum zero-variance → floors 0, top-up by
    // stratum order
    val flat = Seq(("X", 1L), ("X", 1L), ("Y", 2L), ("Y", 2L))
      .toDF("lang", "v")
    val g2 = DataQuality.neymanAllocation(flat, "lang", "v", budget = 3L)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(g2.values.sum === 0L,
      "w_total = 0 must allocate nothing (no weights to honor)")
  }

  test("suite over an empty table: every check passes with zero metric") {
    val empty = Seq.empty[(Option[Long], String)].toDF("fk", "status")
    val got = DataQuality.suite(Seq(
      DataQuality.nullCheck(empty, "fk_null", "fk"),
      DataQuality.uniqueCheck(empty, "fk_unique", "fk"),
      DataQuality.predicateCheck(empty, "dom", !col("status").isin("O"))))
      .as[(String, Long, Boolean)].collect()
    assert(got.length === 3)
    assert(got.forall(r => r._2 === 0L && r._3))
  }
}
