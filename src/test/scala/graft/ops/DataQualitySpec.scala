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

  test("isotonicBinsPpm: PAV pooling on a hand case, identity on a " +
    "monotone input, global monotone output") {
    // rates [0.2, 0.1, 0.3] with equal n: PAV pools the violating first
    // pair to 0.15 → [150000, 150000, 300000]
    val viol = Seq((0L, 10L, 2L), (1L, 10L, 1L), (2L, 10L, 3L))
      .toDF("bin", "n", "pos")
    val got = DataQuality.isotonicBinsPpm(viol)
      .orderBy(col("bin")).as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._4).toSeq === Seq(150000L, 150000L, 300000L))
    // already-monotone input is a fixed point
    val mono = Seq((0L, 10L, 1L), (1L, 10L, 2L), (2L, 10L, 5L))
      .toDF("bin", "n", "pos")
    val got2 = DataQuality.isotonicBinsPpm(mono)
      .orderBy(col("bin")).as[(Long, Long, Long, Long)].collect()
    assert(got2.map(_._4).toSeq === Seq(100000L, 200000L, 500000L))
    // a rougher profile still comes out non-decreasing
    val rough = Seq((0L, 5L, 4L), (1L, 7L, 1L), (2L, 3L, 2L),
      (3L, 9L, 3L), (4L, 4L, 4L)).toDF("bin", "n", "pos")
    val iso = DataQuality.isotonicBinsPpm(rough)
      .orderBy(col("bin")).as[(Long, Long, Long, Long)].collect().map(_._4)
    assert(iso.sliding(2).forall(p => p.length < 2 || p.head <= p.last),
      iso.mkString(","))
  }

  test("conformalCoverage: hand-replayed order statistic, coverage " +
    "counts, and small-group drop") {
    // group g: 10 cal rows (even ids) with values 0.0..0.9, 5 test rows;
    // group tiny: 1 cal row -> r = ceil(2*0.9) = 2 > 1 -> dropped
    val rows =
      (0L until 20L).map(i => ("g", i, (i / 2).toDouble / 10.0)) ++
        Seq(("tiny", 100L, 1.0), ("tiny", 101L, 2.0))
    val df = rows.toDF("grp", "id", "value")
    val got = DataQuality.conformalCoverage(df, "grp", col("value"),
      col("id") % 2 === 0)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet === Set("g"))
    val (_, nCal, r, qhat, nTest, covered, ppm) = got.head
    // driver replay: vq = floor(v*1e6), score = |vq*n - sum|
    val calVq = (0L until 20L).filter(_ % 2 == 0)
      .map(i => math.floor((i / 2).toDouble / 10.0 * 1000000).toLong)
    val s = calVq.sum
    val calScores = calVq.map(v => math.abs(v * calVq.length - s)).sorted
    val expR = ((calVq.length + 1) * 9 + 9) / 10
    val expQ = calScores(expR - 1)
    assert(nCal === calVq.length && r === expR && qhat === expQ)
    val tstVq = (0L until 20L).filter(_ % 2 == 1)
      .map(i => math.floor((i / 2).toDouble / 10.0 * 1000000).toLong)
    val expCov = tstVq.count(v => math.abs(v * calVq.length - s) <= expQ)
    assert(nTest === tstVq.length && covered === expCov)
    assert(ppm === covered * 1000000L / nTest)
  }
}
