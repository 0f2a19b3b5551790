package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics of the temporal joins: as-of (latest-at-or-before, inclusive
  * ties, left-null, no payload back-fill) and the binned range join
  * (equality with the naive between-join, multi-bin intervals, inverted
  * intervals). */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asOfJoin picks the latest right row at-or-before, inclusive at ties") {
    val left = Seq((1L, ts(10), "p10"), (1L, ts(5), "p5"), (1L, ts(2), "p2"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, ts(3), "r3"), (1L, ts(5), "r5"), (1L, ts(7), "r7"))
      .toDF("k", "t", "rv")
    val got = TemporalJoins.asOfJoin(left, right, "k", "t")
      .select("lv", "rv").as[(String, String)].collect().toMap
    // p2: before any right row → null; p5: tie at t=5 matches (inclusive);
    // p10: latest earlier row is r7, not r3/r5
    assert(got === Map("p2" -> null, "p5" -> "r5", "p10" -> "r7"))
  }

  test("asOfJoin keys never cross and left keeps every row") {
    val left = Seq((1L, ts(10), "a"), (2L, ts(10), "b")).toDF("k", "t", "lv")
    val right = Seq((1L, ts(1), "r1")).toDF("k", "t", "rv")
    val got = TemporalJoins.asOfJoin(left, right, "k", "t")
      .select("lv", "rv").as[(String, String)].collect().toMap
    assert(got === Map("a" -> "r1", "b" -> null))
  }

  test("asOfJoin does not back-fill a null payload field from an older row") {
    // r5 has v=null legitimately; a carried-per-column impl would leak 7
    val left = Seq((1L, ts(9), "p")).toDF("k", "t", "lv")
    val right = Seq((1L, ts(3), Some(7L)), (1L, ts(5), None)).toDF("k", "t", "v")
    val got = TemporalJoins.asOfJoin(left, right, "k", "t")
      .select("t_right", "v").collect().head
    assert(got.getTimestamp(0) === ts(5) && got.isNullAt(1))
  }

  test("asOfJoin NULL key/time rows never match (native ASOF semantics)") {
    // right rows with NULL key or NULL time must not become anyone's
    // "latest prior" (nulls-first ascending would otherwise leak them into
    // left rows with no real prior), and NULL-keyed left rows get a null
    // payload instead of matching other NULL-keyed rows
    val left = Seq(
      (Option(1L), Option(ts(2)), "early"),   // before any valid right row
      (Option(1L), Option(ts(9)), "late"),
      (None: Option[Long], Option(ts(9)), "nullkey"),
      (Option(1L), None: Option[Timestamp], "nulltime"))
      .toDF("k", "t", "lv")
    val right = Seq(
      (Option(1L), None: Option[Timestamp], "rNullTime"),
      (None: Option[Long], Option(ts(1)), "rNullKey"),
      (Option(1L), Option(ts(5)), "r5"))
      .toDF("k", "t", "rv")
    val got = TemporalJoins.asOfJoin(left, right, "k", "t")
      .select("lv", "rv").as[(String, String)].collect().toMap
    assert(got === Map(
      "early" -> null, "late" -> "r5", "nullkey" -> null, "nulltime" -> null))
  }

  test("asOfJoin equals the naive quadratic formulation on real events") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val got = TemporalJoins.asOfJoin(purchases, clicks, "user_id", "ts")
      .select("purchase_id", "click_id")
    // naive: pair every purchase with every earlier-or-equal click, keep
    // the latest (the O(events-per-key²) shape asOfJoin avoids)
    val naive = purchases
      .join(clicks.toDF("cuid", "cts", "cid"),
        col("user_id") === col("cuid") && col("cts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("user_id"), col("purchase_id"))
        .orderBy(col("cts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("cid").as("click_id"))
    assert(got.count() === purchases.count())
    assert(got.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(got).count() === 0)
  }

  test("asOfJoinForward picks the earliest right row at-or-after, " +
    "inclusive at ties") {
    val left = Seq((1L, ts(10), "p10"), (1L, ts(5), "p5"), (1L, ts(2), "p2"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, ts(3), "r3"), (1L, ts(5), "r5"), (1L, ts(7), "r7"))
      .toDF("k", "t", "rv")
    val got = TemporalJoins.asOfJoinForward(left, right, "k", "t")
      .select("lv", "rv").as[(String, String)].collect().toMap
    // p2 → first later row r3; p5 → tie at t=5 (inclusive); p10 → none left
    assert(got === Map("p2" -> "r3", "p5" -> "r5", "p10" -> null))
  }

  test("asOfJoinForward equals the naive quadratic formulation on real events") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val got = TemporalJoins.asOfJoinForward(clicks, purchases, "user_id", "ts")
      .select("click_id", "purchase_id")
    val naive = clicks
      .join(purchases.toDF("puid", "pts", "pid"),
        col("user_id") === col("puid") && col("pts") >= col("ts"), "left")
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("user_id"), col("click_id"))
        .orderBy(col("pts").asc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("click_id"), col("pid").as("purchase_id"))
    assert(got.count() === clicks.count())
    assert(got.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(got).count() === 0)
  }

  test("asOfJoinNearest picks the closest row either direction, ties to " +
    "the earlier one") {
    val left = Seq((1L, ts(10), "p10"), (1L, ts(4), "p4"), (1L, ts(1), "p1"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, ts(3), "r3"), (1L, ts(5), "r5"), (1L, ts(20), "r20"))
      .toDF("k", "t", "rv")
    val got = TemporalJoins.asOfJoinNearest(left, right, "k", "t")
      .select("lv", "rv").as[(String, String)].collect().toMap
    // p1 → r3 (forward-only, Δ=2 beats none backward); p4 → tie |Δ|=1
    // between r3 and r5 → earlier (r3); p10 → r5 (Δ=5) beats r20 (Δ=10)
    assert(got === Map("p1" -> "r3", "p4" -> "r3", "p10" -> "r5"))
  }

  test("asOfJoinNearest: same-instant right row wins with Δ=0; empty side " +
    "keeps null payload") {
    val left = Seq((1L, ts(5), "a"), (2L, ts(5), "b")).toDF("k", "t", "lv")
    val right = Seq((1L, ts(5), "x"), (1L, ts(6), "y")).toDF("k", "t", "rv")
    val got = TemporalJoins.asOfJoinNearest(left, right, "k", "t")
      .select("lv", "rv").as[(String, String)].collect().toMap
    assert(got === Map("a" -> "x", "b" -> null))
  }

  test("asOfJoinNearest: NULL-time left rows keep null payload (not the " +
    "minimum-time right row)") {
    // the forward window orders time DESC (nulls last), so without the
    // explicit guard a null-time left row would inherit the min-time right
    // row via last(__r, ignoreNulls)
    val left = Seq((Option(1L), Option(ts(5)), "ok"),
      (Option(1L), None: Option[Timestamp], "nulltime"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, ts(4), "r4"), (1L, ts(9), "r9")).toDF("k", "t", "rv")
    val got = TemporalJoins.asOfJoinNearest(left, right, "k", "t")
      .select("lv", "rv").as[(String, String)].collect().toMap
    assert(got === Map("ok" -> "r4", "nulltime" -> null))
  }

  test("asOfJoinNearest equals the naive min-|Δ| formulation on real events") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val got = TemporalJoins.asOfJoinNearest(purchases, clicks, "user_id", "ts")
      .select("purchase_id", "click_id")
    val naive = purchases
      .join(clicks.toDF("cuid", "cts", "cid"),
        col("user_id") === col("cuid"), "left")
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("user_id"), col("purchase_id"))
        .orderBy(abs(unix_micros(col("cts")) - unix_micros(col("ts")))
          .asc_nulls_last, col("cts").asc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("cid").as("click_id"))
    assert(got.count() === purchases.count())
    assert(got.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(got).count() === 0)
  }

  test("binnedRangeJoin equals the naive between-join, including multi-bin spans") {
    val intervals = Seq(
      (1L, "2020-01-01", "2020-03-10"), // spans many 16-day bins
      (2L, "2020-02-01", "2020-02-02"),
      (3L, "2020-05-01", "2020-04-01")  // inverted → matches nothing
    ).toDF("id", "s", "e")
      .select(col("id"), to_date(col("s")).as("s"), to_date(col("e")).as("e"))
    val points = (0 until 200).map(i => Tuple1(i))
      .toDF("i").select(date_add(to_date(lit("2020-01-01")), col("i")).as("d"))
    val binned = TemporalJoins
      .binnedRangeJoin(intervals, points, "s", "e", "d", binSizeDays = 16)
      .select("id", "d")
    val naive = intervals.join(points, col("d").between(col("s"), col("e")))
      .select("id", "d")
    assert(binned.count() === naive.count())
    assert(binned.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(binned).count() === 0)
    assert(binned.filter(col("id") === 3).count() === 0)
  }

  test("intervalOverlapJoin equals the naive overlap join, one row per " +
    "pair even when the pair shares several bins") {
    val left = Seq(
      (1L, "2020-01-01", "2020-03-10"), // long: shares many bins with rights
      (2L, "2020-02-01", "2020-02-02"),
      (3L, "2020-05-01", "2020-04-01"), // inverted → matches nothing
      (4L, "2020-06-01", "2020-06-01")  // single day
    ).toDF("lid", "ls", "le")
      .select(col("lid"), to_date(col("ls")).as("ls"), to_date(col("le")).as("le"))
    val right = Seq(
      (10L, "2019-12-20", "2020-01-05"), // overlaps 1 across a bin edge
      (11L, "2020-01-15", "2020-02-20"), // overlaps 1 and 2
      (12L, "2020-02-02", "2020-02-02"), // point-interval, touches 2's end
      (13L, "2020-06-01", "2020-06-30"), // touches 4's single day
      (14L, "2020-03-11", "2020-03-12")  // adjacent to 1 but disjoint
    ).toDF("rid", "rs", "re")
      .select(col("rid"), to_date(col("rs")).as("rs"), to_date(col("re")).as("re"))
    val binned = TemporalJoins
      .intervalOverlapJoin(left, right, "ls", "le", "rs", "re", binSizeDays = 16)
      .select("lid", "rid")
    val naive = left.join(right,
      col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid")
    assert(binned.count() === naive.count(), "pair multiplicity must be 1")
    assert(binned.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(binned).count() === 0)
    assert(binned.filter(col("lid") === 3).count() === 0)
    assert(binned.filter(col("lid") === 1 && col("rid") === 14).count() === 0)
  }
}
