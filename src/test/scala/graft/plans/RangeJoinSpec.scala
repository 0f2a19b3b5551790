package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.ops.TemporalJoins

/** The native merge-sweep range join: strategy firing, sweep correctness
  * against the plain-join ground truth (including adversarial interval
  * nestings the heap must handle), NULL semantics, and the fallback path
  * when the strategy declines the shape. */
class RangeJoinSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private def intervals: DataFrame = Seq(
    // (key, lo, hi, tag) — overlapping, nested, duplicate-lo, backwards
    (1L, 10L, 20L, "a"),
    (1L, 12L, 14L, "b"),   // nested inside a: evicted EARLY while a stays
    (1L, 12L, 30L, "c"),   // duplicate lo with b, longer tail
    (1L, 25L, 24L, "w"),   // backwards: matches nothing
    (2L, 0L, 5L, "d"),
    (3L, 1L, 9L, "e")      // key with no points on the other side
  ).toDF("k", "lo", "hi", "tag")

  private def points: DataFrame = Seq(
    (1L, 13L, "p1"),  // hits a, b, c
    (1L, 15L, "p2"),  // hits a, c (b evicted: hi=14 < 15)
    (1L, 13L, "p1b"), // equal point values: hits a, b, c again
    (1L, 28L, "p3"),  // hits c only (a evicted)
    (2L, 5L, "p4"),   // inclusive upper bound
    (2L, 6L, "p5"),   // just outside
    (4L, 3L, "p6")    // key with no intervals
  ).toDF("pk", "p", "ptag")

  private def native(a: DataFrame, b: DataFrame): DataFrame =
    TemporalJoins.nativeRangeJoin(a, b, Seq("k" -> "pk"), "lo", "hi", "p")

  private def plain(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, a("k") === b("pk") && b("p") >= a("lo") && b("p") <= a("hi"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.select("tag", "ptag").collect()
      .map(r => s"${r.getString(0)}|${r.getString(1)}").toSeq.sorted

  test("strategy plans RangeJoinExec for the marked equi+between join") {
    val planned = native(intervals, points).queryExecution.executedPlan
    assert(planned.toString.contains("RangeJoinExec"),
      s"expected RangeJoinExec in:\n$planned")
  }

  test("merge sweep matches the plain-join ground truth, incl. nested/backwards intervals") {
    val got = sortedRows(native(intervals, points))
    val want = sortedRows(plain(intervals, points))
    assert(want.nonEmpty && got == want)
    // spot-check the heap semantics encoded in the fixtures
    assert(got.contains("c|p3") && !got.contains("a|p3") && !got.contains("b|p2"))
    assert(got.contains("d|p4") && !got.contains("d|p5"))
    assert(!got.exists(_.startsWith("w|")))
  }

  test("NULL keys, bounds, and points match nothing (both plans agree)") {
    val a = Seq(
      (Option(1L), Option(0L), Option(100L), "ok"),
      (None: Option[Long], Option(0L), Option(100L), "nullkey"),
      (Option(1L), None: Option[Long], Option(100L), "nulllo"),
      (Option(1L), Option(0L), None: Option[Long], "nullhi")
    ).toDF("k", "lo", "hi", "tag")
    val b = Seq(
      (Option(1L), Option(50L), "pok"),
      (None: Option[Long], Option(50L), "pnullkey"),
      (Option(1L), None: Option[Long], "pnullp")
    ).toDF("pk", "p", "ptag")
    val got = sortedRows(native(a, b))
    assert(got == Seq("ok|pok"))
    assert(got == sortedRows(plain(a, b)))
  }

  test("single-side residual predicates get pushed below the join; strategy still fires") {
    // the optimizer pushes `ptag != 'p3'` into the point-side scan, leaving
    // the clean equi+between condition → RangeJoinExec plus a pre-join filter
    val a = intervals
    val b = points
    val extra = a.join(b,
      a("k") === b("pk") &&
        call_function("graft_between", b("p"), a("lo"), a("hi")) &&
        b("ptag") =!= "p3")
    assert(extra.queryExecution.executedPlan.toString.contains("RangeJoinExec"))
    val want = sortedRows(plain(intervals, points).filter(col("ptag") =!= "p3"))
    assert(sortedRows(extra) == want && want.nonEmpty)
  }

  test("cross-side residual predicates plan as FilterExec above the sweep") {
    // a non-equi predicate touching BOTH sides can't be pushed below the
    // join; the strategy plans the equi+between core as the sweep and the
    // residual as a filter above it (the SMJ residual treatment)
    val a = intervals
    val b = points
    val cross = a.join(b,
      a("k") === b("pk") &&
        call_function("graft_between", b("p"), a("lo"), a("hi")) &&
        a("tag") =!= b("ptag"))
    val p = cross.queryExecution.executedPlan.toString
    assert(p.contains("RangeJoinExec"), p.take(1200))
    val want = sortedRows(plain(intervals, points).filter(col("tag") =!= col("ptag")))
    assert(sortedRows(cross) == want && want.nonEmpty)
  }

  test("swapped sides (bounds on the right child) sweep under a reordering project") {
    val a = intervals
    val b = points
    // b carries the point's columns; put the INTERVAL side on the right
    val swapped = b.join(a,
      b("pk") === a("k") &&
        call_function("graft_between", b("p"), a("lo"), a("hi")))
    val p = swapped.queryExecution.executedPlan.toString
    assert(p.contains("RangeJoinExec"), p.take(1200))
    assert(sortedRows(swapped) == sortedRows(plain(intervals, points)))
  }

  test("declined shapes (between bounds split across sides) fall back, stay correct") {
    // lo from the interval side but hi a literal-free column of the point
    // side: not sweepable, strategy returns Nil, GraftBetween evaluates
    // the plain conjunction inside whatever join Spark picks
    val a = intervals
    val b = points.withColumn("cap", col("p") + 100L)
    val split = a.join(b,
      a("k") === b("pk") &&
        call_function("graft_between", b("p"), a("lo"), b("cap")))
    assert(!split.queryExecution.executedPlan.toString.contains("RangeJoinExec"))
    val want = sortedRows(a.join(b,
      a("k") === b("pk") && b("p") >= a("lo") && b("p") <= b("cap")))
    assert(sortedRows(split) == want && want.nonEmpty)
  }

  test("many intervals per key: sweep equals ground truth under churn") {
    val a = (0 until 400).map(i => (i % 3L, i.toLong, (i + 7L + (i % 13)), s"i$i"))
      .toDF("k", "lo", "hi", "tag")
    val b = (0 until 300).map(j => (j % 4L, (j * 2L) % 450, s"p$j"))
      .toDF("pk", "p", "ptag")
    assert(sortedRows(native(a, b)) == sortedRows(plain(a, b)))
    assert(sortedRows(native(a, b)).nonEmpty)
  }

  test("native overlap join = raw theta ground truth, each pair exactly once") {
    val a = (0 until 200).map(i => (i % 5L, i.toLong, i + 4L + (i % 9), s"a$i"))
      .toDF("k", "ls", "le", "tag")
    val b = (0 until 150).map(j => (j % 6L, (j * 3L) % 220, (j * 3L) % 220 + 2 + (j % 7), s"b$j"))
      .toDF("pk", "rs", "re", "ptag")
    val got = TemporalJoins.nativeIntervalOverlapJoin(
      a, b, Seq("k" -> "pk"), "ls", "le", "rs", "re")
    val want = a.join(b,
      a("k") === b("pk") && a("ls") <= b("re") && b("rs") <= a("le"))
    assert(sortedRows(got) == sortedRows(want))
    assert(sortedRows(got).nonEmpty)
    // exactly once: the union branches are disjoint
    assert(sortedRows(got).distinct.size == sortedRows(got).size)
    // both branches plan as the native sweep
    val p = got.queryExecution.executedPlan.toString
    assert("RangeJoinExec".r.findAllIn(p).size == 2, p.take(1200))
  }

  test("native overlap: identical bounds, touching endpoints, backwards intervals") {
    val a = Seq(
      (1L, 10L, 20L, "a1"),
      (1L, 10L, 20L, "a2"),  // duplicate interval: both pair with each match
      (1L, 30L, 25L, "aw")   // backwards: dropped
    ).toDF("k", "ls", "le", "tag")
    val b = Seq(
      (1L, 20L, 40L, "b1"),  // touches a1/a2 at the endpoint: overlap
      (1L, 10L, 20L, "b2"),  // identical bounds: case 1 only (rs ∈ [ls,le])
      (1L, 0L, 9L, "b3"),    // just misses (re < ls)
      (1L, 5L, 4L, "bw")     // backwards: dropped
    ).toDF("pk", "rs", "re", "ptag")
    val got = sortedRows(TemporalJoins.nativeIntervalOverlapJoin(
      a, b, Seq("k" -> "pk"), "ls", "le", "rs", "re"))
    assert(got == Seq("a1|b1", "a1|b2", "a2|b1", "a2|b2"))
  }

  test("planted hot key: the interval group buffer spills to disk, result unchanged") {
    // One equi-key owns ALL 4000 intervals — the skew shape that used to
    // build the whole group on-heap. With the thresholds forced low the
    // group buffer must migrate to UnsafeExternalSorter and spill, the
    // node's spillSize metric must show it, and the sweep must still
    // match the plain-join ground truth (reading from the spilled
    // iterator instead of the in-memory buffer).
    withSQLConf(
      "spark.graft.rangeJoin.buffer.inMemoryThreshold" -> "16",
      "spark.graft.rangeJoin.buffer.spillThreshold" -> "64",
      "spark.sql.adaptive.enabled" -> "false") {
      val n = 4000
      val a = (0 until n).map(i => (1L, i.toLong, i + 5L, s"i$i"))
        .toDF("k", "lo", "hi", "tag")
      val b = (0 until 500).map(j => (1L, (j * 17L) % (n + 5), s"p$j"))
        .toDF("pk", "p", "ptag")
      val df = native(a, b)
      val got = df.collect()
        .map(r => s"${r.getAs[String]("tag")}|${r.getAs[String]("ptag")}")
        .sorted.toSeq
      assert(got == sortedRows(plain(a, b)) && got.nonEmpty)
      val exec = df.queryExecution.executedPlan
        .collectFirst { case r: RangeJoinExec => r }
      assert(exec.nonEmpty, df.queryExecution.executedPlan.toString.take(800))
      assert(exec.get.metrics("spillSize").value > 0,
        s"expected the planted hot-key group to spill (spillSize=${exec.get.metrics("spillSize").value})")
    }
  }

  private def nativeOuter(a: DataFrame, b: DataFrame): DataFrame =
    TemporalJoins.nativeRangeJoinLeftOuter(a, b, Seq("k" -> "pk"), "lo", "hi", "p")

  private def plainOuter(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, a("k") === b("pk") && b("p") >= a("lo") && b("p") <= a("hi"),
      "left_outer")

  private def sortedOuterRows(df: DataFrame): Seq[String] =
    df.select("tag", "ptag").collect()
      .map(r => s"${r.getString(0)}|${Option(r.getString(1)).getOrElse("∅")}")
      .toSeq.sorted

  test("LEFT OUTER native range join: unmatched intervals (no point, " +
    "backwards, keyless group) emit null-extended; plan is the sweep") {
    val df = nativeOuter(intervals, points)
    assert(df.queryExecution.executedPlan.toString.contains("RangeJoinExec"),
      df.queryExecution.executedPlan.toString.take(800))
    val got = sortedOuterRows(df)
    assert(got == sortedOuterRows(plainOuter(intervals, points)) && got.nonEmpty)
    // the outer-only rows: e (key with no points), w (backwards interval)
    assert(got.contains("e|∅") && got.contains("w|∅"))
    // matched intervals do NOT also emit a null row
    assert(!got.contains("a|∅") && !got.contains("c|∅"))
  }

  test("LEFT OUTER preserves NULL-keyed and NULL-bounded interval rows") {
    val a = Seq(
      (Option(1L), Option(0L), Option(100L), "ok"),
      (None: Option[Long], Option(0L), Option(100L), "nullkey"),
      (Option(1L), None: Option[Long], Option(100L), "nulllo"),
      (Option(1L), Option(0L), None: Option[Long], "nullhi"),
      (Option(7L), Option(0L), Option(9L), "lonely")
    ).toDF("k", "lo", "hi", "tag")
    val b = Seq(
      (Option(1L), Option(50L), "pok"),
      (None: Option[Long], Option(50L), "pnullkey"),
      (Option(1L), None: Option[Long], "pnullp")
    ).toDF("pk", "p", "ptag")
    val df = nativeOuter(a, b)
    assert(df.queryExecution.executedPlan.toString.contains("RangeJoinExec"))
    val got = sortedOuterRows(df)
    assert(got == sortedOuterRows(plainOuter(a, b)))
    assert(got == Seq("lonely|∅", "nullhi|∅", "nullkey|∅", "nulllo|∅", "ok|pok"))
  }

  test("LEFT OUTER residual plans INSIDE the sweep (round-8 item 5: this " +
    "declined to default planning): pairs failing the residual don't " +
    "count as matches, their intervals null-extend") {
    val a = intervals
    val b = points
    // cross-side residual in the ON clause: can't be pushed to either side
    val withResidual = a.join(b,
      a("k") === b("pk") &&
        call_function("graft_between", b("p"), a("lo"), a("hi")) &&
        a("tag") =!= b("ptag"), "left_outer")
    val plan = withResidual.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoinExec") && plan.contains("residual="),
      s"expected a residual-carrying sweep in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"))
    val wantRes = sortedOuterRows(a.join(b,
      a("k") === b("pk") && b("p") >= a("lo") && b("p") <= a("hi") &&
        a("tag") =!= b("ptag"), "left_outer"))
    assert(sortedOuterRows(withResidual) == wantRes && wantRes.nonEmpty)
  }

  test("residual that kills EVERY pair of one interval null-extends that " +
    "interval (matched-flag semantics, not a filter above the join)") {
    val a = intervals
    val b = points
    // 'a' (k=1, [10,20]) matches p1/p2/p1b; the residual bans tag 'a'
    // entirely — under ON-clause semantics the interval must COME BACK
    // null-extended; a filter above the join would delete it
    val got = a.join(b,
      a("k") === b("pk") &&
        call_function("graft_between", b("p"), a("lo"), a("hi")) &&
        (a("tag") =!= "a"), "left_outer")
    assert(got.queryExecution.executedPlan.toString.contains("residual="))
    val gotRows = sortedOuterRows(got)
    val want = sortedOuterRows(a.join(b,
      a("k") === b("pk") && b("p") >= a("lo") && b("p") <= a("hi") &&
        (a("tag") =!= "a"), "left_outer"))
    assert(gotRows == want)
    assert(gotRows.contains("a|∅"), "interval 'a' must null-extend")
    assert(!gotRows.exists(r => r.startsWith("a|") && r != "a|∅"))
  }

  test("RIGHT and FULL OUTER residuals: unmatched points (every spanning " +
    "interval failed the residual) null-extend at their sweep position") {
    val a = intervals
    val b = points
    for (jt <- Seq("right_outer", "full_outer")) {
      val got = a.join(b,
        a("k") === b("pk") &&
          call_function("graft_between", b("p"), a("lo"), a("hi")) &&
          a("tag") =!= b("ptag"), jt)
      assert(got.queryExecution.executedPlan.toString.contains("residual="),
        s"$jt must plan the residual sweep")
      val want = a.join(b,
        a("k") === b("pk") && b("p") >= a("lo") && b("p") <= a("hi") &&
          a("tag") =!= b("ptag"), jt)
      assert(sortedOuterRows(got) == sortedOuterRows(want))
    }
    // a residual nobody passes: RIGHT OUTER returns every point unmatched
    val nobody = a.join(b,
      a("k") === b("pk") &&
        call_function("graft_between", b("p"), a("lo"), a("hi")) &&
        lit(false), "right_outer")
    assert(nobody.count() == points.count())
    assert(nobody.filter(col("tag").isNotNull).count() == 0)
  }

  test("LEFT OUTER residual with bounds on the RIGHT child: the residual " +
    "rides the child swap (binds by exprId) and still matches ground truth") {
    val a = intervals
    val b = points
    val got = b.join(a,
      b("pk") === a("k") &&
        call_function("graft_between", b("p"), a("lo"), a("hi")) &&
        b("ptag") =!= a("tag"), "right_outer") // preserved = interval side
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoinExec") && plan.contains("residual="))
    val want = b.join(a,
      b("pk") === a("k") && b("p") >= a("lo") && b("p") <= a("hi") &&
        b("ptag") =!= a("tag"), "right_outer")
    def rows(df: DataFrame): Seq[String] =
      df.select(coalesce(col("tag"), lit("∅")),
        coalesce(col("ptag"), lit("∅"))).collect()
        .map(r => s"${r.getString(0)}|${r.getString(1)}").toSeq.sorted
    assert(rows(got) == rows(want) && rows(want).nonEmpty)
  }

  test("outer residual under churn equals the plain outer ground truth") {
    val n = 3000
    val ivs = (0 until n).map(i =>
      (i % 7L, (i % 50).toLong, (i % 50 + i % 13).toLong, s"t$i"))
      .toDF("k", "lo", "hi", "tag")
    val pts = (0 until n).map(i => (i % 7L, (i % 60).toLong, s"q$i"))
      .toDF("pk", "p", "ptag")
    val got = ivs.join(pts,
      ivs("k") === pts("pk") &&
        call_function("graft_between", pts("p"), ivs("lo"), ivs("hi")) &&
        (ivs("hi") + pts("p")) % 3 =!= 0, "full_outer")
    assert(got.queryExecution.executedPlan.toString.contains("residual="))
    val want = ivs.join(pts,
      ivs("k") === pts("pk") && pts("p") >= ivs("lo") && pts("p") <= ivs("hi") &&
        (ivs("hi") + pts("p")) % 3 =!= 0, "full_outer")
    assert(sortedOuterRows(got) == sortedOuterRows(want))
  }

  test("LEFT OUTER with bounds on the RIGHT child plans the flipped sweep " +
    "under a reordering project (round-7: this fell back to a nested loop)") {
    val a = intervals
    val b = points
    // preserved side = point side; swap flips it to the RightOuter sweep
    val swapped = b.join(a,
      b("pk") === a("k") &&
        call_function("graft_between", b("p"), a("lo"), a("hi")), "left_outer")
    val p = swapped.queryExecution.executedPlan.toString
    assert(p.contains("RangeJoinExec(RightOuter"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    val want = b.join(a,
      b("pk") === a("k") && b("p") >= a("lo") && b("p") <= a("hi"),
      "left_outer")
    def rows(df: DataFrame) = df.select("ptag", "tag").collect()
      .map(r => s"${r.getString(0)}|${Option(r.getString(1)).getOrElse("∅")}")
      .toSeq.sorted
    val got = rows(swapped)
    assert(got == rows(want) && got.nonEmpty)
    // p5 (just outside), p6 (keyless) preserved null-extended
    assert(got.contains("p5|∅") && got.contains("p6|∅"))
  }

  private def nativeRight(a: DataFrame, b: DataFrame): DataFrame =
    TemporalJoins.nativeRangeJoinRightOuter(a, b, Seq("k" -> "pk"), "lo", "hi", "p")

  private def plainRight(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, a("k") === b("pk") && b("p") >= a("lo") && b("p") <= a("hi"),
      "right_outer")

  private def sortedRightRows(df: DataFrame): Seq[String] =
    df.select("tag", "ptag").collect()
      .map(r => s"${Option(r.getString(0)).getOrElse("∅")}|${r.getString(1)}")
      .toSeq.sorted

  test("RIGHT OUTER native range join: unmatched points (outside every " +
    "interval, keyless group, NULL key/point) emit null-extended from the " +
    "same single sweep") {
    val df = nativeRight(intervals, points)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RangeJoinExec(RightOuter"), p.take(1200))
    assert("RangeJoinExec".r.findAllIn(p).size == 1)
    val got = sortedRightRows(df)
    assert(got == sortedRightRows(plainRight(intervals, points)) && got.nonEmpty)
    // p5 lies just outside d; p6's key has no intervals — both preserved
    assert(got.contains("∅|p5") && got.contains("∅|p6"))
    // matched points do NOT also emit a null row
    assert(!got.contains("∅|p1") && !got.contains("∅|p4"))
  }

  test("RIGHT OUTER preserves NULL-keyed and NULL-valued point rows") {
    val a = Seq(
      (Option(1L), Option(0L), Option(100L), "ok"),
      (Option(1L), None: Option[Long], Option(100L), "nulllo")
    ).toDF("k", "lo", "hi", "tag")
    val b = Seq(
      (Option(1L), Option(50L), "pok"),
      (Option(1L), Option(500L), "pout"),
      (None: Option[Long], Option(50L), "pnullkey"),
      (Option(1L), None: Option[Long], "pnullp"),
      (Option(9L), Option(1L), "plonely")
    ).toDF("pk", "p", "ptag")
    val got = sortedRightRows(nativeRight(a, b))
    assert(got == sortedRightRows(plainRight(a, b)))
    assert(got == Seq("ok|pok", "∅|plonely", "∅|pnullkey", "∅|pnullp", "∅|pout"))
  }

  private def nativeFull(a: DataFrame, b: DataFrame): DataFrame =
    TemporalJoins.nativeRangeJoinFullOuter(a, b, Seq("k" -> "pk"), "lo", "hi", "p")

  private def plainFull(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, a("k") === b("pk") && b("p") >= a("lo") && b("p") <= a("hi"),
      "full_outer")

  private def sortedFullRows(df: DataFrame): Seq[String] =
    df.select("tag", "ptag").collect()
      .map(r => s"${Option(r.getString(0)).getOrElse("∅")}|" +
        s"${Option(r.getString(1)).getOrElse("∅")}")
      .toSeq.sorted

  test("FULL OUTER native range join: BOTH sides' unmatched rows null-" +
    "extend from ONE sweep node; ground truth equality") {
    val df = nativeFull(intervals, points)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RangeJoinExec(FullOuter"), p.take(1200))
    assert("RangeJoinExec".r.findAllIn(p).size == 1,
      "full outer must be ONE sweep, not a union of two scans")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    val got = sortedFullRows(df)
    assert(got == sortedFullRows(plainFull(intervals, points)) && got.nonEmpty)
    // interval side: e (no points), w (backwards); point side: p5, p6
    assert(got.contains("e|∅") && got.contains("w|∅"))
    assert(got.contains("∅|p5") && got.contains("∅|p6"))
  }

  test("FULL OUTER under churn equals the plain outer ground truth, " +
    "including disjoint key universes") {
    val a = (0 until 400).map(i => (i % 5L, i.toLong, (i + 7L + (i % 13)), s"i$i"))
      .toDF("k", "lo", "hi", "tag")
    val b = (0 until 300).map(j => (j % 7L, (j * 2L) % 450, s"p$j"))
      .toDF("pk", "p", "ptag")
    val got = sortedFullRows(nativeFull(a, b))
    assert(got == sortedFullRows(plainFull(a, b)) && got.nonEmpty)
    // keys 5, 6 exist only on the point side; all their points preserved
    assert(got.exists(_.startsWith("∅|")) && got.exists(_.endsWith("|∅")))
  }

  test("FULL OUTER planted hot key spills and still preserves both sides") {
    withSQLConf(
      "spark.graft.rangeJoin.buffer.inMemoryThreshold" -> "16",
      "spark.graft.rangeJoin.buffer.spillThreshold" -> "64",
      "spark.sql.adaptive.enabled" -> "false") {
      val n = 3000
      val a = (0 until n).map(i => (1L, i.toLong * 10, i.toLong * 10 + 5, s"i$i"))
        .toDF("k", "lo", "hi", "tag")
      // every 4th interval hit; half the points fall in inter-interval gaps
      val b = (0 until n / 2).map { j =>
        val p = if (j % 2 == 0) j.toLong * 80 + 2 else j.toLong * 80 + 47
        (1L, p, s"p$j")
      }.toDF("pk", "p", "ptag")
      val df = nativeFull(a, b)
      val got = df.collect()
        .map(r => s"${Option(r.getAs[String]("tag")).getOrElse("∅")}|" +
          s"${Option(r.getAs[String]("ptag")).getOrElse("∅")}")
        .sorted.toSeq
      assert(got == sortedFullRows(plainFull(a, b)))
      val exec = df.queryExecution.executedPlan
        .collectFirst { case r: RangeJoinExec => r }
      assert(exec.nonEmpty && exec.get.metrics("spillSize").value > 0)
      assert(got.exists(_.startsWith("∅|")) && got.exists(_.endsWith("|∅")))
    }
  }

  test("LEFT OUTER under churn equals the plain outer ground truth") {
    val a = (0 until 400).map(i => (i % 5L, i.toLong, (i + 7L + (i % 13)), s"i$i"))
      .toDF("k", "lo", "hi", "tag")
    val b = (0 until 300).map(j => (j % 4L, (j * 2L) % 450, s"p$j"))
      .toDF("pk", "p", "ptag")
    val got = sortedOuterRows(nativeOuter(a, b))
    assert(got == sortedOuterRows(plainOuter(a, b)) && got.nonEmpty)
    // keys 4 (no point side) must appear null-extended
    assert(got.exists(_.endsWith("|∅")))
  }

  test("LEFT OUTER planted hot key spills and still preserves unmatched intervals") {
    withSQLConf(
      "spark.graft.rangeJoin.buffer.inMemoryThreshold" -> "16",
      "spark.graft.rangeJoin.buffer.spillThreshold" -> "64",
      "spark.sql.adaptive.enabled" -> "false") {
      val n = 3000
      val a = (0 until n).map(i => (1L, i.toLong * 10, i.toLong * 10 + 5, s"i$i"))
        .toDF("k", "lo", "hi", "tag")
      // points hit only every 4th interval's range
      val b = (0 until n / 4).map(j => (1L, j.toLong * 40 + 2, s"p$j"))
        .toDF("pk", "p", "ptag")
      val df = nativeOuter(a, b)
      val got = df.collect()
        .map(r => s"${r.getAs[String]("tag")}|${Option(r.getAs[String]("ptag")).getOrElse("∅")}")
        .sorted.toSeq
      assert(got == sortedOuterRows(plainOuter(a, b)))
      val exec = df.queryExecution.executedPlan
        .collectFirst { case r: RangeJoinExec => r }
      assert(exec.nonEmpty && exec.get.metrics("spillSize").value > 0)
      // 3/4 of the intervals are unmatched and must survive the spill path
      assert(got.count(_.endsWith("|∅")) == n - n / 4)
    }
  }

  test("timestamp-typed bounds work end to end (the registered query's type)") {
    val a = Seq((1L, "2024-01-01 00:00:00", "2024-01-02 00:00:00", "t1"))
      .toDF("k", "los", "his", "tag")
      .select(col("k"), col("los").cast("timestamp").as("lo"),
        col("his").cast("timestamp").as("hi"), col("tag"))
    val b = Seq((1L, "2024-01-01 12:00:00", "in"), (1L, "2024-01-03 00:00:00", "out"))
      .toDF("pk", "ps", "ptag")
      .select(col("pk"), col("ps").cast("timestamp").as("p"), col("ptag"))
    assert(sortedRows(native(a, b)) == Seq("t1|in"))
  }
}
