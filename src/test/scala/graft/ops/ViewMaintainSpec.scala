package graft.ops

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** The bilinear delta expansion: maintained view ≡ full recompute on the
  * unioned inputs, across fanout, delta-only keys, and NULL keys. */
class ViewMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  test("maintained view equals the full recompute (fanout, delta-only keys)") {
    val a = Seq((1L, "a1"), (1L, "a2"), (2L, "a3")).toDF("k", "av")
    val da = Seq((2L, "a4"), (9L, "a5")).toDF("k", "av")   // 9 exists nowhere in B∪ΔB's base
    val b = Seq((1L, "b1"), (2L, "b2"), (2L, "b3")).toDF("k", "bv")
    val db = Seq((1L, "b4"), (9L, "b5")).toDF("k", "bv")   // 9 pairs ONLY delta×delta
    val view = a.join(b, Seq("k"))
    val got = ViewMaintain.maintainJoinView(view, a, da, b, db, Seq("k"))
    val want = a.unionByName(da).join(b.unionByName(db), Seq("k"))
    assert(rows(got) == rows(want))
    // the delta×delta term is load-bearing: key 9 must appear
    assert(rows(got).exists(_.startsWith("9|")))
  }

  test("NULL keys match nothing, same as the recompute") {
    val a = Seq((Option(1L), "a1"), (None: Option[Long], "a2")).toDF("k", "av")
    val da = Seq((None: Option[Long], "a3")).toDF("k", "av")
    val b = Seq((Option(1L), "b1")).toDF("k", "bv")
    val db = Seq((None: Option[Long], "b2")).toDF("k", "bv")
    val view = a.join(b, Seq("k"))
    val got = ViewMaintain.maintainJoinView(view, a, da, b, db, Seq("k"))
    val want = a.unionByName(da).join(b.unionByName(db), Seq("k"))
    assert(rows(got) == rows(want) && rows(got) == Seq("1|a1|b1"))
  }

  test("empty deltas maintain the view unchanged") {
    val a = Seq((1L, "a1")).toDF("k", "av")
    val b = Seq((1L, "b1")).toDF("k", "bv")
    val none = Seq.empty[(Long, String)].toDF("k", "av")
    val noneB = Seq.empty[(Long, String)].toDF("k", "bv")
    val view = a.join(b, Seq("k"))
    val got = ViewMaintain.maintainJoinView(view, a, none, b, noneB, Seq("k"))
    assert(rows(got) == rows(view))
  }
}
