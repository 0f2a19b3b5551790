package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val recs = Seq(
    "red widget", "red widget", "ted widget", // dist 1 inside block "widget"
    "blue gear", "blue gears",                // dist 1 but DIFFERENT blocks
    "red gadget"                              // lone name in block "gadget"
  ).toDF("name")

  private def lastToken(n: org.apache.spark.sql.Column) =
    element_at(split(n, " "), -1)

  test("blockedNameMatch: near-match within block, counts carried, " +
    "identical names and cross-block pairs excluded") {
    val got = EntityResolution.blockedNameMatch(recs, "name", lastToken, 4)
      .as[(String, String, Long, Long, Long)].collect().toSet
    // the only admissible pair: red/ted widget at distance 1, with the
    // duplicated "red widget" multiplicity carried through (n_a = 2).
    // blue gear(s) are distance 1 but block on different last tokens —
    // the blocking recall trade — and identical names never pair.
    assert(got === Set(("red widget", "ted widget", 1L, 2L, 1L)))
  }

  test("blockedNameMatch: threshold bounds admission") {
    val wide = EntityResolution.blockedNameMatch(recs, "name", _ => lit(1), 20)
      .as[(String, String, Long, Long, Long)].collect()
    // single block: all C(5,2) distinct-name pairs admitted at dist<=20
    assert(wide.length === 10)
    assert(wide.forall(r => r._3 >= 1 && r._3 <= 20))
    val tight = EntityResolution.blockedNameMatch(recs, "name", _ => lit(1), 1)
      .as[(String, String, Long, Long, Long)].collect()
    assert(tight.forall(_._3 === 1L))
    assert(tight.map(r => (r._1, r._2)).toSet ===
      Set(("blue gear", "blue gears"), ("red widget", "ted widget")))
  }

  test("nameClusters: transitive closure over matched names, min-key " +
    "cluster ids, singletons keep their own id") {
    // chain: "red widget" ~ "ted widget" ~ "tad widget" (transitive even
    // though red~tad is dist 2 of each other via ted); "red gadget" alone
    val keyed = Seq(
      (10L, "red widget"), (11L, "red widget"), (20L, "ted widget"),
      (30L, "tad widget"), (40L, "red gadget"))
      .toDF("k", "name")
    val got = EntityResolution.nameClusters(keyed, "k", "name", lastToken, 2)
      .as[(String, Long)].collect().toMap
    // cluster id = min record key across the whole component (10)
    assert(got("red widget") === 10L)
    assert(got("ted widget") === 10L)
    assert(got("tad widget") === 10L)
    // unmatched name is its own singleton cluster under its min key
    assert(got("red gadget") === 40L)
  }
}
