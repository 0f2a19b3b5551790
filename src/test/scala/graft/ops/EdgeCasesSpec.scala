package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.Dedup

/** Degenerate-input behavior: empty frames, singleton groups, dirty
  * mapping tables — the edges the oracle queries never reach. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val emptyKV = Seq.empty[(String, Double, Long)].toDF("k", "score", "id")

  test("keepBestPerKey / undirectedDedup on empty input stay empty") {
    assert(Kernels.keepBestPerKey(emptyKV, Seq("k"), Seq(col("score").desc))
      .count() === 0)
    val emptyPairs = Seq.empty[(String, String, Double)].toDF("a", "b", "score")
    assert(Kernels.undirectedDedup(emptyPairs, "a", "b", Seq(col("score").desc))
      .count() === 0)
  }

  test("outerMergeChain with an empty side keeps the other side's rows") {
    val a = Seq(("k1", "va", "s1")).toDF("k", "value", "source")
    val b = Seq.empty[(String, String, String)].toDF("k", "value", "source")
    val got = Kernels.outerMergeChain(Seq(a, b), Seq("k"), pipeCols = Set("source"))
      .as[(String, String, String)].collect()
    assert(got.toSeq === Seq(("k1", "s1", "va")))
    val got2 = Kernels.outerMergeChain(Seq(b, a), Seq("k"), pipeCols = Set("source"))
      .as[(String, String, String)].collect()
    assert(got2.toSeq === Seq(("k1", "s1", "va")))
  }

  test("fallbackMap tolerates duplicate keys in a mapping table (no fan-out)") {
    val df = Seq(("x", 1)).toDF("id", "key")
    val dirty = Seq((1, "B"), (1, "A")).toDF("from_id", "to_id")
    val got = Kernels.fallbackMap(df, col("key"), Seq(dirty))
      .select("id", "resolved").as[(String, String)].collect()
    assert(got.toSeq === Seq(("x", "A"))) // one row, min to_id
  }

  test("dedup modules on empty / single-doc inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exactGroups(empty, "doc_id", "text").count() === 0)
    assert(Dedup.ngramJaccardPairs(empty, "doc_id", "text").count() === 0)
    val single = Seq((1L, "just one document here okay")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(single, "doc_id", "text").count() === 0)
    assert(Dedup.minhashLshPairs(single, "doc_id", "text").count() === 0)
    assert(Dedup.simhashNearDupPairs(single, "doc_id", "text").count() === 0)
  }

  test("aggregation kernels on singleton groups") {
    val df = Seq(("k", 5.0)).toDF("k", "v")
    val got = df.groupBy($"k").agg(
      Kernels.median3($"v").as("med"),
      Kernels.orderedMiddle($"v").as("mid"),
      Kernels.conflictFold($"v".cast("string")).as("cf"))
      .as[(String, Double, Double, String)].collect().head
    assert(got === (("k", 5.0, 5.0, "5.0")))
  }
}
