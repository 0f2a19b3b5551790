package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("topMerges: round-1 winner applied, round-2 counts see merged symbol") {
    val docs = Seq(
      (1L, "abab abab ab"),
      (2L, "abab ab cd")
    ).toDF("doc_id", "text")
    // word freqs: abab×3, ab×2, cd×1
    // round 1 pairs: (a,b) 2·3+1·2=8, (b,a) 1·3=3, (c,d) 1
    // merge (a,b): " a b a b "→" ab a b " (leftmost-non-overlapping: the
    // second (a,b) in abab survives), " a b "→" ab "
    // round 2: (a,b) 3, (ab,a) 3 — tie broken l asc — and (c,d) 1
    val got = Bpe.topMerges(docs, "doc_id", "text")
      .orderBy("merge_round", "pair_rank")
      .as[(Long, Long, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, "a", "b", 8L),
      (1L, 2L, "b", "a", 3L),
      (1L, 3L, "c", "d", 1L),
      (2L, 1L, "a", "b", 3L),
      (2L, 2L, "ab", "a", 3L),
      (2L, 3L, "c", "d", 1L)))
  }

  test("tokenCounts: both merges applied through the word dictionary; " +
    "out-of-vocabulary docs get zero counts") {
    val docs = Seq(
      (1L, "abab abab ab"),
      (2L, "abab ab cd"),
      (3L, "!!! ???")                        // no [a-z0-9]+ words at all
    ).toDF("doc_id", "text")
    // round-1 merge (a,b), round-2 merge (a,b) again (ties with (ab,a) at
    // cnt 3, l ascending): abab → "ab ab" (2 symbols — the leftmost-non-
    // overlapping round-1 pass leaves " ab a b ", round 2 closes it),
    // ab → "ab" (1), cd → "c d" (2)
    val got = Bpe.tokenCounts(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 5L, 3L),   // abab+abab+ab = 2+2+1
      (2L, 5L, 3L),   // abab+ab+cd   = 2+1+2
      (3L, 0L, 0L)))
  }

  test("rounds generalization: round 3 adopts (ab,ab); tokenization " +
    "collapses abab to one symbol") {
    val docs = Seq(
      (1L, "abab abab ab"),
      (2L, "abab ab cd")
    ).toDF("doc_id", "text")
    val merges = Bpe.topMerges(docs, "doc_id", "text", perRound = 1, rounds = 3)
      .orderBy("merge_round")
      .as[(Long, Long, String, String, Long)].collect()
    assert(merges.map(m => (m._1, m._3, m._4)).toSeq ===
      Seq((1L, "a", "b"), (2L, "a", "b"), (3L, "ab", "ab")))
    val toks = Bpe.tokenCounts(docs, "doc_id", "text", rounds = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(toks === Set(
      (1L, 3L, 3L),   // abab+abab+ab = 1+1+1 after three merges
      (2L, 4L, 3L)))  // abab+ab+cd   = 1+1+2
  }

  test("topMerges: single-char words contribute no pairs; a fully merged " +
    "vocabulary leaves round 2 empty") {
    val docs = Seq((1L, "a a a bb")).toDF("doc_id", "text")
    val got = Bpe.topMerges(docs, "doc_id", "text")
      .as[(Long, Long, String, String, Long)].collect().toSet
    // "a" has no pairs; "bb" yields (b,b) once; after merging (b,b) the
    // whole vocabulary is single-symbol → round 2 has nothing to count
    assert(got === Set((1L, 1L, "b", "b", 1L)))
  }

  test("checkpointed rounds: 32 merge rounds with a 4-round lineage cut " +
    "are bit-identical to the uncut chain, and the cut actually bounds " +
    "plan depth (production-vocab round counts stay plannable)") {
    // enough structure that 32 rounds keep finding real merges
    val docs = (1L to 8L).map(i =>
      (i, ("abcdefgh" * i.toInt) + " " + ("aabbccdd" * ((i % 4) + 1).toInt) +
        " " + ("xyzw" * ((i % 3) + 1).toInt)))
      .toDF("doc_id", "text")
    def merges(rounds: Int, every: Int) =
      Bpe.topMerges(docs, "doc_id", "text", perRound = 2,
        rounds = rounds, checkpointEvery = every)
        .as[(Long, Long, String, String, Long)].collect().toSet
    // cut ≡ uncut at a depth the uncut plan can still ANALYZE (rounds=8;
    // the uncut 32-round plan takes Catalyst minutes just to optimize —
    // measured, and exactly why the cut exists)
    assert(merges(8, 3) === merges(8, 0),
      "the lineage cut must not change a single merge")
    // at 32 rounds two different cut cadences must agree (both equal the
    // true chain; any cut-placement bug desynchronizes them)
    assert(merges(32, 4) === merges(32, 8))
    val tokCut = Bpe.tokenCounts(docs, "doc_id", "text", rounds = 32,
      checkpointEvery = 4).as[(Long, Long, Long)].collect().toSet
    val tokUncut = Bpe.tokenCounts(docs, "doc_id", "text", rounds = 32,
      checkpointEvery = 8).as[(Long, Long, Long)].collect().toSet
    assert(tokCut === tokUncut)
    assert(Bpe.tokenCounts(docs, "doc_id", "text", rounds = 8,
        checkpointEvery = 3).as[(Long, Long, Long)].collect().toSet ===
      Bpe.tokenCounts(docs, "doc_id", "text", rounds = 8,
        checkpointEvery = 0).as[(Long, Long, Long)].collect().toSet)
    // depth pin: the checkpointed word-table chain ends in a LogicalRDD
    // within the last cut window — its plan never mentions more than
    // checkpointEvery generations of regexp_replace
    val plan = Bpe.tokenCounts(docs, "doc_id", "text", rounds = 32,
      checkpointEvery = 4).queryExecution.optimizedPlan.toString
    val depth = "regexp_replace".r.findAllIn(plan).length
    assert(depth <= 4 * 2,
      s"lineage cut failed: $depth regexp_replace generations in the plan")
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
      "expected a checkpoint boundary in the optimized plan")
  }
}
