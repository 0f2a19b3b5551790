package graft.graph

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels each component with its min vertex id") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val got = GraphOps.connectedComponents(spark, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponentsIncremental ≡ full recompute: merges two " +
      "settled components, attaches new nodes, leaves untouched " +
      "components alone") {
    // settled: {1,2,3} (label 1), {10,11} (label 10), {20,21} (label 20)
    val settled = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("src", "dst")
    // batch: bridge 3–10 (merges two components), chain 11–30–31 (two
    // NEW nodes through a settled one), isolated new pair 40–41;
    // {20,21} untouched
    val batch = Seq((3L, 10L), (11L, 30L), (30L, 31L), (40L, 41L))
      .toDF("src", "dst")
    val prior = GraphOps.connectedComponents(spark, settled)
    val got = GraphOps
      .connectedComponentsIncremental(spark, prior, batch)
      .as[(Long, Long)].collect().toMap
    val full = GraphOps
      .connectedComponents(spark, settled.unionByName(batch))
      .as[(Long, Long)].collect().toMap
    assert(got === full)
    assert(got(31L) == 1L && got(10L) == 1L) // merged through the bridge
    assert(got(20L) == 20L && got(21L) == 20L) // untouched stays put
    assert(got(40L) == 40L && got(41L) == 40L) // brand-new component
  }

  test("stronglyConnectedComponents: cycles collapse to their min id, " +
    "DAG edges and tails stay singletons (what undirected CC cannot see)") {
    // 3-cycle {1,2,3} → 2-cycle {4,5}; 6 is a tail into the first cycle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 4L), (3L, 4L), (6L, 1L)).toDF("src", "dst")
    val got = GraphOps.stronglyConnectedComponents(spark, edges, numIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L))
    // sanity: undirected CC would merge everything into one component
    val cc = GraphOps.connectedComponents(spark, edges)
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet === Set(1L))
  }

  test("degrees counts incident edges (in+out)") {
    val edges = Seq((1L, 2L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = GraphOps.degrees(spark, edges).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
  }

  test("integerPageRank hand-computed on a chain a->b->c") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = GraphOps.integerPageRank(spark, edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    // pr0 = 1e6 each; iter1: b,c <- 1e6 => pr=1e6, a 150000
    // iter2: b <- floor(85*150000/100)+150000 = 277500; c <- 1e6; a 150000
    assert(got === Map(1L -> 150000L, 2L -> 277500L, 3L -> 1000000L))
  }

  test("personalizedPageRank: teleport mass returns only to the seeds") {
    // chain 1->2->3, seed {1}, 2 iters, scale 1e6:
    // p0 = (1e6, 0, 0)
    // it1: 2 <- 1e6; p1 = (150000, 850000, 0)
    // it2: 2 <- 150000, 3 <- 850000
    //      p2 = (150000, 127500, 722500)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = GraphOps.personalizedPageRank(spark, edges, seeds = Set(1L),
      iters = 2).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 150000L, 2L -> 127500L, 3L -> 722500L))
    // a seed absent from the graph contributes nothing (no phantom vertex)
    val got2 = GraphOps.personalizedPageRank(spark, edges,
      seeds = Set(1L, 99L), iters = 2).as[(Long, Long)].collect().toMap
    assert(got2 === got)
    // no seeds in the graph -> every score is zero (walk never starts)
    val got3 = GraphOps.personalizedPageRank(spark, edges, seeds = Set(99L),
      iters = 2).as[(Long, Long)].collect().toMap
    assert(got3 === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("hitsScores hand-computed on a small bipartite-ish graph") {
    // 1->3, 2->3, 2->4: auth1 = indeg: 3->2, 4->1
    // hub1: 1 -> auth1(3)=2; 2 -> auth1(3)+auth1(4)=3
    // auth2: 3 <- hub1(1)+hub1(2)=5; 4 <- hub1(2)=3
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = GraphOps.hitsScores(spark, edges)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 0L), (2L, 3L, 0L), (3L, 0L, 5L), (4L, 0L, 3L)))
  }

  test("triangleCounts on a known 4-clique-minus-edge") {
    // 1-2, 2-3, 1-3 form a triangle; 4 hangs off 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
    val got = GraphOps.triangleCounts(spark, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("shortestPaths hop distances on a chain") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = GraphOps.shortestPaths(spark, edges, Seq(1L))
      .as[(Long, Long, Long)].collect()
      .map { case (n, _, dist) => n -> dist }.toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("ancestorClosure closes a diamond DAG transitively") {
    //      top
    //     /   \
    //   m1     m2
    //     \   /
    //      leaf
    val edges = Seq(
      ("leaf", "m1"), ("leaf", "m2"), ("m1", "top"), ("m2", "top"))
      .toDF("child", "parent")
    val got = GraphOps.ancestorClosure(spark, edges)
      .as[(String, String)].collect().toSet
    assert(got === Set(
      ("leaf", "m1"), ("leaf", "m2"), ("leaf", "top"),
      ("m1", "top"), ("m2", "top")))
  }

  test("ancestorClosure handles chains deeper than one superstep") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("child", "parent")
    val got = GraphOps.ancestorClosure(spark, edges)
      .as[(String, String)].collect().toSet
    assert(got.size === 4 + 3 + 2 + 1)
    assert(got.contains(("a", "e")))
  }

  test("ancestorClosureRelational equals the Pregel closure on a random DAG") {
    // random-ish layered DAG: 40 nodes in 5 layers, deterministic edges
    // from each node to 1-2 nodes of the next layer, plus a long chain so
    // several semi-naive rounds are exercised
    val layered = for {
      layer <- 0 until 4
      i <- 0 until 8
      j <- Seq(i % 8, (i * 3 + layer) % 8).distinct
    } yield (s"n${layer}_$i", s"n${layer + 1}_$j")
    val chain = (0 until 6).map(i => (s"c$i", s"c${i + 1}"))
    val edges = (layered ++ chain).toDF("child", "parent")
    val pregel = GraphOps.ancestorClosure(spark, edges)
      .as[(String, String)].collect().toSet
    val relational = GraphOps.ancestorClosureRelational(edges)
      .as[(String, String)].collect().toSet
    assert(relational === pregel)
  }

  test("labelPropagation: a triangle converges to its min label; a 2-node " +
    "cycle oscillates deterministically under synchronous rounds") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L))
      .toDF("src", "dst")
    val got = GraphOps.labelPropagation(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 1L)
    // synchronous LPA on a bipartite pair swaps labels every round —
    // odd round count leaves them exchanged (deterministic, documented)
    assert(got(10L) === 11L && got(11L) === 10L)
  }

  test("ancestorClosureRelational fails loudly when the hierarchy outruns maxIterations") {
    val edges = (0 until 10).map(i => (s"c$i", s"c${i + 1}"))
      .toDF("child", "parent")
    val ex = intercept[IllegalArgumentException] {
      GraphOps.ancestorClosureRelational(edges, maxIterations = 3).count()
    }
    assert(ex.getMessage.contains("not converged"))
  }

  test("kCore peels pendants and keeps the 2-core triangle") {
    // triangle {1,2,3} + pendant chain 3-4-5: chain peels over two rounds
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = GraphOps.kCore(edges, k = 2)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore on a pure chain empties; k=1 keeps everything") {
    // the chain is the slowest-peeling shape: 5 nodes converge in 3
    // rounds, well inside the default 12 the oracle mirrors
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    assert(GraphOps.kCore(chain, k = 2).count() === 0L)
    val all1 = GraphOps.kCore(chain, k = 1)
      .as[(Long, Long)].collect().toMap
    assert(all1 === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("kTruss: 4-clique is a 4-truss; a pendant triangle peels at k=4 " +
    "but survives k=3") {
    // K4 on {1,2,3,4} (every edge in 2 triangles) + triangle {4,5,6}
    // hanging off vertex 4 (its edges close exactly 1)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)
    ).toDF("src", "dst")
    val t4 = GraphOps.kTruss(edges, k = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(t4 === Set((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
    // k=3 keeps both: every edge closes >= 1 triangle
    assert(GraphOps.kTruss(edges, k = 3).count() === 9L)
    // k=5 kills everything: no edge closes 3 triangles
    assert(GraphOps.kTruss(edges, k = 5).count() === 0L)
  }

  test("kTruss: cascade peeling needs multiple rounds and converges " +
    "inside the default") {
    // two triangles sharing edge (1,2): (1,2) has support 2, the other
    // four edges support 1. k=4 round 1 drops those four; round 2 then
    // drops (1,2) whose support fell to 0 — a genuine cascade.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)
    ).toDF("src", "dst")
    assert(GraphOps.kTruss(edges, k = 4).count() === 0L)
    assert(GraphOps.kTruss(edges, k = 4, rounds = 2)
      .collect().toSet === GraphOps.kTruss(edges, k = 4, rounds = 6)
      .collect().toSet)
  }

  test("kCore fixed rounds are idempotent past convergence") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val atConvergence = GraphOps.kCore(edges, k = 2, rounds = 2)
      .as[(Long, Long)].collect().toSet
    val wellPast = GraphOps.kCore(edges, k = 2, rounds = 12)
      .as[(Long, Long)].collect().toSet
    assert(atConvergence === wellPast)
  }

  test("weightedSssp: shortcut beats the direct heavy edge; unreachable " +
    "nodes absent") {
    // 1-2 (w 10) vs 1-3-2 (w 1+2 = 3); node 50-60 is a separate island
    val edges = Seq(
      (1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L), (50L, 60L, 1L)
    ).toDF("src", "dst", "w")
    val src = Seq(Tuple1(1L)).toDF("node")
    val got = GraphOps.weightedSssp(edges, src, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 3L -> 1L, 2L -> 3L))
  }

  test("weightedSssp: parallel edges collapse to the cheapest; undirected " +
    "traversal; idempotent past convergence") {
    val edges = Seq(
      (1L, 2L, 5L), (2L, 1L, 3L), // parallel opposite-direction pair
      (3L, 2L, 4L)                // reaches 3 only via the reversed view
    ).toDF("src", "dst", "w")
    val src = Seq(Tuple1(1L)).toDF("node")
    val atConvergence = GraphOps.weightedSssp(edges, src, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(atConvergence === Map(1L -> 0L, 2L -> 3L, 3L -> 7L))
    val wellPast = GraphOps.weightedSssp(edges, src, rounds = 8)
      .as[(Long, Long)].collect().toMap
    assert(atConvergence === wellPast)
  }
}
