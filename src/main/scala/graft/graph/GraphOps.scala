package graft.graph

import org.apache.spark.graphx.{Edge, EdgeTriplet, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bulk graph analytics on GraphX (SURVEY.md §4: hierarchy closures,
  * connected components, degree statistics — the "GraphX for analytics
  * portion" of BASELINE.json).
  *
  * Scale notes: vertex ids are either caller-encoded Longs or stable 64-bit
  * hashes of labels (xxhash64 — computed distributed, no driver-side id
  * assignment); all conversions DataFrame↔RDD are per-partition with no
  * collect. GraphX partitions edges across the cluster; components/Pregel
  * are the standard iterative joins with in-memory caching.
  */
object GraphOps {

  /** Connected components over an edge list of Long vertex ids.
    * Returns (node, component) where component = min vertex id in the
    * component (GraphX's convention). */
  def connectedComponents(spark: SparkSession, edges: DataFrame): DataFrame = {
    val edgeRdd = edges.select(
      col(edges.columns(0)).cast("long"), col(edges.columns(1)).cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val graph = Graph.fromEdgeTuples(edgeRdd, defaultValue = 1)
    import spark.implicits._
    graph.connectedComponents().vertices
      .map { case (v, c) => (v, c) }.toDF("node", "component")
  }

  /** INCREMENTAL connected components — fold a batch of NEW edges into an
    * existing labeling without re-running CC over the settled edge set
    * (the maintenance form a growing graph needs: settled edges at 100 TB
    * are never rescanned). Soundness rides the label convention: a
    * settled component's label IS its min vertex id, so contracting every
    * settled component to its label and running CC over (contracted new
    * edges) yields, per merged group, the min of the constituent mins =
    * the min vertex id of the UNION component — exactly what full CC over
    * settled ∪ new would emit. Cost: O(|new edges| + touched components),
    * the contracted graph having one vertex per touched component or
    * brand-new node. Endpoints the prior labeling has never seen label
    * themselves (they are their own components until merged). Output:
    * (node, component) covering settled nodes ∪ new-edge endpoints —
    * bit-equal to a full recompute. */
  def connectedComponentsIncremental(spark: SparkSession,
      priorLabels: DataFrame, newEdges: DataFrame): DataFrame = {
    // pl feeds both contraction joins, the settled relabel and the
    // new-node anti-join (4 consumers); e feeds the contraction and both
    // endpoint unions (3) — eager-cut both so the labeling/batch builds
    // run once instead of per consumer
    val pl = priorLabels.toDF("node", "component").localCheckpoint(true)
    val e = newEdges.select(
      col(newEdges.columns(0)).cast("long").as("src"),
      col(newEdges.columns(1)).cast("long").as("dst"))
      .localCheckpoint(true)
    val contracted = e
      .join(pl.toDF("src", "ls"), Seq("src"), "left")
      .join(pl.toDF("dst", "ld"), Seq("dst"), "left")
      .select(coalesce(col("ls"), col("src")).as("a"),
        coalesce(col("ld"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    // CC over the contracted graph only — (old label → merged label);
    // labels not in any contracted edge are absent and keep themselves
    val merged = connectedComponents(spark, contracted)
      .toDF("old_label", "new_label")
    val settled = pl.join(merged, pl("component") === merged("old_label"),
        "left")
      .select(pl("node"),
        coalesce(col("new_label"), pl("component")).as("component"))
    val newNodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .join(pl.select(col("node")), Seq("node"), "left_anti")
    val newLabeled = newNodes
      .join(merged, newNodes("node") === merged("old_label"), "left")
      .select(newNodes("node"),
        coalesce(col("new_label"), newNodes("node")).as("component"))
    settled.unionByName(newLabeled)
  }

  /** Strongly connected components over a DIRECTED edge list of Long
    * vertex ids — the communicating-classes decomposition connected
    * components cannot see (an edge u→v with no path back leaves u and v
    * in different SCCs). GraphX's coloring convention: component = min
    * vertex id in the SCC. `numIter` caps the outer peel loop; it must
    * cover the graph's SCC-DAG depth (each iteration settles at least
    * the current terminal components). */
  def stronglyConnectedComponents(
      spark: SparkSession, edges: DataFrame, numIter: Int = 50): DataFrame = {
    val edgeRdd = edges.select(
      col(edges.columns(0)).cast("long"), col(edges.columns(1)).cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val graph = Graph.fromEdgeTuples(edgeRdd, defaultValue = 1)
    import spark.implicits._
    graph.stronglyConnectedComponents(numIter).vertices
      .map { case (v, c) => (v, c) }.toDF("node", "component")
  }

  /** Undirected degree per vertex (in+out over the given directed edge
    * list; pass a deduped edge set for distinct-neighbor degree). */
  def degrees(spark: SparkSession, edges: DataFrame): DataFrame = {
    val edgeRdd = edges.select(
      col(edges.columns(0)).cast("long"), col(edges.columns(1)).cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val graph = Graph.fromEdgeTuples(edgeRdd, defaultValue = 1)
    import spark.implicits._
    graph.degrees.map { case (v, d) => (v, d) }.toDF("node", "degree")
  }

  /** Integer-scaled PageRank: pr₀ = scale; each iteration
    * pr'ᵥ = (15·scale)/100 + (85·Σ_{u→v} ⌊prᵤ/outdegᵤ⌋)/100, ALL in
    * BIGINT floor arithmetic. Integer addition commutes, so GraphX's
    * message combining is partition-order-free and the result is
    * bit-replicable by any engine — the determinism double-precision
    * PageRank fundamentally lacks on a cluster. Dangling mass is dropped
    * (the standard simplification); fixed iteration count, no convergence
    * test. */
  def integerPageRank(
      spark: SparkSession, edges: DataFrame, iters: Int = 2,
      scale: Long = 1000000L): DataFrame = {
    val edgeRdd = edges.select(
      col(edges.columns(0)).cast("long"), col(edges.columns(1)).cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val base = Graph.fromEdgeTuples(edgeRdd, defaultValue = 1)
    // vertex attr = (pr, outdeg); outdeg fixed across iterations
    var g: Graph[(Long, Int), Int] = base.outerJoinVertices(base.outDegrees) {
      (_, _, d) => (scale, d.getOrElse(0))
    }
    for (_ <- 1 to iters) {
      val sums = g.aggregateMessages[Long](
        ctx => ctx.sendToDst(ctx.srcAttr._1 / ctx.srcAttr._2), _ + _)
      g = g.outerJoinVertices(sums) { (_, attr, s) =>
        ((15L * scale) / 100L + (85L * s.getOrElse(0L)) / 100L, attr._2)
      }
    }
    import spark.implicits._
    g.vertices.map { case (v, (pr, _)) => (v, pr) }.toDF("node", "pr")
  }

  /** Personalized PageRank from a seed set, integer-scaled: pr₀ = scale
    * on seeds and 0 elsewhere; each iteration
    * pr'ᵥ = [v ∈ seeds]·(15·scale)/100 + (85·Σ_{u→v} ⌊prᵤ/outdegᵤ⌋)/100 —
    * the teleport mass returns ONLY to the seed set, so scores rank nodes
    * by proximity to the seeds (the recommendation / related-entity walk)
    * instead of global prominence. Same BIGINT floor arithmetic as
    * [[integerPageRank]] — commutative message sums, bit-replicable on any
    * cluster and under a relational oracle. Fixed iteration count. */
  def personalizedPageRank(
      spark: SparkSession, edges: DataFrame, seeds: Set[Long],
      iters: Int = 2, scale: Long = 1000000L): DataFrame = {
    val edgeRdd = edges.select(
      col(edges.columns(0)).cast("long"), col(edges.columns(1)).cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val base = Graph.fromEdgeTuples(edgeRdd, defaultValue = 1)
    val seedB = spark.sparkContext.broadcast(seeds)
    var g: Graph[(Long, Int), Int] = base.outerJoinVertices(base.outDegrees) {
      (v, _, d) => (if (seedB.value(v)) scale else 0L, d.getOrElse(0))
    }
    for (_ <- 1 to iters) {
      val sums = g.aggregateMessages[Long](
        ctx => ctx.sendToDst(ctx.srcAttr._1 / ctx.srcAttr._2), _ + _)
      g = g.outerJoinVertices(sums) { (v, attr, s) =>
        (((if (seedB.value(v)) (15L * scale) / 100L else 0L)
          + (85L * s.getOrElse(0L)) / 100L), attr._2)
      }
    }
    import spark.implicits._
    g.vertices.map { case (v, (pr, _)) => (v, pr) }.toDF("node", "pr")
  }

  /** Depth-2 HITS hub/authority scores in pure integer arithmetic:
    * hub₀ ≡ 1, auth₁(v) = |in(v)| (= Σ hub₀ over in-neighbors),
    * hub₁(u) = Σ_{u→v} auth₁(v), auth₂(v) = Σ_{u→v} hub₁(u). Two unrolled
    * half-iterations and no normalization — magnitudes stay graph-bounded
    * and every step is a commutative BIGINT sum, so GraphX's message
    * combining is partition-order-free and the scores are bit-replicable
    * (the same determinism argument as [[integerPageRank]]; float HITS
    * with L2 normalization would not be). Emits (node, hub, auth) with
    * hub = hub₁ and auth = auth₂. The edge set is deduped here (as
    * [[triangleCounts]] canonicalizes its own): duplicate edge rows would
    * otherwise double-count hub/auth mass, and the function's contract
    * should not depend on the caller pre-aggregating. */
  def hitsScores(spark: SparkSession, edges: DataFrame): DataFrame = {
    val edgeRdd = edges.select(
      col(edges.columns(0)).cast("long"), col(edges.columns(1)).cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
      .distinct()
    val g0 = Graph.fromEdgeTuples(edgeRdd, defaultValue = 1)
    val auth1 = g0.aggregateMessages[Long](ctx => ctx.sendToDst(1L), _ + _)
    val g1 = g0.outerJoinVertices(auth1)((_, _, a) => a.getOrElse(0L))
    val hub1 = g1.aggregateMessages[Long](ctx => ctx.sendToSrc(ctx.dstAttr), _ + _)
    val g2 = g1.outerJoinVertices(hub1)((_, a, h) => (a, h.getOrElse(0L)))
    val auth2 = g2.aggregateMessages[Long](ctx => ctx.sendToDst(ctx.srcAttr._2), _ + _)
    val gf = g2.outerJoinVertices(auth2)((_, ah, a2) => (ah._2, a2.getOrElse(0L)))
    import spark.implicits._
    gf.vertices.map { case (v, (h, a)) => (v, h, a) }
      .toDF("node", "hub", "auth")
  }

  /** Triangle count per vertex (GraphX TriangleCount; the edge set is
    * canonicalized srcId < dstId as the algorithm requires). Deterministic
    * integers → exactly oracle-comparable. */
  def triangleCounts(spark: SparkSession, edges: DataFrame): DataFrame = {
    val edgeRdd = edges.select(
      col(edges.columns(0)).cast("long"), col(edges.columns(1)).cast("long"))
      .rdd.map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct()
    val graph = Graph.fromEdgeTuples(edgeRdd, defaultValue = 1)
    import spark.implicits._
    graph.triangleCount().vertices
      .map { case (v, c) => (v, c.toLong) }.toDF("node", "triangles")
  }

  /** Single-source shortest hop-distances to a set of landmark vertices
    * (GraphX ShortestPaths over the undirected view). Deterministic integer
    * distances → oracle-comparable via recursive BFS SQL. Emits one row per
    * (node, landmark) pair that is reachable. */
  def shortestPaths(
      spark: SparkSession, edges: DataFrame, landmarks: Seq[Long]): DataFrame = {
    val edgeRdd = edges.select(
      col(edges.columns(0)).cast("long"), col(edges.columns(1)).cast("long"))
      .rdd.flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .distinct()
    val graph = Graph.fromEdgeTuples(edgeRdd, defaultValue = 1)
    import spark.implicits._
    org.apache.spark.graphx.lib.ShortestPaths.run(graph, landmarks).vertices
      .flatMap { case (v, spmap) =>
        spmap.iterator.map { case (lm, dist) => (v, lm, dist.toLong) }
      }.toDF("node", "landmark", "distance")
  }

  /** Transitive ancestor closure of a (child, parent) string-labelled DAG
    * via Pregel (SURVEY §7.3 risk 6: GO/MONDO ancestor maps,
    * go.py:465-476). Each vertex accumulates the full set of ancestor ids;
    * messages flow parent→child along reversed edges until fixpoint (or
    * `maxIterations` for safety on deep graphs).
    *
    * Returns (node, ancestor) label pairs, node ≠ ancestor.
    */
  def ancestorClosure(
      spark: SparkSession, childParent: DataFrame,
      maxIterations: Int = 50): DataFrame = {
    import spark.implicits._
    val c0 = childParent.columns(0)
    val c1 = childParent.columns(1)
    // the hierarchy frame feeds both label-union sides and the edge RDD
    // (3 consumers), and labels feed the collision check plus the two
    // final decode joins (3 consumers) — eager-cut both so the upstream
    // build runs once instead of up to 6× (plan audit: 12 scans before)
    val cp = childParent.localCheckpoint(true)
    // stable distributed label→id mapping (no driver-side id assignment)
    val labels = cp.select(col(c0).as("label"))
      .unionByName(cp.select(col(c1).as("label")))
      .distinct()
      .withColumn("vid", xxhash64(col("label")))
      .localCheckpoint(true)
    // a 64-bit hash collision would silently merge two ontology nodes —
    // fail loudly instead (one cheap distributed aggregate)
    val Array(nLabels, nVids) = labels
      .agg(count(lit(1)), countDistinct(col("vid"))).head()
      .toSeq.map(String.valueOf(_).toLong).toArray
    require(nLabels == nVids,
      s"xxhash64 label collision: $nLabels labels -> $nVids vertex ids")
    val edgeRdd = cp
      .select(xxhash64(col(c0)).as("src"), xxhash64(col(c1)).as("dst"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val graph = Graph.fromEdges[Set[VertexId], Unit](edgeRdd, Set.empty[VertexId])

    def vprog(id: VertexId, attr: Set[VertexId], msg: Set[VertexId]) = attr ++ msg
    // edge src=child → dst=parent: the parent pushes (itself + its known
    // ancestors) down to the child; send only when it adds information so
    // Pregel halts at fixpoint
    def sendMsg(t: EdgeTriplet[Set[VertexId], Unit]) = {
      val contribution = t.dstAttr + t.dstId
      if (contribution.subsetOf(t.srcAttr)) Iterator.empty
      else Iterator((t.srcId, contribution))
    }
    val closed = graph.pregel(
      initialMsg = Set.empty[VertexId], maxIterations = maxIterations)(
      vprog, sendMsg, (a: Set[VertexId], b: Set[VertexId]) => a ++ b)

    // hierarchies deeper than maxIterations would silently truncate the
    // closure — detect non-convergence (any edge that still wants to send)
    // and fail loudly instead
    val unconverged = closed.triplets
      .filter(t => !(t.dstAttr + t.dstId).subsetOf(t.srcAttr)).count()
    require(unconverged == 0,
      s"ancestor closure not converged after $maxIterations iterations " +
        s"($unconverged edges still propagating) — raise maxIterations")

    val pairs = closed.vertices
      .flatMap { case (v, anc) => anc.iterator.filter(_ != v).map(a => (v, a)) }
      .toDF("vid", "avid")
    pairs
      .join(labels.select(col("vid"), col("label").as("node")), "vid")
      .join(labels.select(col("vid").as("avid"), col("label").as("ancestor")), "avid")
      .select("node", "ancestor")
  }

  /** Relational transitive ancestor closure — the scale-path twin of
    * [[ancestorClosure]] (same (node, ancestor) output, proven equal in
    * GraphOpsSpec): textbook semi-naïve evaluation. The delta (pairs first
    * reached this round) joins the base edge set, new pairs are what the
    * closure hasn't seen (left-anti), and the loop ends when a round adds
    * nothing — exactly `depth` rounds for a depth-d hierarchy.
    *
    * Why it beats Pregel here: no DataFrame→RDD re-encode, no vertex-id
    * hashing (labels join directly), no Set-of-ancestors vertex state to
    * serialize each superstep — every round is one shuffle join + one
    * anti-join on (node, ancestor), all inside Tungsten. Each round's
    * delta/closure persist and the superseded generation unpersists, so
    * lineage stays flat on deep hierarchies. The per-round `isEmpty` is a
    * driver-side termination probe on an empty-or-not question — the same
    * O(1)-row action Pregel's own loop runs internally — not a collect of
    * data. `maxIterations` bounds the loop (a round per hierarchy level;
    * cycles saturate to their reachability pairs like the Pregel form)
    * and hitting the bound before the fixpoint fails loudly. */
  def ancestorClosureRelational(
      childParent: DataFrame, maxIterations: Int = 50): DataFrame = {
    // the edge set is the hierarchy itself — dimension-sized by nature
    // (ontologies, org charts, date rollups), so it materializes ONCE from
    // the input (one upstream scan) and every round joins against its
    // broadcast: the per-round shuffles are only the small delta dedup and
    // the anti-join against the growing closure
    val e = childParent
      .select(col(childParent.columns(0)).as("mid"), col(childParent.columns(1)).as("up"))
      .distinct().persist()
    var closure = e.select(col("mid").as("node"), col("up").as("ancestor"))
      .persist()
    var delta = closure
    var rounds = 0
    var done = false
    while (!done && rounds < maxIterations) {
      val next = delta.select(col("node"), col("ancestor").as("mid"))
        .join(broadcast(e), "mid")
        .select(col("node"), col("up").as("ancestor"))
        .distinct()
        .join(closure, Seq("node", "ancestor"), "left_anti")
        .persist()
      // ONE action per round (the termination probe Pregel also pays);
      // count() fully materializes next's cache as a side effect, so later
      // rounds and the final union never re-run this round's joins
      if (next.count() == 0) {
        next.unpersist(); done = true
      } else {
        closure = closure.unionByName(next).persist()
        delta = next
      }
      rounds += 1
    }
    require(done,
      s"ancestor closure not converged after $maxIterations rounds — " +
        "raise maxIterations (or the hierarchy has a cycle)")
    // superseded generations stay cached until the session drops them: the
    // returned plan reads every round's cached delta through the final
    // union, so eager unpersist here would force a full lineage recompute
    // on the caller's first action
    closure.filter(col("node") =!= col("ancestor"))
  }

  /** Synchronous label propagation (community detection), `iters` fixed
    * rounds: every node starts labeled with its own id; each round a node
    * adopts the MOST FREQUENT label among its undirected neighbors, ties
    * broken by the smallest label. Deterministic by construction —
    * synchronous rounds plus a total tie order — so an independent engine
    * replicates every round exactly (GraphX's built-in LPA is
    * asynchronous and seed-dependent, useless under a bit-exact oracle).
    * Relational plan per round: one edge⋈labels equi-join, one
    * (node, label) count, one max-over-struct — all partial-aggregating,
    * no windows, cost linear in edges at any scale. Output: (node,
    * label). */
  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame = {
    // und feeds the seed labeling plus every round's join — iters+1
    // consumers; without the eager cut the edge-build subtree re-executes
    // once per consumer (the plan audit counted 16 scans for 3 rounds)
    val und = edges.select(col("src").as("node"), col("dst").as("nbr"))
      .unionByName(edges.select(col("dst").as("node"), col("src").as("nbr")))
      .distinct()
      .localCheckpoint(true)
    var labels = und.select(col("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      labels = und
        .join(labels.withColumnRenamed("node", "nbr"), Seq("nbr"))
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("node"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("best"))
        .select(col("node"), (-col("best.neg")).as("label"))
    }
    labels
  }

  /** k-core: the maximal subgraph in which every vertex has (distinct-
    * neighbor, undirected) degree ≥ k, by synchronous peeling — drop all
    * vertices whose CURRENT degree is < k, recompute degrees on the
    * induced subgraph, repeat. Both this engine and the SQL oracle run a
    * FIXED `rounds` peels: peeling is monotone (rounds only remove
    * vertices) and idempotent at the fixpoint, so any round count ≥ the
    * convergence depth yields exactly the true k-core, and two engines
    * running the same count agree even mid-convergence. GraphOpsSpec
    * asserts the fixpoint lands well inside the default on a chain graph
    * (the slowest-peeling shape).
    *
    * Scale: each round is one degree aggregation plus two semi joins —
    * all shuffled on vertex id with partial aggregation; no windows, no
    * driver-side vertex state. Lineage is cut per round with an eager
    * localCheckpoint so the 2·rounds-join plan never reaches the
    * optimizer as one expression. Output: (node, core_degree) for
    * members of the k-core, with their degree inside it. */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 12): DataFrame = {
    var und = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .distinct()
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val keep = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("u"))
      val next = und.join(keep, Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      und.unpersist()
      und = next
    }
    und.groupBy(col("u").as("node")).agg(count(lit(1)).as("core_degree"))
  }

  /** k-truss: the maximal subgraph whose every EDGE closes ≥ k−2
    * triangles within it — the edge-cohesion analog of [[kCore]]
    * (bridges and tree-like spray survive a k-core but never a truss,
    * so trusses isolate genuinely dense communities). Synchronous
    * peeling at a FIXED `rounds`, same contract as kCore: monotone,
    * idempotent at the fixpoint, so engine and oracle running the same
    * round count agree by construction, and any count ≥ the convergence
    * depth yields the true truss. Output: surviving canonical (u, v)
    * edges with the support that admitted them in the final round.
    *
    * Scale: per round one wedge equi-join on the shared endpoint, one
    * pair-keyed LEFT SEMI closing check, one partial-aggregating support
    * count — triangle enumeration is the algorithm's defining cost and
    * every join is an equi-join (no pair enumeration beyond it);
    * localCheckpoint per round bounds the plan. */
  def kTruss(edges: DataFrame, k: Int, rounds: Int = 6): DataFrame = {
    require(rounds >= 1, "kTruss: rounds must be >= 1")
    var e = edges.select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    var prev = e // the checkpointed frame backing the current round
    var sup: DataFrame = e.limit(0).withColumn("support", lit(0L))
    for (_ <- 1 to rounds) {
      val adj = e.select(col("u").as("n"), col("v").as("m"))
        .unionByName(e.select(col("v").as("n"), col("u").as("m")))
      val wedges = e
        .join(adj.select(col("n").as("u"), col("m").as("w")), Seq("u"))
        .filter(col("w") =!= col("v"))
      val closed = wedges.join(
        adj.select(col("n").as("v"), col("m").as("w")),
        Seq("v", "w"), "left_semi")
      sup = closed.groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= k - 2)
        .localCheckpoint(true)
      prev.unpersist()
      prev = sup
      e = sup.select(col("u"), col("v"))
    }
    sup
  }

  /** Fixed-round Bellman-Ford: single-source shortest WEIGHTED distances
    * over the undirected view of `edges` (src, dst, w — integer weights;
    * parallel edges collapse to the cheapest). `sources`' first column is
    * the seed node set at distance 0; output is (node, dist) for every
    * node reached within `rounds` hops.
    *
    * Same fixed-round contract as [[kCore]]/[[kTruss]]: distances are
    * MONOTONE non-increasing per round and the relaxation is idempotent at
    * the fixpoint, so engine and an oracle unrolling the SAME round count
    * agree by construction, and any count ≥ the true shortest-path hop
    * depth yields the exact Dijkstra answer. Per round: one equi-join of
    * the frontier against the weighted adjacency + one min partial agg —
    * the textbook distributed SSSP shape (no windows, no pair
    * enumeration); localCheckpoint bounds plan depth. */
  def weightedSssp(edges: DataFrame, sources: DataFrame,
      rounds: Int = 6): DataFrame = {
    require(rounds >= 1, "weightedSssp: rounds must be >= 1")
    val und = edges
      .select(col("src").as("u"), col("dst").as("v"), col("w").cast("long").as("w"))
      .unionByName(edges
        .select(col("dst").as("u"), col("src").as("v"), col("w").cast("long").as("w")))
      .groupBy(col("u"), col("v")).agg(min(col("w")).as("w"))
      .localCheckpoint(true)
    var dist = sources
      .select(col(sources.columns(0)).cast("long").as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relax = dist.join(und, dist("node") === und("u"))
        .select(und("v").as("node"), (col("dist") + col("w")).as("dist"))
      val next = dist.unionByName(relax)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
      dist.unpersist()
      dist = next
    }
    und.unpersist()
    dist
  }
}
