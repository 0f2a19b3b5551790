package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.graph.GraphOps

/** GraphX analytics queries with relational/recursive-SQL oracles — the
  * engine's graph layer verified against an independent computation.
  *
  * The graph: customers and suppliers as vertices (even/odd Long encoding),
  * an edge where a customer received ≥3 lineitems from a supplier. Derived
  * distributed from lineitem⋈orders; the edge build shuffles once on the
  * pair, GraphX handles the iterative parts.
  */
object GraphQueries {

  /** Shared edge-set CTE: (cust*2, supp*2+1) pairs with ≥3 lineitems. */
  private val edgeCte =
    """WITH e AS (
      |  SELECT CAST(o_custkey * 2 AS BIGINT) AS src,
      |         CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      |""".stripMargin

  private def edgeDf(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3)
      .select(col("src"), col("dst"))

  /** Eager cut of a small derived frame consumed ≥3× downstream — the
    * round-11 shared-base discipline applied to the relational graph
    * queries: the edge/und build scans lineitem⋈orders, and the plan
    * audit counted that subtree duplicated up to 10× per query (g_khop
    * 16 scans, g_neighbor_jaccard 20). The frames cut here are pairs of
    * longs (tens of KB materialized), so unlike the phenotype base the
    * materialization is far cheaper than even one rebuild. */
  private def cut(df: org.apache.spark.sql.DataFrame) =
    df.localCheckpoint(true)

  /** Degree statistics via GraphX `degrees`, oracle = relational
    * distinct-neighbor count. */
  val gDegree = Q(
    "g_degree",
    edgeCte +
      """, und AS (SELECT src AS node, dst AS other FROM e
        |          UNION ALL SELECT dst, src FROM e)
        |SELECT node, COUNT(*) AS degree FROM und GROUP BY node""".stripMargin) { (s, d) =>
    GraphOps.degrees(s, edgeDf(s, d))
      .select(col("node"), col("degree").cast("long").as("degree"))
  }

  /** STRONGLY connected components via GraphX — the communicating-classes
    * decomposition undirected CC cannot see (u→v with no path back keeps
    * u, v apart). Fixture: the functional graph n → (31n+7) mod 64 over
    * the customer key residues — a BOUNDED 64-node domain chosen because
    * the oracle's ground truth is pairwise mutual reachability (recursive
    * CTE + self-join), which must stay enumerable at every sf; the
    * operator itself is GraphX-distributed and domain-agnostic.
    * Convention matched to GraphX: component = min vertex id in the SCC;
    * off-cycle (tail) nodes are singleton SCCs = themselves. */
  val gScc = Q(
    "g_scc",
    """WITH RECURSIVE nodes0 AS (
      |  SELECT DISTINCT c_custkey % 64 AS n FROM customer),
      |e AS (SELECT DISTINCT CAST(n AS BIGINT) AS src,
      |             CAST((n * 31 + 7) % 64 AS BIGINT) AS dst FROM nodes0),
      |nd AS (SELECT src AS n FROM e UNION SELECT dst FROM e),
      |reach (a, b) AS (
      |  SELECT src, dst FROM e
      |  UNION
      |  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src),
      |mut AS (SELECT r1.a AS n, r1.b AS m FROM reach r1
      |        JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a)
      |SELECT nd.n AS node,
      |  CAST(least(nd.n, coalesce(MIN(mut.m), nd.n)) AS BIGINT) AS component
      |FROM nd LEFT JOIN mut ON nd.n = mut.n
      |GROUP BY nd.n""".stripMargin) { (s, d) =>
    val nodes = Tables.customer(s, d)
      .select((col("c_custkey") % 64).cast("long").as("n")).distinct()
    val edges = nodes.select(col("n").as("src"),
      ((col("n") * 31 + 7) % 64).cast("long").as("dst"))
    GraphOps.stronglyConnectedComponents(s, edges, numIter = 10)
  }

  /** Connected components via GraphX, oracle = recursive-CTE min-label
    * reachability in DuckDB (component = min reachable vertex id, GraphX's
    * convention). */
  val gComponents = Q(
    "g_components",
    edgeCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, und AS (SELECT src AS u, dst AS v FROM e UNION SELECT dst, src FROM e),
        |reach (n, m) AS (
        |  SELECT u, u FROM und
        |  UNION
        |  SELECT r.n, w.v FROM reach r JOIN und w ON r.m = w.u)
        |SELECT n AS node, MIN(m) AS component FROM reach GROUP BY n""".stripMargin) { (s, d) =>
    GraphOps.connectedComponents(s, edgeDf(s, d))
  }

  /** INCREMENTAL connected components
    * ([[GraphOps.connectedComponentsIncremental]]): edges with
    * (src + dst) ≡ 0 (mod 5) play the incoming batch, the rest the
    * settled graph whose labeling already exists — the batch folds in
    * through the CONTRACTED graph (one vertex per touched component or
    * new node, O(batch) work), the settled edge set never rescanned. The
    * oracle is the full-graph min-reachability over ALL edges: the green
    * row IS the incremental ≡ full-recompute equality. */
  val gComponentsIncremental = Q(
    "g_components_incremental",
    edgeCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, und AS (SELECT src AS u, dst AS v FROM e UNION SELECT dst, src FROM e),
        |reach (n, m) AS (
        |  SELECT u, u FROM und
        |  UNION
        |  SELECT r.n, w.v FROM reach r JOIN und w ON r.m = w.u)
        |SELECT n AS node, MIN(m) AS component FROM reach GROUP BY n""".stripMargin) { (s, d) =>
    val all = edgeDf(s, d)
    val settled = all.filter((col("src") + col("dst")) % 5 =!= 0)
    val batch = all.filter((col("src") + col("dst")) % 5 === 0)
    GraphOps.connectedComponentsIncremental(s,
      GraphOps.connectedComponents(s, settled), batch)
  }

  /** Transitive ancestor closure of the ship-date hierarchy via Pregel
    * (GO/MONDO ancestors analog, SURVEY §7.3 risk 6); oracle = fixed-depth
    * join expansion (the hierarchy has depth 3). */
  val gAncestors = Q(
    "g_ancestors",
    """WITH days AS (SELECT DISTINCT strftime(l_shipdate, '%Y-%m-%d') AS day,
      |  strftime(l_shipdate, '%Y-%m') AS month, strftime(l_shipdate, '%Y') AS year
      |  FROM lineitem),
      |e AS (
      |  SELECT day AS child, month AS parent FROM days
      |  UNION SELECT DISTINCT month, year FROM days
      |  UNION SELECT DISTINCT year, 'root' FROM days)
      |SELECT child AS node, parent AS ancestor FROM e
      |UNION
      |SELECT e1.child, e2.parent FROM e e1 JOIN e e2 ON e1.parent = e2.child
      |UNION
      |SELECT e1.child, e3.parent FROM e e1 JOIN e e2 ON e1.parent = e2.child
      |  JOIN e e3 ON e2.parent = e3.child""".stripMargin) { (s, d) =>
    GraphOps.ancestorClosure(s, shipDateHierarchy(s, d))
  }

  /** Ship-date rollup edges (day→month→year→root). The fact-side distinct
    * runs on the 4-byte DATE (≈2.5k values), and the three string formats
    * apply AFTER — never a distinct over three formatted strings per
    * lineitem row. Same rows as the oracle's strftime-then-DISTINCT (the
    * date→string map is 1:1). */
  private def shipDateHierarchy(
      s: org.apache.spark.sql.SparkSession, d: String) = {
    val days = Tables.lineitem(s, d).select(col("l_shipdate")).distinct()
      .select(
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        date_format(col("l_shipdate"), "yyyy").as("year"))
    days.select(col("day").as("child"), col("month").as("parent"))
      .unionByName(days.select(col("month"), col("year")).toDF("child", "parent").distinct())
      .unionByName(days.select(col("year")).distinct()
        .select(col("year").as("child"), lit("root").as("parent")))
      .distinct()
  }

  /** Relational twin of [[gAncestors]] under the SAME oracle: semi-naïve
    * closure (GraphOps.ancestorClosureRelational) — no GraphX re-encode,
    * no per-superstep vertex-set state; depth-many broadcast-join rounds
    * inside Tungsten. Measured ≈ parity with Pregel at sf0.1 (both are
    * dominated by the shared edge build — BENCH_NOTES); registered as the
    * structurally-scalable alternative, not as a speedup claim. */
  val gAncestorsRel = Q("g_ancestors_rel", gAncestors.oracle.get) { (s, d) =>
    GraphOps.ancestorClosureRelational(shipDateHierarchy(s, d))
  }

  /** Undirected nation co-trade graph (canonical pairs, no self loops) —
    * non-bipartite, so triangles exist. */
  private val nationEdgeCte =
    """WITH e AS (
      |  SELECT DISTINCT least(s_nationkey, c_nationkey) AS u,
      |         greatest(s_nationkey, c_nationkey) AS v
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE s_nationkey <> c_nationkey)
      |""".stripMargin

  private def nationEdgeDf(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .select(least(col("s_nationkey"), col("c_nationkey")).cast("long").as("u"),
        greatest(col("s_nationkey"), col("c_nationkey")).cast("long").as("v"))
      .distinct()

  /** Triangle counts via GraphX TriangleCount vs SQL triangle enumeration
    * (a<b<c canonical wedges). */
  val gTriangles = Q(
    "g_triangles",
    nationEdgeCte +
      """, tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |pernode AS (
        |  SELECT a AS node FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri),
        |nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e)
        |SELECT n.node, COALESCE(t.c, 0) AS triangles
        |FROM nodes n LEFT JOIN (SELECT node, COUNT(*) AS c FROM pernode GROUP BY node) t
        |  ON n.node = t.node""".stripMargin) { (s, d) =>
    GraphOps.triangleCounts(s, nationEdgeDf(s, d))
  }

  /** Landmark shortest hop-distances via GraphX ShortestPaths vs a bounded
    * recursive-CTE BFS. */
  val gShortestPaths = Q(
    "g_shortest_paths",
    nationEdgeCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, und AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
        |nodes AS (SELECT u AS node FROM und),
        |bfs (node, landmark, dist) AS (
        |  SELECT node, node, 0 FROM nodes WHERE node IN (0, 1)
        |  UNION
        |  SELECT w.v, b.landmark, b.dist + 1
        |  FROM bfs b JOIN und w ON b.node = w.u WHERE b.dist < 30)
        |SELECT node, landmark, CAST(MIN(dist) AS BIGINT) AS distance
        |FROM bfs GROUP BY node, landmark""".stripMargin) { (s, d) =>
    GraphOps.shortestPaths(s, nationEdgeDf(s, d), Seq(0L, 1L))
      .select(col("node"), col("landmark"), col("distance"))
  }

  /** Harmonic centrality over the landmark set, fixed point: per node,
    * Σ_{landmarks at d>0} (10⁶ div d) plus the reachable-landmark count
    * — the closeness family without the disconnected-graph divide-by-
    * infinity problem, and log/float-free like the other graph scores.
    * Reuses the landmark BFS (GraphX ShortestPaths); oracle = the same
    * recursive-CTE BFS aggregated. */
  val gHarmonic = Q(
    "g_harmonic",
    nationEdgeCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, und AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
        |nodes AS (SELECT u AS node FROM und),
        |bfs (node, landmark, dist) AS (
        |  SELECT node, node, 0 FROM nodes WHERE node IN (0, 1)
        |  UNION
        |  SELECT w.v, b.landmark, b.dist + 1
        |  FROM bfs b JOIN und w ON b.node = w.u WHERE b.dist < 30),
        |d AS (SELECT node, landmark, MIN(dist) AS dist
        |      FROM bfs GROUP BY node, landmark)
        |SELECT node, COUNT(*) AS n_reachable,
        |  CAST(SUM(1000000 // dist) AS BIGINT) AS harmonic_ppm
        |FROM d WHERE dist > 0 GROUP BY node""".stripMargin) { (s, d) =>
    GraphOps.shortestPaths(s, nationEdgeDf(s, d), Seq(0L, 1L))
      .filter(col("distance") > 0)
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_reachable"),
        sum(expr("1000000 div distance")).as("harmonic_ppm"))
  }

  /** Integer-scaled PageRank (2 iterations, scale 1e6, damping 85/100 in
    * BIGINT floor arithmetic — see GraphOps.integerPageRank for why
    * integer arithmetic is the only cluster-deterministic formulation).
    * Oracle = both iterations unrolled relationally. */
  val gPagerank = Q(
    "g_pagerank",
    edgeCte +
      """, nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e),
        |od AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        |s1 AS (SELECT e.dst AS n, SUM(1000000 // od.deg) AS s
        |       FROM e JOIN od ON e.src = od.src GROUP BY e.dst),
        |p1 AS (SELECT nodes.n,
        |    CAST(150000 + (85 * COALESCE(s1.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nodes LEFT JOIN s1 ON nodes.n = s1.n),
        |s2 AS (SELECT e.dst AS n, SUM(p1.pr // od.deg) AS s
        |       FROM e JOIN od ON e.src = od.src
        |       JOIN p1 ON p1.n = e.src GROUP BY e.dst)
        |SELECT nodes.n AS node,
        |  CAST(150000 + (85 * COALESCE(s2.s, 0)) // 100 AS BIGINT) AS pr
        |FROM nodes LEFT JOIN s2 ON nodes.n = s2.n""".stripMargin) { (s, d) =>
    GraphOps.integerPageRank(s, edgeDf(s, d), iters = 2)
  }

  /** Personalized PageRank from customer seeds {1, 2} (vertex ids 2 and 4
    * under the even/odd encoding), 2 iterations — teleport mass returns
    * only to the seeds, so the walk scores seed-proximity (the
    * related-entity query a knowledge graph serves). Integer arithmetic as
    * g_pagerank; oracle = both iterations unrolled with the seed indicator
    * in the teleport term. Nodes are the edge-derived vertex set, so a
    * seed outside the graph contributes nothing on either engine. */
  val gPpr = Q(
    "g_ppr",
    edgeCte +
      """, nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e),
        |od AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        |p0 AS (SELECT n, CASE WHEN n IN (2, 4)
        |    THEN CAST(1000000 AS BIGINT) ELSE 0 END AS pr FROM nodes),
        |s1 AS (SELECT e.dst AS n, SUM(p0.pr // od.deg) AS s
        |       FROM e JOIN od ON e.src = od.src
        |       JOIN p0 ON p0.n = e.src GROUP BY e.dst),
        |p1 AS (SELECT nodes.n,
        |    CAST(CASE WHEN nodes.n IN (2, 4) THEN 150000 ELSE 0 END
        |      + (85 * COALESCE(s1.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nodes LEFT JOIN s1 ON nodes.n = s1.n),
        |s2 AS (SELECT e.dst AS n, SUM(p1.pr // od.deg) AS s
        |       FROM e JOIN od ON e.src = od.src
        |       JOIN p1 ON p1.n = e.src GROUP BY e.dst)
        |SELECT nodes.n AS node,
        |  CAST(CASE WHEN nodes.n IN (2, 4) THEN 150000 ELSE 0 END
        |    + (85 * COALESCE(s2.s, 0)) // 100 AS BIGINT) AS pr
        |FROM nodes LEFT JOIN s2 ON nodes.n = s2.n""".stripMargin) { (s, d) =>
    GraphOps.personalizedPageRank(s, edgeDf(s, d), seeds = Set(2L, 4L),
      iters = 2)
  }

  /** Depth-2 HITS hub/authority (integer, unnormalized — see
    * GraphOps.hitsScores for the determinism argument). Oracle = the two
    * half-iterations unrolled relationally. On this bipartite
    * customer→supplier graph customers carry hub mass and suppliers
    * authority mass, which the oracle reproduces structurally. */
  val gHits = Q(
    "g_hits",
    edgeCte +
      """, nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e),
        |a1 AS (SELECT dst AS n, COUNT(*) AS a FROM e GROUP BY dst),
        |h1 AS (SELECT e.src AS n, CAST(SUM(a1.a) AS BIGINT) AS h
        |       FROM e JOIN a1 ON e.dst = a1.n GROUP BY e.src),
        |a2 AS (SELECT e.dst AS n, CAST(SUM(h1.h) AS BIGINT) AS a
        |       FROM e JOIN h1 ON e.src = h1.n GROUP BY e.dst)
        |SELECT nodes.n AS node,
        |  COALESCE(h1.h, 0) AS hub, COALESCE(a2.a, 0) AS auth
        |FROM nodes LEFT JOIN h1 ON nodes.n = h1.n
        |           LEFT JOIN a2 ON nodes.n = a2.n""".stripMargin) { (s, d) =>
    GraphOps.hitsScores(s, edgeDf(s, d))
  }

  /** k-hop neighborhood sizes (k=2): distinct neighbors at distance 1 and
    * at distance ≤ 2 (self excluded) — the relational k-hop expansion with
    * a DISTINCT barrier per hop so path multiplicities never amplify the
    * frontier (the graph-feature analog of the closure queries). At scale
    * each hop is one shuffle on the frontier key; without the per-hop
    * distinct the join output grows with walk counts, not reachable-set
    * sizes. */
  val gKhop = Q(
    "g_khop",
    edgeCte +
      """, und AS (SELECT src AS node, dst AS other FROM e
        |          UNION SELECT dst, src FROM e),
        |h2 AS (SELECT DISTINCT a.node, b.other
        |       FROM und a JOIN und b ON a.other = b.node WHERE b.other <> a.node),
        |reach AS (SELECT node, other FROM und UNION SELECT node, other FROM h2)
        |SELECT node, n_1hop, n_2hop
        |FROM (SELECT node, COUNT(*) AS n_1hop FROM und GROUP BY node) n1
        |JOIN (SELECT node, COUNT(*) AS n_2hop FROM reach GROUP BY node) n2
        |  USING (node)""".stripMargin) { (s, d) =>
    val e = edgeDf(s, d)
    // und feeds h2 (both sides), reach and the 1-hop count — 4 consumers
    val und = cut(e.select(col("src").as("node"), col("dst").as("other"))
      .union(e.select(col("dst").as("node"), col("src").as("other")))
      .distinct())
    val h2 = und.toDF("node", "mid")
      .join(und.toDF("mid", "other"), "mid")
      .filter(col("other") =!= col("node"))
      .select(col("node"), col("other")).distinct()
    val reach = und.union(h2).distinct()
    und.groupBy(col("node")).agg(count(lit(1)).as("n_1hop"))
      .join(reach.groupBy(col("node")).agg(count(lit(1)).as("n_2hop")),
        Seq("node"))
  }

  /** Neighbor-set Jaccard similarity (link-prediction feature): node pairs
    * scored by |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)|. The shared-neighbor pivot is
    * capped at degree ≤ 32 — a hub pivot contributes deg² pair rows and no
    * signal (every customer pair "shares" the mega-supplier), the same
    * quadratic-boilerplate argument as the shingle df cap, and the cap is
    * replicated in the oracle. Degrees in the score stay UNcapped. */
  val gNeighborJaccard = Q(
    "g_neighbor_jaccard",
    edgeCte +
      """, und AS (SELECT src AS node, dst AS other FROM e
        |          UNION SELECT dst, src FROM e),
        |deg AS (SELECT node, COUNT(*) AS d FROM und GROUP BY node),
        |mid AS (SELECT node FROM deg WHERE d <= 32),
        |pairs AS (SELECT a.node AS u, b.node AS v, COUNT(*) AS inter
        |  FROM und a JOIN und b ON a.other = b.other AND a.node < b.node
        |  JOIN mid m ON a.other = m.node
        |  GROUP BY 1, 2)
        |SELECT u, v, inter, du.d AS deg_u, dv.d AS deg_v,
        |  CAST(inter AS DOUBLE) / (du.d + dv.d - inter) AS jaccard
        |FROM pairs JOIN deg du ON u = du.node JOIN deg dv ON v = dv.node
        |WHERE CAST(inter AS DOUBLE) / (du.d + dv.d - inter) >= 0.5"""
        .stripMargin) { (s, d) =>
    val e = edgeDf(s, d)
    // und feeds deg and both pair sides — 3 consumers (deg itself twice)
    val und = cut(e.select(col("src").as("node"), col("dst").as("other"))
      .union(e.select(col("dst").as("node"), col("src").as("other")))
      .distinct())
    val deg = und.groupBy(col("node")).agg(count(lit(1)).as("d"))
    val mid = deg.filter(col("d") <= 32).select(col("node").as("other"))
    val pairs = und.toDF("u", "other")
      .join(mid, Seq("other"), "left_semi")
      .join(und.toDF("v", "other"), Seq("other"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("inter"))
    pairs
      .join(deg.toDF("u", "deg_u"), Seq("u"))
      .join(deg.toDF("v", "deg_v"), Seq("v"))
      .select(col("u"), col("v"), col("inter"), col("deg_u"), col("deg_v"),
        (col("inter").cast("double") / (col("deg_u") + col("deg_v") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  /** Deterministic synchronous label propagation, 3 rounds — community
    * detection whose every round is engine-replicable (mode label with
    * smallest-label tie-break). The oracle unrolls the SAME number of
    * rounds from a generator loop, so Spark and SQL can never disagree on
    * round count or tie order. */
  val gLabelProp = Q(
    "g_label_prop", {
      val rounds = (1 to 3).map { r =>
        s"""c$r AS (SELECT u.node, l.label, COUNT(*) AS cnt
           |  FROM und u JOIN l${r - 1} l ON u.nbr = l.node GROUP BY 1, 2),
           |l$r AS (SELECT node, label FROM (
           |  SELECT node, label,
           |    row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label)
           |      AS rn FROM c$r) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      edgeCte +
        s""", und AS (SELECT src AS node, dst AS nbr FROM e
           |          UNION SELECT dst, src FROM e),
           |l0 AS (SELECT DISTINCT node, node AS label FROM und),
           |$rounds
           |SELECT node, label FROM l3""".stripMargin
    }) { (s, d) =>
    GraphOps.labelPropagation(edgeDf(s, d), iters = 3)
  }

  private val KcoreK = 3
  private val KcoreRounds = 12
  private val KtrussK = 6
  private val KtrussRounds = 6

  /** k-truss input: the nation graph SPARSIFIED to pairs trading at
    * ≥ 1.3× the mean pair volume (exact integer cross-multiply against a
    * one-row total) — the raw nation graph is complete at sf0.01+, where
    * every edge trivially survives any truss. */
  private def trussEdgeDf(s: org.apache.spark.sql.SparkSession, d: String) = {
    val p = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .groupBy(
        least(col("s_nationkey"), col("c_nationkey")).cast("long").as("u"),
        greatest(col("s_nationkey"), col("c_nationkey")).cast("long").as("v"))
      .agg(count(lit(1)).as("n"))
    val tots = p.agg(sum(col("n")).as("total"), count(lit(1)).as("cnt"))
    p.crossJoin(broadcast(tots))
      .filter(col("n") * 10 * col("cnt") >= col("total") * 13)
      .select(col("u").as("src"), col("v").as("dst"))
  }

  private val trussEdgeCte =
    """WITH p AS (
      |  SELECT CAST(least(s_nationkey, c_nationkey) AS BIGINT) AS u,
      |         CAST(greatest(s_nationkey, c_nationkey) AS BIGINT) AS v,
      |         COUNT(*) AS n
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE s_nationkey <> c_nationkey GROUP BY 1, 2),
      |tots AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS cnt
      |         FROM p),
      |e0 AS MATERIALIZED (SELECT u, v FROM p CROSS JOIN tots
      |                    WHERE n * 10 * cnt >= total * 13)
      |""".stripMargin

  /** k-truss via fixed-round edge peeling (GraphOps.kTruss), oracle =
    * the same rounds as materialized CTEs (wedge join + EXISTS closing
    * check ≡ the engine's pair-keyed left-semi). Same fixed-round
    * contract as g_kcore. */
  val gKtruss = Q(
    "g_ktruss", {
      val peels = (1 to KtrussRounds).map { r =>
        s""", adj$r AS MATERIALIZED (SELECT u AS n, v AS m FROM e${r - 1}
           |    UNION ALL SELECT v, u FROM e${r - 1}),
           |sup$r AS MATERIALIZED (
           |  SELECT e.u, e.v, COUNT(*) AS support
           |  FROM e${r - 1} e JOIN adj$r a ON e.u = a.n AND a.m <> e.v
           |  WHERE EXISTS (SELECT 1 FROM adj$r b
           |                WHERE b.n = e.v AND b.m = a.m)
           |  GROUP BY 1, 2 HAVING COUNT(*) >= ${KtrussK - 2}),
           |e$r AS MATERIALIZED (SELECT u, v FROM sup$r)""".stripMargin
      }.mkString("\n")
      trussEdgeCte +
        s"""$peels
           |SELECT u, v, support FROM sup$KtrussRounds""".stripMargin
    }) { (s, d) =>
    GraphOps.kTruss(trussEdgeDf(s, d), k = KtrussK, rounds = KtrussRounds)
  }

  /** k-core via synchronous peeling (GraphOps.kCore), oracle = the SAME
    * fixed number of peel rounds as chained CTEs. Peeling is monotone and
    * idempotent at the fixpoint, so both engines running the identical
    * round count agree by construction, and any count ≥ the convergence
    * depth yields the true k-core (GraphOpsSpec pins convergence depth on
    * the worst-case chain shape). */
  val gKcore = Q(
    "g_kcore", {
      // AS MATERIALIZED: und{r-1} is referenced three times per round —
      // inlined CTEs would re-expand the chain exponentially (DuckDB ran
      // out of file handles re-scanning the base parquet)
      val peels = (1 to KcoreRounds).map { r =>
        s""", k$r AS MATERIALIZED (SELECT u FROM und${r - 1} GROUP BY u
           |  HAVING COUNT(*) >= $KcoreK),
           |und$r AS MATERIALIZED (SELECT u, v FROM und${r - 1}
           |  WHERE u IN (SELECT u FROM k$r) AND v IN (SELECT u FROM k$r))"""
          .stripMargin
      }.mkString("\n")
      edgeCte +
        s""", und0 AS MATERIALIZED (SELECT src AS u, dst AS v FROM e
           |           UNION SELECT dst, src FROM e)
           |$peels
           |SELECT u AS node, COUNT(*) AS core_degree FROM und$KcoreRounds
           |GROUP BY u""".stripMargin
    }) { (s, d) =>
    GraphOps.kCore(edgeDf(s, d), k = KcoreK, rounds = KcoreRounds)
  }

  /** Adamic-Adar link prediction: for node pairs sharing ≥ 2 neighbors,
    * Σ_z 1/ln(deg z) over the common neighbors z — rare shared neighbors
    * count more than hubs (the classic common-neighbor refinement beside
    * g_neighbor_jaccard). Per-z contribution quantized once on the
    * DEGREE domain (⌊10⁶/ln d⌋, d ∈ [2,32] — no boundary value sits
    * within 10⁻⁶ of an integer, checked) then summed as exact BIGINTs.
    * The wedge join is bounded by the same mid-degree cap as jaccard:
    * hubs (deg > 32) generate no candidate pairs — at 100 TB that cap is
    * what keeps the pair count linear in edges. */
  val gAdamicAdar = Q(
    "g_adamic_adar",
    edgeCte +
      """, und AS (SELECT src AS node, dst AS other FROM e
        |          UNION SELECT dst, src FROM e),
        |deg AS (SELECT node, COUNT(*) AS d FROM und GROUP BY node),
        |aa AS (SELECT node AS z, CAST(floor(1000000.0 / ln(d)) AS BIGINT) AS aa_z
        |  FROM deg WHERE d BETWEEN 2 AND 32),
        |pairs AS (SELECT a.node AS u, b.node AS v, COUNT(*) AS inter,
        |    CAST(SUM(aa.aa_z) AS BIGINT) AS aa_micro
        |  FROM und a JOIN und b ON a.other = b.other AND a.node < b.node
        |  JOIN aa ON a.other = aa.z
        |  GROUP BY 1, 2)
        |SELECT u, v, inter, aa_micro FROM pairs WHERE inter >= 2"""
        .stripMargin) { (s, d) =>
    val e = edgeDf(s, d)
    // und feeds deg and both wedge sides — 3 consumers
    val und = cut(e.select(col("src").as("node"), col("dst").as("other"))
      .union(e.select(col("dst").as("node"), col("src").as("other")))
      .distinct())
    val deg = und.groupBy(col("node")).agg(count(lit(1)).as("d"))
    // inner-joining the capped aa table is BOTH the hub cap and the
    // contribution lookup — one broadcast-sized dimension, two uses
    val aa = deg.filter(col("d").between(2, 32))
      .select(col("node").as("other"),
        graft.core.QuantLn.microOverLn(col("d")).as("aa_z"))
    und.toDF("u", "other")
      .join(aa, Seq("other"))
      .join(und.toDF("v", "other"), Seq("other"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("inter"), sum(col("aa_z")).as("aa_micro"))
      .filter(col("inter") >= 2)
  }

  private val SsspRounds = 6

  /** Weighted single-source shortest paths (fixed-round Bellman-Ford,
    * [[GraphOps.weightedSssp]]); weight = co-order multiplicity. The
    * oracle unrolls the SAME round count from this generator, so the two
    * engines can never disagree on round depth; monotonicity makes any
    * depth ≥ the true hop radius exact. Source = smallest customer node
    * (data-derived one-row frame, no driver collect). */
  val gSsspWeighted = Q(
    "g_sssp_weighted",
    """WITH e AS (
      |  SELECT CAST(o_custkey * 2 AS BIGINT) AS src,
      |         CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst,
      |         COUNT(*) AS w
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      |und AS (SELECT u, v, MIN(w) AS w FROM (
      |    SELECT src AS u, dst AS v, w FROM e
      |    UNION ALL SELECT dst, src, w FROM e) b GROUP BY 1, 2),
      |r0 AS (SELECT MIN(src) AS node, CAST(0 AS BIGINT) AS dist FROM e),
      |""".stripMargin +
      (1 to SsspRounds).map { k =>
        s"""r$k AS (SELECT node, MIN(dist) AS dist FROM (
           |    SELECT node, dist FROM r${k - 1}
           |    UNION ALL
           |    SELECT und.v AS node, r.dist + und.w AS dist
           |    FROM r${k - 1} r JOIN und ON r.node = und.u) b
           |  GROUP BY node)""".stripMargin
      }.mkString(",\n") +
      s"\nSELECT node, dist FROM r$SsspRounds") { (s, d) =>
    // e feeds both undirected union sides and the source-min agg — 3
    // consumers inside weightedSssp's und build
    val e = cut(Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 3))
    GraphOps.weightedSssp(e, e.agg(min(col("src"))), rounds = SsspRounds)
  }

  /** Degree assortativity ingredients: exact Pearson numerators between
    * endpoint degrees over the undirected edge list (positive cov ⇒ hubs
    * link to hubs). REUSES [[graft.ops.DataQuality.exactCorrelation]] —
    * the DECIMAL(38,0) carry and digit-string boundary come for free; the
    * graph-side work is one degree aggregation + two broadcast joins. */
  val gAssortativity = Q(
    "g_assortativity",
    edgeCte +
      """, und AS (SELECT src AS node, dst AS other FROM e
        |          UNION SELECT dst, src FROM e),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM und
        |  GROUP BY node),
        |t AS (SELECT du.d AS du, dv.d AS dv
        |  FROM und JOIN deg du ON und.node = du.node
        |  JOIN deg dv ON und.other = dv.node),
        |s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(CAST(du AS HUGEINT)) AS s_du,
        |    SUM(CAST(dv AS HUGEINT)) AS s_dv,
        |    SUM(CAST(du AS HUGEINT) * CAST(du AS HUGEINT)) AS ss_du,
        |    SUM(CAST(dv AS HUGEINT) * CAST(dv AS HUGEINT)) AS ss_dv,
        |    SUM(CAST(du AS HUGEINT) * CAST(dv AS HUGEINT)) AS sp
        |  FROM t)
        |SELECT 'du' AS x_col, 'dv' AS y_col, CAST(n AS BIGINT) AS n,
        |  CAST(n * sp - s_du * s_dv AS VARCHAR) AS cov_num,
        |  CAST(n * ss_du - s_du * s_du AS VARCHAR) AS var_num_x,
        |  CAST(n * ss_dv - s_dv * s_dv AS VARCHAR) AS var_num_y
        |FROM s""".stripMargin) { (s, d) =>
    val e = edgeDf(s, d)
    // und feeds deg (joined back twice) and t — 3 subtree copies
    val und = cut(e.select(col("src").as("node"), col("dst").as("other"))
      .union(e.select(col("dst").as("node"), col("src").as("other")))
      .distinct())
    val deg = und.groupBy(col("node")).agg(count(lit(1)).as("d"))
    val t = und
      .join(deg.toDF("node", "du"), Seq("node"))
      .join(deg.toDF("other", "dv"), Seq("other"))
      .select(col("du"), col("dv"))
    graft.ops.DataQuality.exactCorrelation(t, Seq("du", "dv"))
  }

  /** Deterministic random-walk corpus (the DeepWalk/node2vec input stage:
    * graph → sequence corpus for embedding training). One 4-step walk per
    * node over the undirected graph; step t from node v moves to the
    * neighbor at rank `(wid·1000003 + t·31 + v) mod deg(v)` in the
    * ascending-neighbor order — a pure-integer mix both engines compute
    * identically, so the corpus is reproducible (re-runs and the oracle
    * agree bit-exact) without any RNG. Scale shape: the ranked-neighbor
    * table (idx, deg via two same-partition windows — ONE shuffle) is
    * built once; each step is an equi-join on (node, idx) whose width is
    * the walk count, never the edge count; no dead ends possible (every
    * node in an undirected edge list has deg ≥ 1). */
  val gRandomWalks = Q(
    "g_random_walks",
    edgeCte +
      """, und AS (SELECT DISTINCT node, other FROM (
        |    SELECT src AS node, dst AS other FROM e
        |    UNION ALL SELECT dst, src FROM e)),
        |nbr AS (SELECT node, other,
        |    ROW_NUMBER() OVER (PARTITION BY node ORDER BY other) - 1 AS idx,
        |    COUNT(*) OVER (PARTITION BY node) AS deg
        |  FROM und),
        |w0 AS (SELECT DISTINCT node AS wid, node AS v0 FROM nbr),
        |w1 AS (SELECT wid, v0, n.other AS v1 FROM w0 JOIN nbr n
        |  ON n.node = v0 AND n.idx = (wid * 1000003 + 1 * 31 + v0) % n.deg),
        |w2 AS (SELECT wid, v0, v1, n.other AS v2 FROM w1 JOIN nbr n
        |  ON n.node = v1 AND n.idx = (wid * 1000003 + 2 * 31 + v1) % n.deg),
        |w3 AS (SELECT wid, v0, v1, v2, n.other AS v3 FROM w2 JOIN nbr n
        |  ON n.node = v2 AND n.idx = (wid * 1000003 + 3 * 31 + v2) % n.deg),
        |w4 AS (SELECT wid, v0, v1, v2, v3, n.other AS v4 FROM w3 JOIN nbr n
        |  ON n.node = v3 AND n.idx = (wid * 1000003 + 4 * 31 + v3) % n.deg)
        |SELECT wid, CAST(v0 AS VARCHAR) || '->' || CAST(v1 AS VARCHAR)
        |  || '->' || CAST(v2 AS VARCHAR) || '->' || CAST(v3 AS VARCHAR)
        |  || '->' || CAST(v4 AS VARCHAR) AS path
        |FROM w4""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = edgeDf(s, d)
    val und = e.select(col("src").as("node"), col("dst").as("other"))
      .unionAll(e.select(col("dst").as("node"), col("src").as("other")))
      .distinct()
    val w = Window.partitionBy("node").orderBy("other")
    // nbr feeds all four walk steps plus the walk seed — 5 consumers
    val nbr = cut(und
      .withColumn("idx", (row_number().over(w) - 1).cast("long"))
      .withColumn("deg",
        count(lit(1)).over(Window.partitionBy("node")).cast("long")))
    val walks0 = nbr.select(col("node").as("wid")).distinct()
      .withColumn("v0", col("wid"))
    val walked = (1 to 4).foldLeft(walks0) { (acc, t) =>
      val prev = s"v${t - 1}"
      val step = nbr.select(col("node").as("__n"), col("idx").as("__i"),
        col("deg").as("__d"), col("other").as(s"v$t"))
      acc.join(step,
        col(prev) === col("__n") &&
          col("__i") === (col("wid") * 1000003L + t * 31L + col(prev)) % col("__d"))
        .drop("__n", "__i", "__d")
    }
    walked.select(col("wid"),
      concat_ws("->", (0 to 4).map(t => col(s"v$t").cast("string")): _*)
        .as("path"))
  }

  val all: Seq[Q] = Seq(gDegree, gComponents, gComponentsIncremental,
    gScc, gAncestors, gAncestorsRel,
    gTriangles, gShortestPaths, gPagerank, gPpr, gKhop, gNeighborJaccard,
    gHits, gHarmonic, gLabelProp, gKcore, gKtruss, gAdamicAdar,
    gSsspWeighted, gAssortativity, gRandomWalks)
}
