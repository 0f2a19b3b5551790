package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ColFns, Tables}
import graft.ops.Kernels

/** Flagship end-to-end integration pipeline — the Spark re-expression of the
  * reference's PPI integration (edge_data/ppi.py: intact_process :97-151,
  * biogrid_process :153-263, string_process :266-379, merge_all :382-484).
  *
  * The reference integrates three interaction databases into one edge table:
  * per-source (project → rename → SwissProt semi-filter → null-fix → sort →
  * keep-best groupby with pubmed set-union → undirected dedup), then chained
  * full-outer merges reconciling source / pubmed / method / score columns.
  *
  * Here the "interactome" is derived deterministically from the driver's
  * star schema: proteins ≈ suppliers, an interaction ≈ two suppliers
  * co-supplying one order, a publication ≈ the order. Three disjoint
  * ship-date slices play IntAct / BioGRID / STRING:
  *
  *  - intact  (≤1996): mi-score analog = mean line discount, method =
  *    linestatus, pubmed list per pair;
  *  - biogrid (1997): no score — partners arrive as NAMES (the reference's
  *    gene symbols, ppi.py:198-226) and are resolved to keys via a broadcast
  *    symbol→id mapping join;
  *  - string  (≥1998): integer combined_score ∈ [0,1000] with the
  *    reference's ≥700 high-confidence threshold (ppi.py:307), rescaled to
  *    [0,1] at merge time (ppi.py:449 coalesce semantics).
  *
  * Scale notes (100 TB): pair generation self-joins lineitem on l_orderkey —
  * one hash shuffle on the order key, group size bounded by order width (no
  * skew); per-source dedup and the merge chain all share the (a,b) hash
  * partitioning, so Catalyst reuses the exchange; the only broadcast is the
  * supplier dimension. No driver-side collection anywhere.
  */
object PpiPipeline {

  /** Pair orientation is canonicalized at generation (a < b) — pairs are
    * born undirected here, so the reference's frozenset dedup (D2) reduces
    * to keyed dedup; orientation-preserving dedup over raw directed rows is
    * exercised by the d2_undirected_dedup query. */
  private def pairsInWindow(
      s: SparkSession, d: String, lo: String, hi: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(lo).cast("timestamp")
        && col("l_shipdate") < lit(hi).cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_discount"), col("l_linestatus"), col("l_returnflag"))
    val a = li.toDF("l_orderkey", "sk_a", "ln_a", "disc_a", "ls_a", "rf_a")
    val b = li.toDF("l_orderkey", "sk_b", "ln_b", "disc_b", "ls_b", "rf_b")
    // fact×fact: shuffle on the order key, never broadcast a fact side
    // (see mergedSinglePass — same rationale and same measured win)
    a.join(b.hint("shuffle_hash"), Seq("l_orderkey"))
      .filter(col("sk_a") < col("sk_b"))
  }

  /** SwissProt-set analog: suppliers considered "reviewed". */
  private def reviewed(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).filter(col("s_acctbal") > 1000).select(col("s_suppkey"))

  private def curiePair(df: DataFrame): DataFrame = df
    .withColumn("a", ColFns.curie("supp", col("sk_a")))
    .withColumn("b", ColFns.curie("supp", col("sk_b")))

  /** Keep-best row per pair + pubmed set-union — the reference's
    * sort→groupby("first") + `"|".join(set(pubmeds))` (ppi.py:135-140) —
    * in ONE aggregation over one (a,b) exchange: the former window +
    * separate aggregate + join form re-evaluated the fact×fact self-join
    * subtree per consumer (the window's exchange and the partial-agg
    * exchange differ, so Catalyst reuses neither — the plan audit counted
    * the self-join twice per source) and paid a per-pair sort. `min_by`
    * over the caller's order struct picks the identical winner: the
    * tie-break chains cover every emitted column, the same equivalence
    * [[mergedSinglePass]] rides. `orderKey` must encode descending
    * components negated. */
  private def bestPlusPubmeds(
      pairs: DataFrame, orderKey: Column, keep: Seq[Column]): DataFrame =
    pairs.groupBy(col("a"), col("b"))
      .agg(min_by(struct(keep: _*), orderKey).as("__best"),
        Kernels.setJoinAgg(concat(lit("pmid:"), col("l_orderkey"))).as("pubmeds"))
      .select(col("a"), col("b"), col("__best.*"), col("pubmeds"))

  /** IntAct raw pairs: windowed, SwissProt-filtered, scored. */
  private[pipelines] def intactRawPairs(s: SparkSession, d: String): DataFrame = {
    val rev = reviewed(s, d)
    curiePair(
      pairsInWindow(s, d, "1995-01-01 00:00:00", "1997-01-01 00:00:00"))
      .join(broadcast(rev), col("sk_a") === col("s_suppkey"), "left_semi")
      .join(broadcast(rev), col("sk_b") === col("s_suppkey"), "left_semi")
      .withColumn("score", (col("disc_a") + col("disc_b")) / 2)
  }

  /** IntAct analog: score + method + pubmeds. */
  def intact(s: SparkSession, d: String): DataFrame = {
    val pairs = intactRawPairs(s, d)
    // tie-break chain covers every emitted column (ls_a = method): rows
    // fully tied on it are interchangeable, so the winner is well-defined
    // even though (l_orderkey, l_linenumber) is not unique in the data
    bestPlusPubmeds(pairs,
      struct(negate(col("score")), col("l_orderkey"), col("ln_a"),
        col("ln_b"), col("ls_a")),
      Seq(col("score"), col("ls_a").as("method")))
      .withColumn("source", lit("intact"))
  }

  /** BioGRID analog: partners arrive as upper-cased names and resolve to
    * keys through a broadcast symbol→id mapping (ppi.py:198-226); no score,
    * first-seen row wins (order-key arrival order made explicit). */
  private[pipelines] def biogridRawPairs(s: SparkSession, d: String): DataFrame = {
    // mapping dict is built from reviewed entries only (ppi.py:209-226 maps
    // symbols through the SwissProt set) → unmapped partners drop out below
    val symbolMap = Tables.supplier(s, d).filter(col("s_acctbal") > 1000)
      .select(upper(col("s_name")).as("symbol"), col("s_suppkey").as("mapped"))
    val named = pairsInWindow(s, d, "1997-01-01 00:00:00", "1998-01-01 00:00:00")
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey").as("sk_a"), upper(col("s_name")).as("sym_a"))), Seq("sk_a"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey").as("sk_b"), upper(col("s_name")).as("sym_b"))), Seq("sk_b"))
      .drop("sk_a", "sk_b")
    // resolve symbols back to keys (the mapping join the reference does)
    val resolved = named
      .join(broadcast(symbolMap.toDF("sym_a", "rk_a")), Seq("sym_a"))
      .join(broadcast(symbolMap.toDF("sym_b", "rk_b")), Seq("sym_b"))
      .na.drop(Seq("rk_a", "rk_b"))
      .withColumnRenamed("rk_a", "sk_a").withColumnRenamed("rk_b", "sk_b")
    curiePair(resolved)
      .withColumn("method", concat(lit("exp:"), col("ls_a")))
  }

  def biogrid(s: SparkSession, d: String): DataFrame = {
    val pairs = biogridRawPairs(s, d)
    bestPlusPubmeds(pairs,
      struct(col("l_orderkey"), col("ln_a"), col("ln_b"), col("method")),
      Seq(col("method")))
      .withColumn("source", lit("biogrid"))
  }

  /** STRING analog: integer combined score, high-confidence ≥700 filter
    * (ppi.py:307), no pubmeds/method. */
  private[pipelines] def stringRawPairs(s: SparkSession, d: String): DataFrame =
    curiePair(
      pairsInWindow(s, d, "1998-01-01 00:00:00", "2099-01-01 00:00:00"))
      .withColumn("combined_score",
        floor(lit(1000) * (lit(1) - (col("disc_a") + col("disc_b")) / 2)).cast("long"))
      .filter(col("combined_score") >= 700)

  def string(s: SparkSession, d: String): DataFrame = {
    val pairs = stringRawPairs(s, d)
    // same one-agg keep-best as [[bestPlusPubmeds]] (no pubmeds here):
    // the rank-1 window paid a per-pair sort over the self-join output
    pairs.groupBy(col("a"), col("b"))
      .agg(min_by(col("combined_score"),
        struct(negate(col("combined_score")), col("l_orderkey"),
          col("ln_a"), col("ln_b"))).as("combined_score"))
      .select(col("a"), col("b"),
        (col("combined_score").cast("double") / 1000).as("string_score"))
      .withColumn("source", lit("string"))
  }

  /** Single-pass form of [[merged]] — the 100 TB plan. The chain runs the
    * expensive lineitem self-join once PER SOURCE; the three windows are
    * disjoint ship-date slices, so ONE windowed self-join (same-window
    * pairs only) plus ONE conditional aggregation produces the identical
    * result: per-source keep-bests become `min_by` over per-source
    * ordering structs (the tie chains cover every emitted column, so
    * `min_by` and the rank-1 window pick identical values), pubmed/source
    * merges become presence-guarded set-unions. The biogrid symbol round
    * trip resolves to the reviewed-membership filter (supplier names are
    * unique — same equivalence the oracle uses). Registered under the
    * chain's own oracle SQL → driver-enforced bit-equality. */
  def mergedSinglePass(s: SparkSession, d: String): DataFrame = {
    val cut95 = lit("1995-01-01 00:00:00").cast("timestamp")
    val cut97 = lit("1997-01-01 00:00:00").cast("timestamp")
    val cut98 = lit("1998-01-01 00:00:00").cast("timestamp")
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= cut95)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_discount"), col("l_linestatus"),
        when(col("l_shipdate") < cut97, 1)
          .when(col("l_shipdate") < cut98, 2).otherwise(3).as("win"))
    val a = li.toDF("l_orderkey", "sk_a", "ln_a", "disc_a", "ls_a", "win_a")
    val b = li.toDF("l_orderkey", "sk_b", "ln_b", "disc_b", "ls_b", "win_b")
    val rev = Tables.supplier(s, d).filter(col("s_acctbal") > 1000)
      .select(col("s_suppkey"))
    // fact×fact self-join: force the shuffle-hash strategy — Catalyst's
    // size estimate puts the filtered scan under the broadcast threshold
    // at test scale, but broadcasting a FACT side is exactly the plan
    // that dies at 100 TB (and the driver-side build measurably dominates
    // this query even at sf0.1: 9.1s broadcast vs ~2s shuffled)
    val pairs = a.join(b.hint("shuffle_hash"), Seq("l_orderkey"))
      .filter(col("sk_a") < col("sk_b") && col("win_a") === col("win_b"))
      .withColumnRenamed("win_a", "win")
      .join(broadcast(rev.select(col("s_suppkey").as("sk_a"),
        lit(true).as("rev_a"))), Seq("sk_a"), "left")
      .join(broadcast(rev.select(col("s_suppkey").as("sk_b"),
        lit(true).as("rev_b"))), Seq("sk_b"), "left")
      .withColumn("score", (col("disc_a") + col("disc_b")) / 2)
      .withColumn("cs",
        floor(lit(1000) * (lit(1) - (col("disc_a") + col("disc_b")) / 2)).cast("long"))
      // admission: intact/biogrid need both sides reviewed; string needs
      // the high-confidence threshold (ppi.py:307)
      .filter((col("win") < 3 && col("rev_a").isNotNull && col("rev_b").isNotNull)
        || (col("win") === 3 && col("cs") >= 700))
    val w1 = col("win") === 1
    val w2 = col("win") === 2
    val w3 = col("win") === 3
    val pmid = concat(lit("pmid:"), col("l_orderkey"))
    val bgMethod = concat(lit("exp:"), col("ls_a"))
    def cnt(p: org.apache.spark.sql.Column) = count(when(p, lit(1)))
    pairs
      .groupBy(ColFns.curie("supp", col("sk_a")).as("a"),
        ColFns.curie("supp", col("sk_b")).as("b"))
      .agg(
        min_by(when(w1, struct(col("score"), col("ls_a"))),
          when(w1, struct(negate(col("score")), col("l_orderkey"),
            col("ln_a"), col("ln_b"), col("ls_a")))).as("iwin"),
        min_by(when(w2, bgMethod),
          when(w2, struct(col("l_orderkey"), col("ln_a"), col("ln_b"),
            bgMethod))).as("bmethod"),
        min_by(when(w3, col("cs")),
          when(w3, struct(negate(col("cs")), col("l_orderkey"),
            col("ln_a"), col("ln_b")))).as("scs"),
        when(cnt(w1 || w2) > 0,
          Kernels.setJoinAgg(when(w1 || w2, pmid))).as("pubmeds"),
        concat_ws("|",
          when(cnt(w2) > 0, "biogrid"), when(cnt(w1) > 0, "intact"),
          when(cnt(w3) > 0, "string")).as("source"))
      .select(col("a"), col("b"), col("source"), col("pubmeds"),
        coalesce(col("iwin.ls_a"), col("bmethod")).as("method"),
        coalesce(col("iwin.score"), col("scs").cast("double") / 1000).as("score"))
  }

  /** merge_all (ppi.py:382-484): chained full-outer joins on the pair key;
    * source and pubmeds merge as sorted set-unions, method and score
    * coalesce left-first (intact > biogrid, intact-score > string-score). */
  def merged(s: SparkSession, d: String): DataFrame = {
    val st = string(s, d)
      .withColumnRenamed("string_score", "score") // coalesce target (ppi.py:449)
    Kernels.outerMergeChain(
      Seq(intact(s, d), biogrid(s, d), st),
      Seq("a", "b"),
      pipeCols = Set("source", "pubmeds"))
      .select(col("a"), col("b"), col("source"), col("pubmeds"),
        col("method"), col("score"))
  }

  /** BioCypher-style edge emit (S23): 5-tuple rows with escaped pipe-joined
    * props, the reference's `get_edges()` tuple shape (ppi.py:58-71 sink). */
  def edges(s: SparkSession, d: String): DataFrame = emitEdges(merged(s, d))

  /** [[edges]] over [[mergedSinglePass]]: same 5-tuple emit, one fact scan
    * instead of the three-source chain (the flagship pair already enforces
    * merged ≡ mergedSinglePass bit-equality under one oracle; this twin
    * puts the edge PROJECTION of that equality on its own oracle row). */
  def edgesFast(s: SparkSession, d: String): DataFrame =
    emitEdges(mergedSinglePass(s, d))

  private def emitEdges(m: DataFrame): DataFrame =
    m.select(
      concat_ws("_", lit("ppi"), col("a"), col("b")).as("rel_id"),
      col("a").as("src"),
      col("b").as("dst"),
      lit("protein_interacts_with_protein").as("label"),
      concat_ws("|",
        when(col("source").isNotNull, concat(lit("source="), ColFns.escapeProps(col("source")))),
        when(col("pubmeds").isNotNull, concat(lit("pubmeds="), ColFns.escapeProps(col("pubmeds")))),
        when(col("method").isNotNull, concat(lit("method="), ColFns.escapeProps(col("method")))),
        when(col("score").isNotNull, concat(lit("score="), col("score").cast("string"))))
        .as("props"))

  /** Both graph halves from ONE evaluation of the merge: the reference's
    * memoized-download pattern (E3, `hasattr` guards) maps to persisting
    * the shared subplan so get_nodes + get_edges don't recompute it. */
  def graph(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val m = merged(s, d).persist()
    (nodesOf(s, d, m), edgesOf(m))
  }

  /** Typed emit (`Dataset[Node]`/`Dataset[Edge]`, SURVEY §1.1). */
  def typedGraph(s: SparkSession, d: String): (
      org.apache.spark.sql.Dataset[graft.core.model.Node],
      org.apache.spark.sql.Dataset[graft.core.model.Edge]) = {
    import s.implicits._
    val (n, e) = graph(s, d)
    (n.as[graft.core.model.Node], e.as[graft.core.model.Edge])
  }

  /** Node emit for the same graph: every supplier that appears in an edge.
    * Participant ids are derived from the RAW pair frames (same key set as
    * the merged result — keep-best/merge never drop a pair key), skipping
    * three windows and two outer joins on the node path. */
  def nodes(s: SparkSession, d: String): DataFrame = {
    // stack both endpoints with ONE explode per source instead of a
    // two-sided self-union: each raw-pair frame roots in the fact×fact
    // self-join, so the union form re-evaluated every self-join twice
    // (plan audit: 50 scans on the node path)
    val rawIds = Seq(
      intactRawPairs(s, d), biogridRawPairs(s, d), stringRawPairs(s, d))
      .map(df => df.select(explode(array(col("a"), col("b"))).as("id")))
      .reduce(_ unionByName _)
      .distinct()
    nodesFromIds(s, d, rawIds)
  }

  private def nodesOf(s: SparkSession, d: String, m: DataFrame): DataFrame =
    nodesFromIds(s, d,
      m.select(col("a").as("id")).unionByName(m.select(col("b").as("id"))).distinct())

  private def edgesOf(m: DataFrame): DataFrame = emitEdges(m)

  private def nodesFromIds(s: SparkSession, d: String, present: DataFrame): DataFrame = {
    Tables.supplier(s, d)
      .withColumn("id", ColFns.curie("supp", col("s_suppkey")))
      .join(present, Seq("id"), "left_semi")
      .select(col("id"), lit("protein").as("label"),
        concat_ws("|",
          concat(lit("name="), ColFns.escapeProps(col("s_name"))),
          concat(lit("nation="), col("s_nationkey").cast("string")))
          .as("props"))
  }
}
