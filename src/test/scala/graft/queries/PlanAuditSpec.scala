package graft.queries

import graft.SparkSpec

/** Plan-shape regression guard: the structural properties PLANS.md records
  * must hold — pushed filters reach scans, dimension joins broadcast,
  * rank-filters push down. A refactor that silently turns a broadcast into
  * a shuffle or loses a pushed filter fails here, not in a bench. */
class PlanAuditSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("p4_predicates pushes every predicate to the parquet scan") {
    val p = plan("p4_predicates")
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(500))
    assert(p.contains("In(l_returnflag"), "returnflag IN not pushed")
    // toString truncates long PushedFilters lists — assert the timestamp
    // predicate via the (codegen) Filter node instead
    assert(p.contains("< 1997-06-01"), "shipdate range predicate missing")
  }

  test("j4_broadcast_map joins both dimensions broadcast, zero sort-merge") {
    val p = plan("j4_broadcast_map")
    assert(p.split("BroadcastHashJoin").length - 1 >= 2)
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to SMJ")
  }

  test("p3_semi_filter is a broadcast left-semi (fact side unshuffled)") {
    val p = plan("p3_semi_filter")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
    assert(!p.contains("Exchange hashpartitioning"),
      "semi filter shuffled the fact side")
  }

  test("a1_keep_best gets the WindowGroupLimit rank pushdown") {
    assert(plan("a1_keep_best").contains("WindowGroupLimit"))
  }

  test("x_near_dup_emb is bucketed: no nested-loop join anywhere") {
    val p = plan("x_near_dup_emb")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "embedding near-dup fell back to an all-pairs join")
    assert(!p.contains("CartesianProduct"))
  }

  test("sql_recursive_cte plans the iterative UnionLoop (bounded frontier " +
      "steps), never a cartesian/NLJ rewrite") {
    val p = plan("sql_recursive_cte")
    assert(p.contains("UnionLoop"),
      "WITH RECURSIVE did not plan Spark's iterative UnionLoop node")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("j_range_bin is an equi-join on bins: no nested-loop, no cartesian") {
    val p = plan("j_range_bin")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range join fell back to a nested-loop theta join")
    assert(!p.contains("CartesianProduct"))
  }

  test("j_range_native plans the merge-sweep RangeJoinExec, one exchange per side") {
    val p = plan("j_range_native")
    assert(p.contains("RangeJoinExec"),
      "the marked equi+between join was not planned by RangeJoinStrategy")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // exactly two ENSURE_REQUIREMENTS shuffles feed the sweep (one per side);
    // the aggregate above reuses the left clustering via outputPartitioning
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected ≤3 hash exchanges, got $exchanges:\n${p.take(2000)}")
  }

  test("j_range_native_outer plans the LEFT OUTER merge sweep — one pass, " +
    "no anti-join double scan") {
    val p = plan("j_range_native_outer")
    assert(p.contains("RangeJoinExec(LeftOuter"),
      s"expected the LeftOuter sweep in:\n${p.take(1200)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // the preserved side never needs a second scan: exactly one sweep node
    assert("RangeJoinExec".r.findAllIn(p).size == 1)
  }

  test("j_range_native_full plans ONE FullOuter merge sweep — both sides' " +
    "null-extension from a single pass, no nested loop") {
    val p = plan("j_range_native_full")
    assert(p.contains("RangeJoinExec(FullOuter"),
      s"expected the FullOuter sweep in:\n${p.take(1200)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert("RangeJoinExec".r.findAllIn(p).size == 1)
  }

  test("j_range_native_outer_residual plans ONE residual-carrying LeftOuter " +
    "sweep — never the nested-loop fallback this shape used to take") {
    val p = plan("j_range_native_outer_residual")
    assert(p.contains("RangeJoinExec(LeftOuter") && p.contains("residual="),
      s"expected the residual LeftOuter sweep in:\n${p.take(1200)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert("RangeJoinExec".r.findAllIn(p).size == 1)
    // no FilterExec between the aggregate and the sweep: the residual
    // lives inside the join, not above it (above = wrong under OUTER)
    assert(!p.matches("(?s).*Filter.*RangeJoinExec.*") ||
      p.indexOf("RangeJoinExec") < p.indexOf("Filter") || !p.contains("Filter"))
  }

  test("j_bucketed_colocated: the join runs off the bucketed layout, the " +
      "only hash exchange is the final aggregate's") {
    val p = plan("j_bucketed_colocated")
    assert(p.contains("SortMergeJoin"), "expected the co-located SMJ:\n" + p.take(1200))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"bucketed join should add zero exchanges (1 = agg only), got $exchanges:\n" +
        p.take(2000))
  }

  test("sql_range_native: the SQL front door plans the native sweep too") {
    val p = plan("sql_range_native")
    assert(p.contains("RangeJoinExec"),
      "graft_between written in SQL text did not reach RangeJoinStrategy:\n" +
        p.take(1200))
  }

  test("s12_dsv2_runtime: the fact scan carries a runtime file filter") {
    val p = plan("s12_dsv2_runtime")
    assert("RuntimeFilters: \\[[^\\]]".r.findFirstIn(p).isDefined,
      "no non-empty runtime filter on the kegg-flat scan:\n" + p.take(1500))
  }

  test("j_overlap_native: both containment branches are merge sweeps, no NLJ") {
    val p = plan("j_overlap_native")
    assert("RangeJoinExec".r.findAllIn(p).size == 2,
      "overlap decomposition must plan two native sweeps:\n" + p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("ev_asof_join is one window pass, no join operator at all") {
    val p = plan("ev_asof_join")
    assert(p.contains("Window"), "union-window as-of lost its window")
    assert(!p.contains("Join"), "as-of join materialized a join: " +
      "the union-window form must not pair rows")
  }

  test("q03 is broadcast-joined with a top-k sort (no global sort, no SMJ)") {
    val p = plan("q03_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 materialized a global sort instead of TakeOrderedAndProject")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters"), "date filters not pushed to scans")
  }

  test("q18 qualifying-set is a broadcast left-semi join") {
    val p = plan("q18_large_orders")
    assert(p.contains("LeftSemi") && p.contains("BroadcastHashJoin"))
  }

  test("x_vocab top-200 is TakeOrderedAndProject, not a global sort") {
    assert(plan("x_vocab").contains("TakeOrderedAndProject"))
  }

  test("ddi_merged: no nested-loop; dedup windows get rank pushdown") {
    val p = plan("ddi_merged")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("WindowGroupLimit"),
      "undirected-dedup rank filter did not push down")
  }

  test("x_heavy_hitters probes a broadcast sketch, no nested-loop") {
    val p = plan("x_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), "sketch probe not broadcast")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("x_tfidf top-k is a pushed-down ranking window") {
    assert(plan("x_tfidf").contains("WindowGroupLimit"))
  }

  test("x_bigram_lm joins on bigram keys: no nested-loop, no cartesian") {
    val p = plan("x_bigram_lm")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("j_salted_skew replicates the dim via explode, not a cross join") {
    val p = plan("j_salted_skew")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Generate explode"), "salt replication lost its explode")
  }

  test("x_bloom_filter: bit set and fingerprint dim are broadcast probes") {
    val p = plan("x_bloom_filter")
    assert(p.split("BroadcastHashJoin").length - 1 >= 2,
      "bloom bit set / staged-fp dim not broadcast: the incoming corpus " +
        "must be probed map-side")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q05 star join: dimensions broadcast, filters pushed to scans") {
    val p = plan("q05_local_supplier")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters"), "order-date filter not pushed")
    assert(!p.contains("CartesianProduct"))
  }

  test("g_khop hops are equi-joins with per-hop distinct, no cartesian") {
    val p = plan("g_khop")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("HashAggregate"), "per-hop distinct disappeared")
  }

  test("x_chunk is narrow: zero exchanges, one generate") {
    val p = plan("x_chunk")
    assert(!p.contains("Exchange"), "chunking must not shuffle")
    assert(p.contains("Generate"), "chunk explode missing")
  }

  test("x_weighted_sample ranking gets the WindowGroupLimit pushdown") {
    assert(plan("x_weighted_sample").contains("WindowGroupLimit"))
  }

  test("x_importance_weight probes a broadcast vocab, no shuffle on tokens") {
    val p = plan("x_importance_weight")
    assert(p.contains("BroadcastHashJoin"), "vocab-weight dim not broadcast")
    assert(!p.contains("SortMergeJoin"),
      "token-side join shuffled: the corpus must be probed map-side")
  }

  test("q10 top-20 is TakeOrderedAndProject with pushed scan filters") {
    val p = plan("q10_returned_items")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("PushedFilters: [IsNotNull"), "filters not pushed")
  }

  test("g_neighbor_jaccard caps the pivot via a semi-join, no cartesian") {
    val p = plan("g_neighbor_jaccard")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("LeftSemi"), "hub-degree cap lost its semi-join")
  }

  test("x_ann_recall composes the two rankings without a cartesian") {
    // the brute-force side's broadcast NLJ is its documented by-design
    // baseline shape; the composition itself must add only hash joins
    assert(!plan("x_ann_recall").contains("CartesianProduct"))
  }

  test("x_segment_dedup: df comes from groupBy+join, never a nested loop") {
    val p = plan("x_segment_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("HashAggregate"), "segment df lost its partial agg")
  }

  test("er_blocked_match: block join is an equi-join on distinct names") {
    val p = plan("er_blocked_match")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "blocked match degenerated to all-pairs")
    assert(!p.contains("CartesianProduct"))
  }

  test("q04 EXISTS is a left-semi join with pushed date filters") {
    val p = plan("q04_order_priority")
    assert(p.contains("LeftSemi"))
    assert(p.contains("PushedFilters: [IsNotNull"), "date filter not pushed")
  }

  test("ev_rolling is one user-keyed exchange + one window") {
    val p = plan("ev_rolling")
    assert(p.split("Exchange hashpartitioning").length - 1 === 1,
      "rolling stats should shuffle exactly once on user_id")
    assert(p.contains("Window"))
  }

  test("x_collocations top-50 is TakeOrderedAndProject, not a global sort") {
    assert(plan("x_collocations").contains("TakeOrderedAndProject"))
  }

  test("ev_asof_forward is one window pass, no join operator at all") {
    val p = plan("ev_asof_forward")
    assert(p.contains("Window"))
    assert(!p.contains("Join"), "forward as-of materialized a join")
  }

  test("ev_scd2 shuffles only on user_id (both windows + the run agg)") {
    val p = plan("ev_scd2")
    val exchanges = p.split("Exchange hashpartitioning").length - 1
    assert(exchanges <= 2, s"scd2 shuffled $exchanges times")
    assert(!p.contains("Join"))
  }

  test("x_bpe_merges: the adopted merge is a broadcast, never a shuffle " +
    "of the vocabulary") {
    val p = plan("x_bpe_merges")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "winning merge pair should reach the vocab as a broadcast")
    assert(!p.contains("SortMergeJoin"), "merge application shuffled")
    assert(!p.contains("CartesianProduct"))
  }

  test("x_dedup_prefix_join: candidates come from equi-joins only") {
    val p = plan("x_dedup_prefix_join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "prefix filter degenerated to all-pairs")
    assert(!p.contains("CartesianProduct"))
  }

  test("q21_waiting_suppliers: semi/anti self-joins stay hash equi-joins") {
    val p = plan("q21_waiting_suppliers")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "EXISTS/NOT EXISTS shape degenerated to a nested loop")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
  }

  test("q17_small_qty_revenue: brand-filtered part dim broadcasts; " +
    "brand predicate reaches the scan") {
    val p = plan("q17_small_qty_revenue")
    assert(p.contains("BroadcastHashJoin"), "part dim join not broadcast")
    assert(p.contains("EqualTo(p_brand,Brand#23)") ||
      p.contains("p_brand = Brand#23") || p.contains("Brand#23"),
      "brand filter missing from the plan")
  }

  test("q22_dormant_customers: dormancy anti-join prunes orders at the scan") {
    val p = plan("q22_dormant_customers")
    assert(p.contains("LeftAnti"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "orderdate cutoff not pushed to the orders scan")
  }

  test("q02_min_cost_supplier: decorrelated min is ONE offer aggregate + " +
    "a pushed rank filter, dims broadcast") {
    val p = plan("q02_min_cost_supplier")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.split("BroadcastHashJoin").length - 1 >= 2,
      "eligible-supplier / part dims not broadcast")
    assert(p.contains("WindowGroupLimit"),
      "min-cost rank filter did not push down")
    assert(!p.contains("SortMergeJoin"),
      "best-cost side recomputed and joined back instead of ranking in place")
  }

  test("q08_market_share: all five dims broadcast; only lineitem⋈orders " +
    "shuffles") {
    val p = plan("q08_market_share")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.split("BroadcastHashJoin").length - 1 >= 3,
      "part/supplier-nation/customer-region dims not broadcast")
  }

  test("q09_product_profit: star dims broadcast, date filter on orders only") {
    val p = plan("q09_product_profit")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.split("BroadcastHashJoin").length - 1 >= 2)
  }

  test("q11_important_parts: global total is a one-row broadcast, the " +
    "nation filter a broadcast semi-join") {
    val p = plan("q11_important_parts")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("LeftSemi"), "nation scope lost its semi-join")
    // the one-row total crossJoin legitimately plans as a broadcast NLJ
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 1)
  }

  test("q12_priority_by_status pushes the ship-date window to the scan") {
    val p = plan("q12_priority_by_status")
    assert(p.contains("PushedFilters: [IsNotNull"), "date filters not pushed")
    assert(!p.contains("CartesianProduct"))
  }

  test("q16_supplier_cnt: complaint exclusion is a broadcast anti-join") {
    val p = plan("q16_supplier_cnt")
    assert(p.contains("LeftAnti"), "NOT IN did not become an anti-join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q19_disjunctive: the factored common conjunct reaches the lineitem " +
    "scan; the OR stays a post-join filter") {
    val p = plan("q19_disjunctive")
    assert(p.contains("EqualTo(l_returnflag,N)"),
      "common conjunct not pushed to the scan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q20_excess_shippers: both derived sets stay semi-joins") {
    val p = plan("q20_excess_shippers")
    assert(p.split("LeftSemi").length - 1 >= 2,
      "part-family / excess-shipper sets lost their semi-joins")
    assert(!p.contains("CartesianProduct"))
  }

  test("x_distinct_hll: registers come from partial-aggregating groupBys, " +
    "no window anywhere") {
    val p = plan("x_distinct_hll")
    assert(!p.contains("Window"), "HLL registers must not use windows")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x_dedup_keep_best keeps the keeper choice in aggregates, not windows") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.inputPlan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val phys = graft.SparkEntry.queries("x_dedup_keep_best")(spark, sf)
      .queryExecution.executedPlan
    assert(!flatten(phys).exists(_.isInstanceOf[WindowExec]),
      "keeper selection must be the map-side max-over-struct, not a rank window")
  }

  // ---- partitionless-window regression guard ---------------------------
  // A WindowExec with an empty partitionSpec serializes its whole input
  // through ONE task — the ev_rfm-class scale bug round 3 flagged. The
  // legitimate uses in this codebase (winsorize / histogramQuantiles
  // prefix-sums, binnedGlobalRank bin offsets, the BPE vocab fold) all run
  // over a domain that an aggregation has already reduced to bounded
  // cardinality, so the structural rule is: every partitionless window
  // must have an aggregation somewhere below it. A window directly over
  // scans/joins fails — that input grows with the data.
  test("partitionless windows only ever run above an aggregation") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.inputPlan)
      case _ => p +: p.children.flatMap(flatten)
    }
    def hasAgg(p: SparkPlan): Boolean = flatten(p).exists {
      case _: BaseAggregateExec => true
      case _: SortAggregateExec => true
      case _ => false
    }
    var seen = 0
    val offenders = graft.SparkEntry.registry.flatMap { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan
      flatten(plan).collect {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          seen += 1
          if (hasAgg(w.child)) None
          else Some(s"${q.name}: Window(" +
            w.windowExpression.map(_.sql).mkString(";").take(80) + ")")
      }.flatten
    }
    // detector sanity: the bounded-domain prefix-sums (winsorize,
    // histogramQuantiles, binnedGlobalRank, BPE) must be visible to this
    // walk — zero sightings would mean the walk missed the window nodes,
    // not that the codebase has none
    assert(seen > 5, s"window detector only saw $seen partitionless windows")
    assert(offenders.isEmpty,
      "partitionless window over unbounded input (use binnedGlobalRank / " +
        "a bounded-domain aggregate first): " + offenders.mkString("; "))
  }

  // ---- low-cardinality-partition window guard --------------------------
  // The x_len_quantiles class: a rank/row_number window over RAW rows
  // partitioned by a declared small-domain column (lang/source/stratum/
  // event_type) carries ~corpus/|domain| rows per window task — the
  // low-cardinality variant of the partitionless straggler above, which
  // the empty-partitionSpec rule cannot see because the window IS
  // partitioned. Structural rule (TIGHTENED in round 10 — the x_mad
  // hole): such a window must either have a WindowGroupLimit pushdown
  // bounding its per-partition input (top-k per group), or sit above an
  // aggregation whose grouping REFERENCES A DECLARED BOUNDED-DOMAIN
  // COLUMN. "Above an aggregation" alone is NOT enough: x_mad's old
  // plan aggregated on (grp, price_cents) — a grouping whose domain
  // grows with the corpus — and sailed through, running ~n/3 rows per
  // window task. The declaration set below IS the policy: every name on
  // it carries the argument for why its domain cannot grow with the
  // data, and a new window whose aggregation groups by anything else
  // fails here, not in a 100× bench.
  test("windows partitioned ONLY by small-domain columns run above a " +
    "BOUNDED-DOMAIN aggregation or under a WindowGroupLimit pushdown") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // columns whose value domain stays bounded as the corpus grows
    val smallDomains = Set("lang", "source", "stratum", "split",
      "event_type", "media_type", "label", "predicted", "snap", "side",
      "grp")
    // grouping columns that PROVABLY bound an aggregation's output as the
    // corpus grows, with the bounding argument:
    //  - __bin / bin / bucket / qbin: equal-width or quantile bin ids,
    //    ≤ a compile-time bin count by construction
    //  - merge_round / round: loop indices, ≤ the configured round count
    //  - len / n_tokens / tok_len: per-document counts under the corpus's
    //    hard document-length cap — the domain is the cap, not the corpus
    //  - score_bin / conf_bin: quantized scores, fixed quantization width
    val boundedDomains = Set("__bin", "bin", "bucket", "qbin",
      "merge_round", "round", "len", "n_tokens", "tok_len",
      "score_bin", "conf_bin")
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.inputPlan)
      case _ => p +: p.children.flatMap(flatten)
    }
    def baseName(n: String) = n.takeWhile(_ != '#')
    // an aggregation bounds the domain when its grouping names a declared
    // bounded column, or groups ONLY by small-domain columns (a pure
    // small-domain groupBy is itself bounded)
    def boundedAgg(p: SparkPlan): Boolean = {
      val groupings = flatten(p).collect {
        case a: BaseAggregateExec => a.groupingExpressions
        case a: SortAggregateExec => a.groupingExpressions
      }
      groupings.exists { g =>
        val names = g.flatMap(_.references.toSeq).map(a => baseName(a.name))
        g.nonEmpty &&
          (names.exists(boundedDomains) || names.forall(smallDomains))
      }
    }
    def hasGroupLimit(p: SparkPlan): Boolean =
      flatten(p).exists(_.isInstanceOf[WindowGroupLimitExec])
    var seen = 0
    val offenders = graft.SparkEntry.registry.flatMap { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan
      flatten(plan).collect {
        case w: WindowExec if w.partitionSpec.nonEmpty &&
            w.partitionSpec.flatMap(_.references.toSeq).map(_.name)
              .forall(n => smallDomains(baseName(n))) =>
          seen += 1
          if (boundedAgg(w.child) || hasGroupLimit(w.child)) None
          else Some(s"${q.name}: Window(partition=" +
            w.partitionSpec.map(_.sql).mkString(",") + ")")
      }.flatten
    }
    // detector sanity: the legitimate small-domain windows (per-lang
    // distinct-value prefix sums, per-source top-k pushdowns, x_mad's
    // binned medians) must be visible to the walk
    assert(seen > 0, "small-domain window detector saw nothing — broken?")
    assert(offenders.isEmpty,
      "rank window over raw rows with a small-domain partition key and " +
        "no bounded-domain aggregation below it (bin the values first — " +
        "the x_mad two-phase shape — or bound with a rank filter the " +
        "optimizer can push): " + offenders.mkString("; "))
  }

  // ---- theta-join regression guard -------------------------------------
  // A CartesianProduct is never acceptable; a BroadcastNestedLoopJoin is
  // acceptable ONLY against a documented broadcast dimension (one-row
  // totals, centroid/benchmark/vocab sets, the brute-force ANN corpus) —
  // the whitelisted queries below. A new query that plans a theta join
  // against data-scaled input fails here, not in a 100x bench.
  test("no cartesian products anywhere; nested-loop joins only on the " +
    "documented broadcast-dimension whitelist") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.inputPlan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val bnljWhitelist = Set(
      "ev_rfm", "q_ntile",                       // one-row bin-offset dims
      "q11_important_parts", "q22_dormant_customers", // global-scalar HAVING
      // x_ann_filtered is the brute meter of x_ann_filtered_lsh (the
      // registered bucket-join scale path, which must NOT appear here)
      "x_ann_topk", "x_ann_filtered", "x_ann_ivf", "x_ann_ivf_probe",
      "x_ann_pq",
      // incremental IVF: the one BNLJ is batch × the ~√n centroid
      // dimension (the irreducible coarse-quantizer assignment product —
      // FAISS's add-time cost); corpus candidates come from the persisted
      // assignment table through a cell equi-join, never a pair NLJ
      "x_ann_ivf_incremental",
      // x_ann_sq8 / x_ann_binary left this list in round 8: their stage 1
      // is now the BANDED code bucket join (plan-pinned below), so a BNLJ
      // reappearing in either is a regression
      // broadcast ANN corpus — METER-ONLY members: x_hard_negatives is
      // the sampled-query recall meter of x_hard_negatives_lsh (the
      // registered scale path, which must NOT appear here — its candidate
      // stage is a bucket equi-join)
      "x_ann_recall", "x_hard_negatives",
      // sampled-query brute rankers feeding the fusion demo — the fusion
      // itself is an output-sized hash join; at scale its inputs are the
      // bucket-equi-join rankers (x_ann_ivf / x_ann_lsh / posting top-k)
      "x_rrf_fusion",
      "x_kmeans", "x_cluster_exemplars", "x_semantic_dedup", // centroid sets
      "x_decontaminate_sem",                     // benchmark set
      "x_tfidf", "x_bm25", "x_importance_weight", "x_collocations", // one-row totals
      "x_bpe_merges", "x_bpe_tokenize",          // vocab-bounded dims
      "x_skew_profile", "x_winsorize", "x_interleave", // one-row totals
      "x_winsorize_cont",         // one-row p05/p95 bounds broadcast
      "x_mix_temperature",        // one-row weight-total broadcast
      "x_bootstrap_ci",           // one-row point-estimate broadcast
      "x_dataset_card",           // one-row corpus-dims broadcast
      "x_drift_psi", "x_curriculum", "q_percent_rank", // one-row totals
      "x_quantile_norm", "x_contrastive_pairs",  // one-row totals
      "ev_markov_stationary", "x_semdedup_eps",  // type-domain/one-row dims
      "ev_seasonality",                          // one-row total
      // one-row vocab/corpus-size + class dim broadcasts (the shared NB
      // score-matrix chain behind all three)
      "x_nb_classify", "x_label_issues", "x_abstention",
      "x_neyman_alloc", // one-row weight-total + floor-total broadcasts
      "x_isotonic_fit", // bounded-bin interval self-joins (≤10-row dims)
      "x_join_size_cms", // one-row estimate × one-row exact-count meter
      "x_kmv_setops",  // source-dimension pair frame (groups, not rows)
      "g_ktruss")      // one-row pair-volume total (sparsify threshold)
    var bnljSeen = 0
    val offenders = graft.SparkEntry.registry.flatMap { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan
      flatten(plan).flatMap {
        case _: CartesianProductExec => Some(s"${q.name}: CartesianProduct")
        case _: BroadcastNestedLoopJoinExec =>
          bnljSeen += 1
          if (bnljWhitelist(q.name)) None
          else Some(s"${q.name}: BroadcastNestedLoopJoin")
        case _ => None
      }
    }
    assert(bnljSeen > 10,
      s"join detector only saw $bnljSeen BNLJs — walk broken?")
    assert(offenders.isEmpty,
      "theta join against non-dimension input (bin it, broadcast a " +
        "bounded dim, or add an equi-key): " + offenders.mkString("; "))
  }

  test("x_ann_sq8 and x_ann_binary stage 1 is the banded bucket EQUI-join: " +
    "no nested loop, no cartesian, anywhere in either plan") {
    for (name <- Seq("x_ann_sq8", "x_ann_binary")) {
      val p = plan(name)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name regressed to an all-pairs code join:\n${p.take(1500)}")
      assert(!p.contains("CartesianProduct"), name)
      // the candidate stage joins the banded code table against itself on
      // (band, key) — an equi-join some hash/merge strategy must carry
      assert(p.contains("band"), s"$name lost the band-key join:\n${p.take(1500)}")
    }
  }

  test("ev_rfm and q_ntile rank via partitioned in-bin windows") {
    for (name <- Seq("ev_rfm", "q_ntile")) {
      val p = plan(name)
      assert(!p.contains("ntile("), s"$name still plans a global ntile")
    }
  }

  test("x_skew_profile: top-k is TakeOrderedAndProject, total is broadcast") {
    val p = plan("x_skew_profile")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), s"global sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("x_decontaminate_sem: benchmark side broadcasts; the only wide " +
    "exchange is the per-vector max") {
    val p = plan("x_decontaminate_sem")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"unexpected SMJ:\n$p")
    assert(!p.contains("CartesianProduct"), s"non-broadcast cartesian:\n$p")
  }

  test("x_ann_sq8 ranks through the bounded top-k aggregate, no window") {
    val p = plan("x_ann_sq8")
    assert(!p.contains("Window"), s"sq8 should not plan a window:\n$p")
    // round 8: the grid folds driver-side and stage 1 is the banded
    // bucket join — the NLJ the old pin documented must be GONE
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x_intra_dedup: every exchange is doc-keyed (no corpus-wide state)") {
    val p = plan("x_intra_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the in-doc first-occurrence window partitions on (doc_id, seg)
    assert(p.contains("windowspecdefinition(doc_id"), p)
  }

  test("x_dedup_norm is one partial-aggregating groupBy on the content key") {
    val p = plan("x_dedup_norm")
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert(p.contains("partial_min") || p.contains("HashAggregate"), p)
  }

  test("j_interval_overlap is an equi-join on bins: no nested-loop, " +
    "no cartesian, no distinct for pair dedup") {
    val p = plan("j_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "overlap join fell back to a nested-loop theta join")
    assert(!p.contains("CartesianProduct"))
    // pair dedup is the first-common-bin FILTER, not a distinct shuffle:
    // the only exchanges are the bin-key join and the final groupBy
    assert(p.split("Exchange").length - 1 <= 3, p)
  }

  test("x_rand_proj is narrow: the matrix is plan literals, zero exchanges") {
    val p = plan("x_rand_proj")
    assert(!p.contains("Exchange"), "projection must not shuffle or join")
    assert(!p.contains("Join"), "weight matrix must be literals, not a dim")
    assert(p.contains("Generate"), "posexplode missing")
  }

  test("s_orc_roundtrip pushes the predicate to the ORC scan") {
    val p = plan("s_orc_roundtrip")
    assert(p.contains("PushedFilters") && p.contains("s_nationkey"), p)
  }

  test("column pruning: q01 scan reads only the needed lineitem columns") {
    val p = plan("q01_pricing_summary")
    val schema = "ReadSchema: struct<" +
      p.split("ReadSchema: struct<")(1).split(">")(0) + ">"
    assert(!schema.contains("l_orderkey") && !schema.contains("l_partkey"),
      s"unpruned scan: $schema")
    assert(schema.contains("l_quantity") && schema.contains("l_returnflag"))
  }
}
