package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.ColFns

/** Operator kernels (SURVEY.md §7.1 step 2) — thin, tested wrappers encoding
  * the reference's subtle operator semantics as distributed-safe Spark plans.
  *
  * The recurring hazard (SURVEY §7.3 risk 1): pandas relies on implicit row
  * order (`sort_values` → `groupby(sort=False).agg("first")`,
  * `drop_duplicates(keep="first")`). Spark has no row order after a shuffle,
  * so every kernel here takes an EXPLICIT ordering and resolves ties
  * deterministically. Callers must supply a total order (add a unique
  * tie-breaker column) or accept kernel-chosen tie-breaks.
  */
object Kernels {

  /** "Keep the best row per key" — the reference's
    * `sort_values(score) → groupby(keys).agg("first")` /
    * `drop_duplicates(subset=keys, keep="first")` idiom
    * (ppi.py:135-140, drug.py:500-513, disease.py:631-633, SURVEY §2.5).
    *
    * Implemented as a ranking window, not `first()` (non-deterministic) and
    * not a global sort (the reference's global `sort_values` is only needed
    * for its per-group effect; dropping it removes an O(n log n) total sort
    * at 100 TB — the window shuffles once on `keys` and sorts per-partition).
    */
  def keepBestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Undirected-pair dedup (SURVEY §2.8 D2; ppi.py:142 `frozenset` idiom):
    * treat (a,b) ≡ (b,a); keep the best row per unordered pair under
    * `order`, PRESERVING THE WINNER'S ORIGINAL ORIENTATION (§7.3 risk 2:
    * the reference keeps the first-seen row as-is, not a canonicalized one).
    *
    * `extraKeys` joins the pair key (e.g. interaction_type at ppi.py:142,
    * method at ppi.py:254). Shuffles once on the canonical pair.
    */
  def undirectedDedup(
      df: DataFrame, a: String, b: String,
      order: Seq[Column], extraKeys: Seq[String] = Nil): DataFrame = {
    val withKey = df
      .withColumn("__u", ColFns.canonicalU(col(a), col(b)))
      .withColumn("__v", ColFns.canonicalV(col(a), col(b)))
    keepBestPerKey(withKey, Seq("__u", "__v") ++ extraKeys, order)
      .drop("__u", "__v")
  }

  /** Left-priority coalesce of post-outer-join column twins (SURVEY §2.3 J2,
    * ppi.py:434, drug.py:1065): first non-null wins, left first. */
  def coalesceLeft(cols: Column*): Column = coalesce(cols: _*)

  /** Exact median rounded to 3 dp (SURVEY §2.4 A2; compound.py:461-462).
    * `median` is Spark's exact median (interpolating on even counts), the
    * same contract as pandas/DuckDB `median`. */
  def median3(c: Column): Column = round(median(c), 3)

  /** Middle element of the group's values in SORTED order, upper middle on
    * even counts — pandas `values[len(values) // 2]` after the caller's sort
    * (SURVEY §2.4 A3; compound.py:464-474, drug.py:1377-1387). The reference
    * takes arrival order (inherited from a prior sort); we sort by value so
    * the result is order-independent and distributed-safe.
    * Pure expression: no UDAF, stays in codegen. */
  def orderedMiddle(c: Column): Column = {
    val arr = sort_array(collect_list(c))
    // all-null group → empty list → null (ANSI element_at would throw)
    when(size(arr) > 0,
      element_at(arr, (floor(size(arr) / 2) + 1).cast("int")))
  }

  /** Pipe-encoded multi-value merge aggregate (SURVEY §2.4 A4/A5,
    * `merge_source_column` compound.py:492-501 / `aggregate_column_level`
    * drug.py:1360-1372): split every value on "|", dedup, re-join.
    * The reference's A4 preserves first-arrival order (`dict.fromkeys`);
    * arrival order is not reproducible on a cluster, so we emit sorted order
    * (the A5 set variant's semantics, deterministic everywhere).
    * Empty → null (A5: "empty→NaN"). */
  def mergePipesAgg(c: Column): Column = {
    val merged = array_sort(array_distinct(flatten(collect_list(ColFns.pipeSplit(c)))))
    when(size(merged) > 0, concat_ws("|", merged))
  }

  /** Conflict-detecting aggregate (SURVEY §2.4 A6,
    * `detect_conflicting_action_type` drug.py:902-913): if the group has >1
    * distinct non-null value → null (caller drops the row, drug.py:915),
    * else the single value. */
  def conflictFold(c: Column): Column = {
    val s = collect_set(c)
    when(size(s) === 1, element_at(s, 1))
  }

  /** Conflict fold with an "unknown defers" value (SURVEY §2.4 A7,
    * tf_gen.py:381-395):
    *  - one distinct effect → that effect;
    *  - {unknown, X} → X;
    *  - ≥3 distinct, or two real values → null (conflict).
    * Requires `unknown` to sort last in the value domain (true for
    * "Unknown" among Activation/Repression, and for 'P' among TPC order
    * statuses) so it lands at the end of the sorted distinct-set. */
  def effectFoldWithUnknown(c: Column, unknown: String): Column = {
    val s = array_sort(collect_set(c))
    when(size(s) === 1, element_at(s, 1))
      .when(size(s) === 2 && element_at(s, 2) === unknown, element_at(s, 1))
  }

  /** The reference's TF-effect domain instance. */
  def effectFold(c: Column): Column = effectFoldWithUnknown(c, "Unknown")

  /** Pairwise (column-level) variant of [[effectFoldWithUnknown]]: the
    * reference applies the same conflict rule to post-outer-join column
    * twins, not just groups (tf_gen.py:297,308 via :381-395). Same
    * contract: one distinct non-null value → it; {unknown, X} → X; two
    * real values or none → null (caller drops the row). Unlike the
    * aggregate form, this one does NOT require `unknown` to sort last —
    * it filters the marker out explicitly. */
  def effectMergePair(x: Column, y: Column, unknown: String = "Unknown"): Column = {
    val s = array_distinct(filter(array(x, y), v => v.isNotNull))
    val real = filter(s, v => v =!= unknown)
    when(size(s) === 1, element_at(s, 1))
      .when(size(s) === 2 && size(real) === 1, element_at(real, 1))
  }

  /** Conflicting-evidence row exclusion (SURVEY §2.2 P9, drug.py:874-879):
    * given a collected set-of-values column, admit the group only when it
    * does not contain BOTH conflicting markers. */
  def admitUnlessBoth(setCol: Column, a: String, b: String): Column =
    !(array_contains(setCol, a) && array_contains(setCol, b))

  /** Set-union aggregate to a pipe string, sorted for determinism
    * (SURVEY §2.4 A8, pubmed set-join ppi.py:138). */
  def setJoinAgg(c: Column, sep: String = "|"): Column =
    concat_ws(sep, array_sort(collect_set(c)))

  /** Ordered group-fold to a delimited string (SURVEY §2.4 A9,
    * uniprot.py:102-107 secondary-accession fold). Sorted, not
    * arrival-ordered, for distributed determinism. */
  def sortedFoldAgg(c: Column, sep: String = ";"): Column =
    concat_ws(sep, sort_array(collect_list(c)))

  /** Fallback-chain mapping (SURVEY §2.3 J5; disease.py:1631-1654,
    * :649-670): try each mapping table in priority order, first hit wins.
    * Each `mappings(i)` must have columns (`from_id`, `to_id`). Emits
    * `df.*` + `resolved`. All mapping tables are broadcast — they model the
    * reference's in-memory xref dicts, which are dimension-sized by
    * construction, so at 100 TB this stays a map-side join chain with no
    * shuffle of the fact side.
    */
  def fallbackMap(df: DataFrame, key: Column, mappings: Seq[DataFrame]): DataFrame = {
    val joined = mappings.zipWithIndex.foldLeft(df) { case (acc, (m, i)) =>
      // the reference's xref dicts are unique-keyed; enforce it so a dirty
      // mapping table can never fan out the fact side (min to_id wins,
      // deterministically)
      val uniq = m.groupBy(col("from_id")).agg(min(col("to_id")).as("to_id"))
      val mi = broadcast(
        uniq.select(col("from_id").as(s"__from_$i"), col("to_id").as(s"__to_$i")))
      acc.join(mi, key === col(s"__from_$i"), "left")
    }
    val resolved = coalesce(mappings.indices.map(i => col(s"__to_$i")): _*)
    joined
      .withColumn("resolved", resolved)
      .drop(mappings.indices.flatMap(i => Seq(s"__from_$i", s"__to_$i")): _*)
  }

  /** Multi-way full-outer merge chain (SURVEY §2.3 J1 — the integration
    * backbone, e.g. the DTI 5-chain drug.py:1054-1152). Joins every frame on
    * `keys` with `full_outer`, then reconciles column twins left-to-right:
    * value columns by left-priority coalesce, pipe-encoded multi-value
    * columns (`pipeCols`) by set-union merge (J2).
    *
    * Seq-key joins merge the key columns automatically (no `_x`/`_y` key
    * twins to repair — §7.3 risk 3). Each join shuffles both sides on
    * `keys`; Catalyst reuses the partitioning across the chain so the fold
    * is one shuffle per input, which is the lower bound for n-way outer
    * integration.
    */
  def outerMergeChain(
      frames: Seq[DataFrame], keys: Seq[String],
      pipeCols: Set[String] = Set.empty): DataFrame =
    frames.reduceLeft { (l, r) =>
      val shared = (l.columns.toSet intersect r.columns.toSet) -- keys
      val lRen = shared.foldLeft(l)((d, c) => d.withColumnRenamed(c, s"__l_$c"))
      val rRen = shared.foldLeft(r)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
      val joined = lRen.join(rRen, keys, "full_outer")
      val mergedShared = shared.toSeq.sorted.map { c =>
        val (x, y) = (col(s"__l_$c"), col(s"__r_$c"))
        val m = if (pipeCols(c)) ColFns.mergePipes(x, y) else coalesce(x, y)
        m.as(c)
      }
      val passthrough =
        joined.columns.filterNot(c => c.startsWith("__l_") || c.startsWith("__r_"))
          .map(col).toSeq
      joined.select(passthrough ++ mergedShared: _*)
    }
}
