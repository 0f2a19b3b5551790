package graft.ops

import org.apache.spark.sql.DataFrame

/** Incremental maintenance of a materialized JOIN view — the join-side
  * counterpart of the aggregate maintenance in `s_agg_maintain` and the
  * CDC snapshot merge in `Sinks`. (Engine surface beyond the reference:
  * the reference recomputes every adapter join from scratch per release;
  * at 100 TB a nightly delta is the only affordable form.)
  *
  * For an INSERT-ONLY batch the view delta is the standard bilinear
  * expansion: with `V = A ⋈ B`,
  *
  *   (A ∪ ΔA) ⋈ (B ∪ ΔB) = V ∪ (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * and the three delta terms are pairwise disjoint with V whenever the
  * deltas are disjoint from their bases (no row appears in both A and
  * ΔA) — so maintenance is a UNION ALL, never a dedup shuffle. Cost is
  * O(|Δ|·match-fanout): each term probes a delta side against a base (or
  * delta) side, so a 100 TB base is touched only by the join itself —
  * typically a broadcast of the delta over the bucketed/partitioned base
  * — and never rescanned wholesale. Join keys follow the usual equi-join
  * contract (NULL keys match nothing, same as the full recompute).
  */
object ViewMaintain {

  /** The three-term view delta `ΔV = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)`
    * for an inner equi-join view on `keys`. Column sets of `a`/`da` and
    * `b`/`db` must match pairwise (they are the same logical tables). */
  def joinViewDelta(a: DataFrame, da: DataFrame,
      b: DataFrame, db: DataFrame, keys: Seq[String]): DataFrame =
    da.join(b, keys)
      .unionByName(a.join(db, keys))
      .unionByName(da.join(db, keys))

  /** The maintained view: previous materialization ∪ delta. Callers that
    * persist `view` as a table pay O(|ΔV|) appended rows per batch; the
    * equivalence `maintained ≡ (A∪ΔA) ⋈ (B∪ΔB)` is what the
    * `x_view_maintain_join` oracle (a full recompute) proves. */
  def maintainJoinView(view: DataFrame, a: DataFrame, da: DataFrame,
      b: DataFrame, db: DataFrame, keys: Seq[String]): DataFrame =
    view.unionByName(joinViewDelta(a, da, b, db, keys))
}
