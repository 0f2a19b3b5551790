package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, BindReferences, EqualTo, Expression, JoinedRow, PredicateHelper, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, FilterExec, GraftSpillableRowArray, ProjectExec, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

import graft.functions.GraftBetween

/** Planner strategy for keyed range joins (SURVEY §2.10 temporal-join
  * family; the whole-operator rung (c) of the build rules' extension
  * ladder: LogicalPlan-match → Strategy → custom SparkPlan).
  *
  * Fires on an INNER [[Join]] whose condition conjoins ≥1 cross-side
  * equi-key, a `graft_between(p, lo, hi)` with `lo`/`hi` drawn from one
  * child and `p` from the other, and any number of residual predicates —
  * the shape [[graft.ops.TemporalJoins.nativeRangeJoin]] emits, plus
  * whatever the optimizer pushed into the condition (e.g. the strictness
  * filter of the overlap-join decomposition). Plans [[RangeJoinExec]] on
  * the equi+between core — both sides hash-clustered on the keys and
  * sorted (keys, lo) / (keys, p), then a per-partition merge sweep that
  * walks each key group ONCE with an active-interval heap, O(n log n +
  * output) per group versus the equi-join's O(intervals × points)
  * re-filter. Residual treatment follows join type, mirroring
  * SortMergeJoin's: under INNER the residual filters in a [[FilterExec]]
  * above the sweep (equivalent, and codegen'd); under the OUTER forms a
  * filter above would WRONGLY drop null-extended rows, so the residual
  * evaluates INSIDE the sweep on each candidate (interval, point) pair —
  * only pairs passing the FULL ON condition count as matches, and a
  * preserved row no pair qualifies null-extends, the standard ON-clause
  * semantics (round-8 verdict item 5: these shapes previously declined
  * to Catalyst's nested-loop BETWEEN plan). A between with bounds on the
  * RIGHT child plans the sweep with the children swapped under a
  * reordering [[ProjectExec]].
  *
  * Any other shape (keyless, between's bounds split across sides)
  * returns Nil and falls back to Spark's default join planning, which
  * remains correct because [[GraftBetween]] evaluates the plain
  * conjunction `lo <= p AND p <= hi`.
  */
object RangeJoinStrategy extends SparkStrategy with PredicateHelper {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, jt, Some(cond), _)
        if jt == Inner || jt == LeftOuter || jt == RightOuter || jt == FullOuter =>
      def ofLeft(e: Expression) = e.references.subsetOf(left.outputSet)
      def ofRight(e: Expression) = e.references.subsetOf(right.outputSet)
      def sweepable(b: GraftBetween) =
        (ofLeft(b.lo) && ofLeft(b.hi) && ofRight(b.point)) ||
          (ofRight(b.lo) && ofRight(b.hi) && ofLeft(b.point))
      val preds = splitConjunctivePredicates(cond)
      val (equis, rest0) = preds.partition {
        case EqualTo(a, c) => (ofLeft(a) && ofRight(c)) || (ofRight(a) && ofLeft(c))
        case _ => false
      }
      // drive the sweep with the FIRST plannable between; every other
      // predicate (more betweens included) becomes the residual filter
      val (drivers, residual) = {
        val i = rest0.indexWhere {
          case b: GraftBetween => sweepable(b); case _ => false
        }
        if (i < 0) (Nil, rest0) else (Seq(rest0(i)), rest0.patch(i, Nil, 1))
      }
      (drivers, equis) match {
        case (Seq(b: GraftBetween), _ :: _) =>
          val keyPairs = equis.map {
            case EqualTo(a, c) if ofLeft(a) => (a, c)
            case EqualTo(a, c) => (c, a)
          }
          val (lk, rk) = keyPairs.unzip
          val resExpr = residual.reduceOption(And)
          // INNER: residual above the sweep (equivalent, codegen'd).
          // OUTER: residual INSIDE the sweep — matched-flag semantics,
          // a filter above would drop null-extended rows.
          val sweepResidual = if (jt == Inner) None else resExpr
          val core: SparkPlan =
            if (ofLeft(b.lo))
              RangeJoinExec(lk, rk, b.lo, b.hi, b.point,
                planLater(left), planLater(right), jt, sweepResidual)
            else {
              // bounds on the RIGHT child: swap children so the sweep
              // buffers the interval side, FLIPPING the preserved side
              // with them (LeftOuter ↔ RightOuter; Inner and FullOuter
              // are symmetric), and re-order the output back under a
              // Project that references the EXEC's attributes (same
              // exprIds, outer-adjusted nullability) so null-extension
              // survives the reorder. The residual binds by exprId, so
              // it rides the swap unchanged.
              val flipped = jt match {
                case LeftOuter => RightOuter
                case RightOuter => LeftOuter
                case other => other
              }
              val swapped = RangeJoinExec(rk, lk, b.lo, b.hi, b.point,
                planLater(right), planLater(left), flipped, sweepResidual)
              val reordered = (left.output ++ right.output).map(a =>
                swapped.output.find(_.exprId == a.exprId).get)
              ProjectExec(reordered, swapped)
            }
          (if (jt == Inner)
            resExpr.map(FilterExec(_, core)).getOrElse(core)
          else core) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Co-partitioned merge-sweep inner range join.
  *
  * Left child: interval rows carrying `[lo, hi]`; right child: point rows.
  * Required distribution is [[ClusteredDistribution]] on the equi-keys for
  * BOTH children (EnsureRequirements co-partitions them exactly as it does
  * for sort-merge joins, and AQE coalesces the two shuffles as one group),
  * required ordering `(keys…, lo)` / `(keys…, point)`. Execution zips the
  * co-partitions and, per key group, sweeps the points in ascending order
  * against a min-heap of active intervals keyed by `hi`: each interval
  * enters the heap once (when `lo <= p` first holds), leaves once (when
  * `hi < p`), and every heap resident at a point emits a joined row — so
  * per-group cost is O((I + P)·log I + matches), never the I×P re-filter
  * of the equi-join fallback.
  *
  * Memory discipline is SortMergeJoin's, spill included: each key group's
  * interval rows are buffered in a [[GraftSpillableRowArray]] (the same
  * `ExternalAppendOnlyUnsafeRowArray` SMJ uses for its buffered side), so
  * a hot or low-cardinality equi-key whose group exceeds
  * `spark.sql.sortMergeJoinExec.buffer.in.memory.threshold` migrates to
  * the task's UnsafeExternalSorter and spills to disk under pressure
  * instead of OOMing the executor. Only the ACTIVE intervals (those whose
  * `[lo, hi]` spans the current point — bounded by the data's maximum
  * concurrent overlap, a property of the workload, not the group size)
  * are held on-heap in the sweep heap; the group at large streams from
  * the spillable array's iterator. Thresholds are overridable per query
  * via `spark.graft.rangeJoin.buffer.{inMemoryThreshold,spillThreshold}`
  * (used by the planted-spill spec). Disk bytes spilled surface in the
  * node's `spillSize` SQL metric.
  *
  * NULL in any key, bound, or point drops the row under INNER semantics
  * (NULL is not a match). Under LEFT OUTER (`joinType = LeftOuter`) every
  * interval row is PRESERVED: matched intervals emit one row per
  * contained point, unmatched ones (no point, NULL key, NULL bound) emit
  * once with the point side null-extended — unmatched emission happens at
  * heap EVICTION or group end, so the sweep stays single-pass and the
  * spill discipline is unchanged (NULL-bounded rows buffer in a second
  * spillable array). Under RIGHT OUTER every POINT row is preserved: a
  * point no active interval spans (or with a NULL key/point, or whose
  * key group has no sweepable interval) emits once with the interval
  * side null-extended — decided AT the point's sweep position, so this
  * too is single-pass. FULL OUTER composes both preservations in the
  * same sweep. All three outer forms buffer exactly what INNER buffers.
  *
  * `residual` (OUTER joins only — the strategy keeps INNER residuals in
  * a filter above): extra ON-clause predicates beyond the equi+between
  * core, evaluated on each candidate (interval, point) pair AT the sweep
  * position — a pair counts as a match only when the residual passes
  * (NULL = fail, SQL semantics), so an interval no pair qualifies still
  * null-extends at eviction/group end and a point no interval passes
  * null-extends at its position. One pass, unchanged buffering: the
  * residual only touches pairs the between already admitted.
  */
case class RangeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    lo: Expression,
    hi: Expression,
    point: Expression,
    left: SparkPlan,
    right: SparkPlan,
    joinType: JoinType = Inner,
    residual: Option[Expression] = None) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter =>
      left.output ++ right.output.map(_.withNullability(true))
    case RightOuter =>
      left.output.map(_.withNullability(true)) ++ right.output
    case FullOuter =>
      left.output.map(_.withNullability(true)) ++
        right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "spillSize" -> SQLMetrics.createSizeMetric(sparkContext, "spill size"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(lo, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(point, Ascending))

  // SortMergeJoin's contract: the preserved side's clustering survives;
  // FULL OUTER preserves neither claim (null-extended rows from each side
  // carry nulls in the other side's keys)
  override def outputPartitioning: Partitioning = joinType match {
    case RightOuter => right.outputPartitioning
    case FullOuter => UnknownPartitioning(left.outputPartitioning.numPartitions)
    case _ => left.outputPartitioning
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val spillSize = longMetric("spillSize")
    val lKeysB = leftKeys.map(BindReferences.bindReference(_, left.output))
    val rKeysB = rightKeys.map(BindReferences.bindReference(_, right.output))
    val loB = BindReferences.bindReference(lo, left.output)
    val hiB = BindReferences.bindReference(hi, left.output)
    val ptB = BindReferences.bindReference(point, right.output)
    // residual sees the JOINED row (interval attrs then point attrs —
    // the same order GroupSweep builds its JoinedRow in)
    val resB = residual
      .map(BindReferences.bindReference(_, left.output ++ right.output))
      .orNull
    val keyOrds = leftKeys.map(e => TypeUtils.getInterpretedOrdering(e.dataType))
    val timeOrd = TypeUtils.getInterpretedOrdering(point.dataType)
    val out = output
    val leftAttrs = left.output
    // Same defaults SortMergeJoinExec feeds its buffered-side array, with a
    // graft-scoped override so a spec can force the spill path cheaply.
    val inMemThreshold = conf.getConfString(
      "spark.graft.rangeJoin.buffer.inMemoryThreshold",
      conf.sortMergeJoinExecBufferInMemoryThreshold.toString).toInt
    val spillThreshold = conf.getConfString(
      "spark.graft.rangeJoin.buffer.spillThreshold",
      conf.sortMergeJoinExecBufferSpillThreshold.toString).toInt
    val preserveLeft = joinType == LeftOuter || joinType == FullOuter
    val preserveRight = joinType == RightOuter || joinType == FullOuter
    val rightWidth = right.output.size
    val leftWidth = left.output.size
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(out, out)
      new RangeSweepIterator(lIt.buffered, rIt.buffered,
        lKeysB, rKeysB, loB, hiB, ptB, keyOrds, timeOrd,
        leftAttrs, inMemThreshold, spillThreshold, spillSize,
        preserveLeft, rightWidth, preserveRight, leftWidth, resB)
        .map { jr => numOutputRows += 1; proj(jr) }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override def simpleString(maxFields: Int): String =
    s"RangeJoinExec($joinType, keys=${leftKeys.mkString(",")} = ${rightKeys.mkString(",")}, " +
      s"range=[$lo, $hi] ∋ $point" +
      residual.map(r => s", residual=$r").getOrElse("") + ")"
}

/** The per-partition merge sweep behind [[RangeJoinExec]]. Both inputs
  * arrive sorted by (keys…, lo) / (keys…, point); key groups are matched
  * sort-merge style, and within a matched group the points stream through
  * an active-interval min-heap ordered by interval end. Interval rows are
  * buffered into ONE spillable array per partition (cleared per group —
  * the array copies/serializes on add, so sort-output row reuse is safe);
  * point rows are never buffered — each is fully joined before the next
  * is pulled, so the reused object is safe, matching SparkPlan's iterator
  * contract (downstream copies if it buffers). */
private[plans] final class RangeSweepIterator(
    lBuf: BufferedIterator[InternalRow],
    rBuf: BufferedIterator[InternalRow],
    lKeys: Seq[Expression],
    rKeys: Seq[Expression],
    loE: Expression,
    hiE: Expression,
    ptE: Expression,
    keyOrds: Seq[Ordering[Any]],
    timeOrd: Ordering[Any],
    leftAttrs: Seq[Attribute],
    inMemThreshold: Int,
    spillThreshold: Int,
    spillMetric: org.apache.spark.sql.execution.metric.SQLMetric,
    preserveLeft: Boolean,
    rightWidth: Int,
    preserveRight: Boolean = false,
    leftWidth: Int = 0,
    residualB: Expression = null)
  extends Iterator[InternalRow] {

  // scratch row for residual evaluation (never escapes, so reuse is safe)
  private val resScratch = new JoinedRow

  /** ON-clause residual verdict for a candidate pair: true iff the bound
    * residual evaluates to TRUE (NULL/false = no match, SQL semantics). */
  private def residualPasses(lrow: InternalRow, rrow: InternalRow): Boolean =
    residualB == null ||
      java.lang.Boolean.TRUE == residualB.eval(resScratch(lrow, rrow))

  private val nKeys = lKeys.length
  private var pending: Iterator[InternalRow] = Iterator.empty
  // One spillable group buffer for the whole partition, cleared per key
  // group (the SMJ pattern); sorted (keys, lo) input keeps it lo-ordered.
  private val groupBuf = new GraftSpillableRowArray(inMemThreshold, spillThreshold)
  // LEFT OUTER only: a matched group's NULL-BOUND rows (preserved, but
  // never sweepable) buffer here, same spill discipline.
  private lazy val nullBoundBuf =
    new GraftSpillableRowArray(inMemThreshold, spillThreshold)
  // Sort output is UnsafeRow in practice; project defensively if not.
  private val toUnsafe = UnsafeProjection.create(leftAttrs, leftAttrs)
  private var spillReported = 0L
  private val nullRight =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightWidth)
  private val nullLeft =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(leftWidth)
  // Dedicated JoinedRows for null-extended emissions OUTSIDE GroupSweep
  // (consumers copy per element, so the reuse is safe).
  private val joinedNull = new JoinedRow
  private val joinedNullL = new JoinedRow

  /** Lazily drain left rows while `keep` holds, null-extending each —
    * the LEFT OUTER emission for unmatched groups / null keys / tails. */
  private def nullDrain(keep: () => Boolean): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      override def hasNext: Boolean = keep()
      override def next(): InternalRow = joinedNull(lBuf.next(), nullRight)
    }

  /** The RIGHT-preserved twin: drain point rows while `keep` holds, each
    * emitted once with the interval side null-extended. */
  private def nullDrainRight(keep: () => Boolean): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      override def hasNext: Boolean = keep()
      override def next(): InternalRow = joinedNullL(nullLeft, rBuf.next())
    }

  /** Key values of a row, or null if any key is NULL (row can't match). */
  private def keyOf(row: InternalRow, keys: Seq[Expression]): Array[Any] = {
    val a = new Array[Any](nKeys)
    var i = 0
    while (i < nKeys) {
      val v = keys(i).eval(row)
      if (v == null) return null
      a(i) = v
      i += 1
    }
    a
  }

  private def cmpKeys(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < nKeys) {
      val c = keyOrds(i).compare(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Drop leading rows whose keys contain NULL. */
  private def skipNullKeyed(it: BufferedIterator[InternalRow], keys: Seq[Expression]): Unit =
    while (it.hasNext && keyOf(it.head, keys) == null) it.next()

  private def skipGroup(it: BufferedIterator[InternalRow], keys: Seq[Expression],
      key: Array[Any]): Unit =
    while (it.hasNext && {
      val k = keyOf(it.head, keys); k != null && cmpKeys(k, key) == 0
    }) it.next()

  override def hasNext: Boolean = {
    while (!pending.hasNext) {
      if (preserveLeft && lBuf.hasNext && keyOf(lBuf.head, lKeys) == null) {
        // LEFT/FULL OUTER preserves NULL-keyed interval rows (they sort first)
        pending = nullDrain(() =>
          lBuf.hasNext && keyOf(lBuf.head, lKeys) == null)
      } else if (preserveRight && rBuf.hasNext &&
          keyOf(rBuf.head, rKeys) == null) {
        // RIGHT/FULL OUTER preserves NULL-keyed point rows the same way
        pending = nullDrainRight(() =>
          rBuf.hasNext && keyOf(rBuf.head, rKeys) == null)
      } else {
        if (!preserveLeft) skipNullKeyed(lBuf, lKeys)
        if (!preserveRight) skipNullKeyed(rBuf, rKeys)
        if (!lBuf.hasNext) {
          if (!preserveRight || !rBuf.hasNext) return false
          // intervals exhausted: every remaining point row is unmatched
          pending = nullDrainRight(() => rBuf.hasNext)
        } else if (!rBuf.hasNext) {
          if (!preserveLeft) return false
          // points exhausted: every remaining interval row is unmatched
          pending = nullDrain(() => lBuf.hasNext)
        } else {
          val lk = keyOf(lBuf.head, lKeys)
          val rk = keyOf(rBuf.head, rKeys)
          val c = cmpKeys(lk, rk)
          if (c < 0) {
            if (preserveLeft) pending = nullDrain(() => lBuf.hasNext && {
              val k = keyOf(lBuf.head, lKeys); k != null && cmpKeys(k, lk) == 0
            })
            else skipGroup(lBuf, lKeys, lk)
          }
          else if (c > 0) {
            if (preserveRight) pending = nullDrainRight(() => rBuf.hasNext && {
              val k = keyOf(rBuf.head, rKeys); k != null && cmpKeys(k, rk) == 0
            })
            else skipGroup(rBuf, rKeys, rk)
          }
          else {
            // Buffer the left (interval) group into the spillable array:
            // NULL-bound rows drop at fill time under INNER (the array
            // holds only sweepable intervals, still in ascending-lo
            // order); under LEFT OUTER they buffer separately and emit
            // null-extended.
            groupBuf.clear()
            if (preserveLeft) nullBoundBuf.clear()
            while (lBuf.hasNext && {
              val k = keyOf(lBuf.head, lKeys); k != null && cmpKeys(k, lk) == 0
            }) {
              val row = lBuf.next()
              val u = row match {
                case u0: UnsafeRow => u0
                case other => toUnsafe(other)
              }
              if (loE.eval(row) != null && hiE.eval(row) != null)
                groupBuf.add(u)
              else if (preserveLeft) nullBoundBuf.add(u)
            }
            val spilled = groupBuf.spillSize +
              (if (preserveLeft) nullBoundBuf.spillSize else 0L)
            if (spilled > spillReported) {
              spillMetric += (spilled - spillReported); spillReported = spilled
            }
            val nullBoundOut =
              if (preserveLeft && !nullBoundBuf.isEmpty)
                nullBoundBuf.iterator.map(r => joinedNull(r, nullRight))
              else Iterator.empty
            if (groupBuf.isEmpty) {
              // no sweepable interval in the group: the matched points
              // are all unmatched — preserved under RIGHT/FULL OUTER
              if (preserveRight) {
                val rkKey = rk
                pending = nullBoundOut ++
                  nullDrainRight(() => rBuf.hasNext && {
                    val k = keyOf(rBuf.head, rKeys)
                    k != null && cmpKeys(k, rkKey) == 0
                  })
              } else {
                skipGroup(rBuf, rKeys, rk)
                pending = nullBoundOut
              }
            }
            else pending = nullBoundOut ++ new GroupSweep(rk)
          }
        }
      }
    }
    true
  }

  override def next(): InternalRow = pending.next()

  /** A heap-resident interval: bounds, the (copied) row, and — LEFT OUTER
    * only — whether any point ever matched it. */
  private final class IntervalEntry(val lo: Any, val hi: Any, val row: InternalRow) {
    var matched = false
  }

  /** Sweep one matched key group: points stream from the shared rBuf until
    * the key changes; intervals stream from the spillable group buffer's
    * iterator (a one-row-lookahead cursor — the iterator's row object is
    * reused when reading from spill files, so rows are copied only at the
    * moment they enter the active heap) and enter/leave the heap as
    * described above. On-heap residency is the active set alone.
    *
    * LEFT OUTER: an interval evicted from the heap without ever matching
    * emits one null-extended row AT EVICTION; at group end the remaining
    * heap residents and the never-activated cursor tail drain the same
    * way — single pass, no second scan of the group. */
  private final class GroupSweep(groupKey: Array[Any]) extends Iterator[InternalRow] {

    private val arrIt = groupBuf.iterator
    // lookahead cursor over the interval stream: (curLo, curHi, curRow)
    private var curRow: UnsafeRow = _
    private var curLo: Any = _
    private var curHi: Any = _
    private var cursorLive = advanceCursor()

    private def advanceCursor(): Boolean =
      if (arrIt.hasNext) {
        curRow = arrIt.next()
        curLo = loE.eval(curRow) // never NULL: dropped at fill time
        curHi = hiE.eval(curRow)
        true
      } else false

    private val active = mutable.PriorityQueue.empty[IntervalEntry](
      Ordering.by[IntervalEntry, Any](_.hi)(timeOrd).reverse)
    private var matches: Iterator[InternalRow] = Iterator.empty
    private var done = false
    private var tailDrained = false
    private val joined = new JoinedRow
    // separate JoinedRow for right-preserved emissions: `joined` backs the
    // LAZY evictedOut iterator, so an eager joined(nullLeft, rrow) would
    // be re-mutated by evictions consumed after it (emitting the last
    // evicted interval twice and losing the point)
    private val joinedR = new JoinedRow

    /** One lazily-built null-extended row for the current point (rrow
      * stays valid until the next point is pulled, which can't happen
      * before this iterator is drained). */
    private def lonePoint(rrow: InternalRow): Iterator[InternalRow] =
      new Iterator[InternalRow] {
        private var emitted = false
        override def hasNext: Boolean = !emitted
        override def next(): InternalRow = {
          emitted = true; joinedR(nullLeft, rrow)
        }
      }

    override def hasNext: Boolean = {
      while (!matches.hasNext) {
        if (done) {
          if (!preserveLeft || tailDrained) return false
          // group end: drain unmatched heap residents, then the cursor
          // tail (intervals whose lo exceeded every point — never active)
          tailDrained = true
          val leftoverHeap = active.dequeueAll.iterator
            .filter(!_.matched).map(e => joined(e.row, nullRight))
          val cursorTail = new Iterator[InternalRow] {
            override def hasNext: Boolean = cursorLive
            override def next(): InternalRow = {
              // copy: advanceCursor may refill the reused row object
              val out = joined(curRow.copy(), nullRight)
              cursorLive = advanceCursor()
              out
            }
          }
          matches = leftoverHeap ++ cursorTail
        } else if (!rBuf.hasNext) done = true
        else {
          // Safe to touch rBuf: the previous point's matches are exhausted.
          val k = keyOf(rBuf.head, rKeys)
          if (k == null || cmpKeys(k, groupKey) != 0) done = true
          else {
            val rrow = rBuf.next()
            val p = ptE.eval(rrow)
            if (p != null) {
              while (cursorLive && timeOrd.lteq(curLo, p)) {
                active.enqueue(new IntervalEntry(curLo, curHi, curRow.copy()))
                cursorLive = advanceCursor()
              }
              var evicted: List[InternalRow] = Nil
              while (active.nonEmpty && timeOrd.lt(active.head.hi, p)) {
                val e = active.dequeue()
                if (preserveLeft && !e.matched) evicted = e.row :: evicted
              }
              val evictedOut =
                if (evicted.isEmpty) Iterator.empty
                else evicted.iterator.map(r => joined(r, nullRight))
              val matchedOut =
                if (residualB == null) {
                  if (active.isEmpty) {
                    // no interval spans this point: preserved under
                    // RIGHT/FULL OUTER (emitted before the next point is
                    // pulled, so the reused row object is safe)
                    if (preserveRight) lonePoint(rrow) else Iterator.empty
                  }
                  else active.iterator.map { e =>
                    e.matched = true; joined(e.row, rrow)
                  }
                } else {
                  // ON-clause residual: only PASSING pairs are matches —
                  // decided eagerly per point (the passing set is a
                  // subset of the active heap, already bounded by the
                  // workload's max concurrent overlap), so the
                  // preserved-point decision knows whether ANY passed
                  val passing = mutable.ArrayBuffer.empty[IntervalEntry]
                  val it = active.iterator
                  while (it.hasNext) {
                    val e = it.next()
                    if (residualPasses(e.row, rrow)) {
                      e.matched = true; passing += e
                    }
                  }
                  if (passing.isEmpty) {
                    if (preserveRight) lonePoint(rrow) else Iterator.empty
                  } else passing.iterator.map(e => joined(e.row, rrow))
                }
              matches = evictedOut ++ matchedOut
            } else if (preserveRight) {
              // NULL point matches nothing but IS preserved
              matches = lonePoint(rrow)
            }
          }
        }
      }
      true
    }

    override def next(): InternalRow = matches.next()
  }
}
