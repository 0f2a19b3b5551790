package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale mechanics (SURVEY §7.3 risk 7 / the 100 TB design rules):
  * skew-salted aggregation and bucketed co-located joins, as reusable
  * helpers with plan-level tests.
  */
object Scale {

  /** Two-phase salted aggregation for skewed grouping keys: partial
    * aggregate on (keys ++ salt) spreads a hot key over `salts` reducers,
    * the final aggregate merges partials. Algebraic merges only —
    * (partialExpr, mergeOfPartial) pairs, e.g. (count → sum, sum → sum).
    * Results are identical to a direct groupBy (associative merges),
    * verified in ScaleSpec. */
  /** The salting expression saltedAgg spreads hot keys with — exposed so
    * the spread test in ScaleSpec observes THIS definition rather than a
    * copy that could drift. */
  private[ops] def saltColumn(salts: Int): Column =
    pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts))

  def saltedAgg(
      df: DataFrame, keys: Seq[String], salts: Int,
      partials: Seq[(Column, String)],
      merges: String => Column): DataFrame = {
    val salted = df.withColumn("__salt", saltColumn(salts))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, n) => c.as(n) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(merges(partials.head._2).as(partials.head._2),
        partials.tail.map { case (_, n) => merges(n).as(n) }: _*)
  }

  /** Convenience: salted count + sum, merge = sum of partials. */
  def saltedCountSum(
      df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts,
      Seq(count(lit(1)) -> "n",
        sum(col(valueCol).cast("decimal(18,4)")) -> "total"),
      name => sum(col(name)))

  /** The k Bloom positions of an integer join key (portable md5 family,
    * salts jbloom0..jbloom{k-1}, mod mBits). */
  private def bloomKeyPositions(key: Column, i: Int, mBits: Int): Column =
    pmod(graft.text.TextFns.portableHash(key.cast("string"), lit(s"jbloom$i")),
      lit(mBits.toLong))

  /** Bloom-pruned equi-join — the classic 100 TB shuffle reducer: fold
    * the dim side's join keys into a bounded bit-position set (≤ mBits
    * rows regardless of dim size), broadcast it, and prune the fact side
    * MAP-SIDE with k broadcast left-semi probes BEFORE any exchange, so
    * fact rows that cannot match never enter the shuffle. Bloom
    * guarantees no false negatives and survivors still pass the exact
    * equi-join, so results are identical to the plain join by
    * construction (the oracle IS the plain join). Spark's AQE runtime
    * bloom pushdown does this implicitly; the explicit form is
    * plan-testable and works on any build. */
  def bloomPrunedJoin(
      fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      k: Int = 3, mBits: Int = 4096): DataFrame = {
    val bits = (0 until k).map { i =>
      dim.select(bloomKeyPositions(col(dimKey), i, mBits).as(s"__p$i")).distinct()
    }
    val pruned = (0 until k).foldLeft(fact) { (acc, i) =>
      acc.join(broadcast(bits(i)),
        bloomKeyPositions(col(factKey), i, mBits) === col(s"__p$i"), "left_semi")
    }
    pruned.join(dim, col(factKey) === col(dimKey))
  }

  /** Key-skew profile — the diagnostic that decides whether a join or
    * aggregation on `keyCol` needs salting: the k heaviest keys with row
    * count and corpus share (ppm, fixed-point — engine-exact). Shape: one
    * partial-aggregating per-key count, a one-row total broadcast, and
    * per-partition top-k merged on k rows (TakeOrderedAndProject) — no
    * full-width global sort, no partitionless window, so profiling a
    * 100 TB fact table costs one count shuffle. */
  def skewProfile(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("tot"))
    counts.orderBy(col("n").desc, col("key").asc).limit(k)
      .crossJoin(broadcast(tot))
      .select(col("key"), col("n"),
        expr("(n * 1000000) div tot").as("share_ppm"))
  }

  /** Salt one side of a skewed join: replicate the (small) right side
    * `salts` times and salt the left key randomly-but-deterministically,
    * so one hot key spreads over `salts` tasks. Equi-join results are
    * unchanged. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      salts: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val replicatedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLeft
      .join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey)
          && saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }

  /** Exact 1-based global rank under a total order, with NO corpus-sized
    * single-partition window — the scale-safe replacement for
    * `row_number()/ntile() OVER (ORDER BY …)`.
    *
    * Two levels: `bin` is a caller-supplied deterministic coarsening of the
    * primary order key (identity for bounded integer domains; fixed-width
    * cells from a broadcast min/max for continuous metrics). Bin counts are
    * prefix-summed over the BIN domain (the only partitionless window —
    * its input is the bin aggregate, bounded at any sf), broadcast back,
    * and the in-bin `row_number` (a partitioned window) completes the rank:
    * `rank = bins-before + position-in-bin`.
    *
    * Deterministic by construction (bins derive from values, never from
    * sampling or partition ids — `repartitionByRange` would resample per
    * plan branch and can disagree with itself across an exchange that
    * fails to be reused). Caller contract: `binAsc`/`ordInBin` must order
    * bins consistently with the row order, and `ordInBin` must be a total
    * order (unique tie-break) for the rank to be well-defined. Worst-case
    * skew is the largest single bin (e.g. every user with frequency 1) —
    * strictly better than the one-task global window, and the honest
    * limit of exact rank-with-tie-break semantics. */
  def binnedGlobalRank(
      df: DataFrame, bin: Column, ordInBin: Seq[Column],
      binAsc: Boolean, rankCol: String): DataFrame = {
    val binned = df.withColumn("__bin", bin)
    val cumW = Window
      .orderBy(if (binAsc) col("__bin").asc else col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = binned.groupBy(col("__bin")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(cumW), lit(0L)))
      .select(col("__bin").as("__obin"), col("__off"))
    // null-SAFE (<=>) join back: a NULL bin is its own partition in the
    // row_number()/sum() OVER forms this decomposition replaces (and in
    // the DuckDB oracles) — an equi-join would silently drop those rows
    binned.join(broadcast(offs), col("__bin") <=> col("__obin"))
      .withColumn(rankCol,
        col("__off") + row_number().over(
          Window.partitionBy(col("__bin")).orderBy(ordInBin: _*)))
      .drop("__bin", "__obin", "__off")
  }

  /** PER-GROUP variant of [[binnedGlobalRank]]: exact 1-based rank WITHIN
    * each group under a total order, with no raw-row window partitioned
    * by a low-cardinality group key — the scale-safe replacement for
    * `row_number() OVER (PARTITION BY lang/source ORDER BY …)`, whose
    * window tasks otherwise carry ~corpus/|groups| rows each.
    *
    * Bin-count offsets are computed per (group, bin) — the cumulative
    * window partitions on the GROUP over the bin aggregate, so its input
    * is the (group × bin) domain, bounded at any sf — and joined back on
    * (group, bin); the in-bin `row_number` partitions on (group, bin).
    * Both the join and the window shuffle on the same (group, bin) key,
    * so the exchange is reused. Same caller contract as
    * [[binnedGlobalRank]]: bins must order consistently with the row
    * order inside each group, `ordInBin` must be a total order, and the
    * honest worst case is the largest single (group, bin) cell. */
  def binnedGroupRank(
      df: DataFrame, group: Seq[Column], bin: Column,
      ordInBin: Seq[Column], binAsc: Boolean, rankCol: String): DataFrame = {
    val gNames = group.indices.map(i => s"__g$i")
    val binned = df
      .withColumns(gNames.zip(group).toMap)
      .withColumn("__bin", bin)
    val gCols = gNames.map(col)
    val cumW = Window.partitionBy(gCols: _*)
      .orderBy(if (binAsc) col("__bin").asc else col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = binned.groupBy(gCols :+ col("__bin"): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(cumW), lit(0L)))
      .select(gCols.zip(gNames).map { case (c, n) => c.as(s"__o$n") }
        :+ col("__bin").as("__obin") :+ col("__off"): _*)
    // null-SAFE (<=>) join back on every group/bin key: NULL group or bin
    // values are their own partitions in the window forms this replaces
    // (and in the DuckDB oracles) — an equi-join would silently drop them
    val cond = (gNames.map(n => col(n) <=> col(s"__o$n"))
      :+ (col("__bin") <=> col("__obin"))).reduce(_ && _)
    binned.join(offs, cond)
      .withColumn(rankCol,
        col("__off") + row_number().over(
          Window.partitionBy(gCols :+ col("__bin"): _*).orderBy(ordInBin: _*)))
      .drop(gNames.map(n => s"__o$n") ++ gNames
        :+ "__bin" :+ "__obin" :+ "__off": _*)
  }

  /** PER-GROUP binned running sum: for every row, the exact cumulative
    * `value` over all rows of its group at-or-before it under
    * (bin order, ordInBin) — the scale-safe form of
    * `SUM(v) OVER (PARTITION BY lang ORDER BY … ROWS UNBOUNDED
    * PRECEDING)` for greedy budget selection. Same two-level shape as
    * [[binnedGroupRank]] with SUM(value) offsets instead of counts. */
  def binnedGroupRunningSum(
      df: DataFrame, group: Seq[Column], bin: Column,
      ordInBin: Seq[Column], value: Column, binAsc: Boolean,
      outCol: String): DataFrame = {
    val gNames = group.indices.map(i => s"__g$i")
    val binned = df
      .withColumns(gNames.zip(group).toMap)
      .withColumn("__bin", bin)
      .withColumn("__val", value.cast("long"))
    val gCols = gNames.map(col)
    val cumW = Window.partitionBy(gCols: _*)
      .orderBy(if (binAsc) col("__bin").asc else col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = binned.groupBy(gCols :+ col("__bin"): _*)
      .agg(sum(col("__val")).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(cumW), lit(0L)))
      .select(gCols.zip(gNames).map { case (c, n) => c.as(s"__o$n") }
        :+ col("__bin").as("__obin") :+ col("__off"): _*)
    val inBinW = Window.partitionBy(gCols :+ col("__bin"): _*)
      .orderBy(ordInBin: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-SAFE (<=>) join back — same rationale as binnedGroupRank
    val cond = (gNames.map(n => col(n) <=> col(s"__o$n"))
      :+ (col("__bin") <=> col("__obin"))).reduce(_ && _)
    binned.join(offs, cond)
      .withColumn(outCol, col("__off") + sum(col("__val")).over(inBinW))
      .drop(gNames.map(n => s"__o$n") ++ gNames
        :+ "__bin" :+ "__obin" :+ "__val" :+ "__off": _*)
  }

  /** Map-side `ntile(k)` from an exact global rank and total count —
    * standard SQL ntile bucket sizing (first `n mod k` buckets take one
    * extra row), pure integer arithmetic, no window. Pair with
    * [[binnedGlobalRank]]. */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val q = floor(n / k).cast("long")
    val r = (n % k).cast("long")
    val lead = r * (q + lit(1))
    // q = 0 (n < k) keeps every rank inside the first branch, so the
    // divide-by-q branch is never evaluated (CASE short-circuits).
    when(rank <= lead,
      floor((rank + q) / (q + lit(1))).cast("long"))
      .otherwise(r + floor((rank - lead + q - lit(1)) / q).cast("long"))
  }

  /** Morton (Z-order) bit-interleave of two non-negative integer columns,
    * `bits` bits each: bit j of `x` lands at output bit 2j, bit j of `y`
    * at 2j+1. This is the multi-dimensional clustering key a lakehouse
    * layout pass sorts by (Delta/Iceberg `OPTIMIZE ZORDER BY`): rows close
    * in Z are close in BOTH dimensions, so per-file min/max ranges stay
    * tight on both columns and either predicate prunes files — a
    * one-dimension sort gives tight ranges on that dimension only.
    * Pure integer shifts/masks (whole-stage codegen, zero shuffles to
    * COMPUTE; the layout pass itself is a repartitionByRange on the
    * result). Caller quantizes each dimension into [0, 2^bits) first. */
  def mortonInterleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    // mask into [0, 2^bits) first: an out-of-contract negative input would
    // otherwise sign-extend through shiftright and interleave garbage
    // silently (round-6 advice) — masked, the low `bits` are interleaved
    // and the caller's quantization contract is enforced rather than
    // assumed
    val xm = x.bitwiseAND(lit((1L << bits) - 1))
    val ym = y.bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { j =>
      shiftleft(shiftright(xm, j).bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftright(ym, j).bitwiseAND(lit(1L)), 2 * j + 1)
    }.reduce(_ + _)
  }

  /** Count-min sketch of a JOIN KEY column: (d, b, cnt) cells, depth ×
    * width ≤ a few thousand rows whatever the input size — the mergeable,
    * shippable cardinality artifact (one scan + one small aggregate).
    * Portable md5 hash family, so any engine (and the DuckDB oracle)
    * replicates the cells exactly. */
  def cmsKeySketch(df: DataFrame, keyCol: String,
      depth: Int = 3, width: Int = 1024): DataFrame = {
    import graft.text.TextFns.portableHash
    df.select(explode(array((0 until depth).map(dd =>
        struct(lit(dd).as("d"),
          (portableHash(col(keyCol).cast("string"), lit(s"cms$dd"))
            % width).as("b"))): _*)).as("db"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Join-cardinality estimate from two key sketches: the CMS
    * inner-product estimator (min over depth rows of Σ_b cntA·cntB — an
    * upper bound on the true join size by construction), plus both sides'
    * EXACT row counts, which each sketch carries for free (one depth
    * row's counts sum to the side's cardinality). Everything the join
    * advisor needs from two tiny aggregates — the 100 TB point is that
    * neither input is scanned more than once and nothing corpus-sized
    * moves. */
  def sketchJoinEstimate(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      depth: Int = 3, width: Int = 1024): (Long, Long, Long) = {
    // the sketches are ≤ depth×width rows BY CONSTRUCTION — collecting
    // them is the bounded-dimension collect the advisor exists to enable
    // (the estimate is a driver-side planning step, like AQE's stats read)
    def cells(df: DataFrame, key: String): Map[(Int, Long), Long] =
      cmsKeySketch(df, key, depth, width).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val a = cells(left, leftKey)
    val b = cells(right, rightKey)
    val est = (0 until depth).map { dd =>
      a.iterator.collect { case ((d, bkt), c) if d == dd =>
        b.getOrElse((dd, bkt), 0L) * c }.sum
    }.min
    val lrows = a.iterator.collect { case ((0, _), c) => c }.sum
    val rrows = b.iterator.collect { case ((0, _), c) => c }.sum
    (est, lrows, rrows)
  }

  /** Sketch-ADVISED equi-join — the estimate becomes a PLANNING INPUT
    * instead of a meter: two CMS key sketches are built first (tiny,
    * bounded), then the join strategy is chosen deterministically from
    * what they say —
    *
    *  - smaller side ≤ `broadcastRowBudget` rows → broadcast it (the
    *    shuffle-free plan; at 100 TB this is the decision that saves the
    *    full-table exchange),
    *  - otherwise, inner-product estimate ≤ `hashOutputBudget` → a
    *    `shuffle_hash` hint (hash beats sort-merge when the build side
    *    fits per-partition memory and the output is modest),
    *  - otherwise → a `merge` hint (sort-merge: the spill-safe plan for
    *    a join that is going to be huge no matter what).
    *
    * The RESULT is strategy-independent — identical rows under every
    * branch — which is exactly what lets a correctness oracle ride on the
    * plain join while ScaleSpec pins that the estimate actually flips the
    * physical plan. Decision thresholds are row counts, not bytes, so the
    * choice is engine-replicable and deterministic. The sketch pass costs
    * one extra scan of each input; at scale that is the price of not
    * committing a 100 TB shuffle on a guess (and the sketches are
    * persistable/mergeable artifacts where inputs are append-only). */
  def sketchAdvisedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      broadcastRowBudget: Long = 1000000L,
      hashOutputBudget: Long = 1000000000L,
      depth: Int = 3, width: Int = 1024): DataFrame = {
    val (est, lrows, rrows) =
      sketchJoinEstimate(left, right, leftKey, rightKey, depth, width)
    val cond = left(leftKey) === right(rightKey)
    if (math.min(lrows, rrows) <= broadcastRowBudget) {
      if (rrows <= lrows) left.join(broadcast(right), cond)
      else broadcast(left).join(right, cond)
    } else if (est <= hashOutputBudget) {
      left.hint("shuffle_hash").join(right, cond)
    } else {
      left.hint("merge").join(right, cond)
    }
  }

  /** Write a table bucketed+sorted by join keys — the co-located-join
    * layout: two tables bucketed the same way join with ZERO shuffle
    * (asserted on the physical plan in ScaleSpec). */
  def writeBucketed(
      df: DataFrame, tableName: String, keys: Seq[String], buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
}
