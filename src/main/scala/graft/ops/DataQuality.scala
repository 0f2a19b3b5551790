package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality verification (the Deequ/dbt-test shape): each
  * constraint evaluates to ONE violation-count row, and a suite is the
  * union of its constraint rows with a passed verdict per row. Keeping
  * every check a violation COUNT (not a boolean) makes the output
  * actionable (how broken?) and the oracle a plain aggregate.
  *
  * Scale: every check is either a single conditional aggregation over one
  * scan (null / predicate / domain checks compose into ONE pass when they
  * share a table — Catalyst merges the sums), a groupBy-HAVING on the
  * candidate key (uniqueness), or a broadcast/shuffle anti-join
  * (referential integrity). Nothing collects; a suite over a 100 TB fact
  * table is bounded by one scan per table + one shuffle per key check.
  */
object DataQuality {

  /** Split-conformal coverage audit (Vovk et al.; the distribution-free
    * prediction-interval recipe): per group, the calibration half fits the
    * trivial mean predictor, nonconformity is |value − mean| in EXACT
    * integer units (both sides of |vq·n − Σvq| are BIGINTs from the house
    * ⌊value·10⁶⌋ quantization — no double means, no rounding divergence),
    * the threshold q̂ is the ⌈(n+1)(1−α)⌉-th smallest calibration score
    * (exact order statistic via the distinct-value rank-select idiom: the
    * cumulative window runs above a (group, score) aggregation, never raw
    * rows), and the held-out half reports its empirical coverage at q̂ in
    * ppm (integer division — cross-engine exact). α is passed as the
    * rational alphaNumer/alphaDenom so the rank is pure integer math.
    *
    * Scale: two conditional aggregations over one scan (cal stats / test
    * verdicts), a distinct-score aggregation, and three broadcast joins of
    * per-group one-row frames — the group domain is bounded, the corpus
    * never shuffles on anything but the group key. Overflow guard:
    * vq·n_cal needs |value|·10⁶·n_cal < 2⁶³, and the limit is ENFORCED —
    * each group's max(|vq|) is checked against Long.MaxValue / n_cal and
    * a violating group raises a runtime error naming the group and the
    * fix (switch the score to |vq − Σvq div n|, one exact integer
    * division) rather than producing silently wrong thresholds.
    *
    * Output: (grp, n_cal, r, qhat, n_test, covered, coverage_ppm). Groups
    * whose calibration half is empty, or too small for the rank
    * (r > n_cal), drop — identically on both engines. */
  def conformalCoverage(df: DataFrame, grp: String, value: Column,
      calSide: Column, alphaNumer: Int = 1, alphaDenom: Int = 10): DataFrame = {
    require(alphaNumer >= 1 && alphaNumer < alphaDenom,
      "alpha must be a proper positive fraction")
    val keep = alphaDenom - alphaNumer
    val q = df.select(col(grp).as("__g"), calSide.as("__cal"),
      floor(value * lit(1000000d)).cast("long").as("__vq"))
    val cs = q.filter(col("__cal"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_cal"), sum(col("__vq")).as("__s"),
        max(abs(col("__vq"))).as("__m"))
    // overflow guard (round-6 advice): the |vq·n_cal − Σvq| score needs
    // |vq|·n_cal < 2⁶³ — fail LOUDLY per offending group instead of
    // computing wrong thresholds; n_cal flows through this checked column
    // so every downstream product is covered
    // exact integer threshold: `div` (not `/`, which is DOUBLE division —
    // Long.MaxValue has no double representation, so values within ~1024
    // of the limit could pass the check and still overflow)
    val nCalChecked = when(
      col("__m") <= expr(s"${Long.MaxValue}L div n_cal"), col("n_cal"))
      .otherwise(raise_error(concat(
        lit("conformalCoverage: |value|*1e6*n_cal overflows Int64 for group "),
        col("__g").cast("string"),
        lit(" — switch the score to the |vq - s div n| form"))))
    // r = ceil((n_cal+1)·keep/den), all-integer
    val rr = cs.select(col("__g"), nCalChecked.as("n_cal"), col("__s"),
      expr(s"((n_cal + 1) * $keep + ${alphaDenom - 1}) div $alphaDenom")
        .as("r"))
    def scores(side: Column) = q.filter(side)
      .join(broadcast(rr), Seq("__g"))
      .withColumn("__score", abs(col("__vq") * col("n_cal") - col("__s")))
    // distinct-value rank-select for the exact order statistic: the
    // cumulative count runs over (group, score) AGGREGATES (policy-clean)
    val dist = scores(col("__cal"))
      .groupBy(col("__g"), col("__score")).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__score").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val qh = dist.withColumn("__cum", sum(col("__c")).over(w))
      .join(broadcast(rr.select(col("__g"), col("r"))), Seq("__g"))
      .filter(col("__cum") >= col("r"))
      .groupBy(col("__g")).agg(min(col("__score")).as("qhat"))
    scores(!col("__cal"))
      .join(broadcast(qh), Seq("__g"))
      .groupBy(col("__g"), col("n_cal"), col("r"), col("qhat"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__score") <= col("qhat"), 1L).otherwise(0L))
          .as("covered"))
      .select(col("__g").as(grp), col("n_cal"), col("r"), col("qhat"),
        col("n_test"), col("covered"),
        expr("covered * 1000000 div n_test").as("coverage_ppm"))
  }

  /** Isotonic (PAV) fit over a bin table (bin, n, pos) via the minimax
    * identity iso(b) = max_{i≤b} min_{j≥b} rate_ppm(i..j), where
    * rate_ppm(i..j) = pos(i..j)·10⁶ div n(i..j) is ppm-FLOORED before
    * the minimax — both engines select over identical integers, and the
    * result stays monotone non-decreasing because each lattice argument
    * is monotone in b (proven in DataQualitySpec; on exactly-divisible
    * rates the floored minimax IS pool-adjacent-violators). Everything
    * here runs on the bin table: prefix sums over the bin aggregate, an
    * O(bins²) interval self-join, two grouped minimax passes — plan
    * constants when bins are bounded (they are: a calibration curve).
    * Output: (bin, n, pos, iso_ppm). */
  def isotonicBinsPpm(bins: DataFrame): DataFrame = {
    val wB = Window.orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = bins.select(col("bin"), col("n"), col("pos"),
      sum(col("n")).over(wB).as("cn"), sum(col("pos")).over(wB).as("cp"))
    val iv = cum.select(col("bin").as("i"),
        (col("cn") - col("n")).as("pn"), (col("cp") - col("pos")).as("pp"))
      .join(cum.select(col("bin").as("j"), col("cn"), col("cp")),
        col("i") <= col("j"))
      .select(col("i"), col("j"),
        expr("(cp - pp) * 1000000 div (cn - pn)").as("rate_ppm"))
    val m = iv.join(bins.select(col("bin").as("bb")),
        col("i") <= col("bb") && col("j") >= col("bb"))
      .groupBy(col("i"), col("bb")).agg(min(col("rate_ppm")).as("mn"))
    val iso = m.groupBy(col("bb")).agg(max(col("mn")).as("iso_ppm"))
    bins.join(iso, col("bin") === col("bb"))
      .select(col("bin"), col("n"), col("pos"), col("iso_ppm"))
  }

  /** Rows where `c` is null. */
  def nullCheck(df: DataFrame, name: String, c: String): DataFrame =
    df.agg(count(when(col(c).isNull, lit(1))).as("metric"))
      .select(lit(name).as("check_name"), col("metric"))

  /** Rows violating an arbitrary row-level predicate (pass the VIOLATION
    * condition). */
  def predicateCheck(df: DataFrame, name: String, violation: Column): DataFrame =
    df.agg(count(when(violation, lit(1))).as("metric"))
      .select(lit(name).as("check_name"), col("metric"))

  /** Number of key values occurring more than once. */
  def uniqueCheck(df: DataFrame, name: String, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .agg(count(lit(1)).as("metric"))
      .select(lit(name).as("check_name"), col("metric"))

  /** Child rows whose foreign key has no parent (null FKs are orphans of
    * the completeness check, not this one — they are excluded, matching
    * NOT EXISTS semantics). */
  def fkCheck(child: DataFrame, name: String, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("metric"))
      .select(lit(name).as("check_name"), col("metric"))

  /** Union the constraint rows into one verdict table. */
  def suite(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_))
      .select(col("check_name"), col("metric"),
        (col("metric") === 0).as("passed"))

  /** Column profile — the discovery pass a pipeline runs before writing
    * constraints (what a `describe`/Deequ-analyzer emits): one row per
    * profiled column with row/null/distinct counts, lexicographic min/max
    * and mean value length. Columns are pre-cast to STRING by the caller
    * (floats excluded — their formatting is engine-specific), so min/max
    * are string-ordered: deterministic and oracle-replicable, documented
    * as such.
    *
    * Shape: the profiled columns UNPIVOT to (col_name, v) rows — k×|rows|
    * of them — then a two-level aggregation: (col_name, v) partial counts
    * first (this also carries the distinct), then per-column rollup.
    * Both are content-keyed shuffles with map-side partial aggregation;
    * nothing is quadratic in rows or columns. The distinct count is EXACT
    * here; at 100 TB swap the first level for the portable HLL/KMV
    * sketches in [[graft.text.Sketches]] when exactness isn't required. */
  /** k-anonymity audit: the re-identification risk table over a
    * quasi-identifier tuple — each QI combination's population and
    * whether it falls below the anonymity threshold `k` (a group of
    * size < k re-identifies its members; the audit a privacy-preserving
    * data release runs before publishing). One hash aggregation on the
    * QI key — map-side partial, content-keyed shuffle, no windows;
    * bounded by the QI value domain at any corpus size. */
  def kAnonymity(df: DataFrame, qi: Seq[String], k: Int): DataFrame =
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("at_risk", col("group_size") < k)

  /** l-diversity audit — k-anonymity's companion: a QI group whose
    * members all share ONE sensitive value leaks that value even when the
    * group is large (the homogeneity attack). Per QI group: size, number
    * of distinct sensitive values, and whether it reaches `l`. Same
    * QI-domain-bounded single aggregation as [[kAnonymity]] (the distinct
    * count rides the same shuffle). */
  def lDiversity(df: DataFrame, qi: Seq[String], sensitive: Column,
      l: Int): DataFrame =
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)

  /** Population-Stability-Index drift between two corpus snapshots — the
    * monitoring metric that flags a distribution shift at ingest (new
    * crawl vs reference). Input: one row per item with `snap` ∈ {0, 1}
    * (0 = reference, 1 = candidate) and `bin` (the caller's deterministic
    * value coarsening). Output: one row per bin with add-one-smoothed
    * counts, integer ppm shares, the quantized log-ratio and the bin's
    * PSI contribution (Σ psi_pico ·10⁻¹² = the classic PSI; > 0.2 ⇒
    * actionable drift).
    *
    * Integer carry: shares are exact `c·10⁶ div n`; the log-ratio is
    * computed on the EXACT product form ln((ca·nb)/(cb·na)) — add-one
    * smoothing keeps every factor ≥ 1 (no ln 0), and each product must
    * stay ≤ 2⁵³ for the double quotient to be exact (≈ 9·10¹⁵ — beyond
    * that the guard raises rather than silently drifting, the PMI-guard
    * discipline). psi_pico = (pa_ppm − pb_ppm)·lr_micro — |ppm| ≤ 10⁶ and
    * |lr_micro| ≤ ~3·10⁷, so each term is ≪ 2⁶³.
    *
    * Scale: one hash aggregation over the bin domain + a one-row totals
    * broadcast — never a shuffle of the raw rows beyond the bin count.
    *
    * Residual cross-engine risk (documented, not eliminated): the quotient
    * (ca*nb)/(cb*na) is exact in double, but `ln` itself is correctly-
    * rounded on neither JVM `Math.log` nor libm — both guarantee < 1 ulp,
    * not 0.5. A ratio whose true 1e6*ln lands within ~1 ulp of an integer
    * (probability ~1e-9 per bin for data-dependent ratios; zero at r = 1
    * where ln is exact) can floor differently across engines, flipping
    * lr_micro by 1. Unlike g_adamic_adar's bounded degree domain, these
    * arguments are data-dependent and cannot be pre-checked; a one-micro
    * disagreement here indicts the quantization boundary, not the
    * pipeline — the decision threshold (0.2 PSI = 2e11 pico) sits ten
    * orders of magnitude above a single flip. Exact adjudication would
    * need integer bounds on e^(k/1e6), out of proportion to a monitoring
    * metric. */
  def psiDrift(binned: DataFrame): DataFrame = {
    val c = binned.groupBy(col("bin")).agg(
      (count(when(col("snap") === 0, lit(1))) + 1).as("ca"),
      (count(when(col("snap") === 1, lit(1))) + 1).as("cb"))
    val t = c.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val bound = lit(9000000000000000L) // 9e15 < 2^53: exact-double bound
    c.crossJoin(broadcast(t))
      .withColumn("pa_ppm", expr("ca * 1000000 div na"))
      .withColumn("pb_ppm", expr("cb * 1000000 div nb"))
      .withColumn("lr_micro",
        when(col("ca") * col("nb") <= bound && col("cb") * col("na") <= bound,
          graft.core.QuantLn.lnMicro((col("ca") * col("nb")).cast("double") /
            (col("cb") * col("na")).cast("double")))
          .otherwise(raise_error(concat(
            lit("psiDrift: smoothed-count product exceeds the exact-double " +
              "bound (pre-aggregate or subsample the reference; see " +
              "scaladoc); ca="), col("ca"), lit(" nb="), col("nb")))))
      .withColumn("psi_pico", (col("pa_ppm") - col("pb_ppm")) * col("lr_micro"))
      .select(col("bin"), col("ca"), col("cb"), col("pa_ppm"), col("pb_ppm"),
        col("lr_micro"), col("psi_pico"))
  }

  /** Exact pairwise covariance/variance numerators between numeric
    * columns, carried in DECIMAL(38,0) so nothing overflows or rounds:
    * cov_num = n·Σxy − Σx·Σy (= n² · covariance), var_num likewise —
    * the correlation's sign and any downstream ratio derive exactly.
    * Inputs must already be integer-quantized (cents/ppm) LONG columns.
    * The decimal totals leave the query as STRINGS — plain digit strings
    * are the one representation both engines (int128 vs Decimal) print
    * identically, the same boundary discipline as [[graft.Q.pipeBoundary]].
    *
    * Scale: ONE scan of the fact table computing every Σx/Σx²/Σxy
    * partial-aggregated (Catalyst folds all pairs into a single hash
    * aggregate with no keys); the pair assembly is a per-row explode of a
    * one-row frame. Decimal aggregation is exact at any corpus size the
    * 38-digit width holds (10³⁸ ≫ any 100 TB sum of 64-bit products). */
  def exactCorrelation(df: DataFrame, cols: Seq[String]): DataFrame = {
    def d(c: Column) = c.cast("decimal(38,0)")
    val pairs = cols.combinations(2).map { case Seq(x, y) => (x, y) }.toSeq
    val sums = df.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      (cols.map(c => Seq(
        sum(d(col(c))).as(s"s_$c"),
        sum((d(col(c)) * d(col(c))).cast("decimal(38,0)")).as(s"ss_$c"))) ++
        pairs.map { case (x, y) => Seq(
          sum((d(col(x)) * d(col(y))).cast("decimal(38,0)")).as(s"sp_${x}_$y")) })
        .flatten: _*)
    sums.select(explode(array(pairs.map { case (x, y) =>
      struct(
        lit(x).as("x_col"), lit(y).as("y_col"),
        col("n").cast("long").as("n"),
        (col("n") * col(s"sp_${x}_$y") - col(s"s_$x") * col(s"s_$y"))
          .cast("decimal(38,0)").cast("string").as("cov_num"),
        (col("n") * col(s"ss_$x") - col(s"s_$x") * col(s"s_$x"))
          .cast("decimal(38,0)").cast("string").as("var_num_x"),
        (col("n") * col(s"ss_$y") - col(s"s_$y") * col(s"s_$y"))
          .cast("decimal(38,0)").cast("string").as("var_num_y"))
    }: _*)).as("p"))
      .select(col("p.*"))
  }

  /** Poisson-bootstrap confidence interval for a corpus mean — the
    * MAP-SIDE bootstrap big-data systems use because the classic
    * multinomial resample needs global coordination: each row contributes
    * Poisson(1) copies to each of `b` resamples, drawn by inverse-CDF on
    * a deterministic md5 ppm uniform (cumulative thresholds 367879,
    * 735758, 919698, 981011, 996340, 999405 — Poisson(1) quantized to
    * ppm, tail capped at 6 copies (draws past the last threshold take
    * `thresholds.size` = 6, mirrored by the oracle's ELSE 6); the SEEDED
    * draw is what makes the CI bit-replicable, the x_dp_release
    * discipline. A resample whose total copy count is 0 would yield a
    * NULL mean via `div` — vanishingly unlikely at realistic N (p ≈
    * e^(-0.632·N) per resample) and excluded by the rank selection only
    * when it occurs; documented rather than special-cased). Resample
    * means carry
    * exact integer milli-units (Σ copies·v ·1000 div Σ copies); the
    * percentile CI rank-selects over the b-row resample table.
    *
    * Scale: one corpus scan exploded ×b (map-side; no index join, no
    * per-resample shuffle of the data) + one b-row aggregation + a b-row
    * window — the coordination-free shape, cost linear in b·N.
    *
    * Output: ONE row (point_milli, ci_lo_milli, ci_hi_milli,
    * b_resamples), CI at ranks ⌈0.025·b⌉ / ⌈0.975·b⌉ of the resample
    * means. */
  /** Neyman (variance-optimal) sample allocation across strata — the
    * survey-sampling answer to "split an annotation/eval budget over
    * corpus strata": stratum h gets budget · N_h·σ_h ⁄ Σ_k N_k·σ_k,
    * which minimizes the stratified-mean variance at fixed budget
    * (proportional allocation is the σ-uniform special case).
    *
    * Determinism carry: the variance NUMERATOR n·Σx² − (Σx)² is exact in
    * DECIMAL(38,0) over integer-quantized values; σ enters as
    * sqrt(CAST(num AS DOUBLE))⁄n — IEEE sqrt and division are
    * CORRECTLY-rounded ops (unlike ln), so σ is bit-identical on both
    * engines from identical exact inputs; the weight N_h·σ_h is then
    * quantized to micro units (⌊·10⁶⌋ BIGINT) so the cross-strata total
    * is an ORDER-FREE integer sum and every later step is integral:
    * floor share budget·w_micro div W, largest-remainder top-up ranked
    * by (remainder desc, stratum asc) over the strata DOMAIN (bounded —
    * the window sits above the aggregation). Σ alloc = budget exactly
    * (when W > 0). Single-row strata have σ = 0 and draw only
    * remainder-rank allocation.
    * Output: (stratum, n_rows, w_micro, alloc). */
  def neymanAllocation(
      df: DataFrame, strataCol: String, valueCol: String,
      budget: Long): DataFrame = {
    def d(c: Column) = c.cast("decimal(38,0)")
    val per = df.groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).as("n_rows"),
        sum(d(col(valueCol))).as("s1"),
        sum((d(col(valueCol)) * d(col(valueCol))).cast("decimal(38,0)"))
          .as("s2"))
      .withColumn("var_num",
        (col("n_rows") * col("s2") - col("s1") * col("s1"))
          .cast("decimal(38,0)"))
      .withColumn("sigma",
        sqrt(col("var_num").cast("double")) / col("n_rows"))
      .withColumn("w_micro",
        floor(col("n_rows") * col("sigma") * 1000000).cast("long"))
    val tot = per.agg(sum(col("w_micro")).as("w_total"))
    val withFl = per.crossJoin(broadcast(tot))
      .withColumn("fl", when(col("w_total") > 0,
        expr(s"$budget * w_micro div w_total")).otherwise(0L))
      .withColumn("rem", when(col("w_total") > 0,
        expr(s"$budget * w_micro % w_total")).otherwise(0L))
    val flTot = withFl.agg(sum(col("fl")).as("fl_total"))
    val wRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("stratum").asc)
    withFl.crossJoin(broadcast(flTot))
      .withColumn("rr", row_number().over(wRem))
      .select(col("stratum"), col("n_rows"), col("w_micro"),
        // all-zero weights (every stratum constant) → Neyman is undefined;
        // allocate NOTHING rather than spraying the budget arbitrarily
        (col("fl") + when(col("w_total") > 0 &&
          col("rr") <= lit(budget) - col("fl_total"), 1L).otherwise(0L))
          .as("alloc"))
  }

  def bootstrapMeanCi(
      df: DataFrame, idCol: String, valueCol: String, seed: String,
      b: Int = 40): DataFrame = {
    import graft.text.TextFns.portableHash
    val thresholds = Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L)
    val u = pmod(portableHash(
      concat(lit(seed + ":"), col("__b").cast("string"),
        lit(":"), col("__id")),
      lit("boot")), lit(1000000L))
    val copies = thresholds.zipWithIndex
      .foldRight(lit(thresholds.size): Column) { case ((t, k), els) =>
        when(u < t, lit(k)).otherwise(els)
      }
    val v = col(valueCol).cast("long")
    val resamples = df
      .select(v.as("__v"), col(idCol).cast("string").as("__id"))
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__c", copies.cast("long"))
      .groupBy(col("__b"))
      .agg((sum(col("__c") * col("__v")) * 1000).as("__s"),
        sum(col("__c")).as("__n"))
      .select(col("__b"), expr("__s div __n").as("mean_milli"))
    val point = df.select(v.as("__v"))
      .agg((sum(col("__v")) * 1000).as("__s"), count(lit(1)).as("__n"))
      .select(expr("__s div __n").as("point_milli"))
    val wAsc = org.apache.spark.sql.expressions.Window
      .orderBy(col("mean_milli").asc, col("__b").asc)
    val ranked = resamples
      .withColumn("__r", row_number().over(wAsc)) // b-row window, bounded
    val loRank = math.ceil(0.025 * b).toLong.max(1L)
    val hiRank = math.ceil(0.975 * b).toLong
    ranked.agg(
        min(when(col("__r") === loRank, col("mean_milli"))).as("ci_lo_milli"),
        min(when(col("__r") === hiRank, col("mean_milli"))).as("ci_hi_milli"))
      .crossJoin(broadcast(point))
      .select(col("point_milli"), col("ci_lo_milli"), col("ci_hi_milli"),
        lit(b.toLong).as("b_resamples"))
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stacked = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
      .as("s"))
      .select(col("s.col_name"), col("s.v"))
    val perValue = stacked.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("n"))
    perValue.groupBy(col("col_name")).agg(
      sum(col("n")).as("n_rows"),
      coalesce(sum(when(col("v").isNull, col("n"))), lit(0L)).as("n_null"),
      count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"),
      (sum(when(col("v").isNotNull, length(col("v")) * col("n")))
        / sum(when(col("v").isNotNull, col("n")))).as("avg_len"))
  }
}
