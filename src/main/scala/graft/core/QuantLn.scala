package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE sanctioned cross-engine quantized-logarithm idiom — every
  * log-valued score in the engine that must hash-match a DuckDB oracle
  * goes through these helpers (bigram LM scores, token entropy, DSIR
  * importance weights, naive-Bayes log-probs, PSI drift, Adamic-Adar,
  * Gumbel/geometric noise). Centralized so a new log-based query cannot
  * silently reintroduce the cross-engine rounding risk with an ad-hoc
  * `floor(log(x) * 1e6)`.
  *
  * == The 1-ulp policy (shared contract of every helper below) ==
  *
  * `ln` is correctly rounded on NEITHER engine: JVM `Math.log` (Spark)
  * and libm `log` (DuckDB) each guarantee < 1 ulp error, not 0.5. Both
  * are exact at x = 1. Quantizing ⌊ln(x)·10⁶⌋ is therefore
  * cross-engine-stable iff:
  *
  *  1. '''The ARGUMENT is bit-identical on both engines.''' Callers must
  *     feed exact-double arguments: ratios of exact integers whose
  *     products stay ≤ 2⁵³ (see [[graft.ops.DataQuality.psiDrift]]'s
  *     raise_error guard for the enforcement pattern), or ppm uniforms
  *     divided by a power-of-ten literal written identically in the
  *     oracle SQL.
  *  2. '''The true ln·scale does not sit within ~1 ulp of an integer.'''
  *     A 1-ulp disagreement flips the floor only at such a boundary —
  *     probability ~1e-9 per evaluation for data-dependent arguments.
  *     Two audit levels, both in use:
  *      - ''domain audit'' (bounded argument domains): enumerate the
  *        domain and verify no value lands near a boundary — done for
  *        x_dp_release's 999,998 ppm uniforms (nearest boundary ~1e-6
  *        away, >>1 ulp) and g_adamic_adar's integer degrees;
  *      - ''documented residual'' (unbounded data-dependent ratios): a
  *        one-micro flip indicts the quantization boundary, not the
  *        pipeline, and sits orders of magnitude below every decision
  *        threshold built on these scores (see psiDrift's scaladoc).
  *
  * The helpers are intentionally thin — the VALUE is identical to the
  * inline form they replace (same Catalyst AST, oracles unchanged);
  * what's centralized is the contract above.
  */
object QuantLn {

  /** ⌊ln(x)·10⁶⌋ as BIGINT — log scores in integer microunits. */
  def lnMicro(x: Column): Column =
    floor(log(x) * 1000000).cast("long")

  /** ⌊−ln(x)·10⁶⌋ as BIGINT — exponential-tail priorities (Efraimidis–
    * Spirakis weighted sampling, Gumbel perturbation). NOT `-lnMicro(x)`:
    * floor does not commute with negation. */
  def negLnMicro(x: Column): Column =
    floor(-log(x) * 1000000).cast("long")

  /** ⌊−ln(x)⌋ as BIGINT — unit-scale geometric noise via inverse CDF
    * (the x_dp_release mechanism). Callers must domain-audit x (a ppm
    * uniform has 10⁶ values — enumerable). */
  def negLnUnit(x: Column): Column =
    floor(-log(x)).cast("long")

  /** ⌊10⁶ ⁄ ln(x)⌋ as BIGINT — reciprocal-log weights (Adamic-Adar).
    * x must be ≥ 2 (ln 1 = 0 divides by zero); integer x domains are
    * enumerable for the domain audit. */
  def microOverLn(x: Column): Column =
    floor(lit(1000000.0) / log(x)).cast("long")
}
