package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.QuantLn

/** Generation-evaluation metrics at corpus scale: ROUGE-1 / ROUGE-2 and
  * BLEU-2 over (candidate, reference) text pairs — the eval leg of a
  * training-data pipeline (reference: the CROssBAR dataflows have no text
  * eval; this is brief-driven engine surface, published-metric semantics
  * from Lin 2004 / Papineni et al. 2002).
  *
  * All ratio metrics are EXACT integer ppm — `⌊x·10⁶⌋` of rationals whose
  * numerator/denominator are exact token counts — so the DuckDB oracle
  * hash-matches bit-exact. The one log-valued output goes through
  * [[QuantLn.lnMicro]] under its documented 1-ulp policy (the argument is
  * a product of two exact-integer ratios, identical IEEE expression on
  * both engines).
  *
  * Scale shape: tokens explode to (pair, gram) rows, n-gram counts are a
  * hash aggregate on that key, clipped overlaps an equi-join of the two
  * count sides — every stage is a shuffle on (pair, gram) whose width is
  * bounded by document length, never a cross product; per-pair metrics
  * come back via key-clustered aggregates. (A per-row higher-order-fold
  * form would avoid the shuffles but costs O(len²) per doc — the explode
  * form is the one that survives long documents.)
  */
object GenEval {

  /** Candidate/reference bigram arrays from token arrays (1-based
    * element_at; empty when fewer than 2 tokens — `slice(a,1,0)` keeps
    * the empty branch STRING-typed where `array()` would be NullType). */
  private def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(slice(toks, 1, 0))

  /** Per-pair ROUGE-1 precision/recall/F1, ROUGE-2 F1, BLEU-2 modified
    * precisions, and twice the log-BLEU-2, all quantized:
    *
    *  - `r1_p_ppm` / `r1_r_ppm` = ⌊10⁶·ov₁/|cand|⌋ / ⌊10⁶·ov₁/|ref|⌋
    *  - `r1_f_ppm` = ⌊2·10⁶·ov₁/(|cand|+|ref|)⌋ (the F1 of those exact
    *    rationals — 2PR/(P+R) collapses to 2·ov/(c+r))
    *  - `r2_f_ppm` — same on bigrams, 0 when both bigram sets are empty
    *  - `bleu_p2_ppm` = ⌊10⁶·ov₂/|cand₂|⌋ (p₁ ≡ r1_p), NULL when the
    *    candidate has no bigrams
    *  - `bleu2_2xlog_micro` = twice log BLEU-2 in micro units:
    *    brevity `⌊2·10⁶·(1−|ref|/|cand|)⌋` (0 when |cand| ≥ |ref|) plus
    *    `lnMicro(p₁·p₂)` (= ⌊(ln p₁ + ln p₂)·10⁶⌋ up to the documented
    *    1-ulp residual); NULL when either clipped overlap is 0 (log of 0)
    *    or the candidate has no bigrams. Doubled so the weights ½,½ stay
    *    integer — callers exponentiate `x/2·10⁻⁶` downstream.
    *
    * Clipped overlap ovₙ = Σ_g min(count_cand(g), count_ref(g)) — the
    * standard modified-precision numerator. `ov₁ ≥ 1` is guaranteed
    * nothing: disjoint texts yield 0 across the board.
    *
    * `pairs` must carry one row per (idCol, candCol, refCol); ids must be
    * unique (they key the joins back together). Tokenization is the
    * engine-wide whitespace convention ([[TextFns.tokens]]).
    */
  def rougeBleuPairs(pairs: DataFrame, idCol: String,
      candCol: String, refCol: String): DataFrame = {
    val base = pairs.select(col(idCol),
      TextFns.tokens(col(candCol)).as("__c1"),
      TextFns.tokens(col(refCol)).as("__r1"))
      .withColumn("__c2", bigrams(col("__c1")))
      .withColumn("__r2", bigrams(col("__r1")))

    def gramCounts(arr: String, out: String): DataFrame = base
      .select(col(idCol), explode(col(arr)).as("__g"))
      .groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as(out))

    def clipped(cArr: String, rArr: String, out: String): DataFrame =
      gramCounts(cArr, "__cn")
        .join(gramCounts(rArr, "__rn"), Seq(idCol, "__g"))
        .groupBy(col(idCol))
        .agg(sum(least(col("__cn"), col("__rn"))).as(out))

    val lens = base.select(col(idCol),
      size(col("__c1")).cast("long").as("c1_len"),
      size(col("__r1")).cast("long").as("r1_len"),
      size(col("__c2")).cast("long").as("c2_len"),
      size(col("__r2")).cast("long").as("r2_len"))

    def ppm(num: Column, den: Column): Column =
      floor(num * lit(1000000.0) / den).cast("long")

    val withOv = lens
      .join(clipped("__c1", "__r1", "__ov1"), Seq(idCol), "left")
      .join(clipped("__c2", "__r2", "__ov2"), Seq(idCol), "left")
      .select(col(idCol), col("c1_len"), col("r1_len"),
        col("c2_len"), col("r2_len"),
        coalesce(col("__ov1"), lit(0L)).as("ov1"),
        coalesce(col("__ov2"), lit(0L)).as("ov2"))

    val p1 = col("ov1").cast("double") / col("c1_len")
    val p2 = col("ov2").cast("double") / col("c2_len")
    withOv.select(col(idCol),
      col("c1_len"), col("r1_len"), col("ov1"), col("ov2"),
      ppm(col("ov1"), col("c1_len")).as("r1_p_ppm"),
      ppm(col("ov1"), col("r1_len")).as("r1_r_ppm"),
      ppm(col("ov1") * 2, col("c1_len") + col("r1_len")).as("r1_f_ppm"),
      when(col("c2_len") + col("r2_len") === 0, lit(0L))
        .otherwise(ppm(col("ov2") * 2, col("c2_len") + col("r2_len")))
        .as("r2_f_ppm"),
      when(col("c2_len") === 0, lit(null).cast("long"))
        .otherwise(ppm(col("ov2"), col("c2_len"))).as("bleu_p2_ppm"),
      when(col("ov1") === 0 || col("ov2") === 0 || col("c2_len") === 0,
        lit(null).cast("long"))
        .otherwise(
          when(col("c1_len") >= col("r1_len"), lit(0L))
            .otherwise(floor((col("c1_len") - col("r1_len")) *
              lit(2000000.0) / col("c1_len")).cast("long")) +
          QuantLn.lnMicro(p1 * p2))
        .as("bleu2_2xlog_micro"))
  }
}
