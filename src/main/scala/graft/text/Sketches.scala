package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-portable sketches. Unlike HLL (whose register layout is
  * library-private and never reproducible across engines), a K-minimum-
  * values sketch built on the portable md5-prefix hash is bit-replicable
  * anywhere — the sketch IS k BIGINTs — so the estimate itself can sit
  * under a DuckDB oracle. At 100 TB the per-group state is k values
  * (mergeable by min-union), vs shuffling every distinct token. */
object Sketches {

  /** Hash space of TextFns.portableHash: md5 hex prefix of 14 nibbles. */
  val HashSpace: Double = math.pow(2, 56)

  /** KMV distinct-token estimate per group: the k-th smallest distinct
    * token hash h₍ₖ₎ estimates distinct-count as (k−1)·2⁵⁶/h₍ₖ₎. Groups
    * with fewer than k distinct hashes fall back to the exact count
    * (kth_hash null). Exact count included for inspection. */
  def kmvDistinctTokens(
      docs: DataFrame, textCol: String, groupCol: String,
      k: Int = 64): DataFrame = {
    val words = docs
      .select(col(groupCol).as("g"),
        explode(TextFns.tokens(col(textCol))).as("word"))
      .distinct()
    val hashes = words
      .select(col("g"), TextFns.portableHash(col("word"), lit("kmv")).as("h"))
      .distinct()
    val kth = hashes
      .withColumn("rn", row_number().over(Window.partitionBy(col("g")).orderBy(col("h"))))
      .filter(col("rn") === k)
      .select(col("g"), col("h").as("kth_hash"))
    val exact = words.groupBy(col("g")).agg(countDistinct(col("word")).as("n_exact"))
    exact.join(kth, Seq("g"), "left")
      .select(col("g").as(groupCol), col("n_exact"), col("kth_hash"),
        when(col("kth_hash").isNull, col("n_exact").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace)
            / col("kth_hash").cast("double")).as("est"))
  }

  /** Mergeable fixed-width-histogram quantile sketch, graded against the
    * exact rank answer — the accuracy-measurement pattern (cf.
    * x_ann_recall): the sketch's bin counts are the only state a 100 TB
    * run would keep (mergeable by cell-wise sum, like the CMS), and the
    * estimate for quantile q is the upper edge of the first bin whose
    * cumulative count reaches ⌈q·N⌉. Output per q: (q, target_rank,
    * est_hi, exact, err) — err is the sketch's overshoot, bounded by
    * binWidth−1 by construction (asserted in the spec).
    *
    * All arithmetic is integer (counts, bin edges) except the one
    * ⌈q·N⌉, which both engines evaluate as a single IEEE multiply+ceil.
    * The cumulative windows run over the BIN/VALUE DOMAIN (bounded:
    * bins, distinct lengths), never over the corpus — the corpus is
    * reduced by a partial-aggregating groupBy first, so the
    * single-partition window input is histogram-sized at any sf. */
  def histogramQuantiles(df: DataFrame, valueCol: String, binWidth: Int = 50,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame = {
    val qArr = array(qs.map(lit): _*)
    val v = df.select(col(valueCol).cast("long").as("val"))
    def cumAndTotal(grouped: DataFrame, ord: String): DataFrame = {
      val wCum = Window.orderBy(col(ord))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy(col(ord))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      grouped
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(wAll))
    }
    val bins = cumAndTotal(
      v.groupBy(floor(col("val") / binWidth.toDouble).cast("long").as("bin"))
        .agg(count(lit(1)).as("cnt")), "bin")
    val sk = bins.withColumn("q", explode(qArr))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col("q"))
      .agg(min(col("bin")).as("minbin"),
        min(ceil(col("q") * col("n")).cast("long")).as("target_rank"))
    val vals = cumAndTotal(
      v.groupBy(col("val")).agg(count(lit(1)).as("cnt")), "val")
    val ex = vals.withColumn("q", explode(qArr))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col("q")).agg(min(col("val")).as("exact"))
    sk.join(ex, Seq("q"))
      .select(col("q"), col("target_rank"),
        ((col("minbin") + 1) * binWidth - 1).as("est_hi"), col("exact"),
        ((col("minbin") + 1) * binWidth - 1 - col("exact")).as("err"))
  }
}
