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
}
