package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
