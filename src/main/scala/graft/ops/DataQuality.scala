package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
