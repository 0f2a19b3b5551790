package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** EC-number hierarchy node/edge builder — the Spark re-expression of the
  * reference's ec module (node_data/ec.py): one node per hierarchy level
  * of every dotted EC code with an escaped name prop (get_nodes :108-172 —
  * the reference walks a 4-level nested dict; level-4 names additionally
  * drop '.' characters :151), and one child→parent `is_a` edge per level
  * (get_ec_hierarchy_edges :187-215).
  *
  * Analog mapping: 4-level dotted codes derive deterministically from
  * p_partkey residues; level names come from the lexicographically first
  * part (min — the distributed stand-in for the reference's dict insert
  * order) with the reference's own escaping (| → ',', ' → '^').
  *
  * Scale: four hash aggregates over part (one per level) + unions —
  * no joins at all; the nested driver-side loop of the reference becomes
  * fully distributed level projections.
  */
object EcPipeline {

  private def withCodes(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(col("p_partkey"), col("p_type"), col("p_name"))
      .withColumn("l1", (col("p_partkey") % 6 + 1).cast("string"))
      .withColumn("l2", concat_ws(".", col("l1"),
        (col("p_partkey") % 8 + 1).cast("string")))
      .withColumn("l3", concat_ws(".", col("l2"),
        (col("p_partkey") % 5 + 1).cast("string")))
      .withColumn("l4", concat_ws(".", col("l3"),
        (col("p_partkey") % 97 + 1).cast("string")))

  private def esc(c: Column): Column = translate(c, "|'", ",^")

  /** One node per distinct code at every level; name = escaped min source
    * string (levels 1–3 from p_type, level 4 from p_name with dots
    * stripped, mirroring ec.py:151). */
  def nodes(s: SparkSession, d: String): DataFrame = {
    val p = withCodes(s, d)
    def level(lvl: String, src: String, stripDots: Boolean): DataFrame = {
      val name0 = esc(min(col(src)))
      val name = if (stripDots) regexp_replace(name0, "\\.", "") else name0
      p.groupBy(col(lvl).as("code")).agg(name.as("name"))
        .select(concat(lit("eccode:"), col("code")).as("id"),
          lit("ec_number").as("label"), col("name"))
    }
    level("l1", "p_type", stripDots = false)
      .unionByName(level("l2", "p_type", stripDots = false))
      .unionByName(level("l3", "p_type", stripDots = false))
      .unionByName(level("l4", "p_name", stripDots = true))
  }

  /** Child→parent hierarchy edges at every level (distinct per level;
    * levels cannot collide — ids differ in dot count). */
  def edges(s: SparkSession, d: String): DataFrame = {
    val p = withCodes(s, d)
    def level(child: String, parent: String): DataFrame =
      p.select(concat(lit("eccode:"), col(child)).as("src"),
        concat(lit("eccode:"), col(parent)).as("dst")).distinct()
    level("l4", "l3").unionByName(level("l3", "l2")).unionByName(level("l2", "l1"))
      .withColumn("label", lit("ec_number_is_a_ec_number"))
  }
}
