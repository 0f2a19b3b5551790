package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ColFns, Tables}
import graft.ops.Kernels

/** Compound–target-interaction pipeline (node_data/compound.py analog).
  *
  * Reference semantics covered: activity pre-filters (assay type 'B',
  * standard_relation '=', compound.py:145,157) → chembl→drugbank broadcast
  * mapping with anti-join for unmappable compounds kept under their chembl
  * CURIE (compound.py:179,391 J7) → per-(compound,target) aggregation with
  * rounded median (A2, compound.py:461-462), ordered-middle document (A3,
  * compound.py:464-474) and source set-union (A8) → semi-join restriction
  * to targets with a qualifying activity (J8, compound.py:379-391).
  *
  * Testdata casting: activities = lineitem ('A'/'F' slice), chembl id =
  * part key, target = supplier key, pchembl = extended price, document =
  * order key; the drugbank mapping covers large parts (p_size > 25).
  */
object CtiPipeline {

  def activities(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
      .select(col("l_partkey").as("chembl"), col("l_suppkey").as("target"),
        col("l_extendedprice").as("pchembl"), col("l_orderkey").as("doc"))

  /** chembl→drugbank dimension (broadcast; the reference's UniChem dict). */
  def drugbankMap(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).filter(col("p_size") > 25)
      .select(col("p_partkey").as("from_id"),
        concat(lit("drugbank:DB"), col("p_partkey")).as("to_id"))

  def interactions(s: SparkSession, d: String): DataFrame = {
    val act = activities(s, d)
    val map = broadcast(drugbankMap(s, d))
    // J4 mapped + J7 anti-join unmapped, unioned under one compound id
    val mapped = act.join(map, col("chembl") === col("from_id"))
      .select(col("to_id").as("compound_id"), col("target"), col("pchembl"), col("doc"))
    val unmapped = act.join(map, col("chembl") === col("from_id"), "left_anti")
      .select(ColFns.curie("chembl", col("chembl")).as("compound_id"),
        col("target"), col("pchembl"), col("doc"))
    val all = mapped.unionByName(unmapped)
    // J8: only targets with at least one strong activity anywhere
    val qualifying = act.filter(col("pchembl") > 20000)
      .select(col("target")).distinct()
    val grouped = all
      .join(broadcast(qualifying), Seq("target"), "left_semi")
      .groupBy(col("compound_id"), col("target"))
      .agg(
        Kernels.median3(col("pchembl")).as("med_pchembl"),
        Kernels.orderedMiddle(col("pchembl")).as("mid_pchembl"),
        count(lit(1)).as("n_activities"),
        Kernels.setJoinAgg(concat(lit("doc:"), col("doc"))).as("refs"))
    grouped
  }

  /** Compound node builder (compound.py:379-401): admission = "MOL"
    * structure type, NOT mapped to drugbank (anti-join against the UniChem
    * dimension — those emit as drugs instead), AND has at least one
    * qualifying activity (semi-join); props conformed to the compound
    * label. */
  def nodes(s: SparkSession, d: String): DataFrame = {
    val act = activities(s, d).select(col("chembl").as("p_partkey")).distinct()
    val mapKeys = drugbankMap(s, d).select(col("from_id").as("p_partkey"))
    val admitted = Tables.part(s, d)
      .filter(col("p_type").startsWith("MEDIUM"))
      .join(broadcast(mapKeys), Seq("p_partkey"), "left_anti")
      .join(act, Seq("p_partkey"), "left_semi")
    val raw = admitted.select(
      ColFns.curie("chembl", concat(lit("CHEMBL"), col("p_partkey"))).as("id"),
      lit("compound").as("label"),
      round(col("p_retailprice"), 3).as("full_mwt"),
      col("p_size").cast("long").as("heavy_atoms"),
      ColFns.escapeProps(col("p_type")).as("smiles"),
      upper(substring(md5(col("p_name")), 1, 14)).as("inchikey"))
    graft.core.SchemaRegistry.conformNodes(raw, "compound")
  }
}
