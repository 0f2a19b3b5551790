package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Kernels

/** Drug–drug-interaction merge chain and the CTD drug–gene-interaction
  * admission filter (node_data/drug.py analogs).
  *
  * DDI (drug.py:1169-1186 `merge_all_ddis`): two "sources" — KEGG DDI
  * (drug.py:595-644: contraindication/precaution folded into a pipe-joined
  * recommendation, empty → null, undirected frozenset dedup at :640) and
  * DDInter (drug.py:662-697: level/actions payloads, undirected dedup at
  * :693) — full-outer merged on the ordered (drug1, drug2) key with the
  * shared `source` column pipe-merged (merge_source_column). The reference
  * does NOT re-dedup orientations across sources after the merge; neither
  * do we.
  *
  * DGI (drug.py:863-899 `process_ctd_data`): per-(gene, drug) evidence rows
  * whose action set may contain conflicting increases/decreases-expression
  * markers; a group containing BOTH is excluded entirely (drug.py:874-879 —
  * SURVEY §2.2 P9, [[Kernels.admitUnlessBoth]]).
  *
  * Scale shape: each source aggregates/dedups on its own (drug1, drug2) key
  * (one shuffle each), the outer merge reuses that partitioning, and
  * nothing broadcasts or collects — the chain is linear in input size at
  * any scale factor.
  */
object DdiPipeline {

  private def slice(s: SparkSession, d: String) = Tables.lineitem(s, d)
    .select(
      concat(lit("DB"), col("l_partkey")).as("drug1"),
      concat(lit("DB"), col("l_suppkey")).as("drug2"),
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      col("l_linestatus"), col("l_discount"), col("l_quantity"), col("l_tax"))

  /** KEGG DDI analog: contraindication/precaution flags fold into one
    * pipe-joined recommendation (drug.py:610-628), empty → null
    * (drug.py:637 `replace("", np.nan)`); undirected first-wins dedup
    * under an explicit total order (drug.py:640's arrival-order frozenset
    * drop, made deterministic via the lineitem PK). */
  def keggDdi(s: SparkSession, d: String): DataFrame = {
    val raw = slice(s, d).filter(col("l_returnflag") === "A")
      .withColumn("recommendation",
        graft.core.ColFns.emptyToNull(concat_ws("|",
          when(col("l_discount") > 0.05, "contraindication"),
          when(col("l_quantity") > 25, "precaution"))))
      .withColumn("source", lit("Kegg"))
    Kernels.undirectedDedup(raw, "drug1", "drug2",
      Seq(col("l_orderkey"), col("l_linenumber")))
      .select(col("drug1"), col("drug2"), col("recommendation"), col("source"))
  }

  /** DDInter analog: severity level + pipe-joined actions payloads
    * (drug.py:670-690: DDInter levels are Minor/Moderate/Major, actions a
    * tuple pipe-joined when multiple), undirected first-wins dedup
    * (drug.py:693). */
  def ddinterDdi(s: SparkSession, d: String): DataFrame = {
    val raw = slice(s, d)
      .filter(col("l_returnflag") === "N" && col("l_linestatus") === "F")
      .withColumn("interaction_level",
        when(col("l_tax") < 0.03, "Minor")
          .when(col("l_tax") < 0.06, "Moderate")
          .otherwise("Major"))
      .withColumn("interaction_type",
        graft.core.ColFns.emptyToNull(concat_ws("|",
          when(col("l_discount") > 0.05, "metabolism"),
          when(col("l_quantity") > 25, "serum_concentration"))))
      .withColumn("source", lit("DDInter"))
    Kernels.undirectedDedup(raw, "drug1", "drug2",
      Seq(col("l_orderkey"), col("l_linenumber")))
      .select(col("drug1"), col("drug2"), col("interaction_level"),
        col("interaction_type"), col("source"))
  }

  /** The KEGG × DDInter full-outer merge (drug.py:1177) with pipe-merged
    * source column (drug.py:1180). */
  def merged(s: SparkSession, d: String): DataFrame =
    Kernels.outerMergeChain(
      Seq(keggDdi(s, d), ddinterDdi(s, d)),
      Seq("drug1", "drug2"), pipeCols = Set("source"))
      .select(col("drug1"), col("drug2"), col("source"),
        col("recommendation"), col("interaction_level"),
        col("interaction_type"))

  /** CTD DGI analog with the P9 conflicting-evidence exclusion: group
    * evidence rows per (gene, drug); a group whose action set contains both
    * increases_expression and decreases_expression is dropped whole
    * (drug.py:874-879), otherwise the single action survives with the
    * set-joined references (drug.py:881-898). */
  def dgiCtd(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_suppkey").as("entrez"),
        concat(lit("DB"), col("l_partkey")).as("drug"),
        when(col("l_quantity") > 25, "increases_expression")
          .otherwise("decreases_expression").as("action"),
        concat(lit("ref:"), col("l_orderkey")).as("ref"))
      .groupBy(col("entrez"), col("drug"))
      .agg(collect_set(col("action")).as("__actions"),
        Kernels.setJoinAgg(col("ref")).as("refs"))
      .filter(Kernels.admitUnlessBoth(col("__actions"),
        "increases_expression", "decreases_expression"))
      .select(col("entrez"), col("drug"),
        element_at(col("__actions"), 1).as("action_type"), col("refs"))
}
