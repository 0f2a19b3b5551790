package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Kernels

/** Disease–drug and disease–disease (DDA) edge merges
  * (node_data/disease.py analogs) — the two edge chains of disease.py that
  * had no named analog after round 2 (gene–disease is GeneDiseasePipeline).
  *
  * Disease–drug (disease.py:1166-1205 `merge_disease_drug_edge_data`):
  * three sources — CTD chemical–disease (disease.py:563-601: therapeutic
  * evidence only, pubmed ids pipe-merged per (disease, drug) group), ChEMBL
  * drug indication (disease.py:603-638: max_phase > 0, sort by phase desc +
  * drop_duplicates keep-first), KEGG drug indication (disease.py:640-689:
  * bare distinct pairs) — chained CHEMBL ⟕⟖ CTD ⟕⟖ KEGG with pipe-merged
  * `source`.
  *
  * DDA (disease.py:1089-1121 + 1326-1343 `merge_disease_disease_edge_data`):
  * DisGeNET jaccard-by-genes and jaccard-by-variants frames (3-dp rounded
  * score, zero-score rows dropped, score-desc undirected frozenset dedup at
  * disease.py:1103-1104/1119-1120), outer-merged on the ordered pair with
  * pipe-merged source, then the post-merge self-pair filter
  * (disease.py:1336).
  *
  * Scale shape: per-source aggregation/dedup shuffles once on its own key;
  * the outer merges reuse that partitioning; no broadcasts, no collects.
  */
object DiseaseEdgesPipeline {

  private def slice(s: SparkSession, d: String) = Tables.lineitem(s, d)
    .select(
      concat(lit("mondo:"), col("l_partkey")).as("disease_id"),
      concat(lit("DB"), col("l_suppkey")).as("drug_id"),
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      col("l_linestatus"), col("l_quantity"), col("l_discount"), col("l_tax"))

  /** CTD chemical–disease analog: therapeutic-evidence rows grouped per
    * (disease, drug) with pipe-merged pubmed refs (disease.py:594-598's
    * groupby + merge_source_column over pubmed_ids). */
  def ctd(s: SparkSession, d: String): DataFrame =
    slice(s, d).filter(col("l_returnflag") === "A")
      .groupBy(col("disease_id"), col("drug_id"))
      .agg(Kernels.setJoinAgg(concat(lit("pmid:"), col("l_orderkey")))
        .as("pubmed_ids"))
      .withColumn("source", lit("CTD"))

  /** ChEMBL drug-indication analog: max_phase > 0 admission
    * (disease.py:617), then keep the best row per (disease, drug) under
    * phase-desc order (disease.py:633-635's sort_values + drop_duplicates,
    * made deterministic with the lineitem PK tie-breaker). */
  def chembl(s: SparkSession, d: String): DataFrame = {
    val raw = slice(s, d).filter(col("l_returnflag") === "N")
      .withColumn("max_phase", floor(col("l_quantity") / 10).cast("double"))
      .filter(col("max_phase") > 0.0)
    Kernels.keepBestPerKey(raw, Seq("disease_id", "drug_id"),
      Seq(col("max_phase").desc, col("l_orderkey"), col("l_linenumber")))
      .select(col("disease_id"), col("drug_id"), col("max_phase"))
      .withColumn("source", lit("ChEMBL"))
  }

  /** KEGG drug-indication analog: distinct (disease, drug) pairs
    * (disease.py:683-686). */
  def kegg(s: SparkSession, d: String): DataFrame =
    slice(s, d).filter(col("l_returnflag") === "R")
      .select(col("disease_id"), col("drug_id")).distinct()
      .withColumn("source", lit("KEGG"))

  /** CHEMBL ⟕⟖ CTD ⟕⟖ KEGG (disease.py:1177,1186) with pipe-merged
    * source. */
  def diseaseDrugMerged(s: SparkSession, d: String): DataFrame =
    Kernels.outerMergeChain(
      Seq(chembl(s, d), ctd(s, d), kegg(s, d)),
      Seq("disease_id", "drug_id"), pipeCols = Set("source"))
      .select(col("disease_id"), col("drug_id"), col("source"),
        col("max_phase"), col("pubmed_ids"))

  /** One DisGeNET DDA source: 3-dp rounded score, zero-score rows dropped
    * (disease.py:1093), score-desc undirected dedup preserving the winner's
    * orientation (disease.py:1103-1104). */
  private def ddaSource(
      base: DataFrame, scoreCol: org.apache.spark.sql.Column,
      scoreName: String, source: String): DataFrame = {
    val raw = base
      .withColumn(scoreName, round(scoreCol, 3))
      .filter(col(scoreName) =!= 0.0)
      .withColumn("source", lit(source))
    Kernels.undirectedDedup(raw, "disease_id1", "disease_id2",
      Seq(col(scoreName).desc, col("l_orderkey"), col("l_linenumber")))
      .select(col("disease_id1"), col("disease_id2"), col(scoreName),
        col("source"))
  }

  private def ddaSlice(s: SparkSession, d: String) = Tables.lineitem(s, d)
    .select(
      concat(lit("mondo:"), col("l_partkey")).as("disease_id1"),
      concat(lit("mondo:"), col("l_suppkey")).as("disease_id2"),
      col("l_orderkey"), col("l_linenumber"), col("l_linestatus"),
      col("l_discount"), col("l_tax"))

  /** Disease node builder (disease.py:1355-1407 `get_nodes`): one
    * mondo_disease node per non-obsolete MONDO term (negative-balance
    * customers stand in for obsolete terms), name and synonyms escaped
    * (`'`→`^`, `|`→`,`, disease.py:1371-1378), per-database xref props
    * only where that xref exists (disease.py:1380-1383), conformed to the
    * configured field subset (P10). */
  def diseaseNodes(s: SparkSession, d: String): DataFrame = {
    import graft.core.ColFns
    val raw = Tables.customer(s, d).filter(col("c_acctbal") >= 0)
      .select(
        concat(lit("mondo:"), col("c_custkey")).as("id"),
        lit("mondo_disease").as("label"),
        ColFns.escapeProps(col("c_name")).as("name"),
        array_sort(array(
          ColFns.escapeProps(lower(col("c_name"))),
          concat(lit("syn "), col("c_custkey")))).as("synonyms"),
        when(col("c_nationkey") % 3 === 0, concat(lit("C"), col("c_custkey")))
          .as("umls"),
        when(col("c_nationkey") % 3 === 1, concat(lit("DOID:"), col("c_custkey")))
          .as("doid"),
        when(col("c_nationkey") % 3 === 2, concat(lit("D"), col("c_custkey")))
          .as("mesh"))
    graft.core.SchemaRegistry.conformNodes(raw, "mondo_disease",
      selected = Set("name", "synonyms", "umls", "doid", "mesh"))
  }

  /** The DDA merge (disease.py:1331) + post-merge self-pair filter
    * (disease.py:1336). */
  def ddaMerged(s: SparkSession, d: String): DataFrame = {
    val sl = ddaSlice(s, d)
    val genes = ddaSource(sl.filter(col("l_linestatus") === "O"),
      col("l_discount"), "disgenet_jaccard_genes_score",
      "Disgenet Disease-Disease Gene")
    val variants = ddaSource(sl.filter(col("l_linestatus") === "F"),
      col("l_tax"), "disgenet_jaccard_variants_score",
      "Disgenet Disease-Disease Variant")
    Kernels.outerMergeChain(Seq(genes, variants),
      Seq("disease_id1", "disease_id2"), pipeCols = Set("source"))
      .filter(col("disease_id1") =!= col("disease_id2"))
      .select(col("disease_id1"), col("disease_id2"), col("source"),
        col("disgenet_jaccard_genes_score"),
        col("disgenet_jaccard_variants_score"))
  }
}
