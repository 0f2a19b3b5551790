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

  /** MONDO hierarchical edges (disease.py:1410-1446
    * `get_mondo_hiererchical_edges`): one child→parent
    * `disease_is_a_disease` edge per entry of the OBO parents map — only
    * sources with a non-empty parent list survive the dict build
    * (disease.py:235's `if v` filter) — MONDO CURIEs on both ends, no
    * props. Analog: the same customer id domain as [[diseaseNodes]] with
    * a deterministic multi-parent DAG (parents of ck = distinct positive
    * {ck div 7, ck div 11}). Scale: a narrow projection + explode —
    * zero shuffles. */
  def hierarchyEdges(s: SparkSession, d: String): DataFrame = {
    import graft.core.ColFns
    Tables.customer(s, d)
      .filter(col("c_custkey") >= 7)
      .select(col("c_custkey").as("child"),
        explode(array_distinct(array(
          floor(col("c_custkey") / 7).cast("long"),
          floor(col("c_custkey") / 11).cast("long")))).as("parent"))
      .filter(col("parent") >= 1)
      .select(ColFns.curie("mondo", col("child")).as("src"),
        ColFns.curie("mondo", col("parent")).as("dst"),
        lit("disease_is_a_disease").as("label"))
  }

  /** MalaCards comorbidity edges (disease.py:1127-1163
    * `process_malacards_disease_comorbidity` + 1584-1611
    * `get_disease_comorbidity_edges`): the disease's McId maps to MONDO
    * through the malacards dict; the comorbidity partner resolves
    * slug → McId → MONDO through two chained dicts; a row survives only
    * if EVERY dict lookup hits (the nested `.get` admissions,
    * :1136-1139); self-pairs are removed (:1145) and the frozenset
    * (undirected) dedup keeps the FIRST encounter (:1147) — encounter
    * order is input row order, pinned here with the lineitem PK.
    * Label `disease_is_comorbid_with_disease`, no props.
    *
    * Scale: three broadcast dict joins ([[Kernels.fallbackMap]], which
    * also carries the dict-uniqueness guard) + one undirected dedup
    * shuffle on the canonical pair. */
  def comorbidityEdges(s: SparkSession, d: String): DataFrame = {
    import graft.core.ColFns
    val mcToMondo = Tables.part(s, d)
      .filter(col("p_partkey") % 3 =!= 0)
      .select(col("p_partkey").as("from_id"),
        (col("p_partkey") * 3).as("to_id"))
    val slugToMc = Tables.supplier(s, d)
      .filter(col("s_suppkey") % 5 =!= 0)
      .select(col("s_suppkey").as("from_id"),
        (col("s_suppkey") + 7).as("to_id"))
    val base = Tables.lineitem(s, d).select(
      col("l_partkey").as("mc1"), col("l_suppkey").as("slug"),
      col("l_orderkey"), col("l_linenumber"))
    val step1 = Kernels.fallbackMap(base, col("mc1"), Seq(mcToMondo))
      .withColumnRenamed("resolved", "d1").filter(col("d1").isNotNull)
    val step2 = Kernels.fallbackMap(step1, col("slug"), Seq(slugToMc))
      .withColumnRenamed("resolved", "mc2").filter(col("mc2").isNotNull)
    val step3 = Kernels.fallbackMap(step2, col("mc2"), Seq(mcToMondo))
      .withColumnRenamed("resolved", "d2").filter(col("d2").isNotNull)
      .filter(col("d1") =!= col("d2"))
    Kernels.undirectedDedup(step3, "d1", "d2",
        Seq(col("l_orderkey"), col("l_linenumber")))
      .select(ColFns.curie("mondo", col("d1")).as("src"),
        ColFns.curie("mondo", col("d2")).as("dst"),
        lit("disease_is_comorbid_with_disease").as("label"))
  }

  /** Organism→disease edges (disease.py:1448-1487
    * `get_organism_disease_edges`): PathoPhenoDB interactions filtered to
    * `manual assertion` evidence AND a resolving DOID→MONDO mapping
    * (the `and ... get` admission, :1461); emit
    * (ncbitaxon:taxid, mondo:mapped, `organism_causes_disease`) one row
    * PER INTERACTION — the reference never dedups, so duplicates pass
    * through. Analog: lineitem plays the interaction list (returnflag A =
    * manual assertion), the DOID dict covers part ids ∉ 4ℤ. Scale: one
    * broadcast dict join over a filtered scan — zero wide shuffles. */
  def organismDiseaseEdges(s: SparkSession, d: String): DataFrame = {
    import graft.core.ColFns
    val doidToMondo = Tables.part(s, d)
      .filter(col("p_partkey") % 4 =!= 0)
      .select(col("p_partkey").as("from_id"),
        (col("p_partkey") + 50000).as("to_id"))
    val inter = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "A")
      .select(col("l_suppkey").as("taxid"), col("l_partkey").as("doid"))
    Kernels.fallbackMap(inter, col("doid"), Seq(doidToMondo))
      .filter(col("resolved").isNotNull)
      .select(ColFns.curie("ncbitaxon", col("taxid")).as("src"),
        ColFns.curie("mondo", col("resolved")).as("dst"),
        lit("organism_causes_disease").as("label"))
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
