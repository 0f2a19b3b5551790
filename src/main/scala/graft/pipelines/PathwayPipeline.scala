package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ColFns, Tables}

/** Pathway node/edge integration — the Spark re-expression of the
  * reference's pathway module (node_data/pathway.py):
  *
  *  - merge_protein_pathway_data (:382-397): per-source protein→pathway
  *    membership frames concatenated (KEGG + Reactome) — U1 union of
  *    per-source deduped frames;
  *  - get_pathway_pathway_orthology_edges (:655-706): ORDERED pathway
  *    pairs whose organism-stripped ids match — KEGG strips the 3-char
  *    organism prefix (:668-676), Reactome compares the last '-'-separated
  *    id element (:689-699); both directions are emitted (the reference's
  *    nested loop keeps (p1,p2) AND (p2,p1)), and both sources carry the
  *    reference's own `kegg.pathway` CURIE prefix (:678-680, :697-699 —
  *    reproduced as-is).
  *
  * Analog mapping: pathway catalogues derive from `part` (organism from
  * p_size parity, shared numeric suffix from p_partkey mod 40 — every
  * suffix exists for both organisms, so orthology pairs are plentiful);
  * memberships derive from lineitem slices (protein ≈ supplier).
  *
  * Scale: the catalogues are dimension-sized (distinct over part) so the
  * suffix self-join broadcasts; memberships are one distinct per source
  * (hash shuffle on the membership key), and the union is shuffle-free.
  */
object PathwayPipeline {

  private def organism(c: Column): Column =
    when(c % 2 === 0, "hsa").otherwise("mmu")

  /** KEGG pathway catalogue: 3-char organism prefix + shared suffix. */
  private[pipelines] def keggPathways(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(concat(organism(col("p_size")), (col("p_partkey") % 40).cast("string"))
        .as("id"))
      .distinct()

  /** Reactome pathway catalogue: R-HSA-n / R-MMU-n shaped ids. */
  private[pipelines] def reactomePathways(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(concat(lit("R-"), upper(organism(col("p_size"))), lit("-"),
        (col("p_partkey") % 40).cast("string")).as("id"))
      .distinct()

  /** Protein→pathway membership union (merge_protein_pathway_data): each
    * source deduped, then concatenated — ids stay disjoint by prefix, so
    * the concat needs no cross-source dedup (same as the reference). */
  def proteinPathwayEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val kegg = li.filter(col("l_returnflag") === "A")
      .select(ColFns.curie("uniprot", col("l_suppkey")).as("protein"),
        ColFns.curie("kegg.pathway",
          concat(lit("hsa"), (col("l_partkey") % 40).cast("string"))).as("pathway"))
      .distinct()
    val reactome = li.filter(col("l_returnflag") === "R")
      .select(ColFns.curie("uniprot", col("l_suppkey")).as("protein"),
        ColFns.curie("reactome",
          concat(lit("R-HSA-"), (col("l_partkey") % 40).cast("string"))).as("pathway"))
      .distinct()
    kegg.unionByName(reactome)
  }

  /** Ordered orthology pairs from one catalogue under a suffix extractor. */
  private def orthoPairsOf(cat: DataFrame, suffix: Column => Column): DataFrame = {
    val a = cat.select(col("id").as("id_a")).withColumn("sfx", suffix(col("id_a")))
    val b = cat.select(col("id").as("id_b")).withColumn("sfx", suffix(col("id_b")))
    a.join(b, Seq("sfx"))
      .filter(col("id_a") =!= col("id_b"))
      .select(ColFns.curie("kegg.pathway", col("id_a")).as("src"),
        ColFns.curie("kegg.pathway", col("id_b")).as("dst"))
  }

  /** Both-direction pathway orthology pairs, KEGG then Reactome, with the
    * reference's edge label. */
  def orthologyPairs(s: SparkSession, d: String): DataFrame =
    orthoPairsOf(keggPathways(s, d), id => id.substr(lit(4), lit(1000000)))
      .unionByName(orthoPairsOf(reactomePathways(s, d),
        id => element_at(split(id, "-"), -1)))
      .withColumn("label", lit("pathway_is_ortholog_to_pathway"))

  /** KEGG drug id → DrugBank broadcast dict (pathway.py's
    * `kegg_drug_to_drugbank`; same part-derived membership as the drug
    * node builder's kegg_drug prop — every 3rd part has a KEGG drug id). */
  private def keggDrugToDrugbank(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).filter(col("p_partkey") % 3 === 0)
      .select(col("p_partkey").as("from_id"),
        ColFns.curie("drugbank", concat(lit("DB"), col("p_partkey")))
          .as("drug_id"))

  /** ChEBI → DrugBank broadcast dict (`chebi_to_drugbank`; the same
    * p_size>25 membership the compound module's drugbank map uses). */
  private def chebiToDrugbank(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).filter(col("p_size") > 25)
      .select(col("p_partkey").as("from_id"),
        ColFns.curie("drugbank", concat(lit("DB"), col("p_partkey")))
          .as("drug_id"))

  /** Drug→pathway union (merge_drug_pathway_data, pathway.py:397-411:
    * `pd.concat([kegg_df, reactome_df])` — a U1 concat, NOT an outer
    * merge):
    *  - KEGG (process_kegg_drug_pathway :278-301): rows admitted by the
    *    kegg_drug_to_drugbank dict, pathway ids re-organismed map→hsa
    *    (:290), per-source key dedup (:294);
    *  - Reactome (process_reactome_drug_pathway :254-276): evidence-coded
    *    annotations excluded (`evidence_code not in
    *    remove_selected_annotations`, :265 — the IEA class), rows admitted
    *    by the chebi_to_drugbank dict, key dedup (:269).
    * Scale: both dicts broadcast (part-derived dimensions); one distinct
    * per source; the union is shuffle-free. */
  def drugPathwayEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val kegg = li.filter(col("l_linestatus") === "O")
      .join(broadcast(keggDrugToDrugbank(s, d)),
        col("l_partkey") === col("from_id"))
      .select(col("drug_id"),
        ColFns.curie("kegg.pathway",
          concat(lit("hsa"), (col("l_orderkey") % 40).cast("string")))
          .as("pathway_id"))
      .distinct()
      .withColumn("source", lit("KEGG"))
    val evidence = when(col("l_returnflag") === "N", "EXP")
      .when(col("l_returnflag") === "A", "IDA").otherwise("IEA")
    val reactome = li.filter(col("l_linestatus") === "F")
      .filter(evidence =!= "IEA")
      .join(broadcast(chebiToDrugbank(s, d)),
        col("l_partkey") === col("from_id"))
      .select(col("drug_id"),
        ColFns.curie("reactome",
          concat(lit("R-HSA-"), (col("l_orderkey") % 40).cast("string")))
          .as("pathway_id"))
      .distinct()
      .withColumn("source", lit("Reactome"))
    kegg.unionByName(reactome)
  }

  /** Per-database disease-xref → MONDO broadcast dims (the reference's
    * `mondo_mappings[db]`): customer-derived, each covering a different
    * slice with a distinct target space, so the fallback priority is
    * observable. */
  private def mondoDim(s: SparkSession, d: String, memberPred: Column,
      target: Column): DataFrame =
    Tables.customer(s, d).filter(memberPred)
      .select(col("c_custkey").as("from_id"),
        ColFns.curie("mondo", target).as("to_id"))

  /** Disease→pathway outer merge (merge_disease_pathway_data,
    * pathway.py:413-432):
    *  - KEGG (process_kegg_disease_pathway :303-344): each KEGG disease
    *    resolves through the ORDERED fallback chain MeSH > OMIM > ICD-10
    *    into a MONDO id (:313-334 — sequential dict probes with early
    *    break = J5), unresolved rows dropped (:336), pathway map→hsa;
    *  - CTD (process_ctd_disease_pathway :346-388): disease resolved via
    *    the per-db mondo dict (:363), KEGG-shaped pathway ids admitted
    *    only when present in the hsa pathway catalogue (:355, :365-367),
    *    non-KEGG ids pass through unchecked (:369-371);
    *  - outer merge on (disease_id, pathway_id), source pipe-merged
    *    (:423-425 merge_source_column = J1+J2).
    * Scale: mapping dims broadcast; the catalogue checker is a broadcast
    * semi-join; one shuffle per side for the key dedup + outer join. */
  def diseasePathwayEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val mesh = mondoDim(s, d, col("c_nationkey") % 3 === 2, col("c_custkey"))
    val omim = mondoDim(s, d, col("c_nationkey") % 5 === 0,
      col("c_custkey") % 997)
    val icd10 = mondoDim(s, d, col("c_nationkey") % 2 === 1,
      col("c_custkey") + 500000)
    val kegg = graft.ops.Kernels.fallbackMap(
      li.filter(col("l_returnflag") === "N"), col("l_suppkey"),
      Seq(mesh, omim, icd10))
      .filter(col("resolved").isNotNull)
      .select(col("resolved").as("disease_id"),
        ColFns.curie("kegg.pathway",
          concat(lit("hsa"), (col("l_partkey") % 40).cast("string")))
          .as("pathway_id"))
      .distinct()
      .withColumn("source", lit("KEGG"))
    // CTD rows carry either a KEGG-shaped pathway id (checked against the
    // hsa catalogue) or a Reactome-shaped one (no check); suffixes run 0-49
    // so the checker genuinely rejects
    val ctdBase = li.filter(col("l_returnflag") === "A")
      .join(broadcast(mesh), col("l_suppkey") === col("from_id"))
      .select(col("to_id").as("disease_id"),
        (col("l_orderkey") % 50).cast("string").as("sfx"),
        (col("l_tax") > 0.04).as("is_kegg"))
    val hsaSfx = keggPathways(s, d).filter(col("id").startsWith("hsa"))
      .select(col("id").substr(lit(4), lit(1000000)).as("sfx")).distinct()
    val ctd = ctdBase.filter(col("is_kegg"))
      .join(broadcast(hsaSfx), Seq("sfx"), "left_semi")
      .select(col("disease_id"),
        ColFns.curie("kegg.pathway", concat(lit("hsa"), col("sfx")))
          .as("pathway_id"))
      .unionByName(ctdBase.filter(!col("is_kegg"))
        .select(col("disease_id"),
          ColFns.curie("reactome", concat(lit("R-HSA-"), col("sfx")))
            .as("pathway_id")))
      .distinct()
      .withColumn("source", lit("CTD"))
    graft.ops.Kernels.outerMergeChain(Seq(kegg, ctd),
      Seq("disease_id", "pathway_id"), pipeCols = Set("source"))
  }

  /** Reactome pathway hierarchy (get_reactome_hierarchical_edges,
    * pathway.py:635-652 over reactome_pathway_relations :126-128): one
    * child→parent edge per relation, both ends reactome-prefixed, label
    * `pathway_participates_pathway`. Analog relations: suffix n parents
    * to n/4 within the same organism (the domain/EC parent convention),
    * roots (n = n/4) emit nothing. Dimension-sized projection, no joins. */
  def hierarchyEdges(s: SparkSession, d: String): DataFrame = {
    val sfx = element_at(split(col("id"), "-"), -1).cast("long")
    val org = element_at(split(col("id"), "-"), 2)
    reactomePathways(s, d)
      .filter(sfx =!= floor(sfx / 4))
      .select(ColFns.curie("reactome", col("id")).as("src"),
        ColFns.curie("reactome",
          concat(lit("R-"), org, lit("-"), floor(sfx / 4).cast("string")))
          .as("dst"),
        lit("pathway_participates_pathway").as("label"))
  }

  /** Pathway node builder (pathway.py:434-476 `get_nodes`): Reactome nodes
    * (escaped name, organism passthrough) + KEGG nodes (name = first
    * '-'-separated element trimmed then escaped, :465; organism resolved
    * from the 3-char id prefix through the abbreviation dict, :468),
    * conformed to the pathway label. */
  def nodes(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    def orgName(abbv: Column): Column =
      when(abbv === "hsa", "Homo sapiens")
        .when(abbv === "mmu", "Mus musculus")
    val kegg = p
      .groupBy(concat(organism(col("p_size")),
        (col("p_partkey") % 40).cast("string")).as("kid"))
      .agg(min(col("p_name")).as("nm"))
      .select(ColFns.curie("kegg.pathway", col("kid")).as("id"),
        lit("pathway").as("label"),
        ColFns.escapeProps(trim(element_at(split(col("nm"), "-"), 1))).as("name"),
        orgName(substring(col("kid"), 1, 3)).as("organism"))
    val reactome = p
      .groupBy(concat(lit("R-"), upper(organism(col("p_size"))), lit("-"),
        (col("p_partkey") % 40).cast("string")).as("rid"))
      .agg(min(col("p_name")).as("nm"))
      .select(ColFns.curie("reactome", col("rid")).as("id"),
        lit("pathway").as("label"),
        ColFns.escapeProps(col("nm")).as("name"),
        orgName(lower(element_at(split(col("rid"), "-"), 2))).as("organism"))
    graft.core.SchemaRegistry.conformNodes(
      reactome.unionByName(kegg), "pathway")
  }
}
