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
