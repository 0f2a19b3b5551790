package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative graph-schema registry — the engine's `schema_config.yaml`
  * equivalent (SURVEY §1.1/§1.3: the reference declares 820 lines of node
  * and edge types with typed property lists; BioCypher validates emitted
  * tuples against it).
  *
  * Here the declaration is a Scala value (no YAML parser dependency in the
  * zero-egress build); each label compiles to a `StructType`, and
  * [[conform]] applies the reference's config-driven field projection (P10:
  * keep only configured props, cast to declared types, null-fill missing) —
  * the `node_fields` / `edge_fields` selection every adapter implements.
  */
object SchemaRegistry {

  sealed trait PropType { def spark: DataType }
  case object PStr extends PropType { val spark: DataType = StringType }
  case object PInt extends PropType { val spark: DataType = LongType }
  case object PFloat extends PropType { val spark: DataType = DoubleType }
  case object PBool extends PropType { val spark: DataType = BooleanType }
  case object PStrArr extends PropType { val spark: DataType = ArrayType(StringType) }
  case object PIntArr extends PropType { val spark: DataType = ArrayType(LongType) }

  final case class LabelSchema(label: String, props: Seq[(String, PropType)]) {
    def struct(keyCols: Seq[(String, DataType)]): StructType =
      StructType(
        keyCols.map { case (n, t) => StructField(n, t, nullable = false) } ++
          props.map { case (n, t) => StructField(n, t.spark) })
  }

  /** Node labels — the engine's own emit shapes (protein/compound/disease/
    * pathway, kept stable for the pipelines that conform against them)
    * plus the full reference catalogue (schema_config.yaml:8-175: every
    * declared node type with its typed property list). */
  val nodes: Map[String, LabelSchema] = Seq(
    // engine emit shapes (used by the pipelines; do not change lightly)
    LabelSchema("protein", Seq(
      "name" -> PStr, "length" -> PInt, "mass" -> PInt, "organism" -> PStr,
      "xrefs" -> PStrArr)),
    LabelSchema("compound", Seq(
      "full_mwt" -> PFloat, "heavy_atoms" -> PInt, "smiles" -> PStr,
      "inchikey" -> PStr)),
    LabelSchema("disease", Seq(
      "name" -> PStr, "synonyms" -> PStrArr, "xrefs" -> PStrArr)),
    LabelSchema("pathway", Seq("name" -> PStr, "organism" -> PStr)),
    // reference catalogue (schema_config.yaml:8-175)
    LabelSchema("gene", Seq(
      "genes" -> PStrArr, "kegg" -> PStrArr, "ensembl" -> PStrArr,
      "ensembl_gene_ids" -> PStrArr)),
    LabelSchema("uniprot_protein", Seq(
      "secondary_ids" -> PStrArr, "length" -> PInt, "mass" -> PInt,
      "protein_names" -> PStrArr, "proteome" -> PStrArr,
      "organism_id" -> PInt, "ec" -> PStrArr, "virus_hosts" -> PIntArr)),
    LabelSchema("organism_taxon", Seq("organism" -> PStr)),
    LabelSchema("protein_domain", Seq(
      "protein_count" -> PInt, "name" -> PStr, "type" -> PStr,
      "parent_list" -> PStrArr, "child_list" -> PStrArr, "pfam" -> PStrArr,
      "ec" -> PStrArr, "pdb" -> PStrArr)),
    LabelSchema("biological_process", Seq("name" -> PStr)),
    LabelSchema("cellular_component", Seq("name" -> PStr)),
    LabelSchema("molecular_function", Seq("name" -> PStr)),
    LabelSchema("small_molecule", Seq(
      "drugbank_id" -> PStr, "cas_number" -> PStr, "name" -> PStr,
      "groups" -> PStrArr, "general_references" -> PStrArr,
      "atc_codes" -> PStrArr, "kegg_drug" -> PStr, "rxcui" -> PStr,
      "pharmgkb" -> PStr, "pdb" -> PStr, "drugcentral" -> PStr,
      "zinc" -> PStr, "chembl" -> PStr, "bindingdb" -> PStr,
      "clinicaltrials" -> PStr, "chebi" -> PStr, "pubchem" -> PStr,
      "inchi" -> PStr, "inchikey" -> PStr)),
    LabelSchema("molecular_mixture", Seq(
      "type" -> PStr, "full_mwt" -> PFloat, "species" -> PStr,
      "heavy_atoms" -> PInt, "alogp" -> PFloat, "inchi" -> PStr,
      "inchikey" -> PStr, "qed_score" -> PFloat)),
    LabelSchema("mondo_disease", Seq(
      "name" -> PStr, "synonyms" -> PStrArr, "umls" -> PStr, "doid" -> PStr,
      "mesh" -> PStr, "omim" -> PStr, "efo" -> PStr, "orphanet" -> PStr,
      "hp" -> PStr, "icd10cm" -> PStr, "ncit" -> PStr, "icd9" -> PStr,
      "meddra" -> PStr)),
    LabelSchema("phenotype", Seq("name" -> PStr, "synonyms" -> PStrArr)),
    // schema_config.yaml:171-175 (side effect, preferred_id sider.effect);
    // props from side_effect.py:322-331 (name + ADReCS synonyms)
    LabelSchema("side_effect", Seq("name" -> PStr, "synonyms" -> PStrArr))
  ).map(s => s.label -> s).toMap

  /** Edge labels — engine emit shapes plus the full reference catalogue
    * (schema_config.yaml:181-576, keyed by each entry's `label_as_edge`;
    * labels reused by several association types — is_a, part_of, the GO
    * regulation labels — carry the union of their property lists). */
  val edges: Map[String, LabelSchema] = Seq(
    // engine emit shapes (used by the pipelines; do not change lightly)
    LabelSchema("protein_interacts_with_protein", Seq(
      "source" -> PStr, "pubmeds" -> PStrArr, "method" -> PStr,
      "score" -> PFloat)),
    LabelSchema("drug_targets_protein", Seq(
      "source" -> PStr, "refs" -> PStrArr, "pchembl" -> PFloat,
      "direct_interaction" -> PBool)),
    LabelSchema("disease_is_a_disease", Seq("source" -> PStr)),
    // reference catalogue (schema_config.yaml:181-576)
    LabelSchema("Encodes", Nil),
    LabelSchema("Belongs_To", Nil),
    LabelSchema("Interacts_With", Seq(
      "source" -> PStrArr, "pubmed_id" -> PIntArr, "method" -> PStr,
      "interaction_type" -> PStr, "intact_score" -> PFloat,
      "string_combined_score" -> PInt,
      "string_physical_combined_score" -> PInt)),
    LabelSchema("protein_has_domain", Seq("locations" -> PStrArr)),
    LabelSchema("protein_involved_in_biological_process", Seq(
      "reference" -> PStr, "evidence_code" -> PStr)),
    LabelSchema("located_in", Seq(
      "reference" -> PStr, "evidence_code" -> PStr)),
    LabelSchema("part_of", Seq(
      "reference" -> PStr, "evidence_code" -> PStr)),
    LabelSchema("is_active_in", Seq(
      "reference" -> PStr, "evidence_code" -> PStr)),
    LabelSchema("enables", Seq(
      "reference" -> PStr, "evidence_code" -> PStr)),
    LabelSchema("contributes_to", Seq(
      "reference" -> PStr, "evidence_code" -> PStr)),
    LabelSchema("is_a", Nil),
    LabelSchema("positively_regulates", Nil),
    LabelSchema("negatively_regulates", Nil),
    LabelSchema("protein_domain_enables_molecular_function", Nil),
    LabelSchema("protein_domain_involved_in_biological_process", Nil),
    LabelSchema("protein_domain_located_in_cellular_component", Nil),
    LabelSchema("chembl_drug_targets_protein", Seq(
      "known_action" -> PStr, "activity_value" -> PFloat,
      "confidence_score" -> PFloat, "direct_interaction" -> PBool,
      "disease_efficacy" -> PBool, "mechanism_of_action" -> PStr,
      "pchembl" -> PFloat, "activity_type" -> PStr,
      "dgidb_score" -> PFloat, "references" -> PStrArr,
      "mechanism_of_action_type" -> PStr,
      "stitch_combined_score" -> PFloat, "source" -> PStrArr,
      "actions" -> PStrArr)),
    LabelSchema("drug_interacts_with_drug", Seq(
      "recommendation" -> PStr, "interaction_level" -> PStr,
      "interaction_type" -> PStrArr, "source" -> PStrArr)),
    LabelSchema("decreases_expression", Seq(
      "source" -> PStrArr, "references" -> PStrArr)),
    LabelSchema("increases_expression", Seq(
      "source" -> PStrArr, "references" -> PStrArr)),
    LabelSchema("targets", Seq(
      "source" -> PStrArr, "pchembl" -> PFloat, "activity_value" -> PFloat,
      "activity_type" -> PStr, "assay_chembl" -> PStrArr,
      "confidence_score" -> PFloat, "stitch_combined_score" -> PFloat)),
    LabelSchema("Is_Orthologous_With", Seq(
      "source" -> PStrArr, "relation_type" -> PStr,
      "oma_orthology_score" -> PFloat)),
    LabelSchema("organism_causes_disease", Nil),
    LabelSchema("disease_is_treated_by_drug", Seq(
      "source" -> PStrArr, "pubmed_ids" -> PStrArr, "max_phase" -> PStr)),
    LabelSchema("disease_is_associated_with_disease", Seq(
      "source" -> PStrArr, "disgenet_jaccard_genes_score" -> PFloat,
      "disgenet_jaccard_variants_score" -> PFloat)),
    LabelSchema("disease_is_comorbid_with_disease", Nil),
    LabelSchema("gene_is_related_to_disease", Seq(
      "source" -> PStrArr, "variant_source" -> PStrArr,
      "opentargets_score" -> PFloat,
      "disgenet_gene_disease_score" -> PFloat,
      "disgenet_variant_disease_score" -> PFloat,
      "diseases_confidence_score" -> PFloat, "allele_id" -> PStr,
      "clinical_significance" -> PStr, "review_status" -> PInt,
      "variation_id" -> PStr, "pubmed_ids" -> PStrArr,
      "dbsnp_id" -> PStrArr)),
    LabelSchema("protein_take_part_in_pathway", Seq("source" -> PStr)),
    LabelSchema("disease_modulates_pathway", Seq("source" -> PStrArr)),
    LabelSchema("drug_has_target_in_pathway", Seq("source" -> PStr)),
    LabelSchema("pathway_is_part_of_pathway", Nil),
    LabelSchema("pathway_is_equivalent_to_pathway", Nil),
    LabelSchema("pathway_participates_pathway", Nil),
    LabelSchema("pathway_is_ortholog_to_pathway", Nil),
    LabelSchema("protein_is_associated_with_phenotype", Nil),
    LabelSchema("phenotype_is_a_phenotype", Nil),
    LabelSchema("phenotype_is_associated_with_disease", Seq(
      "pubmed_ids" -> PStrArr, "evidence" -> PStr))
  ).map(s => s.label -> s).toMap

  val nodeKey: Seq[(String, DataType)] =
    Seq("id" -> StringType, "label" -> StringType)
  val edgeKey: Seq[(String, DataType)] =
    Seq("rel_id" -> StringType, "src" -> StringType, "dst" -> StringType,
      "label" -> StringType)

  /** Config-driven projection (P10): keep the key columns plus the
    * intersection of declared props and `selected` (all declared props when
    * `selected` is empty); missing declared props become typed nulls,
    * present ones are cast to their declared type. */
  def conform(
      df: DataFrame, schema: LabelSchema,
      keyCols: Seq[(String, DataType)],
      selected: Set[String] = Set.empty): DataFrame = {
    val wanted = schema.props.filter { case (n, _) =>
      selected.isEmpty || selected(n)
    }
    val present = df.columns.toSet
    val cols: Seq[Column] =
      keyCols.map { case (n, t) => col(n).cast(t).as(n) } ++
        wanted.map { case (n, t) =>
          (if (present(n)) col(n).cast(t.spark) else lit(null).cast(t.spark)).as(n)
        }
    df.select(cols: _*)
  }

  def conformNodes(df: DataFrame, label: String, selected: Set[String] = Set.empty): DataFrame =
    conform(df, nodes(label), nodeKey, selected)

  def conformEdges(df: DataFrame, label: String, selected: Set[String] = Set.empty): DataFrame =
    conform(df, edges(label), edgeKey, selected)
}
