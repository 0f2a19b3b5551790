package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ColFns, Tables}
import graft.ops.Kernels

/** Phenotype edge builder — the Spark re-expression of the reference's
  * phenotype module (node_data/phenotype.py get_edges :240-255): the union
  * of three edge types, each built independently:
  *
  *  - protein→phenotype (:257-283): a SET of (protein, hp) pairs — pure
  *    distinct emit, no props;
  *  - phenotype hierarchical (:~300): child→parent `is_a` pairs from the
  *    HPO ontology;
  *  - phenotype→disease (:~330): keyed rows with an evidence code and a
  *    pubmed set-union.
  *
  * Analog mapping: phenotype ≈ customer (hp: CURIE), protein ≈ supplier,
  * disease ≈ nation (mondo: CURIE); the ontology parent of hp:N is
  * hp:(N/10) — a deterministic 10-ary tree. Disjoint slices by order
  * status/returnflag.
  *
  * Scale: two distinct aggregates and one grouped aggregate, unioned —
  * each shuffles once on its own emit key; no joins beyond the base
  * fact⋈orders equi-join shared with every other pipeline.
  */
object PhenotypePipeline {

  private def base(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))

  /** Protein→phenotype: set-dedup pair emit (the reference literally
    * accumulates a Python set). */
  private[pipelines] def proteinPhenotype(s: SparkSession, d: String): DataFrame =
    proteinPhenotypeFrom(base(s, d))

  private def proteinPhenotypeFrom(b: DataFrame): DataFrame =
    b
      .filter(col("o_orderstatus") === "F" && col("l_returnflag") === "N")
      .select(ColFns.curie("uniprot", col("l_suppkey")).as("src"),
        ColFns.curie("hp", col("o_custkey")).as("dst"))
      .distinct()
      .select(col("src"), col("dst"),
        lit("protein_is_associated_with_phenotype").as("label"),
        lit(null).cast("string").as("evidence"),
        lit(null).cast("string").as("pubmed_ids"))

  /** Hierarchical is_a edges over the deterministic 10-ary hp tree. */
  private[pipelines] def hierarchy(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey") >= 10) // roots have no parent
      .select(ColFns.curie("hp", col("c_custkey")).as("src"),
        ColFns.curie("hp", floor(col("c_custkey") / 10).cast("long")).as("dst"))
      .distinct()
      .select(col("src"), col("dst"),
        lit("phenotype_is_a_phenotype").as("label"),
        lit(null).cast("string").as("evidence"),
        lit(null).cast("string").as("pubmed_ids"))

  /** Phenotype→disease: evidence code + pubmed set-union per pair. */
  private[pipelines] def phenotypeDisease(s: SparkSession, d: String): DataFrame =
    phenotypeDiseaseFrom(base(s, d), s, d)

  private def phenotypeDiseaseFrom(b: DataFrame, s: SparkSession,
      d: String): DataFrame =
    b
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))), Seq("o_custkey"))
      .filter(col("o_orderstatus") === "P")
      .groupBy(ColFns.curie("hp", col("o_custkey")).as("src"),
        ColFns.curie("mondo", col("c_nationkey")).as("dst"))
      .agg(Kernels.setJoinAgg(concat(lit("pmid:"), col("o_orderkey"))).as("pubmed_ids"),
        min(col("o_orderpriority")).as("evidence"))
      .select(col("src"), col("dst"),
        lit("phenotype_is_associated_with_disease").as("label"),
        col("evidence"), col("pubmed_ids"))

  /** get_edges: the three edge types unioned in reference order.
    *
    * NOT checkpointed: only TWO consumers share the lineitem⋈orders base
    * here, and materializing the full fact join costs more than the one
    * scan+join it saves (round-11 regressed 1.40→~2.0 s doing exactly
    * that; the gda chain keeps its checkpoint because SEVEN sources share
    * the base there, and side_effects keeps its with three). */
  def edges(s: SparkSession, d: String): DataFrame =
    proteinPhenotype(s, d)
      .unionByName(hierarchy(s, d))
      .unionByName(phenotypeDisease(s, d))

  /** Phenotype node builder (phenotype.py:194-236 `get_nodes`): one
    * `phenotype` node per HPO term — hp CURIE id, name with the
    * `|`→`,` / `'`→`^` escapes (:208), and the synonyms quirk (:210-215):
    * a term with exactly ONE synonym gets the scalar string, more get the
    * list, a dict miss gets no prop at all. Under the pipe CSV boundary
    * codec the scalar and the 1-element list coincide (pipe-join of one
    * element is the element), so the quirk is represented as a 1-element
    * vs n-element array; the reference's synonym SET is emitted sorted
    * (the set iteration order is not observable in its CSV either).
    * Conformed to the configured field subset (P10).
    *
    * Analog: customer plays hpo_terms (name = c_name); ids ≡ 0 mod 3
    * carry one synonym, ≡ 1 two, ≡ 2 none. Scale: narrow projection,
    * zero shuffles. */
  def nodes(s: SparkSession, d: String): DataFrame = {
    val single = ColFns.escapeProps(lower(col("c_name")))
    val raw = Tables.customer(s, d)
      .select(
        ColFns.curie("hp", col("c_custkey")).as("id"),
        lit("phenotype").as("label"),
        ColFns.escapeProps(col("c_name")).as("name"),
        when(col("c_custkey") % 3 === 0, array(single))
          .when(col("c_custkey") % 3 === 1, array_sort(array(
            single, concat(lit("syn "), col("c_custkey")))))
          .as("synonyms"))
    graft.core.SchemaRegistry.conformNodes(raw, "phenotype",
      selected = Set("name", "synonyms"))
  }
}
