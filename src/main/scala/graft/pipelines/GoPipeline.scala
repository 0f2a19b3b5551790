package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** GO node/edge builder — the Spark re-expression of the reference's go
  * module (node_data/go.py):
  *
  *  - nodes (get_go_nodes :383-411): one node per GO term whose aspect is
  *    selected; node label carries a SPACE ("biological process"), name
  *    escaping is `'`→`^` and `|` REMOVED (:406 — unlike the EC escaping);
  *  - protein→GO edges (:423-456): SwissProt-filtered annotations, the
  *    default `remove_selected_annotations=["IEA"]` evidence filter
  *    (:144), dynamic edge label `protein_<qualifier>_<aspect label with
  *    underscores>`, reference + evidence_code props;
  *  - GO→GO edges (:459-482): ancestor pairs labelled
  *    `<aspect>_<relation>_<aspect>`;
  *  - domain→GO edges (:484-515): InterPro terms labelled through the
  *    aspect→{involved_in, enables, located_in} dict.
  *
  * Analog mapping: GO term ≈ p_partkey mod 300 with aspect = term mod 3
  * (P/F/C), ontology parent = term/10; annotations from lineitem
  * (protein ≈ supplier, SwissProt ≈ acctbal-reviewed); domains ≈ p_partkey
  * mod 80. Evidence codes derive from returnflag — 'R' maps to IEA and is
  * dropped by the default filter, exercising the removal path.
  *
  * Scale: distinct projections + one broadcast semi-filter; no fact-side
  * shuffles beyond the distincts.
  */
object GoPipeline {

  private def aspectOf(term: Column): Column =
    when(term % 3 === 0, "P").when(term % 3 === 1, "F").otherwise("C")

  /** Node label: spaces, per the reference's aspect dict. */
  private def nodeLabel(aspect: Column): Column =
    when(aspect === "P", "biological process")
      .when(aspect === "F", "molecular function")
      .otherwise("cellular component")

  /** Edge-label fragment: underscores. */
  private def edgeAspect(aspect: Column): Column =
    regexp_replace(nodeLabel(aspect), " ", "_")

  private def goEscape(c: Column): Column =
    regexp_replace(translate(c, "'", "^"), "\\|", "")

  private def term(c: Column): Column = c % 300

  /** One node per GO term: go: CURIE, aspect-derived label, escaped name
    * (min source string per term). */
  def nodes(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .groupBy(term(col("p_partkey")).as("t"))
      .agg(goEscape(min(col("p_type"))).as("name"))
      .select(concat(lit("go:"), col("t")).as("id"),
        nodeLabel(aspectOf(col("t"))).as("label"), col("name"))

  private[pipelines] def proteinGo(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.supplier(s, d).filter(col("s_acctbal") > 1000)
      .select(col("s_suppkey"))
    val t = term(col("l_partkey"))
    Tables.lineitem(s, d)
      .join(broadcast(rev), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .select(
        concat(lit("uniprot:"), col("l_suppkey")).as("src"),
        concat(lit("go:"), t).as("dst"),
        concat_ws("_", lit("protein"),
          when(col("l_linestatus") === "O", "enables").otherwise("involved_in"),
          edgeAspect(aspectOf(t))).as("label"),
        concat(lit("pmid:"), col("l_orderkey")).as("reference"),
        when(col("l_returnflag") === "N", "EXP")
          .when(col("l_returnflag") === "A", "IDA")
          .otherwise("IEA").as("evidence_code"))
      // the reference's default remove_selected_annotations=["IEA"]
      .filter(col("evidence_code") =!= "IEA")
      .distinct()
  }

  private[pipelines] def goGo(s: SparkSession, d: String): DataFrame = {
    val t = term(col("p_partkey"))
    Tables.part(s, d)
      .select(t.as("child"), floor(t / 10).cast("long").as("parent"),
        when(col("p_partkey") % 2 === 0, "is_a").otherwise("part_of").as("rel"))
      .filter(col("child") =!= col("parent"))
      .distinct()
      .select(concat(lit("go:"), col("child")).as("src"),
        concat(lit("go:"), col("parent")).as("dst"),
        concat_ws("_", edgeAspect(aspectOf(col("child"))), col("rel"),
          edgeAspect(aspectOf(col("parent")))).as("label"),
        lit(null).cast("string").as("reference"),
        lit(null).cast("string").as("evidence_code"))
  }

  private[pipelines] def domainGo(s: SparkSession, d: String): DataFrame = {
    val t = term(col("p_partkey"))
    val fn = when(aspectOf(t) === "P", "involved_in")
      .when(aspectOf(t) === "F", "enables").otherwise("located_in")
    Tables.part(s, d)
      .select(concat(lit("interpro:IPR"), col("p_partkey") % 80).as("src"),
        concat(lit("go:"), t).as("dst"),
        concat_ws("_", lit("protein_domain"), fn, edgeAspect(aspectOf(t)))
          .as("label"),
        lit(null).cast("string").as("reference"),
        lit(null).cast("string").as("evidence_code"))
      .distinct()
  }

  /** get_go_edges: protein→GO, GO→GO, domain→GO in reference order. */
  def edges(s: SparkSession, d: String): DataFrame =
    proteinGo(s, d).unionByName(goGo(s, d)).unionByName(domainGo(s, d))
}
