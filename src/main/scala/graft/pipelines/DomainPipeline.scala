package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Kernels

/** InterPro domain node/edge builder — the Spark re-expression of the
  * reference's domain module (node_data/domain.py):
  *
  *  - nodes (:90-142): one `domain` node per InterPro entry with
  *    protein_count, name, type and the parent/child hierarchy lists
  *    (emitted pipe-encoded: the reference's single-element-list collapse
  *    is the natural reading of a pipe string);
  *  - edges (:145-160): one protein→domain `Has` edge per annotation with
  *    its locations list.
  *
  * Analog mapping: domain ≈ p_partkey mod 80 under a 4-ary hierarchy
  * (parent = id/4), annotations from lineitem (protein ≈ supplier,
  * locations ≈ the line numbers the pair occurs at).
  *
  * Scale: domain dimension aggregates are tiny; the annotation edge build
  * is one hash aggregate on the (protein, domain) key.
  */
object DomainPipeline {

  private def did(c: org.apache.spark.sql.Column) = c % 80

  private def curieD(c: org.apache.spark.sql.Column) =
    concat(lit("interpro:IPR"), c)

  def nodes(s: SparkSession, d: String): DataFrame = {
    val base = Tables.part(s, d)
      .groupBy(did(col("p_partkey")).as("did"))
      .agg(min(col("p_type")).as("name"), min(col("p_brand")).as("type"))
    val dids = base.select(col("did"))
    val children = dids.select(col("did").as("child"))
      .withColumn("p", floor(col("child") / 4).cast("long"))
      .filter(col("child") =!= col("p"))
      .groupBy(col("p").as("did"))
      .agg(Kernels.setJoinAgg(curieD(col("child"))).as("child_list"))
    val counts = Tables.lineitem(s, d)
      .groupBy(did(col("l_partkey")).as("did"))
      .agg(countDistinct(col("l_suppkey")).as("protein_count"))
    base
      .join(children, Seq("did"), "left")
      .join(counts, Seq("did"), "left")
      .select(curieD(col("did")).as("id"), lit("domain").as("label"),
        col("protein_count"), col("name"), col("type"),
        when(floor(col("did") / 4).cast("long") =!= col("did"),
          curieD(floor(col("did") / 4).cast("long"))).as("parent_list"),
        col("child_list"))
  }

  /** One `Has` edge per (protein, domain) annotation; locations = the
    * sorted line numbers of the pair. */
  def edges(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(concat(lit("uniprot:"), col("l_suppkey")).as("src"),
        curieD(did(col("l_partkey"))).as("dst"))
      // cast before the fold: the oracle's string_agg sorts STRINGS, and
      // int-sorted "2|10" vs string-sorted "10|2" would diverge past 9
      .agg(Kernels.setJoinAgg(col("l_linenumber").cast("string")).as("locations"))
      .select(col("src"), col("dst"), lit("Has").as("label"), col("locations"))
}
