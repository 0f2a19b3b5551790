package graft.pipelines

import org.apache.spark.sql.types._
import graft.SparkSpec

/** Cross-pipeline emit checks: schema-conformed edges and the typed graph. */
class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("DtiPipeline.edges conforms to the registry drug_targets_protein shape") {
    val e = DtiPipeline.edges(spark, sf)
    assert(e.columns.toSeq ===
      Seq("rel_id", "src", "dst", "label", "source", "refs", "pchembl",
        "direct_interaction"))
    assert(e.schema("refs").dataType === ArrayType(StringType))
    assert(e.schema("direct_interaction").dataType === BooleanType)
    val row = e.filter($"pchembl".isNotNull).head()
    assert(row.getAs[String]("src").startsWith("drugbank:DB"))
    assert(row.getAs[String]("label") === "drug_targets_protein")
  }

  test("PpiPipeline.typedGraph yields typed Node/Edge datasets sharing one merge") {
    val (nodes, edges) = PpiPipeline.typedGraph(spark, sf)
    val n = nodes.collect()
    val e = edges.collect()
    assert(n.nonEmpty && e.nonEmpty)
    assert(n.forall(_.label == "protein"))
    assert(e.forall(_.label == "protein_interacts_with_protein"))
    // every edge endpoint is an emitted node
    val ids = n.map(_.id).toSet
    assert(e.forall(x => ids.contains(x.src) && ids.contains(x.dst)))
  }

  test("GeneDiseasePipeline.merged: every row names at least one source") {
    val m = GeneDiseasePipeline.merged(spark, sf)
    assert(m.filter($"source".isNull || $"source" === "").count() === 0)
    assert(m.count() > 0)
  }
}
