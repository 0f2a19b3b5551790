package graft.core

import org.apache.spark.sql.types._
import graft.SparkSpec

class SchemaRegistrySpec extends SparkSpec {
  import spark.implicits._

  test("registry breadth mirrors the reference catalogue") {
    // schema_config.yaml declares 12 node types and 33 label_as_edge names
    // (some shared across association types); the registry carries all of
    // them plus the engine's own emit shapes
    assert(SchemaRegistry.nodes.size >= 14,
      s"node catalogue thin: ${SchemaRegistry.nodes.size}")
    assert(SchemaRegistry.edges.size >= 36,
      s"edge catalogue thin: ${SchemaRegistry.edges.size}")
    // spot-check reference shapes survived the translation
    assert(SchemaRegistry.edges("gene_is_related_to_disease")
      .props.toMap.apply("review_status") === SchemaRegistry.PInt)
    assert(SchemaRegistry.nodes("small_molecule").props.size === 19)
    // every schema compiles to a valid struct
    (SchemaRegistry.nodes.values.map(_.struct(SchemaRegistry.nodeKey)) ++
      SchemaRegistry.edges.values.map(_.struct(SchemaRegistry.edgeKey)))
      .foreach(st => assert(st.fieldNames.nonEmpty))
  }

  test("label schemas compile to StructTypes with key columns") {
    val st = SchemaRegistry.nodes("protein").struct(SchemaRegistry.nodeKey)
    assert(st.fieldNames.take(2) === Array("id", "label"))
    assert(st("length").dataType === LongType)
    assert(st("xrefs").dataType === ArrayType(StringType))
  }

  test("conformNodes: config-driven projection, cast, null-fill (P10)") {
    val df = Seq(("uniprot:P1", "protein", "Alpha", 42))
      .toDF("id", "label", "name", "length")
    val out = SchemaRegistry.conformNodes(df, "protein")
    assert(out.columns.toSeq ===
      Seq("id", "label", "name", "length", "mass", "organism", "xrefs"))
    assert(out.schema("length").dataType === LongType) // cast from int
    val row = out.collect().head
    assert(row.getAs[String]("name") === "Alpha")
    assert(row.isNullAt(out.columns.indexOf("mass"))) // declared, absent → null
  }

  test("conformNodes with selected fields keeps only those props") {
    val df = Seq(("uniprot:P1", "protein", "Alpha", 42))
      .toDF("id", "label", "name", "length")
    val out = SchemaRegistry.conformNodes(df, "protein", selected = Set("name"))
    assert(out.columns.toSeq === Seq("id", "label", "name"))
  }

  test("conformEdges validates the ppi edge shape") {
    val df = Seq(("r1", "supp:1", "supp:2", "protein_interacts_with_protein",
      "intact", 0.9)).toDF("rel_id", "src", "dst", "label", "source", "score")
    val out = SchemaRegistry.conformEdges(df, "protein_interacts_with_protein")
    assert(out.schema("score").dataType === DoubleType)
    assert(out.schema("pubmeds").dataType === ArrayType(StringType))
  }

  test("YAML front door round-trips the registry exactly") {
    val yaml = SchemaYaml.render(SchemaRegistry.nodes, SchemaRegistry.edges)
    val (n, e) = SchemaYaml.parse(yaml)
    assert(n === SchemaRegistry.nodes)
    assert(e === SchemaRegistry.edges)
    // property ORDER (the struct field order) survives, not just the sets
    assert(n("uniprot_protein").props === SchemaRegistry.nodes("uniprot_protein").props)
    assert(e("Interacts_With").props === SchemaRegistry.edges("Interacts_With").props)
  }

  test("checked-in conf/schema_config.yaml ≡ the Scala registry (golden)") {
    val path = "conf/schema_config.yaml"
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      s"missing $path — regenerate: Files.write(path, SchemaYaml.render(...))")
    val (n, e) = SchemaYaml.load(path)
    assert(n === SchemaRegistry.nodes,
      "conf/schema_config.yaml drifted from SchemaRegistry.nodes")
    assert(e === SchemaRegistry.edges,
      "conf/schema_config.yaml drifted from SchemaRegistry.edges")
  }

  test("YAML parser fails loudly on typos instead of dropping properties") {
    intercept[IllegalArgumentException] {
      SchemaYaml.parse("nodes:\n  x:\n    p: sting\n")
    }
    intercept[IllegalArgumentException] {
      SchemaYaml.parse("nodes:\n      overindented: str\n")
    }
    intercept[IllegalArgumentException] {
      SchemaYaml.parse("labels:\n  x: {}\n")
    }
    // comments, blank lines, empty labels all parse
    val (n, _) = SchemaYaml.parse(
      "# c\nnodes:\n\n  a: {}\n  b:\n    p: int[] # inline\nedges:\n")
    assert(n("a").props.isEmpty && n("b").props === Seq("p" -> SchemaRegistry.PIntArr))
  }
}
