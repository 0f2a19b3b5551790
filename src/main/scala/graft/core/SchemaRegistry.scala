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

  /** Node labels (subset mirroring schema_config.yaml:8-175 shapes). */
  val nodes: Map[String, LabelSchema] = Seq(
    LabelSchema("protein", Seq(
      "name" -> PStr, "length" -> PInt, "mass" -> PInt, "organism" -> PStr,
      "xrefs" -> PStrArr)),
    LabelSchema("compound", Seq(
      "full_mwt" -> PFloat, "heavy_atoms" -> PInt, "smiles" -> PStr,
      "inchikey" -> PStr)),
    LabelSchema("disease", Seq(
      "name" -> PStr, "synonyms" -> PStrArr, "xrefs" -> PStrArr)),
    LabelSchema("pathway", Seq("name" -> PStr, "organism" -> PStr))
  ).map(s => s.label -> s).toMap

  /** Edge labels (schema_config.yaml:181-576 shapes). */
  val edges: Map[String, LabelSchema] = Seq(
    LabelSchema("protein_interacts_with_protein", Seq(
      "source" -> PStr, "pubmeds" -> PStrArr, "method" -> PStr,
      "score" -> PFloat)),
    LabelSchema("drug_targets_protein", Seq(
      "source" -> PStr, "refs" -> PStrArr, "pchembl" -> PFloat,
      "direct_interaction" -> PBool)),
    LabelSchema("disease_is_a_disease", Seq("source" -> PStr))
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
