package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ColFns, Tables}
import graft.ops.Kernels

/** Gene–disease association integration — the reference's LARGEST merge
  * chain (node_data/disease.py: seven sources joined full-outer at
  * :1225-1291, with fallback disease-id mapping :1631-1654 feeding it).
  *
  * Seven disjoint order-priority slices of lineitem⋈orders play the seven
  * sources (OpenTargets, ClinVar, DisGeNET GDA/VDA, HumSaVar, KEGG,
  * DISEASES-knowledge); gene = supplier key, disease = customer key under a
  * `mondo:` CURIE. The OpenTargets slice arrives keyed by customer NAME and
  * resolves through a two-step fallback mapping chain (J5) before the merge
  * — exactly the reference's "UMLS first, then vocabulary" priority.
  *
  * Scale: each slice is one filtered scan + one hash aggregate on the
  * (gene, disease) key; the 7-way chain then reuses that partitioning for
  * every join (6 shuffle-free joins after the first co-partitioning at
  * cluster scale); the only broadcasts are the customer-name mapping dims.
  */
object GeneDiseasePipeline {

  private def base(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("gene"), col("o_custkey"),
        col("o_orderpriority").as("prio"), col("l_returnflag"),
        col("l_linestatus"), col("l_orderkey"), col("l_extendedprice"),
        col("o_totalprice"), col("o_orderstatus"))

  private def disease(c: org.apache.spark.sql.Column) = ColFns.curie("mondo", c)

  private def refs = Kernels.setJoinAgg(concat(lit("ref:"), col("l_orderkey")))

  /** OpenTargets analog: diseases arrive as customer NAMES and resolve via
    * the J5 fallback chain (preferred vocabulary first, then the full
    * mapping), then aggregate. */
  def opentargets(s: SparkSession, d: String): DataFrame = {
    val named = base(s, d).filter(col("prio") === "1-URGENT")
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_name"))), Seq("o_custkey"))
    val primary = Tables.customer(s, d).filter(col("c_acctbal") > 0)
      .select(col("c_name").as("from_id"), col("c_custkey").as("to_id"))
    val fallback = Tables.customer(s, d)
      .select(col("c_name").as("from_id"), col("c_custkey").as("to_id"))
    Kernels.fallbackMap(named, col("c_name"), Seq(primary, fallback))
      .groupBy(col("gene"), disease(col("resolved")).as("disease"))
      .agg(max(col("o_totalprice")).as("ot_score"), refs.as("refs"))
      .withColumn("source", lit("opentargets"))
  }

  def clinvar(s: SparkSession, d: String): DataFrame =
    base(s, d).filter(col("prio") === "2-HIGH")
      .groupBy(col("gene"), disease(col("o_custkey")).as("disease"))
      .agg(Kernels.effectFoldWithUnknown(col("o_orderstatus"), "P").as("clin_sig"),
        refs.as("refs"))
      .withColumn("source", lit("clinvar"))

  def disgenetGda(s: SparkSession, d: String): DataFrame =
    base(s, d).filter(col("prio") === "3-MEDIUM" && col("l_returnflag") === "N")
      .groupBy(col("gene"), disease(col("o_custkey")).as("disease"))
      .agg(Kernels.median3(col("l_extendedprice")).as("gda_score"), refs.as("refs"))
      .withColumn("source", lit("disgenet_gda"))

  def disgenetVda(s: SparkSession, d: String): DataFrame =
    base(s, d).filter(col("prio") === "3-MEDIUM" && col("l_returnflag") =!= "N")
      .groupBy(col("gene"), disease(col("o_custkey")).as("disease"))
      .agg(Kernels.setJoinAgg(concat(lit("rs"), col("l_orderkey"))).as("variants"),
        refs.as("refs"))
      .withColumn("source", lit("disgenet_vda"))

  def humsavar(s: SparkSession, d: String): DataFrame =
    base(s, d).filter(col("prio") === "4-NOT SPECIFIED")
      .groupBy(col("gene"), disease(col("o_custkey")).as("disease"))
      .agg(Kernels.conflictFold(col("l_returnflag")).as("variant_category"),
        refs.as("refs"))
      .withColumn("source", lit("humsavar"))

  def kegg(s: SparkSession, d: String): DataFrame =
    base(s, d).filter(col("prio") === "5-LOW" && col("l_linestatus") === "F")
      .groupBy(col("gene"), disease(col("o_custkey")).as("disease"))
      .agg(Kernels.setJoinAgg(col("l_linestatus")).as("kegg_evidence"),
        refs.as("refs"))
      .withColumn("source", lit("kegg"))

  /** `salts` > 0 switches the aggregation to the two-phase salted form
    * (Scale.saltedAgg): a hot (gene, disease) key — one disease studied by
    * thousands of papers is the realistic 100 TB skew — spreads over
    * `salts` reducers in the partial phase; the final merge is algebraic
    * (count → sum, set-join → distinct-flatten), so the result is
    * IDENTICAL to the direct group-by (equality + hot-key-spread proven in
    * ScaleSpec). Off by default: at benign skew the extra shuffle isn't
    * free, and AQE's skew handling cannot help here anyway (skew sits in
    * the aggregation feeding a full-outer chain, which OptimizeSkewedJoin
    * refuses to split). */
  def diseasesKnowledge(s: SparkSession, d: String, salts: Int = 0): DataFrame = {
    val b = base(s, d).filter(col("prio") === "5-LOW" && col("l_linestatus") =!= "F")
    val direct = b
      .groupBy(col("gene"), disease(col("o_custkey")).as("disease"))
      .agg(count(lit(1)).as("knowledge_conf"), refs.as("refs"))
    val agg =
      if (salts <= 0) direct
      else graft.ops.Scale.saltedAgg(
        b.select(col("gene"), disease(col("o_custkey")).as("disease"),
          concat(lit("ref:"), col("l_orderkey")).as("__ref")),
        Seq("gene", "disease"), salts,
        Seq((count(lit(1)), "knowledge_conf"),
          (collect_set(col("__ref")), "__refs_part")),
        {
          case "knowledge_conf" => sum(col("knowledge_conf"))
          case n => array_sort(array_distinct(flatten(collect_list(col(n)))))
        })
        .withColumn("refs", concat_ws("|", col("__refs_part")))
        .drop("__refs_part")
    agg.withColumn("source", lit("diseases_knowledge"))
  }

  /** The 7-chain merge (disease.py:1225-1291). `salts` forwards to the
    * skew-prone aggregation (see [[diseasesKnowledge]]). */
  def merged(s: SparkSession, d: String, salts: Int = 0): DataFrame =
    Kernels.outerMergeChain(
      Seq(opentargets(s, d), clinvar(s, d), disgenetGda(s, d),
        disgenetVda(s, d), humsavar(s, d), kegg(s, d),
        diseasesKnowledge(s, d, salts)),
      Seq("gene", "disease"),
      pipeCols = Set("source", "refs"))
      .select(col("gene"), col("disease"), col("source"), col("refs"),
        col("ot_score"), col("clin_sig"), col("gda_score"), col("variants"),
        col("variant_category"), col("kegg_evidence"), col("knowledge_conf"))
}
