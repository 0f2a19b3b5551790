package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Kernels

/** Drug→side-effect integration — the Spark re-expression of the
  * reference's side_effect module (node_data/side_effect.py:
  * merge_drug_side_effect_data :258-280): three sources keyed
  * (drugbank_id, meddra_id), each deduped first-seen per key
  * (drop_duplicates :201,224), then two chained outer merges with the
  * pipe-merged source column.
  *
  *  - ADReCS (:~130): ids resolve through a broadcast dict chain before
  *    the key dedup;
  *  - SIDER (:181-200): drug ids resolve through a TWO-step dict chain
  *    (cid → name → drugbank id), frequency kept as a string;
  *  - OffSides (:210-232): rxcui → drugbank broadcast dict, meddra ids
  *    admitted only when numeric (`isnumeric`), proportional reporting
  *    ratio rounded to 3 dp (:221).
  *
  * Analog mapping: drug ≈ part, side effect ≈ customer (via orders), the
  * three sources are order-status slices; the dicts are part-derived
  * broadcast dimensions. Scale: three aggregates + two outer joins on the
  * same key — exchange-reused like every other merge chain; all mapping
  * joins broadcast.
  */
object SideEffectPipeline {

  private def base(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey"), col("o_custkey"), col("o_orderstatus"),
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))

  /** badd/rxcui → drugbank broadcast dimension (a part-derived dict). */
  private def drugbankMap(s: SparkSession, d: String, minPrice: Double): DataFrame =
    Tables.part(s, d).filter(col("p_retailprice") > minPrice)
      .select(col("p_partkey").as("from_id"),
        concat(lit("drugbank:DB"), col("p_partkey")).as("drugbank_id"))

  private def keepFirst(df: DataFrame, extraOrder: Seq[org.apache.spark.sql.Column]) =
    Kernels.keepBestPerKey(df, Seq("drugbank_id", "meddra_id"),
      Seq(col("l_orderkey").asc, col("l_linenumber").asc) ++ extraOrder)

  /** ADReCS analog: dict-resolved ids, key dedup, no props. */
  private[pipelines] def adrecs(s: SparkSession, d: String): DataFrame =
    adrecsFrom(base(s, d), s, d)

  private def adrecsFrom(b: DataFrame, s: SparkSession,
      d: String): DataFrame =
    keepFirst(
      b.filter(col("o_orderstatus") === "F")
        .join(broadcast(drugbankMap(s, d, 0)), col("l_partkey") === col("from_id"))
        .withColumn("meddra_id", col("o_custkey").cast("string")),
      Nil)
      .select(col("drugbank_id"), col("meddra_id"), lit("ADReCS").as("source"))

  /** SIDER analog: two-step dict chain (key → name → drugbank id),
    * frequency bucket string. */
  private[pipelines] def sider(s: SparkSession, d: String): DataFrame =
    siderFrom(base(s, d), s, d)

  private def siderFrom(b: DataFrame, s: SparkSession,
      d: String): DataFrame = {
    // p_name alone is NOT unique in the testdata (64 distinct names) — a
    // name-keyed dict would fan out; disambiguate the way the reference's
    // drug-name dicts are implicitly unique-keyed
    val uname = concat(col("p_name"), lit("#"), col("p_partkey"))
    val keyToName = Tables.part(s, d)
      .select(col("p_partkey").as("k"), uname.as("nm"))
    val nameToDb = Tables.part(s, d)
      .select(uname.as("nm"),
        concat(lit("drugbank:DB"), col("p_partkey")).as("drugbank_id"))
    val freq = floor(col("l_quantity")).cast("long") % 4
    keepFirst(
      b.filter(col("o_orderstatus") === "O")
        .join(broadcast(keyToName), col("l_partkey") === col("k"))
        .join(broadcast(nameToDb), Seq("nm"))
        .withColumn("meddra_id", col("o_custkey").cast("string"))
        .withColumn("frequency",
          when(freq === 0, "rare").when(freq === 1, "infrequent")
            .when(freq === 2, "frequent").otherwise("postmarketing")),
      Seq(col("frequency").asc))
      .select(col("drugbank_id"), col("meddra_id"), col("frequency"),
        lit("Sider").as("source"))
  }

  /** OffSides analog: rxcui dict, numeric-meddra admission (the
    * reference's `isnumeric`), PRR rounded 3 dp. */
  private[pipelines] def offsides(s: SparkSession, d: String): DataFrame =
    offsidesFrom(base(s, d), s, d)

  private def offsidesFrom(b: DataFrame, s: SparkSession,
      d: String): DataFrame = {
    // every 7th id arrives in a prefixed non-numeric shape and must drop
    val meddraRaw = when(col("o_custkey") % 7 === 0,
      concat(lit("M"), col("o_custkey"))).otherwise(col("o_custkey").cast("string"))
    keepFirst(
      b.filter(col("o_orderstatus") === "P")
        .join(broadcast(drugbankMap(s, d, 1200)), col("l_partkey") === col("from_id"))
        .withColumn("meddra_id", meddraRaw)
        .filter(col("meddra_id").rlike("^[0-9]+$"))
        .withColumn("proportional_reporting_ratio",
          round(col("l_extendedprice") / 1000.0, 3)),
      Seq(col("proportional_reporting_ratio").asc))
      .select(col("drugbank_id"), col("meddra_id"),
        col("proportional_reporting_ratio"), lit("OffSides").as("source"))
  }

  /** Side-effect node builder (side_effect.py:296-334 `get_nodes`): the
    * meddra→name dict is a PRIORITY union — SIDER names win, OffSides fills
    * gaps (numeric meddra ids only, :309-310), ADReCS fills the rest with
    * its badd term (:314-316); ADReCS synonyms attach where present,
    * escaped `|`→`,` `'`→`^` (:319, with the name's extra `"` removal at
    * :326). Single-synonym terms are normalized to a 1-element array (the
    * reference emits a bare string there — schema discipline instead).
    * One row per meddra id; each source contributes its DISTINCT id set,
    * so the priority window is deterministic. */
  def nodes(s: SparkSession, d: String): DataFrame = {
    import graft.core.ColFns
    // ONE lineitem⋈orders scan: all three source id-sets are per-custkey
    // presence predicates (the OffSides numeric-meddra admission is the
    // custkey%7 test — M-prefixed ids never qualify), so the priority
    // union + keep-best window and the ADReCS left join both collapse
    // into a single conditional aggregation (the mergedSinglePass trick;
    // previously each id-set re-derived base, 4 shuffle joins per run).
    val pres = base(s, d).groupBy(col("o_custkey"))
      .agg(
        min(when(col("o_orderstatus") === "O", 1)
          .when(col("o_orderstatus") === "P" &&
            !(col("o_custkey") % 7 === 0), 2)
          .when(col("o_orderstatus") === "F", 3)).as("prio"),
        max((col("o_orderstatus") === "F").cast("int")).as("__adr"))
      .filter(col("prio").isNotNull)
      .select(col("o_custkey").cast("string").as("mid"), col("prio"),
        when(col("__adr") === 1, lit(true)).as("has_syn"))
    val named = pres
      .join(Tables.customer(s, d),
        col("mid") === col("c_custkey").cast("string"))
    val nameEsc = (c: org.apache.spark.sql.Column) => translate(c, "'|\"", "^,")
    val raw = named.select(
      concat(lit("meddra:"), col("mid")).as("id"),
      lit("side_effect").as("label"),
      when(col("prio") === 1, nameEsc(col("c_name")))
        .when(col("prio") === 2, nameEsc(upper(col("c_name"))))
        .otherwise(nameEsc(concat(lit("badd "), col("c_name")))).as("name"),
      when(col("has_syn"), array_sort(array(
        ColFns.escapeProps(lower(col("c_name"))),
        concat(lit("syn:"), col("mid"))))).as("synonyms"))
    graft.core.SchemaRegistry.conformNodes(raw, "side_effect")
  }

  /** ADReCS side-effect hierarchy edges
    * (side_effect.py:402-417 `get_adrecs_side_effect_hierarchical_edges`):
    * one child→parent edge per ontology relation where BOTH ends resolve
    * through the adrecs_adr_id→meddra broadcast dict (:411 — the
    * both-present guard drops relations with an unmapped end), meddra
    * CURIE prefixes, label `side_effect_is_a_side_effect`. NOTE the
    * reference only reaches this builder under the swapped
    * DRUG_TO_SIDE_EFFECT guard (side_effect.py:366-367, the §7.3.8 bug);
    * the engine wires each builder to its own semantics
    * (ReferenceDeviationsSpec). Analog: relations child ck → parent ck/7
    * over the customer domain; the dict covers ids with ck%4≠0. */
  def hierarchyEdges(s: SparkSession, d: String): DataFrame = {
    val dict = Tables.customer(s, d)
      .filter(col("c_custkey") % 4 =!= 0)
      .select(col("c_custkey").as("from_id"),
        col("c_custkey").cast("string").as("meddra_id"))
    val rel = Tables.customer(s, d).filter(col("c_custkey") >= 7)
      .select(col("c_custkey").as("child"),
        floor(col("c_custkey") / 7).cast("long").as("parent"))
    rel
      .join(broadcast(dict.withColumnRenamed("meddra_id", "child_meddra")),
        col("child") === col("from_id")).drop("from_id")
      .join(broadcast(dict.withColumnRenamed("meddra_id", "parent_meddra")),
        col("parent") === col("from_id")).drop("from_id")
      .select(
        concat(lit("meddra:"), col("child_meddra")).as("src"),
        concat(lit("meddra:"), col("parent_meddra")).as("dst"),
        lit("side_effect_is_a_side_effect").as("label"))
  }

  /** merge_drug_side_effect_data: (adrecs ⟗ sider) ⟗ offsides, source
    * pipe-merged, value columns coalesced. */
  def merged(s: SparkSession, d: String): DataFrame = {
    // one eager cut of the shared lineitem⋈orders base for all three
    // sources (the GeneDiseasePipeline.merged discipline — without it
    // each source's aggregate replays the fact join); chain structure
    // unchanged, mergedSinglePass stays the registered 100 TB plan
    val b = base(s, d).localCheckpoint(true)
    Kernels.outerMergeChain(
      Seq(adrecsFrom(b, s, d), siderFrom(b, s, d), offsidesFrom(b, s, d)),
      Seq("drugbank_id", "meddra_id"),
      pipeCols = Set("source"))
      .select(col("drugbank_id"), col("meddra_id"), col("source"),
        col("frequency"), col("proportional_reporting_ratio"))
  }

  /** Single-pass form of [[merged]]: ONE lineitem⋈orders scan + one
    * broadcast part dim + ONE hash aggregation, vs three source builds
    * (7 joins) + two outer joins + three ranking windows. The transforms
    * that make it bit-equal:
    *  - each source's keep-first-by-(l_orderkey, l_linenumber, tiebreak)
    *    window becomes a min-over-struct aggregate — lexicographic struct
    *    order IS the window order, so the carried payload field matches;
    *  - the sider two-step name dict resolves to the identity partkey→
    *    DB-id mapping (unique-suffixed names), so it needs no join at
    *    all; adrecs/offsides dict admission becomes the retail-price
    *    predicate on the broadcast dim;
    *  - the chain's sorted-distinct pipe merge becomes an alphabetical
    *    concat_ws over per-source presence counts.
    * Registered under the SAME oracle — the driver's hash compare
    * enforces bit-equality with the faithful chain. */
  def mergedSinglePass(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.part(s, d).select(col("p_partkey"), col("p_retailprice"))
    val rows = base(s, d)
      .join(broadcast(dim), col("l_partkey") === col("p_partkey"))
      .withColumn("src",
        when(col("o_orderstatus") === "F" && col("p_retailprice") > 0, "A")
          .when(col("o_orderstatus") === "O", "S")
          .when(col("o_orderstatus") === "P" && col("p_retailprice") > 1200 &&
            !(col("o_custkey") % 7 === 0), "F2"))
      .filter(col("src").isNotNull)
      .withColumn("drugbank_id", concat(lit("drugbank:DB"), col("l_partkey")))
      .withColumn("meddra_id", col("o_custkey").cast("string"))
    val freq = floor(col("l_quantity")).cast("long") % 4
    val freqStr = when(freq === 0, "rare").when(freq === 1, "infrequent")
      .when(freq === 2, "frequent").otherwise("postmarketing")
    val prr = round(col("l_extendedprice") / 1000.0, 3)
    def firstOf(src: String, value: org.apache.spark.sql.Column) =
      min(when(col("src") === src,
        struct(col("l_orderkey"), col("l_linenumber"), value.as("v"))))
        .getField("v")
    def present(src: String) = count(when(col("src") === src, lit(1))) > 0
    rows.groupBy(col("drugbank_id"), col("meddra_id"))
      .agg(
        firstOf("S", freqStr).as("frequency"),
        firstOf("F2", prr).as("proportional_reporting_ratio"),
        concat_ws("|",
          when(present("A"), "ADReCS"),
          when(present("F2"), "OffSides"),
          when(present("S"), "Sider")).as("source"))
      .select(col("drugbank_id"), col("meddra_id"), col("source"),
        col("frequency"), col("proportional_reporting_ratio"))
  }
}
