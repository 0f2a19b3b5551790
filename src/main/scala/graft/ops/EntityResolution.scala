package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage: blocked fuzzy matching of entity
  * names — the operation behind merging free-text source vocabularies
  * (drug names, disease labels) where ids are absent and spellings drift.
  *
  * The scale shape is DISTINCT-VALUE matching: records are first reduced
  * to their distinct names with multiplicities (a partial-aggregating
  * groupBy — at 100 TB the name domain is orders of magnitude smaller
  * than the record count), then candidate pairs are generated only within
  * blocks (records that disagree on the block key are never compared),
  * and the quadratic Levenshtein step runs on distinct-name blocks, not
  * record blocks. Emitting matched NAME pairs with their record counts
  * keeps the output linear in the name domain; materializing record-pair
  * rosters would square it back.
  */
object EntityResolution {

  /** Fuzzy-match distinct values of `nameCol` within blocks.
    *
    * @param blockKey blocking function over the name (e.g. last token,
    *                 phonetic key, length bucket) — standard ER blocking:
    *                 recall is traded for never comparing across blocks
    * @param maxDist  Levenshtein admission threshold; distance-0 pairs
    *                 are excluded (identical names are exact duplicates,
    *                 the business of [[graft.dedup.Dedup.exactGroups]])
    * @return (name_a, name_b, dist, n_a, n_b) with name_a < name_b,
    *         1 <= dist <= maxDist, n_* = record multiplicities
    */
  def blockedNameMatch(records: DataFrame, nameCol: String,
      blockKey: Column => Column, maxDist: Int = 4): DataFrame = {
    val names = records.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n"))
      .select(blockKey(col("name")).as("blk"), col("name"), col("n"))
    val a = names.select(col("blk"), col("name").as("name_a"), col("n").as("n_a"))
    val b = names.select(col("blk"), col("name").as("name_b"), col("n").as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist").between(1, maxDist))
      .select("name_a", "name_b", "dist", "n_a", "n_b")
  }

  /** Entity clusters from the blocked fuzzy matches — the transitive-
    * closure step between matching and survivorship: matched NAME pairs
    * form an undirected graph, connected components give the entity, and
    * every record attaches through its name. Names stay the unit of
    * clustering (the distinct-name domain, not the record count); the
    * GraphX vertex id of a name is its MIN record key — derivable by an
    * independent engine, so the whole closure oracle-replicates as a
    * recursive CTE over the same edges. Names with no fuzzy match are
    * their own singleton cluster (left join + coalesce).
    * Output: (name, cluster_id). */
  def nameClusters(records: DataFrame, keyCol: String, nameCol: String,
      blockKey: Column => Column, maxDist: Int = 4): DataFrame = {
    val nids = records.groupBy(col(nameCol).as("name"))
      .agg(min(col(keyCol)).as("nid"))
    val edges = blockedNameMatch(records, nameCol, blockKey, maxDist)
      .join(nids.select(col("name").as("name_a"), col("nid").as("a")),
        Seq("name_a"))
      .join(nids.select(col("name").as("name_b"), col("nid").as("b")),
        Seq("name_b"))
      .select(col("a"), col("b"))
    val cc = graft.graph.GraphOps
      .connectedComponents(records.sparkSession, edges)
    nids.join(cc.select(col("node").as("nid"), col("component")),
        Seq("nid"), "left")
      .select(col("name"),
        coalesce(col("component"), col("nid")).as("cluster_id"))
  }
}
