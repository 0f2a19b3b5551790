package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over quantized embeddings — deterministic end
  * to end, so the DuckDB oracle replicates every iteration bit-exact.
  *
  * The textbook algorithm is non-deterministic on a cluster in two places;
  * both are closed here:
  *
  *  - init: centroids are the vectors whose id is divisible by
  *    `centroidStep` (the deterministic sample the IVF index also uses),
  *    not random picks;
  *  - the mean: per-dimension sums run over BIGINT-quantized elements
  *    (`floor(x·1e6)`) — integer addition commutes, so partition/arrival
  *    order can never change a centroid, and the single double division
  *    per dimension is IEEE-deterministic. Assignment is L2² with a
  *    sequential fold and centroid-id tie-break.
  *
  * Scale shape per iteration: assignment joins against a BROADCAST
  * centroid dimension (k rows) and ranks per vector; the recompute is one
  * shuffle keyed (cluster, dim) + one keyed (cluster) — never a driver
  * collect, never an all-pairs join. Empty clusters simply drop out of the
  * next iteration (inner semantics on both engines). */
object KMeans {

  private val Scale = 1e6

  /** Nearest centroid per vector: (dist² asc, cid asc). */
  private def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("dist"), col("cid"))
    vecs.join(broadcast(cents), lit(true))
      .select(col("id"), col("q"), col("cid"),
        Similarity.l2sq(col("vq"), col("cv")).as("dist"), col("vq"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("q"), col("vq"), col("cid"), col("dist"))
  }

  /** Exact integer per-dimension sums → new centroid means. */
  private def recompute(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("q")).as(Seq("pos", "qv")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("cid"))
      .agg(collect_list(struct(col("pos"), col("s"), col("n"))).as("ps"))
      .select(col("cid"),
        transform(array_sort(col("ps")),
          t => t("s").cast("double") / (t("n").cast("double") * Scale))
          .as("cv"))

  /** `iters` Lloyd iterations; returns (vec_id, cluster, dist2) where
    * cluster is the surviving initial-centroid id and dist2 the final L2²
    * to its centroid. */
  def kmeans(
      emb: DataFrame, idCol: String, vecCol: String,
      centroidStep: Long = 40, iters: Int = 2): DataFrame = {
    graft.functions.L2Squared.register(emb.sparkSession)
    // deliberately NOT checkpointed: at bench scale the whole Lloyd
    // chain recomputes cheaply (small embedding table), and eager cuts
    // here measured a net LOSS — they tax every cheap consumer (the
    // x_semdedup_eps sweep tripled) for plan-size savings the optimizer
    // absorbs at iters = 2
    val base = emb
      .select(col(idCol).as("id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * Scale).cast("long")).as("q"))
      .withColumn("vq", transform(col("q"), x => x.cast("double") / Scale))
    var cents = base.filter(col("id") % centroidStep === 0)
      .select(col("id").as("cid"), col("vq").as("cv"))
    var assigned = assign(base, cents)
    for (_ <- 2 to iters) {
      cents = recompute(assigned)
      assigned = assign(base, cents)
    }
    assigned.select(col("id").as("vec_id"), col("cid").as("cluster"),
      col("dist").as("dist2"))
  }
}
