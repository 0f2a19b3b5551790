package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ops.ViewMaintain

/** Streaming incremental JOIN-view maintenance — the streaming twin of
  * [[ViewMaintain]] (`x_view_maintain_join`): one stream of tagged delta
  * rows (`sideCol` = "a" | "b") maintains both base tables AND the
  * materialized inner-join view, micro-batch by micro-batch, each trigger
  * paying O(|Δ|·match-fanout) — the 100 TB bases are only ever PROBED by
  * the three delta joins, never rescanned or rewritten.
  *
  * Epoch discipline (the SketchStreams/streamToParquet exactly-once
  * pattern): batch `i` writes `view/delta_<i>`, `base_a/delta_<i>`,
  * `base_b/delta_<i>`, READING only strictly-older epochs as the bases —
  * so a crashed batch replays into its own three directories
  * deterministically (same inputs → same bytes, mode overwrite), and the
  * accumulated view `Σ view/delta_*` equals the one-shot join of
  * everything seen (ViewStreamsSpec proves ≡ batch recompute and replay
  * idempotence). Within one batch the delta×delta term covers a-rows and
  * b-rows arriving TOGETHER, so arrival interleaving never loses pairs.
  */
object ViewStreams {

  /** Start the view-maintenance stream. `changes` carries `sideCol` plus
    * the union of both sides' columns; side "a" rows are projected to
    * `keys ++ aCols`, side "b" to `keys ++ bCols`. */
  def streamingJoinView(
      changes: DataFrame, sideCol: String,
      keys: Seq[String], aCols: Seq[String], bCols: Seq[String],
      outRoot: String, checkpointDir: String): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        val da = batch.filter(col(sideCol) === "a")
          .select((keys ++ aCols).map(col): _*)
        val db = batch.filter(col(sideCol) === "b")
          .select((keys ++ bCols).map(col): _*)
        val a = epochsBefore(s, s"$outRoot/base_a", batchId, da.schema)
        val b = epochsBefore(s, s"$outRoot/base_b", batchId, db.schema)
        ViewMaintain.joinViewDelta(a, da, b, db, keys)
          .write.mode("overwrite").parquet(s"$outRoot/view/delta_$batchId")
        da.write.mode("overwrite").parquet(s"$outRoot/base_a/delta_$batchId")
        db.write.mode("overwrite").parquet(s"$outRoot/base_b/delta_$batchId")
      }
      .start()

  /** The maintained view: every committed view delta, unioned. */
  def currentView(spark: SparkSession, outRoot: String): DataFrame = {
    val dirs = deltaDirs(s"$outRoot/view", Long.MaxValue)
    require(dirs.nonEmpty, s"no view epochs under $outRoot/view")
    spark.read.parquet(dirs: _*)
  }

  /** Union of all delta epochs strictly older than `batchId` (empty frame
    * of the given schema when none exist — batch 0's bases). */
  private def epochsBefore(spark: SparkSession, dir: String,
      batchId: Long, schema: StructType): DataFrame = {
    val dirs = deltaDirs(dir, batchId)
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.parquet(dirs: _*)
  }

  private def deltaDirs(dir: String, beforeId: Long): Seq[String] =
    Option(new java.io.File(dir).list()).getOrElse(Array.empty[String])
      .filter(_.startsWith("delta_"))
      .map(_.stripPrefix("delta_").toLong)
      .filter(_ < beforeId).sorted
      .map(id => s"$dir/delta_$id").toSeq
}
