package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.text.{Relevance, Sketches}

/** Streaming sketch maintenance — the "running corpus statistics" shape: a
  * stream of new documents keeps a persisted HyperLogLog register table
  * up to date, micro-batch by micro-batch, so distinct-token cardinality
  * per group is queryable at any time without rescanning the corpus.
  *
  * This is the sketch's mergeability used OPERATIONALLY: each trigger
  * computes registers over just its batch (O(batch) work) and cell-wise
  * max-merges them into the previous state — the same update a 100 TB
  * deployment runs, where the register table is a few KB per group and the
  * corpus is never re-read. Each epoch writes `registers_<batchId>`
  * reading only strictly-older epochs, so replaying a crashed batch
  * overwrites its own directory deterministically (the
  * [[EventStreams.streamToParquet]] exactly-once discipline), and
  * [[latestRegisters]] always reads a complete, committed epoch.
  */
object SketchStreams {

  /** Start the register-maintenance stream: every micro-batch of
    * (`groupCol`, `textCol`) documents merges its HLL registers into the
    * newest prior epoch under `outDir/registers_<batchId>`. */
  def streamingHllRegisters(
      incoming: DataFrame, textCol: String, groupCol: String,
      outDir: String, checkpointDir: String, p: Int = 7): StreamingQuery =
    incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val batchRegs = Sketches.hllRegisters(batch.toDF(), textCol, groupCol, p)
        val merged = epochBefore(outDir, "registers_", batchId) match {
          case Some(dir) =>
            Sketches.hllMerge(batch.sparkSession.read.parquet(dir), batchRegs)
          case None => batchRegs
        }
        merged.write.mode("overwrite").parquet(s"$outDir/registers_$batchId")
      }
      .start()

  /** The newest committed register epoch (to estimate from). */
  def latestRegisters(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(
      epochBefore(outDir, "registers_", Long.MaxValue)
        .getOrElse(sys.error(s"no register epochs under $outDir")))

  /** Streaming count-min-sketch maintenance — the SUM-mergeable sibling of
    * [[streamingHllRegisters]]: each micro-batch computes CMS cells over
    * just its batch (O(batch) work) and cell-wise ADDS them into the
    * newest prior epoch (Relevance.cmsMerge). Counts are additive, so the
    * merged table equals the one-shot sketch of everything seen — provided
    * the merged parts are disjoint, which the epoch discipline guarantees:
    * `cells_<batchId>` reads only strictly-older epochs, so a crashed
    * batch replays into its own directory deterministically rather than
    * double-counting. */
  def streamingCmsCells(
      incoming: DataFrame, textCol: String,
      outDir: String, checkpointDir: String,
      depth: Int = 4, width: Int = 1024): StreamingQuery =
    incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val batchCells = Relevance.cmsCells(batch.toDF(), textCol, depth, width)
        val merged = epochBefore(outDir, "cells_", batchId) match {
          case Some(dir) =>
            Relevance.cmsMerge(batch.sparkSession.read.parquet(dir), batchCells)
          case None => batchCells
        }
        merged.write.mode("overwrite").parquet(s"$outDir/cells_$batchId")
      }
      .start()

  /** The newest committed CMS cell epoch (to probe via Relevance.cmsProbe). */
  def latestCells(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(
      epochBefore(outDir, "cells_", Long.MaxValue)
        .getOrElse(sys.error(s"no cell epochs under $outDir")))

  private def epochBefore(
      outDir: String, prefix: String, batchId: Long): Option[String] = {
    val ids = Option(new java.io.File(outDir).list()).getOrElse(Array.empty)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toLong)
      .filter(_ < batchId)
    if (ids.isEmpty) None else Some(s"$outDir/$prefix${ids.max}")
  }
}
