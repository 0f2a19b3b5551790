package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.graph.GraphOps

/** Streaming graph maintenance — the rolling form of the incremental
  * connected-components fold: a stream of NEW edges updates a persisted
  * (node, component) labeling micro-batch by micro-batch through
  * [[GraphOps.connectedComponentsIncremental]], so each trigger pays
  * O(batch + touched components) and the settled edge set is NEVER
  * rescanned — the cost model a growing 100 TB graph actually needs
  * (full CC per trigger would be O(all edges seen), quadratic over the
  * stream's life).
  *
  * foreachBatch for the same reason as [[DedupStreams]]: the fold reads
  * its own prior OUTPUT (the label table), a self-dependency Structured
  * Streaming's stateful operators cannot express, while epoch-per-batch
  * parquet state makes crash replay exact — `state_<batchId>` reads only
  * strictly OLDER epochs and overwrites its own directory (the
  * [[SketchStreams]] discipline), so a replayed batch recomputes the
  * identical labeling.
  *
  * Exactness is inductive: batch 0's labels are plain CC over batch 0;
  * every later epoch folds one batch through the contraction argument
  * proven in GraphOpsSpec (min of constituent mins = the union
  * component's min), so after ANY number of batches the label table
  * equals the one-shot recompute over every edge seen (pinned in
  * GraphStreamsSpec). */
object GraphStreams {

  /** Start the maintenance query over a stream of (src, dst) edges.
    * State epochs land under `stateDir/state_<batchId>/labels`. */
  def streamingComponentMaintenance(incoming: DataFrame,
      stateDir: String, checkpointDir: String): StreamingQuery =
    incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        val e = batch.toDF().select(col("src"), col("dst"))
        val labels = SketchStreams.epochBefore(stateDir, "state_", batchId,
          markerRel = "labels/_SUCCESS")
          match {
            case Some(dir) => GraphOps.connectedComponentsIncremental(
              s, s.read.parquet(s"$dir/labels"), e)
            case None => GraphOps.connectedComponents(s, e)
          }
        labels.write.mode("overwrite")
          .parquet(s"$stateDir/state_$batchId/labels")
      }
      .start()

  /** The newest COMPLETE label-table epoch: selection is gated on the
    * epoch's parquet `_SUCCESS` marker, so a reader racing a crashed
    * mid-write epoch (between crash and replay) reads the last committed
    * labeling, never a truncated one. */
  def latestComponents(
      spark: org.apache.spark.sql.SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(
      SketchStreams.epochBefore(stateDir, "state_", Long.MaxValue,
        markerRel = "labels/_SUCCESS")
        .getOrElse(sys.error(s"no state epochs under $stateDir")) + "/labels")
}
