package org.apache.spark.sql.execution

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge into `SparkSession.internalCreateDataFrame` (private[sql]) —
  * the one hook a V1 streaming [[org.apache.spark.sql.execution.streaming.Source]]
  * needs: `getBatch` must return a frame whose `isStreaming` flag is set
  * (MicroBatchExecution asserts it), and the only way to mint one from a
  * computed batch plan is this internal constructor. Same pattern as the
  * built-in FileStreamSource; lives in the spark.sql.execution package
  * for visibility, like [[GraftSpillableRowArray]]. */
object GraftStreamingBridge {
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    cs.internalCreateDataFrame(
      cds.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The SINK-side twin: a V1 [[org.apache.spark.sql.execution.streaming.Sink]]'s
    * `addBatch` frame is backed by the trigger's IncrementalExecution —
    * re-planning it through ordinary writer paths re-executes the
    * streaming plan. Re-minting it over the already-planned `toRdd` as a
    * NON-streaming frame (the DeltaSink/FileStreamSink pattern) makes it
    * a plain batch input the transactional commit paths can stage. */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    cs.internalCreateDataFrame(
      cds.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
