package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.text.Sketches

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
        val merged = epochBefore(outDir, batchId) match {
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
      epochBefore(outDir, Long.MaxValue)
        .getOrElse(sys.error(s"no register epochs under $outDir")))

  private def epochBefore(outDir: String, batchId: Long): Option[String] = {
    val ids = Option(new java.io.File(outDir).list()).getOrElse(Array.empty)
      .filter(_.startsWith("registers_"))
      .map(_.stripPrefix("registers_").toLong)
      .filter(_ < batchId)
    if (ids.isEmpty) None else Some(s"$outDir/registers_${ids.max}")
  }
}
