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
    maintained(incoming, outDir, "registers_", checkpointDir)(
      b => Sketches.hllRegisters(b, textCol, groupCol, p), Sketches.hllMerge)

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
    maintained(incoming, outDir, "cells_", checkpointDir)(
      b => Relevance.cmsCells(b, textCol, depth, width), Relevance.cmsMerge)

  /** The newest committed CMS cell epoch (to probe via Relevance.cmsProbe). */
  def latestCells(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(
      epochBefore(outDir, "cells_", Long.MaxValue)
        .getOrElse(sys.error(s"no cell epochs under $outDir")))

  /** Streaming histogram-bin maintenance — the third mergeable-sketch
    * state (Sketches.histogramBins, SUM-merged like the CMS): keeps the
    * length/metric distribution queryable (quantileRanksFromBins) while
    * the corpus streams in. */
  def streamingHistogramBins(
      incoming: DataFrame, valueCol: String,
      outDir: String, checkpointDir: String, binWidth: Int = 50): StreamingQuery =
    maintained(incoming, outDir, "bins_", checkpointDir)(
      b => Sketches.histogramBins(b, valueCol, binWidth),
      Sketches.histogramMerge)

  /** The newest committed histogram epoch. */
  def latestBins(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(
      epochBefore(outDir, "bins_", Long.MaxValue)
        .getOrElse(sys.error(s"no bin epochs under $outDir")))

  /** Streaming KMV maintenance — the MIN-merge law completing the
    * mergeable family (HLL max, CMS sum, histogram sum, KMV min): each
    * micro-batch sketches just its documents (k smallest distinct hashes
    * per group) and Sketches.kmvMerge re-truncates the union with the
    * newest prior epoch. Set-union distinctness makes the merge
    * idempotent, so crash replay under the epoch discipline is
    * exactly-once; estimates (and kmvSetOps pair algebra) read the
    * committed sketch table without touching the corpus. */
  def streamingKmvSketch(
      incoming: DataFrame, textCol: String, groupCol: String,
      outDir: String, checkpointDir: String, k: Int = 64): StreamingQuery =
    maintained(incoming, outDir, "kmv_", checkpointDir)(
      b => Sketches.kmvSketch(b, textCol, groupCol, k), Sketches.kmvMerge(k))

  /** The newest committed KMV sketch epoch. */
  def latestKmv(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(
      epochBefore(outDir, "kmv_", Long.MaxValue)
        .getOrElse(sys.error(s"no kmv epochs under $outDir")))

  /** Streaming materialized-aggregate maintenance — the epoch skeleton
    * applied to BUSINESS aggregates rather than sketch cells: each
    * micro-batch is aggregated alone (O(batch)) and SUM-merged into the
    * newest prior per-key state via [[graft.sources.Sinks.mergeAggState]],
    * keeping an always-fresh key-dimension-sized table (e.g. revenue per
    * customer) no trigger of which ever rescans history. Counts ride as
    * sums of 1s; the same crash-replay epoch discipline as the sketches
    * (a replayed batch overwrites its own epoch, reading only
    * strictly-older state). */
  def streamingAggMaintain(
      incoming: DataFrame, keys: Seq[String], sums: Seq[String],
      outDir: String, checkpointDir: String): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, sum}
    def aggOf(df: DataFrame): DataFrame = {
      val aggs = sums.map(c => sum(col(c)).as(c))
      df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    maintained(incoming, outDir, "agg_", checkpointDir)(
      aggOf,
      (base, delta) => graft.sources.Sinks.mergeAggState(
        base, delta, keys, sums))
  }

  /** The newest committed aggregate-state epoch. */
  def latestAgg(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(
      epochBefore(outDir, "agg_", Long.MaxValue)
        .getOrElse(sys.error(s"no aggregate epochs under $outDir")))

  /** Incremental Naive-Bayes RETRAINING — the model-maintenance shape of
    * the sketch streams: the NB model state is two sum-mergeable count
    * tables ([[Relevance.nbModelCounts]] — per-(class, token) counts and
    * per-class doc counts), so each micro-batch trains on ITSELF
    * (O(batch)) and sum-merges into the settled model; scoring any probe
    * set against the maintained state
    * ([[Relevance.nbScoreMatrixFromModel]]) equals scoring against a
    * one-shot train over everything seen (counts are additive over the
    * disjoint epochs the replay discipline guarantees). Both tables write
    * under one epoch id reading only strictly-older epochs, so a crashed
    * batch replays both deterministically. At 100 TB the model tables are
    * vocab- and class-sized — the corpus is never re-read to retrain. */
  def streamingNbModel(
      incoming: DataFrame, textCol: String, classCol: String,
      outDir: String, checkpointDir: String): StreamingQuery =
    incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val (m, cls) = Relevance.nbModelCounts(batch.toDF(), textCol, classCol)
        val mergedM = epochBefore(outDir, "nbm_", batchId) match {
          case Some(dir) => graft.sources.Sinks.mergeAggState(
            spark.read.parquet(dir), m, Seq("cl", "w"), Seq("c"))
          case None => m
        }
        val mergedC = epochBefore(outDir, "nbc_", batchId) match {
          case Some(dir) => graft.sources.Sinks.mergeAggState(
            spark.read.parquet(dir), cls, Seq("cl"), Seq("n_docs"))
          case None => cls
        }
        mergedM.write.mode("overwrite").parquet(s"$outDir/nbm_$batchId")
        mergedC.write.mode("overwrite").parquet(s"$outDir/nbc_$batchId")
      }
      .start()

  /** The newest committed NB model state: (token counts, class counts).
    * The epoch is chosen from `nbc_` — the batch's LAST write — so a
    * crash between the two table writes can never serve a torn pair
    * (nbm_N paired with nbc_{N−1}); nbm at the same id is guaranteed to
    * exist because it was written first. */
  def latestNbModel(spark: SparkSession, outDir: String): (DataFrame, DataFrame) = {
    val c = epochBefore(outDir, "nbc_", Long.MaxValue)
      .getOrElse(sys.error(s"no NB class epochs under $outDir"))
    // rebuild from the epoch id — a replace over the full path would also
    // rewrite any "/nbc_" appearing inside outDir itself
    val id = c.substring(c.lastIndexOf("/nbc_") + "/nbc_".length)
    val m = s"$outDir/nbm_$id"
    (spark.read.parquet(m), spark.read.parquet(c))
  }

  /** Shared epoch-maintenance skeleton: per micro-batch, compute the
    * batch's sketch state, merge it with the newest STRICTLY-OLDER epoch,
    * overwrite `<prefix><batchId>` — so a crashed batch replays into its
    * own directory deterministically (exactly-once for any merge law,
    * idempotent max or additive sum alike). */
  private def maintained(
      incoming: DataFrame, outDir: String, prefix: String,
      checkpointDir: String)(
      state: DataFrame => DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame): StreamingQuery =
    incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = state(batch.toDF())
        val merged = epochBefore(outDir, prefix, batchId) match {
          case Some(dir) => merge(batch.sparkSession.read.parquet(dir), s)
          case None => s
        }
        merged.write.mode("overwrite").parquet(s"$outDir/$prefix$batchId")
      }
      .start()

  /** Newest epoch directory strictly older than `batchId` — gated on a
    * COMPLETENESS marker (parquet's `_SUCCESS`, or `markerRel` for
    * epochs whose parquet lives in a subdirectory): a crash mid-write
    * leaves a partial epoch without the marker, and an external reader
    * hitting the state between crash and replay must not read it as
    * truncated data (the round-8 advisory). The replay path itself is
    * unaffected — a replayed batch reads strictly OLDER epochs and
    * overwrites its own partial one. Hadoop FileSystem, so state dirs
    * may live on a cluster filesystem like every other metadata path. */
  private[streaming] def epochBefore(
      outDir: String, prefix: String, batchId: Long,
      markerRel: String = "_SUCCESS"): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return None
    val ids = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toLong)
      .filter(id => id < batchId &&
        fs.exists(new org.apache.hadoop.fs.Path(root, s"$prefix$id/$markerRel")))
    if (ids.isEmpty) None else Some(s"$outDir/$prefix${ids.max}")
  }
}
