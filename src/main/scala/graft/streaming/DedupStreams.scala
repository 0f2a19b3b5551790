package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.dedup.Dedup

/** Streaming incremental corpus dedup — the rolling-crawl shape: a stream
  * of NEW documents is near-dup-checked AGAINST a static settled corpus,
  * micro-batch by micro-batch, through the batch
  * [[Dedup.crossSnapshotNearDups]] kernel inside foreachBatch.
  *
  * Why foreachBatch and not a stream-static join: the LSH chain needs a
  * per-document aggregation (shingles → minhash signature) on the
  * STREAMING side, which a single continuous query would have to express
  * as a stateful agg feeding a join — two stateful stages Structured
  * Streaming forbids in one query. foreachBatch runs the whole chain as a
  * bounded batch per trigger, which is also the honest cost model: each
  * trigger pays O(batch) for signatures plus a bucket join against the
  * corpus-side signatures.
  *
  * Because each batch's matches depend only on (batch, corpus) — never on
  * other batches — the union of per-batch outputs equals the one-shot
  * batch answer over the full incoming set (proven in DedupStreamsSpec),
  * and replaying a crashed epoch overwrites its own batch directory (the
  * [[EventStreams.streamToParquet]] exactly-once discipline). At 100 TB
  * the corpus signatures are computed once and persisted; here they are
  * recomputed per batch because the fixture corpus is test-sized.
  */
object DedupStreams {

  /** Start the incremental dedup stream: `incoming` is a streaming frame
    * with (`idCol`, `textCol`); every micro-batch writes its (new_id,
    * old_id, jaccard) matches under `outDir/batch_<id>`. Doc ids must be
    * disjoint from the corpus ids (the kernel's contract). */
  def streamingCrossSnapshotDedup(
      incoming: DataFrame, corpus: DataFrame, idCol: String, textCol: String,
      outDir: String, checkpointDir: String,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): StreamingQuery =
    incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Dedup.crossSnapshotNearDups(corpus, batch, idCol, textCol,
            n, numHashes, bands, threshold)
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .start()
}
