package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads modelled as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches (the Scala equivalent of a batched pandas UDF — one buffer of
  * `batchSize` rows at a time through the decoder, never a whole partition
  * materialized).
  *
  * The actual media decode is STUBBED (no image/audio codecs in this
  * environment): [[fakeDecode]] is a deterministic stand-in that derives a
  * feature vector from the bytes. The Spark-side plumbing — schema, typed
  * Dataset, batch shape, partition-local execution — is real and tested;
  * swapping [[fakeDecode]] for a JNI/codec call is the only change needed
  * for real media.
  */
object Multimodal {

  case class MediaRow(media_id: Long, content: Array[Byte], mime: String)
  case class MediaFeatures(
      media_id: Long, n_bytes: Int, digest: String, feature: Array[Float])

  /** Wrap a text table as a binary "media" table (UTF-8 payload, text/plain
    * mime) — the driver testdata has no binary column, so the engine's
    * media path is exercised on synthesized payloads. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("content"),
      lit("text/plain").as("mime"))

  /** STUB decoder — deterministic fake: 8 "channels" derived from byte
    * sums over 8 stripes of the payload, scaled by 1/256. Replace with a
    * real codec for production media.
    *
    * Exactness contract (what makes the DuckDB oracle bit-identical): the
    * stripe sums are exact integers, and dividing by 256 (a power of two)
    * only shifts the exponent — so for payloads whose stripe sums stay
    * below 2^24 (payload < ~0.5 MB) the float32 value, its float64
    * widening, and an independent engine's integer-sum/256.0 all agree to
    * the last bit. */
  def fakeDecode(content: Array[Byte]): Array[Float] = {
    val n = content.length
    val sums = new Array[Long](8)
    var i = 0
    while (i < n) {
      sums(((i.toLong * 8) / n).toInt) += (content(i) & 0xff).toLong
      i += 1
    }
    val out = new Array[Float](8)
    var c = 0
    while (c < 8) { out(c) = sums(c) / 256.0f; c += 1 }
    out
  }

  /** Batched feature extraction: partition-local, `batchSize` rows per
    * decode buffer (the mapInPandas batch shape, in Scala). */
  def extractFeatures(
      media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one decode call per batch — the real-codec integration point
        batch.map { r =>
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(r.content).map("%02x".format(_)).mkString
          MediaFeatures(r.media_id, r.content.length, digest, fakeDecode(r.content))
        }
      }
    }
  }

  /** Perceptual difference-hash (dHash) over the payload's byte stripes:
    * `stripes` integer stripe sums (same striping rule as [[fakeDecode]]),
    * bit i set iff stripe i's sum exceeds stripe i+1's — the gradient
    * signature real image dHash computes over resized pixel rows. Pure
    * integer, so an external engine replicates it exactly. Empty payloads
    * hash to 0. */
  def dHash(content: Array[Byte], stripes: Int = 32): Long = {
    val n = content.length
    if (n == 0) return 0L
    val sums = new Array[Long](stripes)
    var i = 0
    while (i < n) {
      sums(((i.toLong * stripes) / n).toInt) += (content(i) & 0xff).toLong
      i += 1
    }
    var h = 0L
    var c = 0
    while (c < stripes - 1) {
      if (sums(c) > sums(c + 1)) h |= (1L << c)
      c += 1
    }
    h
  }

  case class MediaHash(media_id: Long, phash: Long)

  /** Batched perceptual-hash extraction (the dedup-by-phash front half):
    * partition-local like [[extractFeatures]]. */
  def extractHashes(
      media: Dataset[MediaRow], stripes: Int = 32,
      batchSize: Int = 64): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map(r =>
        MediaHash(r.media_id, dHash(r.content, stripes))))
    }
  }

  /** STUB resize: re-stripe a decoded feature vector to `channels` buckets
    * (the shape a real image resize would have: fixed output dims from
    * variable input). Deterministic, pure. */
  def fakeResize(feature: Array[Float], channels: Int): Array[Float] = {
    val out = new Array[Float](channels)
    if (feature.nonEmpty) {
      var i = 0
      while (i < feature.length) {
        out(i * channels / feature.length) += feature(i)
        i += 1
      }
    }
    out
  }

  /** STUB frame sampling: every `stride`-th fixed-size block of the payload
    * (the video-frame-sampling batch shape: one row in, many frames out). */
  def frameSample(
      content: Array[Byte], frameBytes: Int, stride: Int): Seq[Array[Byte]] =
    content.grouped(frameBytes).zipWithIndex
      .collect { case (frame, i) if i % stride == 0 => frame }
      .toSeq

  case class MediaFrame(media_id: Long, frame_no: Int, frame: Array[Byte])

  /** Frame explosion over the typed media set: one row per sampled frame
    * (flatMap through the partition-local batch path). */
  def sampleFrames(
      media: Dataset[MediaRow], frameBytes: Int = 64, stride: Int = 2): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      frameSample(r.content, frameBytes, stride).zipWithIndex.map {
        case (f, i) => MediaFrame(r.media_id, i, f)
      }
    }
  }

  /** End-to-end media pipeline over the documents table: synthesize binary
    * payloads, extract batched features. */
  def documentFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    extractFeatures(asMedia(docs, "doc_id", "text").as[MediaRow])
  }
}
