package graft.streaming

import graft.SparkSpec
import graft.dedup.Dedup

class DedupStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed incremental dedup over two micro-batches equals the " +
    "one-shot batch answer on the full incoming set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (12L, "completely different words entirely here now friends"),
      (14L, "another corpus document about nothing in particular today")
    ).toDF("doc_id", "text")
    val batch1 = Seq(
      (21L, "the quick brown fox jumps over the lazy dog"),
      (23L, "fresh unseen content with no earlier counterpart anywhere"))
    val batch2 = Seq(
      (25L, "the quick brown fox jumps over the lazy cat"),
      (27L, "another corpus document about nothing in particular today"))

    val out = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-incdedup-c").toString
    val ms = MemoryStream[(Long, String)]
    val q = DedupStreams.streamingCrossSnapshotDedup(
      ms.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text", out, ckpt)
    ms.addData(batch1: _*)
    q.processAllAvailable()
    ms.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    // two real micro-batches, each with its own epoch directory
    val dirs = new java.io.File(out).list().filter(_.startsWith("batch_"))
    assert(dirs.length == 2, dirs.mkString(","))

    val streamed = spark.read.parquet(s"$out/batch_*")
      .as[(Long, Long, Double)].collect().toSet
    val oneShot = Dedup.crossSnapshotNearDups(
      corpus, (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed === oneShot)
    // sanity on content: the exact dup and the corpus-identical doc match,
    // the novel doc matches nothing
    assert(streamed.exists(r => r._1 == 21L && r._2 == 10L && r._3 == 1.0))
    assert(streamed.exists(r => r._1 == 27L && r._2 == 14L && r._3 == 1.0))
    assert(!streamed.exists(_._1 == 23L))
  }
}
