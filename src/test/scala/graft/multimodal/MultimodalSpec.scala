package graft.multimodal

import graft.SparkSpec
import graft.core.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media plumbing: binary payloads, batch extraction, typed features") {
    val feats = Multimodal.documentFeatures(
      spark, Tables.documents(spark, "/root/testdata/sf0.001"))
    val rows = feats.collect()
    assert(rows.length === 500)
    // digest is a real md5 of the payload
    assert(rows.forall(_.digest.matches("[0-9a-f]{32}")))
    // stub decode: fixed 8-channel shape, deterministic
    assert(rows.forall(_.feature.length === 8))
    val again = Multimodal.documentFeatures(
      spark, Tables.documents(spark, "/root/testdata/sf0.001")).collect()
    assert(rows.sortBy(_.media_id).map(_.feature.toSeq).toSeq ===
      again.sortBy(_.media_id).map(_.feature.toSeq).toSeq)
  }

  test("fakeResize re-stripes to fixed channels; frame sampling strides") {
    val f = Multimodal.fakeResize(Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f), 4)
    assert(f.toSeq === Seq(3f, 7f, 11f, 15f))
    assert(Multimodal.fakeResize(Array.emptyFloatArray, 4).toSeq === Seq(0f, 0f, 0f, 0f))
    val frames = Multimodal.frameSample((0 until 300).map(_.toByte).toArray,
      frameBytes = 64, stride = 2)
    assert(frames.length === 3) // blocks 0,2,4 of the 5 blocks
    assert(frames.head.length === 64)
  }

  test("sampleFrames explodes media rows into typed frames") {
    val frames = Multimodal.sampleFrames(
      Multimodal.asMedia(
        graft.core.Tables.documents(spark, "/root/testdata/sf0.001"),
        "doc_id", "text")
        .as[Multimodal.MediaRow](org.apache.spark.sql.Encoders.product),
      frameBytes = 32, stride = 2)
    val got = frames.collect()
    assert(got.nonEmpty)
    assert(got.forall(_.frame.length <= 32))
    assert(got.groupBy(_.media_id).values.forall(fs =>
      fs.map(_.frame_no).sorted.toSeq == (0 until fs.length)))
  }

  test("embeddingNearDupPairs finds planted duplicate vectors") {
    import graft.dedup.Dedup
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.99f, 0.1f, 0f)), // near-dup pair
      (3L, Array(0f, 1f, 0f))).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.95,
      planes = 6, dim = 3, probes = 1)
      .as[(Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet === Set((1L, 2L)))
  }

  test("fakeDecode stripes bytes into 8 channels") {
    val f = Multimodal.fakeDecode("abcdefgh".getBytes("UTF-8"))
    assert(f.length === 8)
    assert(f.forall(_ > 0))
    assert(Multimodal.fakeDecode(Array.emptyByteArray).forall(_ == 0f))
  }

  test("dHash: identical payloads collide, gradient flips a bit, empty → 0") {
    def h(s: String) = Multimodal.dHash(s.getBytes("UTF-8"), stripes = 4)
    assert(h("aabb") === h("aabb"))
    // 4 stripes of 1 byte: bits = (s0>s1, s1>s2, s2>s3)
    // "dcba" → sums d,c,b,a strictly decreasing → all 3 bits set
    assert(h("dcba") === 7L)
    // "abcd" ascending → no bits
    assert(h("abcd") === 0L)
    assert(Multimodal.dHash(Array.emptyByteArray) === 0L)
  }

  test("extractHashes groups exact payload duplicates under one phash") {
    val media = Seq(
      Multimodal.MediaRow(1L, "the same payload body".getBytes, "text/plain"),
      Multimodal.MediaRow(2L, "the same payload body".getBytes, "text/plain"),
      Multimodal.MediaRow(3L, "a rather different one".getBytes, "text/plain")
    ).toDS()
    val got = Multimodal.extractHashes(media).collect()
    assert(got.length === 3)
    val byId = got.map(m => m.media_id -> m.phash).toMap
    assert(byId(1L) === byId(2L))
  }
}
