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

  test("fakeDecode stripes bytes into 8 channels") {
    val f = Multimodal.fakeDecode("abcdefgh".getBytes("UTF-8"))
    assert(f.length === 8)
    assert(f.forall(_ > 0))
    assert(Multimodal.fakeDecode(Array.emptyByteArray).forall(_ == 0f))
  }
}
