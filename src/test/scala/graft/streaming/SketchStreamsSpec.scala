package graft.streaming

import graft.SparkSpec
import graft.text.Sketches

class SketchStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed HLL register maintenance over two micro-batches equals " +
    "the one-shot batch registers (and therefore the same estimate)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val batch1 = (1 to 300).map(i => ("en", s"tok$i alpha beta"))
    val batch2 = (200 to 500).map(i => ("en", s"tok$i gamma")) ++
      Seq(("fr", "un deux trois"))

    val out = java.nio.file.Files.createTempDirectory("graft-hll").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hll-c").toString
    val ms = MemoryStream[(String, String)]
    val q = SketchStreams.streamingHllRegisters(
      ms.toDF().toDF("lang", "text"), "text", "lang", out, ckpt)
    ms.addData(batch1: _*)
    q.processAllAvailable()
    ms.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    // two epochs, each a complete committed register table
    val dirs = new java.io.File(out).list().filter(_.startsWith("registers_"))
    assert(dirs.length == 2, dirs.mkString(","))

    val streamed = SketchStreams.latestRegisters(spark, out)
      .as[(String, Long, Int)].collect().toSet
    val oneShot = Sketches.hllRegisters(
      (batch1 ++ batch2).toDF("lang", "text"), "text", "lang")
      .as[(String, Long, Int)].collect().toSet
    assert(streamed === oneShot)

    // and the estimates agree with the batch query path
    val se = Sketches.hllEstimate(SketchStreams.latestRegisters(spark, out))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val be = Sketches.hllEstimate(Sketches.hllRegisters(
      (batch1 ++ batch2).toDF("lang", "text"), "text", "lang"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(se === be)
    assert(se.keySet === Set("en", "fr"))
  }

  test("hllMerge is the cell-wise max for ANY split of the corpus") {
    val docs = (1 to 400).map(i => ("g", s"w$i"))
    val (a, b) = docs.splitAt(123)
    // overlapping, uneven split: merge(A, B∪overlap) == registers(A∪B)
    val withOverlap = b ++ a.take(50)
    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(a.toDF("lang", "text"), "text", "lang"),
      Sketches.hllRegisters(withOverlap.toDF("lang", "text"), "text", "lang"))
      .as[(String, Long, Int)].collect().toSet
    val direct = Sketches.hllRegisters(docs.toDF("lang", "text"), "text", "lang")
      .as[(String, Long, Int)].collect().toSet
    assert(merged === direct)
  }
}
