package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec
import graft.sources.SnapshotTable

/** The graft-snapshot Spark data source: manifest-backed FileIndex,
  * automatic stats/partition file skipping from pushed filters, time
  * travel via versionAsOf, soundness of the pruning extractor. */
class SnapshotSourceSpec extends SparkSpec {
  import spark.implicits._

  private def clusteredFixture(): String = {
    val dir = Files.createTempDirectory("graft-snapsrc").toString
    val rows = (0L until 1000L).map(k =>
      (k, s"n$k", k.toDouble, "p" + (k % 4)))
      .toDF("k", "name", "price", "part")
    SnapshotTable.overwriteClustered(spark, dir, rows, "part",
      statsCols = Seq("k"), rangeFiles = 8)
    dir
  }

  private def load(dir: String): DataFrame =
    spark.read.format("graft-snapshot").load(dir)

  test("format load equals the Scala read; versionAsOf equals readAt; " +
      "the plan lists through SnapshotFileIndex, never a directory walk") {
    val dir = clusteredFixture()
    SnapshotTable.deleteWhere(spark, dir, col("k") < 100, "part",
      pruneRange = Some(("k", 0L, 99L)))                            // v2
    def rows(df: DataFrame) =
      df.select("k", "name").as[(Long, String)].collect().toSet
    assert(rows(load(dir)) == rows(SnapshotTable.read(spark, dir)))
    val v1 = spark.read.format("graft-snapshot")
      .option("versionAsOf", "1").load(dir)
    assert(rows(v1) == rows(SnapshotTable.readAt(spark, dir, 1L)))
    assert(v1.count() == 1000 && load(dir).count() == 900)
    val plan = load(dir).queryExecution.executedPlan.toString
    assert(plan.contains("SnapshotFileIndex"),
      s"scan must list through the manifest index:\n${plan.take(800)}")
  }

  test("pushed range filters on a statted column prune files from the " +
      "manifest alone; the filtered result is exact") {
    val dir = clusteredFixture()
    val idx = new SnapshotFileIndex(spark, dir, 1L)
    val k = AttributeReference("k", LongType)()
    def band(lo: Long, hi: Long): Seq[Expression] =
      Seq(GreaterThanOrEqual(k, Literal(lo)), LessThanOrEqual(k, Literal(hi)))
    val total = idx.prune(Nil).size
    val kept = idx.prune(band(100L, 199L)).size
    assert(total >= 8 && kept < total,
      s"band [100,199] must skip files ($kept/$total)")
    assert(idx.prune(band(5000L, 6000L)).isEmpty, "all-miss band skips all")
    // end-to-end: the filtered format read equals the ground truth
    val got = load(dir).filter(col("k").between(100L, 199L))
      .select("k").as[Long].collect().toSet
    assert(got == (100L until 200L).toSet)
    // equality pins the point form
    assert(idx.prune(Seq(EqualTo(k, Literal(150L)))).size < total)
    assert(load(dir).filter(col("k") === 150L).count() == 1)
  }

  test("Z-ordered table: conjuncts on BOTH stat columns prune " +
      "multiplicatively through the format read") {
    val dir = Files.createTempDirectory("graft-snapsrc-z").toString
    val rows = (0 until 4096).map(i =>
      (i.toLong, (i / 64).toLong, (i % 64).toLong, "all"))
      .toDF("id", "k1", "k2", "p")
    SnapshotTable.overwriteZordered(spark, dir, rows, "p",
      statsCols = Seq("k1", "k2"), rangeFiles = 16)
    val idx = new SnapshotFileIndex(spark, dir, 1L)
    val (k1, k2) = (AttributeReference("k1", LongType)(),
      AttributeReference("k2", LongType)())
    val total = idx.prune(Nil).size
    val k1Only = idx.prune(Seq(LessThanOrEqual(k1, Literal(7L)))).size
    val both = idx.prune(Seq(LessThanOrEqual(k1, Literal(7L)),
      LessThanOrEqual(k2, Literal(7L)))).size
    assert(k1Only < total && both <= k1Only)
    val got = load(dir)
      .filter(col("k1").between(0, 7) && col("k2").between(0, 7))
      .select("id").as[Long].collect().toSet
    val want = rows.filter(col("k1").between(0, 7) && col("k2").between(0, 7))
      .select("id").as[Long].collect().toSet
    assert(got == want)
  }

  test("partition-column equality prunes by manifest entry; unprovable " +
      "shapes prune nothing (soundness default)") {
    val dir = clusteredFixture()
    val idx = new SnapshotFileIndex(spark, dir, 1L)
    val part = AttributeReference("part",
      org.apache.spark.sql.types.StringType)()
    val total = idx.prune(Nil).size
    val one = idx.prune(Seq(EqualTo(part,
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString("p1"),
        org.apache.spark.sql.types.StringType)))).size
    assert(one < total, s"part = 'p1' must prune entries ($one/$total)")
    // a filter the extractor can't prove keeps every file
    val name = AttributeReference("name",
      org.apache.spark.sql.types.StringType)()
    assert(idx.prune(Seq(EqualTo(name,
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString("n1"),
        org.apache.spark.sql.types.StringType)))).size == total)
    // end-to-end partition read
    assert(load(dir).filter(col("part") === "p1").count() == 250)
  }

  test("pre-schema-header tables refuse the format read with a pointed " +
      "error; a missing versionAsOf manifest fails loudly") {
    val dir = Files.createTempDirectory("graft-snapsrc-old").toString
    val rows = Seq((1L, "a", "p1")).toDF("k", "name", "p")
    val staged = SnapshotTable.stageBatch(rows, dir, "p",
      SnapshotTable.newBatchTag(1L))
    SnapshotTable.casCommit(dir, 0L, staged) // no schema header
    val ex = intercept[IllegalArgumentException] { load(dir).count() }
    assert(ex.getMessage.contains("schema header"))
    val dir2 = clusteredFixture()
    val ex2 = intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot")
        .option("versionAsOf", "7").load(dir2).count()
    }
    assert(ex2.getMessage.contains("unreadable"))
  }
}
