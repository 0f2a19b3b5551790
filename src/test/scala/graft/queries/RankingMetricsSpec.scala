package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables
import graft.text.TextFns

/** Ranking-metric queries checked against naive driver-side definitions:
  * the decomposed (no-global-window) average precision must equal the
  * textbook single-sort computation, and the CMS join-size estimate must
  * respect the count-min upper-bound guarantee. */
class RankingMetricsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("x_avg_precision equals the naive sort-everything AP with " +
    "ppm-floored precision terms") {
    // the same scored frame the query builds, replayed naively
    val it = Tables.documents(spark, sf)
      .select(col("doc_id"),
        aggregate(TextFns.classifierFeatures(col("text")), lit(0L),
          (acc, f) => acc + TextFns.classifierWeight(f)).as("score"),
        (TextFns.qualityScore(col("text")) >= 0.35).as("label"))
      .as[(Long, Long, Boolean)].collect()
    val ranked = it.sortBy { case (id, s, _) => (-s, id) }
    var pos = 0L
    var sumP = 0L
    ranked.zipWithIndex.foreach { case ((_, _, label), idx) =>
      if (label) {
        pos += 1
        sumP += pos * 1000000L / (idx + 1)
      }
    }
    val got = TextQueries.xAvgPrecision.fn(spark, sf)
      .as[(Long, Long, Long)].collect().head
    assert(got._1 === pos)
    assert(got._2 === sumP)
    assert(got._3 === sumP / pos)
  }

  test("x_ndcg equals the naive sort-everything computation and is " +
    "at most 10^6 ppm") {
    val it = Tables.documents(spark, sf)
      .select(col("doc_id"),
        aggregate(TextFns.classifierFeatures(col("text")), lit(0L),
          (acc, f) => acc + TextFns.classifierWeight(f)).as("score"),
        (TextFns.qualityScore(col("text")) >= 0.35).as("label"))
      .as[(Long, Long, Boolean)].collect()
    val ranked = it.sortBy { case (id, s, _) => (-s, id) }
    def disc(k: Long): Long = math.floor(1000000.0 / math.log(k + 1.0)).toLong
    var pos = 0L; var dcg = 0L; var idcg = 0L
    ranked.zipWithIndex.foreach { case ((_, _, label), idx) =>
      if (label) {
        pos += 1
        dcg += disc(idx + 1L)
        idcg += disc(pos)
      }
    }
    val got = TextQueries.xNdcg.fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((pos, dcg, idcg, dcg * 1000000L / idcg)))
    assert(got._4 <= 1000000L && got._4 > 0L)
  }

  test("x_join_size_cms: estimate is an upper bound on the exact join " +
    "size (count-min guarantee) and deterministic across runs") {
    val a = CoreQueries.xJoinSizeCms.fn(spark, sf)
      .as[(Long, Long, Long)].collect().head
    assert(a._1 >= a._2, s"CMS estimate ${a._1} below exact ${a._2}")
    assert(a._3 >= 0L)
    val b = CoreQueries.xJoinSizeCms.fn(spark, sf)
      .as[(Long, Long, Long)].collect().head
    assert(a === b)
  }

  test("x_auc_by_lang equals a naive per-group Mann-Whitney with " +
    "tie-aware counting") {
    val rows = Tables.documents(spark, sf)
      .select(col("lang"),
        aggregate(TextFns.classifierFeatures(col("text")), lit(0L),
          (acc, f) => acc + TextFns.classifierWeight(f)).as("score"),
        (TextFns.qualityScore(col("text")) >= 0.35).as("label"))
      .as[(String, Long, Boolean)].collect()
    val expected = rows.groupBy(_._1).map { case (lang, rs) =>
      val pos = rs.filter(_._3).map(_._2)
      val neg = rs.filterNot(_._3).map(_._2)
      // u2 = Σ over (p, n) pairs of 2·[p > n] + 1·[p == n]
      val u2 = (for (p <- pos; n <- neg) yield
        if (p > n) 2L else if (p == n) 1L else 0L).sum
      val auc =
        if (pos.nonEmpty && neg.nonEmpty)
          Some(u2 * 1000000L / (2L * pos.length * neg.length))
        else None
      lang -> (pos.length.toLong, neg.length.toLong, auc)
    }
    val got = TextQueries.xAucByLang.fn(spark, sf)
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === expected)
  }

  test("x_isotonic_fit output is monotone non-decreasing in the bin " +
    "and preserves bin populations") {
    val rows = TextQueries.xIsotonicFit.fn(spark, sf)
      .orderBy(col("bin")).as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val iso = rows.map(_._4)
    assert(iso.sliding(2).forall(p => p.length < 2 || p.head <= p.last),
      iso.mkString(","))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum === nDocs)
  }
}
