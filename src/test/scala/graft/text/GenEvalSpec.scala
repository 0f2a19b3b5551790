package graft.text

import org.apache.spark.sql.Row
import graft.SparkSpec

/** Hand-computed ROUGE/BLEU fixtures: clipping, brevity, degenerate
  * shapes (no bigrams, zero overlap), and the identity pair. */
class GenEvalSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)]): Map[Long, Row] =
    GenEval.rougeBleuPairs(
      rows.toDF("pid", "cand", "ref"), "pid", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("identity pair scores perfect everywhere; log-BLEU is exactly 0") {
    val m = run(Seq((1L, "the cat sat", "the cat sat")))(1L)
    assert(m.getAs[Long]("r1_p_ppm") == 1000000L)
    assert(m.getAs[Long]("r1_r_ppm") == 1000000L)
    assert(m.getAs[Long]("r1_f_ppm") == 1000000L)
    assert(m.getAs[Long]("r2_f_ppm") == 1000000L)
    assert(m.getAs[Long]("bleu_p2_ppm") == 1000000L)
    assert(m.getAs[Long]("bleu2_2xlog_micro") == 0L)
  }

  test("partial overlap: exact rational ppm values") {
    // cand "a b c d" vs ref "b c x": ov1=2, ov2=1 ("b c")
    val m = run(Seq((1L, "a b c d", "b c x")))(1L)
    assert(m.getAs[Long]("ov1") == 2L && m.getAs[Long]("ov2") == 1L)
    assert(m.getAs[Long]("r1_p_ppm") == 500000L)      // 2/4
    assert(m.getAs[Long]("r1_r_ppm") == 666666L)      // ⌊2e6/3⌋
    assert(m.getAs[Long]("r1_f_ppm") == 571428L)      // ⌊4e6/7⌋
    assert(m.getAs[Long]("r2_f_ppm") == 400000L)      // ⌊2e6/5⌋
    assert(m.getAs[Long]("bleu_p2_ppm") == 333333L)   // ⌊1e6/3⌋
    // cand longer than ref: brevity 0; 2·log BLEU-2 = ⌊ln(1/6)·1e6⌋
    assert(m.getAs[Long]("bleu2_2xlog_micro") ==
      math.floor(math.log((2.0 / 4) * (1.0 / 3)) * 1000000).toLong)
  }

  test("clipping: repeated candidate tokens count at most the reference multiplicity") {
    val m = run(Seq((1L, "a a a", "a")))(1L)
    assert(m.getAs[Long]("ov1") == 1L)
    assert(m.getAs[Long]("r1_p_ppm") == 333333L)
    assert(m.getAs[Long]("r1_r_ppm") == 1000000L)
  }

  test("brevity penalty fires when the candidate is shorter than the reference") {
    // cand "a b" (len 2) vs ref "a b c d" (len 4): p1 = 1, p2 = 1
    val m = run(Seq((1L, "a b", "a b c d")))(1L)
    // 2·(1 − 4/2)·1e6 = ⌊(2−4)·2e6/2⌋ = −2,000,000; ln(1·1) = 0
    assert(m.getAs[Long]("bleu2_2xlog_micro") == -2000000L)
  }

  test("degenerate shapes: single token (no bigrams) and zero overlap") {
    val m = run(Seq(
      (1L, "x", "y z"),       // c2_len = 0 → BLEU columns NULL; ov1 = 0
      (2L, "p q", "r s")))    // zero overlap → log-BLEU NULL, ppms 0
    assert(m(1L).getAs[Long]("ov1") == 0L)
    assert(m(1L).isNullAt(m(1L).fieldIndex("bleu_p2_ppm")))
    assert(m(1L).isNullAt(m(1L).fieldIndex("bleu2_2xlog_micro")))
    assert(m(1L).getAs[Long]("r2_f_ppm") == 0L)
    assert(m(2L).getAs[Long]("r1_f_ppm") == 0L)
    assert(m(2L).isNullAt(m(2L).fieldIndex("bleu2_2xlog_micro")))
  }

  test("tokenization is the engine convention: lowercased, whitespace-split") {
    val m = run(Seq((1L, "The  CAT", "the cat")))(1L)
    assert(m.getAs[Long]("r1_f_ppm") == 1000000L)
  }
}
