package graft.text

import graft.SparkSpec

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana cherry cherry date"),
    (3L, "apple banana cherry date"),
    (4L, "zebra zebra zebra zebra")
  ).toDF("doc_id", "text")

  test("nbLabelIssues: a doc written in the other class's vocabulary is " +
    "flagged; consistent docs are not; flags agree with the matrix") {
    val corpus = Seq(
      (1L, "alpha alpha beta alpha beta", "A"),
      (2L, "alpha beta alpha alpha", "A"),
      (3L, "gamma delta gamma delta gamma", "B"),
      (4L, "delta gamma delta delta", "B"),
      (5L, "gamma delta gamma delta", "A")   // labeled A, pure B vocab
    ).toDF("doc_id", "text", "source")
    val got = Relevance.nbLabelIssues(corpus, "doc_id", "text", "source")
      .as[(Long, String, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(5L)._4, "planted mislabel not flagged")
    assert(got(5L)._3 === "B")
    Seq(1L, 2L, 3L, 4L).foreach(i =>
      assert(!got(i)._4, s"clean doc $i wrongly flagged"))
    // flag definition honors the matrix: flagged ⇒ predicted ≠ actual
    got.values.foreach(r => if (r._4) assert(r._3 !== r._2))
  }

  test("nbAbstention: clear-vocab docs predict, ambiguous docs abstain; " +
    "single-class corpus abstains everywhere (null margin)") {
    val corpus = Seq(
      (1L, "alpha alpha alpha alpha alpha", "A"),
      (2L, "gamma gamma gamma gamma gamma", "B"),
      (3L, "alpha gamma", "A")   // one token each side → thin margin
    ).toDF("doc_id", "text", "source")
    val got = Relevance.nbAbstention(corpus, "doc_id", "text", "source",
      marginMicro = 2000000L)
      .as[(Long, String, String, Option[Long], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(!got(1L)._5 && !got(2L)._5, "clear docs must not abstain")
    assert(got(3L)._5, "ambiguous doc must abstain")
    assert(got(3L)._4.get < got(1L)._4.get)
    val single = Seq((1L, "alpha beta", "A"), (2L, "beta", "A"))
      .toDF("doc_id", "text", "source")
    val g2 = Relevance.nbAbstention(single, "doc_id", "text", "source", 1L)
      .as[(Long, String, String, Option[Long], Boolean)].collect()
    assert(g2.forall(r => r._4.isEmpty && r._5),
      "single-class corpus must abstain with null margins")
  }

  test("bm25Scores: hand-computed integer BM25 on a tiny corpus " +
    "(Lucene idf, cleared k1/b fraction, exact integral division)") {
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple cherry cherry date")).toDF("doc_id", "text")
    // N = 3, L = 9; df(apple)=df(banana)=df(cherry)=2, df(date)=1 →
    // query = {apple, banana, cherry}; idf_micro = ⌊ln(8/5)·1e6⌋ = 470003
    // contrib = (470003·44·9·tf) div (180·tf + 6·9 + 18·dl·3)
    val got = Relevance.bm25Scores(corpus, "doc_id", "text", qTerms = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) === ((2L, 646254L + 470003L)))   // apple tf2 + banana tf1
    assert(got(2L) === ((2L, 544214L + 544214L)))   // banana + cherry, dl 2
    assert(got(3L) === ((2L, 413602L + 590860L)))   // apple tf1 + cherry tf2
    // monotonicity sanity: higher tf of a query term at equal dl scores higher
    assert(got(1L)._2 > got(3L)._2)
  }

  test("tfIdfTopTerms: rare terms outrank common ones, k respected") {
    val got = Relevance.tfIdfTopTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, Long, String, Long, Long, Long)].collect()
    assert(got.groupBy(_._1).forall(_._2.length <= 2))
    // doc 4: zebra df=1 tf=4 → score 4·(4·10⁶/1) — its only and top term
    val d4 = got.filter(_._1 == 4L)
    assert(d4.length === 1 && d4.head._3 === "zebra"
      && d4.head._6 === 4L * 4000000L)
    // doc 1: apple (tf 2, df 2) outranks cherry/banana (tf 1, df 3)
    assert(got.find(r => r._1 == 1L && r._2 == 1L).get._3 === "apple")
  }

  test("bigramLmScore: repeated corpus transitions score higher") {
    val got = Relevance.bigramLmScore(docs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "avg_p_ppm")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_._2 === 3L)) // 4 tokens → 3 bigrams each
    // doc 4's zebra→zebra transition: c2=3, c1(zebra)=4 → 750000 ppm avg;
    // every other doc mixes rarer transitions and must score lower
    assert(got(4L)._3 === 750000L)
    assert(Seq(1L, 2L, 3L).forall(d => got(d)._3 < got(4L)._3))
    // a single-token doc has no bigrams and is absent
    val one = Seq((9L, "solo")).toDF("doc_id", "text")
    assert(Relevance.bigramLmScore(one, "doc_id", "text").count() === 0)
  }

  test("cmsHeavyHitters: estimate is never below the exact count") {
    val real = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Relevance.cmsHeavyHitters(real, "text",
      depth = 4, width = 1024, minExact = 50)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r._3 >= r._2),
      "CMS must overestimate: " + got.filter(r => r._3 < r._2).mkString(","))
    // narrow sketch on a skewed corpus: estimates inflate but never deflate
    val narrow = Relevance.cmsHeavyHitters(real, "text",
      depth = 2, width = 8, minExact = 50)
      .as[(String, Long, Long)].collect()
    assert(narrow.forall(r => r._3 >= r._2))
  }

  test("semanticDedupFlags: exact duplicate in one cluster is flagged") {
    // two identical vectors + noise: they co-cluster (identical ⇒ same
    // nearest centroid) and cosine 1.0 ≥ threshold ⇒ larger id flagged
    val base = (0L until 50L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 13 + j * 7) % 19 - 9).toFloat)))
    val emb = (base :+ (50L, base(5)._2)).toDF("vec_id", "embedding")
    val got = graft.dedup.Dedup.semanticDedupFlags(emb, "vec_id", "embedding",
      threshold = 0.95, centroidStep = 10, iters = 2)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got.size === 51)
    assert(got(50L)._3 === true)   // the planted twin (larger id) is dropped
    assert(got(5L)._3 === false)   // the original (smaller id) is kept
  }

  test("importanceWeights: target-domain vocabulary scores above general") {
    import org.apache.spark.sql.functions.col
    // target docs speak "medical"; general docs speak "web"
    val docs = Seq(
      (1L, true, "protein kinase pathway protein enzyme"),
      (2L, true, "enzyme pathway kinase protein binding"),
      (3L, false, "click here buy now free offer"),
      (4L, false, "subscribe newsletter click offer deal"),
      (5L, false, "protein kinase enzyme pathway binding") // general doc, target words
    ).toDF("doc_id", "is_t", "text")
    val got = Relevance.importanceWeights(docs, "doc_id", "text", col("is_t"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // docs made of target-LM vocabulary must outscore web-word docs,
    // including doc 5 which sits in the general split but reads like target
    assert(got(1L) > got(3L) && got(2L) > got(4L))
    assert(got(5L) > got(3L))
    // resampling key is deterministic
    val again = Relevance.importanceWeights(docs, "doc_id", "text", col("is_t"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(again === got)
  }

  test("bigramLogScore: hand-computed lp_micro, truncation-toward-minus-" +
    "infinity avg, predictable text scores above improbable text") {
    val tiny = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = Relevance.bigramLogScore(tiny, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // c1: a=3 b=3; c2: (a,b)=3 (b,a)=1
    // lp(a,b) = floor(ln(1)·1e6) = 0
    // lp(b,a) = floor(ln(1/3)·1e6) = -1098613  (floor, not trunc)
    assert(got(1L) === ((3L, -1098613L, -366205L))) // floor(-1098613/3)
    assert(got(2L) === ((1L, 0L, 0L)))
    // on the shared corpus: the all-repeats doc (zebra⁴: 3 transitions of
    // p=3/4 → floor(ln(0.75)·1e6) = -287683) is the most predictable
    val full = Relevance.bigramLogScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(full(4L) === -287683L)
    assert(full(4L) === full.values.max)
  }

  test("tokenEntropy: constant doc → 0, uniform doc → ln(k)·1e6, " +
    "skew lands strictly between") {
    val tiny = Seq(
      (1L, "a a a a"), (2L, "a b c d"), (3L, "a a a b")
    ).toDF("doc_id", "text")
    val got = Relevance.tokenEntropy(tiny, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got(1L) === ((1L, 4L, 0L)))
    // uniform over 4 tokens: h = floor(ln(4)·1e6) = 1386294
    assert(got(2L) === ((4L, 4L, 1386294L)))
    assert(got(3L)._3 > 0L && got(3L)._3 < 1386294L)
  }

  test("pmiCollocations: planted collocation tops independence baseline") {
    val docs = Seq(
      (1L, "aa bb cc dd aa bb"),
      (2L, "aa bb dd cc aa bb"),
      (3L, "cc dd aa bb cc aa bb")
    ).toDF("doc_id", "text")
    val got = Relevance.pmiCollocations(docs, "doc_id", "text",
        minCount = 2, topK = 5)
      .as[(String, String, Long, Long, Long, Long)].collect()
    // "aa bb" is a perfect collocation: c_xy=6, c_x=c_y=6, N=19
    // → lift_ppm = (6·10⁶·19) div 36 = 3,166,666 — ranks first, above
    // the 10⁶ independence line
    assert(got.head === (("aa", "bb", 6L, 6L, 6L, 3166666L)))
    assert(got.forall(_._3 >= 2))
  }

  test("naiveBayesClassify separates two vocabularies, matches a JVM replica") {
    val labeled = Seq(
      (1L, "apple apple banana", "fruit"),
      (2L, "apple banana banana", "fruit"),
      (3L, "steel iron iron", "metal"),
      (4L, "iron steel steel", "metal"),
      (5L, "apple iron banana", "fruit")
    ).toDF("doc_id", "text", "source")
    val got = Relevance.naiveBayesClassify(labeled, "doc_id", "text", "source")
      .as[(Long, String, Long, String, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // class-pure docs classify correctly
    assert(got(1L)._2 === "fruit" && got(1L)._5)
    assert(got(2L)._2 === "fruit")
    assert(got(3L)._2 === "metal" && got(3L)._5)
    assert(got(4L)._2 === "metal")
    // independent JVM replica of the fixed-point NB definition
    val train = Seq(
      (1L, "apple apple banana", "fruit"),
      (2L, "apple banana banana", "fruit"),
      (3L, "steel iron iron", "metal"),
      (4L, "iron steel steel", "metal"),
      (5L, "apple iron banana", "fruit"))
    val toks = train.map { case (id, t, c) => (id, t.split("\\s+").toSeq, c) }
    val classes = toks.map(_._3).distinct.sorted
    val vocab = toks.flatMap(_._2).distinct.size
    val counts = toks.flatMap(t => t._2.map(w => (t._3, w)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nS = classes.map(c => c -> counts.collect {
      case ((cl, _), n) if cl == c => n }.sum).toMap
    def lnMicro(num: Double, den: Double): Long =
      math.floor(math.log(num / den) * 1000000).toLong
    def score(ws: Seq[String], c: String): Long = {
      val prior = lnMicro(toks.count(_._3 == c).toDouble, toks.size.toDouble)
      prior + ws.map { w =>
        val cnt = counts.getOrElse((c, w), 0L)
        lnMicro((cnt + 1).toDouble, (nS(c) + vocab).toDouble)
      }.sum
    }
    toks.foreach { case (id, ws, _) =>
      val best = classes.map(c => (c, score(ws, c)))
        .sortBy { case (c, s) => (-s, c) }.head
      assert(got(id)._2 === best._1, s"predicted class, doc $id")
      assert(got(id)._3 === best._2, s"winning score_micro, doc $id")
    }
  }

  test("classifierEval: per-class counts and ppm ratios, null-safe edges") {
    val pred = Seq(
      ("en", "en"), ("en", "de"), ("de", "de"), ("fr", "en")
    ).toDF("actual", "predicted")
    val got = Relevance.classifierEval(pred, "actual", "predicted")
      .as[(String, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("en") === (("en", 2L, 2L, 1L, Some(500000L), Some(500000L))))
    assert(got("de") === (("de", 1L, 2L, 1L, Some(500000L), Some(1000000L))))
    // fr is never predicted: precision undefined (null), recall 0
    assert(got("fr") === (("fr", 1L, 0L, 0L, None, Some(0L))))
  }
}
