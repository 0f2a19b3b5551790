package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Repetition quality metrics and benchmark decontamination. */
class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  test("sequencePacking: hand-computed stream offsets, chunks, straddle " +
    "flags at capacity 5; zero-token docs occupy no stream space") {
    val docs = Seq(
      (1L, "a b c"),        // 3 tokens: [0,3) → chunk 0
      (2L, "d e f g"),      // 4 tokens: [3,7) → chunks 0-1, straddles
      (3L, "h"),            // 1 token:  [7,8) → chunk 1
      (4L, "i j k l m n")   // 6 tokens: [8,14) → chunks 1-2, straddles
    ).toDF("doc_id", "text")
    val got = TrainPrep.sequencePacking(docs, "doc_id", "text", capacity = 5)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 3L, 0L, 0L, 0L, false)))
    assert(got(2L) === ((2L, 4L, 3L, 0L, 1L, true)))
    assert(got(3L) === ((3L, 1L, 7L, 1L, 1L, false)))
    assert(got(4L) === ((4L, 6L, 8L, 1L, 2L, true)))
    // offsets are gapless and ordered by doc_id: Σ n_tokens = next start
    val ordered = got.values.toSeq.sortBy(_._1)
    ordered.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3 + a._2 === b._3, s"stream gap between ${a._1} and ${b._1}")
    }
  }

  private def metrics(text: String): (Option[Double], Option[Double]) = {
    val r = Seq(text).toDF("text")
      .select(TextFns.dupBigramFrac(col("text")).as("d"),
        TextFns.topTokenFrac(col("text")).as("t"))
      .head()
    (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)))
  }

  test("dupBigramFrac: all-distinct bigrams → 0, degenerate repetition → high") {
    assert(metrics("the quick brown fox")._1.contains(0.0))
    // "spam spam spam spam": 3 bigrams, all "spam spam" → 2/3 duplicated
    assert(math.abs(metrics("spam spam spam spam")._1.get - 2.0 / 3) < 1e-12)
  }

  test("dupBigramFrac: under 2 tokens → null (no bigrams to judge)") {
    assert(metrics("word")._1.isEmpty)
    assert(metrics("")._1.isEmpty)
  }

  test("topTokenFrac: uniform text → 1/n, repeated token dominates") {
    assert(metrics("a b c d")._2.contains(0.25))
    assert(metrics("go go go stop")._2.contains(0.75))
  }

  test("contaminationReport flags exactly the train docs sharing a test shingle") {
    // Pick ids whose md5 split buckets land in test (<50) and train (>=100):
    // probe a range and select deterministically.
    val probe = spark.range(0, 400).toDF("doc_id")
    val buckets = probe.select(col("doc_id"),
        (TextFns.portableHash(col("doc_id").cast("string"), lit("split")) % 1000)
          .as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val testId = buckets.collectFirst { case (id, b) if b < 50 => id }.get
    val trainIds = buckets.collect { case (id, b) if b >= 100 => id }.take(3).toSeq
    val leaked = "alpha beta gamma delta" // shares 3-gram shingles with testId
    val clean = "zeta eta theta iota"
    val docs = Seq(
      (testId, leaked),
      (trainIds(0), "prefix alpha beta gamma delta suffix"), // contaminated
      (trainIds(1), clean), // clean
      (trainIds(2), "too short")) // no shingles at n=3 → clean
      .toDF("doc_id", "text")
    val got = TrainPrep.contaminationReport(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.keySet === trainIds.toSet) // only train docs reported
    assert(got(trainIds(0))._2 && got(trainIds(0))._1 >= 2) // ≥2 shared shingles
    assert(got(trainIds(1)) === ((0L, false)))
    assert(got(trainIds(2)) === ((0L, false)))
  }

  test("noveltyReport: first owner scores full novelty, a later copy zero, " +
    "partial overlap in between; sub-shingle docs have no row") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),        // first owner of its 2 shingles
      (2L, "alpha beta gamma delta"),        // exact later copy → 0 novel
      (3L, "alpha beta gamma epsilon zeta"), // shares 1 of 3 shingles
      (4L, "too short")                      // < 3 words → no row
    ).toDF("doc_id", "text")
    val got = TrainPrep.noveltyReport(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === ((2L, 2L, 1000000L)))
    assert(got(2L) === ((2L, 0L, 0L)))
    assert(got(3L) === ((3L, 2L, 666666L))) // "beta gamma epsilon", "gamma epsilon zeta" novel
  }

  test("cdcChunks: chunk ids follow hash boundaries, concatenation in order " +
    "rebuilds the document, boundaries are edit-stable downstream") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val docs = Seq((1L, base)).toDF("doc_id", "text")
    val chunks = TrainPrep.cdcChunks(docs, "doc_id", "text", avgTokens = 4)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    // chunks partition the doc in order
    assert(chunks.map(_._2).mkString(" ") === base)
    assert(chunks.map(_._3).sum === 12L)
    assert(chunks.map(_._1).toSeq === chunks.indices.map(_.toLong))
    // edit stability: prepending words only re-chunks the head — the words
    // after the first boundary land in chunks with identical contents
    val edited = TrainPrep.cdcChunks(
      Seq((1L, s"zzz $base")).toDF("doc_id", "text"), "doc_id", "text", 4)
      .collect().map(_.getString(2)).toSet
    val orig = chunks.map(_._2).toSet
    assert((orig intersect edited).nonEmpty)
    assert(orig.drop(1).forall(edited.contains) ||
      orig.tail.toSet.subsetOf(edited))
  }

  test("HLL sketch: registers bounded by m, estimate within the m=128 " +
    "error band, duplicate tokens change nothing") {
    import graft.text.Sketches
    val big = Seq(("b", (1 to 2000).map(i => s"tok$i").mkString(" ")))
      .toDF("lang", "text")
    val r = Sketches.hllDistinctTokens(big, "text", "lang", p = 7).head()
    assert(r.getLong(1) === 2000L)               // n_exact
    assert(r.getLong(2) <= 128L)                 // v_filled ≤ m
    val est = r.getDouble(3)
    // σ ≈ 1.04/√128 ≈ 9.2%; 4σ band, deterministic hash → never flakes
    assert(est > 2000 * 0.6 && est < 2000 * 1.4, s"HLL estimate off: $est")
    // distinct-(g,word) projection: repeating every token is a no-op
    val dup = Seq(("b", ((1 to 2000) ++ (1 to 2000)).map(i => s"tok$i")
      .mkString(" "))).toDF("lang", "text")
    val r2 = Sketches.hllDistinctTokens(dup, "text", "lang", p = 7).head()
    assert(r2.getDouble(3) === est)
  }

  test("KMV sketch: exact below k, sane estimate above k") {
    import graft.text.Sketches
    // 40 distinct words < k=64 → exact path, kth_hash null
    val small = Seq(("a", (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("lang", "text")
    val s = Sketches.kmvDistinctTokens(small, "text", "lang", k = 64).head()
    assert(s.getLong(1) === 40L && s.isNullAt(2) && s.getDouble(3) === 40.0)
    // 2000 distinct words ≫ k → estimate within 50% (deterministic given
    // the fixed hash family, so this can never flake)
    val big = Seq(("b", (1 to 2000).map(i => s"tok$i").mkString(" ")))
      .toDF("lang", "text")
    val r = Sketches.kmvDistinctTokens(big, "text", "lang", k = 64).head()
    val est = r.getDouble(3)
    assert(r.getLong(1) === 2000L)
    assert(est > 1000 && est < 4000, s"KMV estimate off: $est")
  }

  test("equalizeSourceBudgets: data-derived rates, capped at 1000") {
    val docs = (1 to 20).map(i => (i.toLong, "A", Seq.fill(10)("w").mkString(" "))) ++
      Seq((100L, "B", "w w w w w"))
    val df = docs.toDF("doc_id", "source", "text")
    // A: 200 tokens, budget 100 → rate 500‰; B: 5 tokens → capped 1000‰
    val got = TrainPrep.equalizeSourceBudgets(df, "doc_id", "source", "text", 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.filter(_._2 == "B") === Array((100L, "B", 1000L)))
    val aKept = got.filter(_._2 == "A").map(_._1).toSet
    val expected = (1 to 20).map(_.toLong).filter { id =>
      val bucket = spark.range(1).select(
        TextFns.portableHash(lit(id.toString), lit("mix")) % 1000)
        .head().getLong(0)
      bucket < 500
    }.toSet
    assert(got.filter(_._2 == "A").forall(_._3 == 500L))
    assert(aKept === expected)
  }

  test("stratifiedSample: rate 1000 keeps everything, rate 0 keeps nothing") {
    val docs = spark.range(0, 200).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("zh"))
    val kept = TrainPrep.stratifiedSample(docs, "doc_id", col("lang"),
      ratesPerMille = Map("en" -> 1000, "zh" -> 0), defaultPerMille = 500)
    assert(kept.filter(col("lang") === "en").count() === 100)
    assert(kept.filter(col("lang") === "zh").count() === 0)
  }

  test("weightedSampleTopK: k per stratum, heavy weights overrepresented") {
    val docs = spark.range(0, 400).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("zh"))
      // first 40 of each stratum get 100× the weight of the rest
      .withColumn("w", when(col("doc_id") < 80, 1000L).otherwise(10L))
    val kept = TrainPrep.weightedSampleTopK(docs, "doc_id", "lang", "w", k = 30)
    assert(kept.groupBy("lang").count().collect()
      .forall(_.getLong(1) === 30L), "exactly k rows per stratum")
    // with a 100:1 weight ratio the 40 heavy docs should dominate the 30
    // selections (each heavy doc individually beats ~all light docs)
    val heavy = kept.filter(col("doc_id") < 80).count()
    assert(heavy >= 40, s"heavy docs under-selected: $heavy of 60")
    // determinism: same inputs → same selection
    val again = TrainPrep.weightedSampleTopK(docs, "doc_id", "lang", "w", k = 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === kept.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("budgetSelect: per-stratum prefix by quality within token budget") {
    val docs = Seq(
      ("en", 1L, 900L, 40L), ("en", 2L, 800L, 40L), ("en", 3L, 700L, 40L),
      ("en", 4L, 600L, 40L), ("zh", 5L, 500L, 90L), ("zh", 6L, 400L, 20L)
    ).toDF("lang", "doc_id", "quality", "n_tokens")
    val got = TrainPrep
      .budgetSelect(docs, "lang", "quality", "doc_id", "n_tokens", budget = 100L)
      .select("doc_id", "running").as[(Long, Long)].collect().toMap
    // en: 40+40 fits, third doc would hit 120 > 100 → docs 1,2 only
    assert(got.keySet === Set(1L, 2L, 5L))
    assert(got(2L) === 80L && got(5L) === 90L)
  }

  test("histogramQuantiles: exact matches rank-select, overshoot < binWidth") {
    val df = (1L to 100L).toDF("v")
    val got = Sketches
      .histogramQuantiles(df, "v", binWidth = 10, qs = Seq(0.5, 0.9))
      .orderBy("q").as[(Double, Long, Long, Long, Long)].collect()
    // q=.5: rank ceil(50)=50 → exact 50, bin 5 → upper edge 59, err 9
    assert(got(0) === ((0.5, 50L, 59L, 50L, 9L)))
    assert(got(1) === ((0.9, 90L, 99L, 90L, 9L)))
    val errs = Sketches.histogramQuantiles(df, "v", binWidth = 25)
      .select("err").as[Long].collect()
    assert(errs.forall(e => e >= 0 && e < 25))
  }

  test("scriptCount: per-range counts on mixed-script text, empty text zero") {
    val df = Seq(
      "abc ЖЗИ 漢字漢 123",
      "",
      "日本語テキスト" // kana outside the CJK-ideograph range, 3 kanji-range chars
    ).toDF("text")
    val got = df.select(
      TextFns.scriptCount(col("text"), TextFns.latinClass).as("la"),
      TextFns.scriptCount(col("text"), TextFns.cjkClass).as("cj"),
      TextFns.scriptCount(col("text"), TextFns.cyrillicClass).as("cy"),
      TextFns.scriptCount(col("text"), TextFns.digitClass).as("di"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got(0) === ((3, 3, 3, 3)))
    assert(got(1) === ((0, 0, 0, 0)))
    assert(got(2) === ((0, 3, 0, 0)))
  }

  private def strip(html: String): String =
    Seq(html).toDF("h").select(TextFns.htmlStrip(col("h")).as("t"))
      .head().getString(0)

  test("htmlStrip: tags go, script/style CONTENT goes with the block") {
    assert(strip("<p>Hello <b>world</b></p>") === "Hello world")
    assert(strip("<script>var leak = 1;</script>text") === "text")
    assert(strip("<style>p{color:red}</style>text") === "text")
    // script body containing '<' must not derail the block removal
    assert(strip("<script>if (a < b) leak();</script>ok") === "ok")
    // multi-line blocks ((?s) flag)
    assert(strip("<script>\nline1();\nline2();\n</script>after") === "after")
  }

  test("htmlStrip: entity decode in standard order, &amp; last") {
    assert(strip("a &lt;tag&gt; b") === "a <tag> b")
    assert(strip("q&quot;x&quot; &#39;y&#39;") === "q\"x\" 'y'")
    assert(strip("a&nbsp;b") === "a b")
    // &amp;lt; decodes to the LITERAL "&lt;", not to "<"
    assert(strip("x &amp;lt; y") === "x &lt; y")
  }

  test("htmlStrip ∘ htmlEncode recovers whitespace-collapsed text " +
    "(the embed-extract round trip the x_html_strip query runs)") {
    val texts = Seq(
      "it's a \"quoted\" thing & more",
      "tabs\tand\nnewlines   collapse",
      "1 < 2 && 3 > 2")
    texts.foreach { t =>
      val enc = Seq(t).toDF("t")
        .select(TextFns.htmlEncode(col("t")).as("e")).head().getString(0)
      val collapsed = t.trim.replaceAll("\\s+", " ")
      assert(strip(s"<div class='x'>$enc</div>") === collapsed, s"for: $t")
    }
  }

  /** JVM-side replica of TextFns.classifierWeight: md5-prefix hash folded
    * to [-500, 500] — the independent computation the engine must match. */
  private def weightOf(feature: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"qw:$feature".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 14)
    java.lang.Long.parseLong(hex, 16) % 1001 - 500
  }

  test("classifierScore = sum of token+bigram weights, keep = sign") {
    val text = "good clean prose"
    val feats = Seq("good", "clean", "prose", "good clean", "clean prose")
    val expected = feats.map(weightOf).sum
    val r = Seq(text).toDF("text")
      .select(TextFns.classifierScore(col("text")).as("s"),
        size(TextFns.classifierFeatures(col("text"))).as("n"))
      .head()
    assert(r.getLong(0) === expected)
    assert(r.getInt(1) === 5)
  }

  test("classifierFeatures: single token has no bigrams; empty text is one feature") {
    val n1 = Seq("word").toDF("text")
      .select(size(TextFns.classifierFeatures(col("text"))))
      .head().getInt(0)
    assert(n1 === 1)
    val n0 = Seq("").toDF("text")
      .select(size(TextFns.classifierFeatures(col("text"))))
      .head().getInt(0)
    assert(n0 === 1) // tokens("") = [""] — one (empty) token, no bigrams
  }

  private def canon(url: String): String =
    Seq(url).toDF("url")
      .select(TextFns.canonicalizeUrl(col("url"))).head().getString(0)

  test("canonicalizeUrl collapses case/www/port/slash/utm/fragment aliases") {
    assert(canon("HTTPS://WWW.Example1.COM:443/docs/5/?utm_source=feed&id=7#x")
      === "https://example1.com/docs/5?id=7")
    assert(canon("https://example1.com/docs/5?id=7&utm_campaign=z")
      === "https://example1.com/docs/5?id=7")
    // already canonical -> fixed point
    assert(canon("https://example1.com/docs/5?id=7")
      === "https://example1.com/docs/5?id=7")
  }

  test("canonicalizeUrl: param sort, tracking-only query drops the '?', " +
    "non-default port and path case survive") {
    assert(canon("http://a.com/p?b=2&a=1") === "http://a.com/p?a=1&b=2")
    assert(canon("http://a.com/p?ref=feed&gclid=123&fbclid=9")
      === "http://a.com/p")
    assert(canon("http://a.com:8080/Docs/X") === "http://a.com:8080/Docs/X")
    // root path: trailing slash stripped to the bare authority
    assert(canon("http://a.com/?id=1") === "http://a.com?id=1")
  }

  test("kmvSetOps: exact union/intersection below k (complete sketches)") {
    import graft.text.Sketches
    // A = w1..w40, B = w21..w60: union 60, inter 20 — all under k=64
    val docs = Seq(
      ("a", (1 to 40).map(i => s"w$i").mkString(" ")),
      ("b", (21 to 60).map(i => s"w$i").mkString(" "))).toDF("src", "text")
    val r = Sketches.kmvSetOps(docs, "text", "src", k = 64).head()
    assert(r.getString(0) === "a" && r.getString(1) === "b")
    assert(r.getLong(2) === 60L) // n_sketch = exact union size
    assert(r.getLong(3) === 20L) // n_both = exact intersection
    assert(r.getDouble(4) === 60.0 && r.getDouble(5) === 20.0)
  }

  test("kmvSetOps: estimates track a planted 50% overlap above k, and the " +
    "union estimate obeys the merge law (= sketch of the concatenation)") {
    import graft.text.Sketches
    // A = t1..t1000, B = t501..t1500: union 1500, inter 500
    val aText = (1 to 1000).map(i => s"t$i").mkString(" ")
    val bText = (501 to 1500).map(i => s"t$i").mkString(" ")
    val docs = Seq(("a", aText), ("b", bText)).toDF("src", "text")
    val r = Sketches.kmvSetOps(docs, "text", "src", k = 64).head()
    val (estU, estI) = (r.getDouble(4), r.getDouble(5))
    // deterministic given the fixed hash family — these bands cannot flake
    assert(math.abs(estU - 1500) / 1500.0 < 0.35, s"union est $estU")
    assert(math.abs(estI - 500) / 500.0 < 0.6, s"inter est $estI")
    // merge law: k-min of (top-k(A) ∪ top-k(B)) = k-min of A ∪ B, so the
    // pairwise union estimate equals the single-group sketch of A ++ B
    val merged = Seq(("u", aText + " " + bText)).toDF("src", "text")
    val direct = Sketches.kmvDistinctTokens(merged, "text", "src", k = 64)
      .head().getDouble(3)
    assert(estU === direct)
  }

  test("gopherRules: each rule fires on its own planted violation") {
    def verdicts(text: String): Map[String, Boolean] = {
      val rules = TextFns.gopherRules(col("text"))
      val r = Seq(text).toDF("text")
        .select(rules.map { case (n, c) => c.as(n) }: _*).head()
      rules.map(_._1).zipWithIndex
        .map { case (n, i) => n -> r.getBoolean(i) }.toMap
    }
    // a healthy doc: 60 ordinary words incl. several core stopwords
    val good = (("the quick brown fox of june and the lazy dog in a barn " +
      "is to be seen ") * 4).trim
    val g = verdicts(good)
    assert(g.values.forall(identity), s"healthy doc fails: $g")
    // too short
    assert(!verdicts("the of and short")("r_word_count"))
    // degenerate word length (all 1-char tokens)
    assert(!verdicts(Seq.fill(60)("a").mkString(" "))("r_word_len"))
    // symbol spam: > 1 hash/ellipsis per 10 words
    val hashy = good.split(" ").map(w => w + " ###").mkString(" ")
    assert(!verdicts(hashy)("r_symbol"))
    // bullet-only lines
    val bullets = (1 to 20).map(i => s"- item $i of the list").mkString("\n")
    assert(!verdicts(bullets)("r_bullet"))
    // every line trails an ellipsis
    val ell = (1 to 10).map(i => s"line $i of text...").mkString("\n")
    assert(!verdicts(ell)("r_ellipsis"))
    // numeric spam: < 80% alphabetic words
    val nums = (good.split(" ").take(20) ++ (1 to 40).map(_.toString))
      .mkString(" ")
    assert(!verdicts(nums)("r_alpha"))
    // only one distinct core stopword present
    assert(!verdicts(Seq.fill(60)("the word").mkString(" "))("r_stopwords"))
  }
}
