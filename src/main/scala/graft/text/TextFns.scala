package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library for large-scale training-data pipelines:
  * language-ID (stopword-hit heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), document fingerprinting. All pure column
  * expressions — codegen-friendly, no UDFs, no shuffles beyond what the
  * caller's aggregation needs.
  */
object TextFns {

  /** Whitespace tokens of lower-cased trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish segmentation: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs (the usual pre-tokenizer regex shape). */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpeishCount(text: Column): Column = size(bpeishTokens(text))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deterministic, heuristic by design. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "una"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you"))

  /** Number of tokens that are stopwords of `lang`. */
  def stopwordHits(text: Column, lang: String): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords(lang))))

  /** Zero-guarded ratio: empty/whitespace-only text → null instead of an
    * ANSI DIVIDE_BY_ZERO (Spark 4 default). */
  private def ratio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den)

  def stopwordRatio(text: Column, lang: String = "en"): Column =
    ratio(stopwordHits(text, lang), tokenCount(text))

  /** Punctuation character count / ratio. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:'\"()\\[\\]-]", ""))
  def punctRatio(text: Column): Column =
    ratio(punctCount(text), length(text))

  /** Mean token length: exact integer sums, one double division. */
  def avgTokenLen(text: Column): Column =
    ratio(
      aggregate(transform(tokens(text), t => length(t)), lit(0), (a, x) => a + x),
      tokenCount(text))

  /** Composite quality score in [0,1]-ish: rewards moderate length, real
    * words, low punctuation noise. Fixed evaluation order so engines agree
    * bit-for-bit. */
  def qualityScore(text: Column): Column =
    least(length(text).cast("double") / 500, lit(1.0)) * 0.4 +
      stopwordRatio(text) * 0.4 +
      (lit(1.0) - punctRatio(text)) * 0.2

  /** Language-ID: argmax of per-language stopword hits, ties broken by
    * language code ascending (deterministic). Languages with zero hits all
    * tie → lexicographically first code wins; callers wanting "unknown"
    * can test maxHits == 0. */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scored = array(langs.map(l =>
      struct(stopwordHits(text, l).as("hits"), lit(l).as("lang"))): _*)
    // max by (hits, then lang DESC) == first lang asc among max hits:
    // array_max on struct compares fields in order; to break ties toward the
    // smaller code, negate via reverse sort: pick via sort then element.
    element_at(
      array_sort(scored, (a, b) =>
        when(a("hits") > b("hits"), -1)
          .when(a("hits") < b("hits"), 1)
          .when(a("lang") < b("lang"), -1)
          .when(a("lang") > b("lang"), 1)
          .otherwise(0)),
      1)("lang")
  }

  /** Fraction of word bigrams that are repeats of an earlier bigram in the
    * same document — the classic intra-document repetition signal
    * (boilerplate, keyword stuffing, decode loops). Pure per-row array
    * expression: no shuffle at any scale, cost bounded by document length.
    * Texts with <2 tokens → null (no bigrams to judge). */
  def dupBigramFrac(text: Column): Column = {
    val t = tokens(text)
    val bigrams = transform(
      sequence(lit(1), size(t) - 1),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1)))
    // size < 2 → no bigrams; guard BEFORE building the sequence (ANSI mode
    // rejects both sequence(1,0) and element_at out-of-bounds)
    when(size(t) >= 2,
      ratio(size(bigrams) - size(array_distinct(bigrams)), size(bigrams)))
  }

  /** Share of the document occupied by its single most frequent token —
    * high values flag degenerate repetition. O(distinct · n) per row, no
    * shuffle. Empty text → null. */
  def topTokenFrac(text: Column): Column = {
    val t = tokens(text)
    val counts = transform(array_distinct(t), w => size(filter(t, x => x === w)))
    ratio(array_max(counts), size(t))
  }

  /** Content fingerprint: md5 over the sorted distinct token set — robust
    * to word order and repetition (the "bag-of-words" dedup key). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Aggressive normalization for "fuzzy-exact" dedup (the standard
    * curation convention: normalize, then hash the whole sequence):
    * lowercase, strip every character outside [a-z] and whitespace
    * (punctuation, digits), collapse whitespace runs. Order-PRESERVING —
    * unlike [[fingerprint]]'s bag-of-words key, documents differing only
    * in case/punctuation/numbers collapse, reordered text does not. */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z\\s]", ""),
      "\\s+", " "))

  /** Polynomial rolling hash over the text's characters:
    * h = fold(h*31 + ascii(c)) mod (2^31-1). Engine-portable (same fold in
    * DuckDB list_reduce); the classic cheap content fingerprint. */
  def rollingHash(text: Column): Column = {
    val m = (1L << 31) - 1
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, c) => (acc * 31 + ascii(c)) % m)
  }

  /** 56-bit engine-portable token hash: md5 hex prefix as a number. Used by
    * minhash/simhash so independent engines (the DuckDB oracle) can
    * reproduce signatures exactly. */
  def portableHash(c: Column, salt: Column): Column =
    conv(substring(md5(concat(salt, lit(":"), c)), 1, 14), 16, 10).cast("long")

  /** Per-script character counts — the writing-system profile that
    * complements [[langId]]'s stopword vote (stopwords need SPACES and a
    * known vocabulary; script ranges work on any text, and catch
    * mixed-script spam/mojibake). Counts use explicit codepoint-range
    * classes (`\x{4e00}-\x{9fff}` etc) — the ONE script syntax Java regex
    * and RE2 share, unlike `\p{Han}`/`\p{IsHan}` which differ — so the
    * DuckDB oracle replicates exactly. Zero shuffles. */
  def scriptCount(text: Column, rangeClass: String): Column =
    size(split(text, rangeClass)) - 1

  val latinClass = "[A-Za-z]"
  val cjkClass = "[\\x{4e00}-\\x{9fff}]"
  val cyrillicClass = "[\\x{0400}-\\x{04ff}]"
  val digitClass = "[0-9]"

  /** HTML → text extraction (the WET-style boilerplate strip every web
    * crawl pipeline runs before any quality/dedup stage): drop
    * script/style blocks wholesale (their CONTENT is code, not text —
    * a bare tag strip would leak it), strip remaining tags to a space,
    * decode the six common entities (`&amp;` last, the standard order —
    * decoding it first would double-decode `&amp;lt;`), collapse
    * whitespace. Pure per-row expression chain: zero shuffles, and every
    * regex is shared Java-regex/RE2 syntax so the DuckDB oracle replicates
    * byte-for-byte. */
  def htmlStrip(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)\\s*>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    // entity strings contain no regex metacharacters, so regexp_replace
    // is a literal replace here (the oracle uses DuckDB's replace())
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) =>
        regexp_replace(c, ent, ch)
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Entity-encode text for embedding into HTML (the inverse boundary of
    * [[htmlStrip]]'s decode): `&` first so later entities aren't
    * double-encoded, then `<` (the one character that would derail the
    * tag-strip regex), quotes. */
  def htmlEncode(text: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", "\"" -> "&quot;", "'" -> "&#39;")
      .foldLeft(text) { case (c, (ch, ent)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(ch), ent)
      }

  /** Hashed linear quality-classifier features: every whitespace token
    * plus every adjacent-token bigram (the fastText `wordNgrams=2`
    * feature map). Always at least one feature (the empty-text token). */
  def classifierFeatures(text: Column): Column = {
    val ws = tokens(text)
    val bigrams = when(size(ws) >= 2,
      zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array())
    concat(ws, bigrams)
  }

  /** Per-feature signed integer weight in [-500, 500]: the 56-bit
    * portable hash folded to a small range. Stands in for a pre-trained
    * model's weight table (which at scale is the same shape: a pure
    * per-feature lookup, broadcast or hash-derived) while staying
    * bit-replicable by the DuckDB oracle. */
  def classifierWeight(feature: Column): Column =
    portableHash(feature, lit("qw")) % 1001 - 500

  /** fastText-shape linear classifier INFERENCE score: the integer sum of
    * hashed token+bigram weights. Entirely per-row column expressions —
    * ZERO shuffles: classifier scoring is the canonical embarrassingly
    * parallel corpus pass and must never cost more than the scan. The
    * keep decision is `score > 0` (sign of the mean = sign of the sum). */
  def classifierScore(text: Column): Column =
    aggregate(classifierFeatures(text), lit(0L),
      (acc, f) => acc + classifierWeight(f))

  /** URL canonicalization — the normalize step of web-crawl dedup (the
    * same fetched page arrives under utm-tagged, fragment-bearing,
    * case-varied, www/port-decorated aliases; crawl frontiers and
    * re-crawl joins key on the canonical form). Rules, each a pure
    * per-row expression (ZERO shuffles):
    *  1. drop the `#fragment` (never sent to the server);
    *  2. lowercase scheme and host (RFC 3986 §6.2.2.1 — path stays
    *     case-sensitive);
    *  3. strip a default `:443`/`:80` port and a leading `www.`;
    *  4. strip trailing `/` from the path;
    *  5. drop tracking params (`utm_*`, `fbclid`, `gclid`, `ref`) and
    *     SORT the survivors (param order is not semantic).
    * Regex subset shared by Java and RE2 so a DuckDB oracle replicates
    * byte-for-byte. Expects `scheme://host[/path][?query][#frag]`. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = split(url, "#").getItem(0)
    val scheme = lower(split(noFrag, "://").getItem(0))
    val rest = split(noFrag, "://").getItem(1)
    val hostport = regexp_extract(rest, "^([^/]*)", 1)
    val host = regexp_replace(
      regexp_replace(lower(hostport), ":(443|80)$", ""), "^www\\.", "")
    val pathq = regexp_extract(rest, "^[^/]*(.*)$", 1)
    val path = regexp_replace(split(pathq, "\\?").getItem(0), "/+$", "")
    val query = when(pathq.contains("?"),
      split(pathq, "\\?").getItem(1)).otherwise(lit(""))
    val kept = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)=")))
    concat(scheme, lit("://"), host, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** The Gopher-style rule bundle (Rae et al. 2021 §A1.1 heuristics,
    * re-expressed as exact integer comparisons — every threshold is a
    * cross-multiplication, never a float ratio, so the verdicts
    * oracle-replicate bit-for-bit): word-count bounds, mean-word-length
    * bounds via 3n ≤ Σlen ≤ 10n, symbol(#/…)-to-word ratio ≤ 0.1,
    * bullet-started lines ≤ 90%, ellipsis-ended lines ≤ 30%, ≥ 80% of
    * words contain a letter, ≥ 2 distinct core stopwords present.
    * Pure per-row expressions — the bundle costs one corpus scan. */
  def gopherRules(text: Column): Seq[(String, Column)] = {
    val ws = tokens(text)
    val nW = size(ws).cast("long")
    val sumLen = aggregate(transform(ws, w => length(w).cast("long")),
      lit(0L), (a, x) => a + x)
    val nHash = (length(text) - length(regexp_replace(text, "#", "")))
      .cast("long")
    val nEll = size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0)))
      .cast("long")
    val alphaW = size(filter(ws, w => w.rlike("[a-z]"))).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletL = size(filter(lines, l => l.rlike("^\\s*[-*•]")))
      .cast("long")
    val ellL = size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))).cast("long")
    // the published rule names {the, be, to, of, and, that, have, with};
    // this engine substitutes its house language-ID list (same mechanism,
    // ≥ 2 distinct core stopwords) so one rule set serves both operators
    val core = stopwords("en")
    val stopHits = size(array_intersect(array_distinct(ws),
      array(core.map(lit): _*))).cast("long")
    Seq(
      "r_word_count" -> (nW >= 50 && nW <= 100000),
      "r_word_len" -> (sumLen >= nW * 3 && sumLen <= nW * 10),
      "r_symbol" -> ((nHash + nEll) * 10 <= nW),
      "r_bullet" -> (bulletL * 10 <= nLines * 9),
      "r_ellipsis" -> (ellL * 10 <= nLines * 3),
      "r_alpha" -> (alphaW * 10 >= nW * 8),
      "r_stopwords" -> (stopHits >= 2))
  }
}
