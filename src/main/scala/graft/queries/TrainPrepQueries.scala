package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.text.TrainPrep

/** Training-corpus preparation queries (split / pack / scrub), each a full
  * DuckDB replica. */
object TrainPrepQueries {

  val xSplit = Q(
    "x_split",
    """SELECT doc_id,
      |  CASE WHEN h % 1000 < 50 THEN 'test'
      |       WHEN h % 1000 < 100 THEN 'val' ELSE 'train' END AS split
      |FROM (SELECT doc_id,
      |    ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT AS h
      |  FROM documents)""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    docs.select(col("doc_id"),
      TrainPrep.hashSplit(docs, "doc_id").as("split"))
  }

  /** Concat-then-chunk packing with BOUNDARY accounting
    * ([[TrainPrep.sequencePacking]]) — the x_pack delta: one GLOBAL
    * document stream (not per-shard), each doc's stream offset and
    * first/last 512-token chunk, and the `straddles` flag marking docs a
    * packed batch must attention-mask across a chunk boundary. The
    * running sum is the binned scale-safe form (no raw-row partitionless
    * window — the cumulative pass runs over id-block aggregates). */
  val xPackStraddle = Q(
    "x_pack_straddle",
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
      |      AS n_tokens
      |  FROM documents),
      |c AS (SELECT doc_id, n_tokens,
      |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cum FROM t)
      |SELECT doc_id, n_tokens, cum - n_tokens AS start_off,
      |  (cum - n_tokens) // 512 AS first_chunk,
      |  (cum - n_tokens + greatest(n_tokens, 1) - 1) // 512 AS last_chunk,
      |  ((cum - n_tokens) // 512)
      |    <> ((cum - n_tokens + greatest(n_tokens, 1) - 1) // 512)
      |    AS straddles
      |FROM c""".stripMargin) { (s, d) =>
    TrainPrep.sequencePacking(Tables.documents(s, d), "doc_id", "text",
      capacity = 512)
  }

  val xPack = Q(
    "x_pack",
    """SELECT doc_id, shard, n_tokens, running,
      |  CAST(floor(greatest(running - 1, 0) / 2048) AS BIGINT) AS bin
      |FROM (SELECT doc_id, shard, n_tokens,
      |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
      |  FROM (SELECT doc_id, doc_id % 8 AS shard,
      |      CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens
      |    FROM documents))""".stripMargin) { (s, d) =>
    TrainPrep.sequentialPack(Tables.documents(s, d),
      shardCol = col("doc_id") % 8, orderCol = "doc_id",
      graft.text.TextFns.tokenCount(col("text")).cast("long"), budget = 2048)
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("running"),
        col("bin"))
  }

  /** PII scrub over text with synthesized deterministic contacts (the raw
    * corpus has none), so the regexes demonstrably fire. */
  val xScrub = Q(
    "x_scrub",
    """WITH aug AS (SELECT doc_id,
      |    text || (CASE WHEN doc_id % 3 = 0
      |      THEN ' contact user' || doc_id || '@example.com' ELSE '' END)
      |      || (CASE WHEN doc_id % 5 = 0
      |      THEN ' tel 555-1234-567' ELSE '' END) AS text
      |  FROM documents)
      |SELECT doc_id,
      |  len(regexp_extract_all(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      |  len(regexp_extract_all(text, '\b[0-9]{2,3}-[0-9]{3,4}-[0-9]{3,4}\b')) AS n_phones,
      |  regexp_replace(regexp_replace(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b[0-9]{2,3}-[0-9]{3,4}-[0-9]{3,4}\b', '<PHONE>', 'g') AS scrubbed
      |FROM aug""".stripMargin) { (s, d) =>
    val aug = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(""),
        when(col("doc_id") % 5 === 0, " tel 555-1234-567").otherwise(""))
        .as("text"))
    val (scrubbed, emails, phones) = TrainPrep.scrubPii(col("text"))
    aug.select(col("doc_id"), emails.as("n_emails"), phones.as("n_phones"),
      scrubbed.as("scrubbed"))
  }

  /** Stratified deterministic sampling — per-language training-mix rates
    * (down-sample dominant en, keep all rare zh). */
  val xSample = Q(
    "x_sample",
    """SELECT doc_id, lang FROM (SELECT doc_id, lang,
      |    ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
      |      % 1000 AS bucket
      |  FROM documents)
      |WHERE bucket < CASE lang WHEN 'en' THEN 400 WHEN 'zh' THEN 1000
      |  ELSE 250 END""".stripMargin) { (s, d) =>
    TrainPrep.stratifiedSample(Tables.documents(s, d), "doc_id", col("lang"),
      ratesPerMille = Map("en" -> 400, "zh" -> 1000), defaultPerMille = 250)
      .select(col("doc_id"), col("lang"))
  }

  /** Benchmark decontamination: train docs sharing any 3-gram shingle with
    * the test split, with distinct-shingle hit counts. */
  val xDecontaminate = Q(
    "x_decontaminate",
    """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
      |           FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
      |       FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
      |b AS (SELECT doc_id,
      |    ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
      |      % 1000 AS bucket
      |  FROM documents),
      |ev AS (SELECT DISTINCT shingle FROM sh0 JOIN b USING (doc_id)
      |       WHERE bucket < 50),
      |tr AS (SELECT doc_id FROM b WHERE bucket >= 100),
      |hits AS (SELECT s.doc_id, COUNT(*) AS n_hits
      |         FROM sh0 s JOIN tr USING (doc_id) JOIN ev USING (shingle)
      |         GROUP BY s.doc_id)
      |SELECT tr.doc_id, coalesce(h.n_hits, 0) AS n_hits,
      |  coalesce(h.n_hits, 0) > 0 AS contaminated
      |FROM tr LEFT JOIN hits h ON tr.doc_id = h.doc_id""".stripMargin) { (s, d) =>
    TrainPrep.contaminationReport(Tables.documents(s, d), "doc_id", "text", n = 3)
  }

  /** Incremental corpus refresh (the daily-batch upsert a training corpus
    * actually runs): a deterministic staged batch — every 5th doc updated
    * (text + " v2"), the first 50 re-keyed as brand-new ids — full-outer
    * merged into the current snapshot with per-row status. One shuffle on
    * doc_id; at 100 TB the staged side is the small one and the snapshot
    * never rewrites unchanged rows downstream (status drives the sink). */
  val xIncremental = Q(
    "x_incremental",
    """WITH upd AS (
      |  SELECT doc_id, text || ' v2' AS new_text FROM documents
      |  WHERE doc_id % 5 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
      |m AS (SELECT coalesce(d.doc_id, u.doc_id) AS doc_id,
      |    coalesce(u.new_text, d.text) AS text,
      |    CASE WHEN d.doc_id IS NULL THEN 'new'
      |         WHEN u.doc_id IS NULL THEN 'unchanged'
      |         ELSE 'updated' END AS status
      |  FROM documents d FULL OUTER JOIN upd u ON d.doc_id = u.doc_id)
      |SELECT doc_id, status, CAST(len(text) AS BIGINT) AS n_chars
      |FROM m""".stripMargin) { (s, d) =>
    // presence is tracked with explicit per-side marker columns, NOT
    // payload nullity: a document with a genuinely NULL text would
    // otherwise be misclassified ('new'/'unchanged' instead of
    // 'unchanged'/'updated'), diverging from the oracle's d.doc_id IS NULL
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"),
      lit(true).as("__in_cur"))
    val staged = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" v2")).as("new_text"))
      .unionByName(docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          col("text").as("new_text")))
      .withColumn("__in_staged", lit(true))
    docs.join(staged.select(col("doc_id"), col("new_text"), col("__in_staged")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__in_cur").isNull, "new")
          .when(col("__in_staged").isNull, "unchanged")
          .otherwise("updated").as("status"),
        length(coalesce(col("new_text"), col("text"))).cast("long")
          .as("n_chars"))
  }

  /** Data-driven mixture rebalancing: per-source keep-rates computed from
    * the corpus itself (800-token budget per source). */
  val xMixRebalance = Q(
    "x_mix_rebalance",
    """WITH t AS (SELECT doc_id, source,
      |    len(string_split_regex(trim(lower(text)), '\s+')) AS n
      |  FROM documents),
      |s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS src_tokens
      |      FROM t GROUP BY source),
      |r AS (SELECT source, CASE WHEN src_tokens > 0
      |        THEN least(1000, (800 * 1000) // src_tokens)
      |        ELSE 1000 END AS rate_pm FROM s)
      |SELECT t.doc_id, t.source, CAST(r.rate_pm AS BIGINT) AS rate_pm
      |FROM t JOIN r USING (source)
      |WHERE ('0x' || substr(md5('mix:' || CAST(t.doc_id AS VARCHAR)), 1, 14))::BIGINT
      |  % 1000 < r.rate_pm""".stripMargin) { (s, d) =>
    TrainPrep.equalizeSourceBudgets(Tables.documents(s, d), "doc_id",
      "source", "text", budgetTokens = 800)
  }

  /** Weighted sampling without replacement (A-ES, fixed-point priorities):
    * top-20 docs per language, inclusion probability ∝ n_chars. */
  val xWeightedSample = Q(
    "x_weighted_sample",
    """WITH k AS (SELECT doc_id, lang, n_chars,
      |    (('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
      |      % 1000000) + 1 AS u_ppm
      |  FROM documents),
      |p AS (SELECT doc_id, lang, n_chars,
      |    (CAST(floor(-ln(u_ppm / 1000000.0) * 1000000) AS BIGINT) * 1000000)
      |      // n_chars AS priority
      |  FROM k)
      |SELECT lang, doc_id, n_chars, priority
      |FROM (SELECT *, row_number() OVER (PARTITION BY lang
      |        ORDER BY priority, doc_id) AS rn FROM p)
      |WHERE rn <= 20""".stripMargin) { (s, d) =>
    TrainPrep.weightedSampleTopK(Tables.documents(s, d),
      "doc_id", "lang", "n_chars", k = 20)
      .select(col("lang"), col("doc_id"), col("n_chars"), col("priority"))
  }

  /** Greedy per-language token-budget selection ordered by type-token
    * ratio (integer milli-units): keep the best docs until 3000 tokens. */
  val xBudgetSelect = Q(
    "x_budget_select",
    """WITH t AS (SELECT doc_id, lang,
      |    string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
      |q AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
      |    (CAST(len(list_distinct(toks)) AS BIGINT) * 1000)
      |      // CAST(len(toks) AS BIGINT) AS ttr_milli
      |  FROM t),
      |r AS (SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY lang
      |      ORDER BY ttr_milli DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    AS running FROM q)
      |SELECT doc_id, lang, n_tokens, ttr_milli, running
      |FROM r WHERE running <= 3000""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        graft.text.TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
      .withColumn("ttr_milli", expr("(n_distinct * 1000) div n_tokens"))
    TrainPrep.budgetSelect(base, "lang", "ttr_milli", "doc_id", "n_tokens",
        budget = 3000L)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("ttr_milli"),
        col("running"))
  }

  /** Overlapping token-window chunking (size 32, stride 24) — the RAG /
    * context-window prep step. Chunk boundaries are pure integer
    * arithmetic; the final partial chunk is kept. One generated row per
    * chunk, no shuffle at all (narrow explode). */
  val xChunk = Q(
    "x_chunk",
    """WITH t AS (SELECT doc_id,
      |    string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
      |n AS (SELECT doc_id, toks,
      |    (greatest(CAST(len(toks) AS BIGINT) - 32, 0) + 23) // 24 + 1 AS n_chunks
      |  FROM t)
      |SELECT doc_id, i AS chunk_idx,
      |  array_to_string(toks[(i*24+1):(i*24+32)], ' ') AS chunk_text,
      |  CAST(len(toks[(i*24+1):(i*24+32)]) AS BIGINT) AS n_chunk_tokens
      |FROM n, UNNEST(range(n_chunks)) AS u(i)""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), graft.text.TextFns.tokens(col("text")).as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        expr("(greatest(n_tok - 32, 0L) + 23) div 24 + 1"))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0L, n_chunks - 1)," +
            " i -> slice(toks, int(i * 24 + 1), 32))")).as(Seq("pos", "chunk")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        array_join(col("chunk"), " ").as("chunk_text"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"))
  }

  /** Winsorization at exact p05/p95 rank-select bounds (outlier clipping
    * before corpus statistics) — bounds broadcast, clamp map-side. */
  val xWinsorize = Q(
    "x_winsorize",
    """WITH vc AS (SELECT n_chars AS v, COUNT(*) AS cnt FROM documents
      |            GROUP BY 1),
      |vv AS (SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |         AS cum, SUM(cnt) OVER () AS n FROM vc),
      |lo AS (SELECT MIN(v) AS lo FROM vv WHERE cum >= ceil(0.05 * n)),
      |hi AS (SELECT MIN(v) AS hi FROM vv WHERE cum >= ceil(0.95 * n))
      |SELECT doc_id, n_chars,
      |  least(greatest(n_chars, lo), hi) AS clamped,
      |  n_chars <> least(greatest(n_chars, lo), hi) AS was_clipped
      |FROM documents, lo, hi""".stripMargin) { (s, d) =>
    TrainPrep.winsorize(Tables.documents(s, d), "n_chars")
      .select(col("doc_id"), col("n_chars"), col("clamped"), col("was_clipped"))
  }

  /** Temperature-based mixture weights (the multilingual-corpus
    * flattening standard, α = 0.5): per-source sampling weight ∝ √n_s,
    * beside the raw share — small sources up-weighted, large flattened.
    * Engine-exact WITHOUT the ln caveat: IEEE requires sqrt and multiply
    * correctly rounded, so both engines compute the identical double for
    * √n·10⁶, the identical floor, and from there everything is BIGINT
    * (the quantized weights are summed as integers — never a
    * source-order-dependent double sum). One aggregation over the source
    * dimension + a one-row totals broadcast. */
  val xMixTemperature = Q(
    "x_mix_temperature",
    """WITH s AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
      |q AS (SELECT source, n_docs,
      |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS wq
      |  FROM s),
      |z AS (SELECT CAST(SUM(wq) AS BIGINT) AS tot_wq,
      |             CAST(SUM(n_docs) AS BIGINT) AS tot_n FROM q)
      |SELECT source, n_docs,
      |  n_docs * 1000000 // tot_n AS share_ppm,
      |  wq * 1000000 // tot_wq AS weight_ppm
      |FROM q, z""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("wq",
        floor(sqrt(col("n_docs").cast("double")) * 1000000).cast("long"))
    val z = src.agg(
      org.apache.spark.sql.functions.sum(col("wq")).as("tot_wq"),
      org.apache.spark.sql.functions.sum(col("n_docs")).as("tot_n"))
    src.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"),
        expr("n_docs * 1000000 div tot_n").as("share_ppm"),
        expr("wq * 1000000 div tot_wq").as("weight_ppm"))
  }

  /** Winsorization of a CONTINUOUS metric through the guard's sanctioned
    * route: the double avg-token-length is quantized to exact milli-units
    * (floor of a correctly-rounded product — deterministic cross-engine),
    * and the quantized INTEGER metric goes through the same distinct-value
    * rank-select winsorize as x_winsorize. This is the path the
    * bounded-domain guard points continuous callers at — registered so
    * the documented alternative is itself oracle-proven. */
  val xWinsorizeCont = Q(
    "x_winsorize_cont",
    """WITH t AS (SELECT doc_id,
      |    string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents),
      |m AS (SELECT doc_id,
      |    CAST(floor(CAST(list_sum(list_transform(ws, w -> len(w))) AS DOUBLE)
      |      / len(ws) * 1000) AS BIGINT) AS atl_milli
      |  FROM t),
      |vc AS (SELECT atl_milli AS v, COUNT(*) AS cnt FROM m GROUP BY 1),
      |vv AS (SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |         AS cum, SUM(cnt) OVER () AS n FROM vc),
      |lo AS (SELECT MIN(v) AS lo FROM vv WHERE cum >= ceil(0.05 * n)),
      |hi AS (SELECT MIN(v) AS hi FROM vv WHERE cum >= ceil(0.95 * n))
      |SELECT doc_id, atl_milli,
      |  least(greatest(atl_milli, lo), hi) AS clamped,
      |  atl_milli <> least(greatest(atl_milli, lo), hi) AS was_clipped
      |FROM m, lo, hi""".stripMargin) { (s, d) =>
    val quantized = Tables.documents(s, d).select(col("doc_id"),
      floor(graft.text.TextFns.avgTokenLen(col("text")) * 1000)
        .cast("long").as("atl_milli"))
    TrainPrep.winsorize(quantized, "atl_milli")
      .select(col("doc_id"), col("atl_milli"), col("clamped"),
        col("was_clipped"))
  }

  /** Deterministic global training-order shuffle + balanced 16-way shard
    * assignment (round-robin on the exact md5-order global position; no
    * corpus-sized one-task window — Scale.binnedGlobalRank over uniform
    * hash cells). */
  val xShard = Q(
    "x_shard",
    """SELECT doc_id, pos, (pos - 1) % 16 AS shard,
      |  (pos - 1) // 16 + 1 AS pos_in_shard
      |FROM (SELECT doc_id, row_number() OVER (ORDER BY h, doc_id) AS pos
      |  FROM (SELECT doc_id,
      |      ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT AS h
      |    FROM documents))""".stripMargin) { (s, d) =>
    TrainPrep.shardAssign(Tables.documents(s, d), "doc_id", nShards = 16)
      .select(col("doc_id"), col("pos"), col("shard"), col("pos_in_shard"))
  }

  /** Weighted fair-queueing interleave across sources (the mixture
    * SCHEDULE): source weight w = (numeric suffix % 4) + 1 here standing in
    * for a configured mixture map; a weight-4 source appears 4× as often as
    * a weight-1 source at every prefix of the global order. */
  val xInterleave = Q(
    "x_interleave",
    """WITH h AS (SELECT doc_id, source,
      |    ('0x' || substr(md5('ilv:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT AS h
      |  FROM documents),
      |r AS (SELECT doc_id, source,
      |    CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS w,
      |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
      |  FROM h),
      |v AS (SELECT doc_id, source, rn, (rn * 1000000) // w AS vt FROM r)
      |SELECT doc_id, source, CAST(rn AS BIGINT) AS rn, vt,
      |  row_number() OVER (ORDER BY vt, source, rn) AS pos
      |FROM v""".stripMargin) { (s, d) =>
    TrainPrep.interleaveOrder(Tables.documents(s, d), "doc_id", "source",
        weight = expr("CAST(substr(source, 4, 8) AS BIGINT) % 4 + 1"))
      .select(col("doc_id"), col("source"), col("rn"), col("vt"), col("pos"))
  }

  /** N-gram novelty scoring: per document, the fraction of its distinct
    * 3-gram shingles it is the corpus-wide FIRST owner of (min doc id) —
    * ranks later near-copies low without any pairwise join. */
  val xNovelty = Q(
    "x_novelty",
    """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
      |           FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
      |       FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
      |fo AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1)
      |SELECT doc_id, COUNT(*) AS n_shingles,
      |  COUNT(*) FILTER (WHERE doc_id = first_doc) AS n_novel,
      |  (COUNT(*) FILTER (WHERE doc_id = first_doc) * 1000000) // COUNT(*)
      |    AS novelty_ppm
      |FROM sh JOIN fo USING (shingle) GROUP BY 1""".stripMargin) { (s, d) =>
    TrainPrep.noveltyReport(Tables.documents(s, d), "doc_id", "text", n = 3)
  }

  /** Content-defined chunking: boundaries after hash≡0 words (expected
    * length 8 tokens) — edit-stable chunk boundaries, unlike x_chunk's
    * fixed stride. */
  val xChunkCdc = Q(
    "x_chunk_cdc",
    """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
      |           FROM documents),
      |t AS (SELECT doc_id, i, ws[i] AS word
      |      FROM w, UNNEST(range(1, len(ws) + 1)) AS u(i)),
      |b AS (SELECT doc_id, i, word,
      |    CASE WHEN ('0x' || substr(md5('cdc:' || word), 1, 14))::BIGINT % 8 = 0
      |      THEN 1 ELSE 0 END AS bd FROM t),
      |c AS (SELECT doc_id, i, word,
      |    CAST(COALESCE(SUM(bd) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS chunk_id FROM b)
      |SELECT doc_id, chunk_id,
      |  string_agg(word, ' ' ORDER BY i) AS chunk_text,
      |  COUNT(*) AS n_tokens
      |FROM c GROUP BY 1, 2""".stripMargin) { (s, d) =>
    TrainPrep.cdcChunks(Tables.documents(s, d), "doc_id", "text", avgTokens = 8)
  }

  /** URL canonicalization + dedup (TextFns.canonicalizeUrl): the corpus
    * has no URL column, so aliases are SYNTHESIZED deterministically from
    * doc_id — case-varied scheme/host, www. prefix, default :443 port,
    * trailing slash, utm params in varying order, fragments — and the
    * operator under test collapses them: canonical key reduces to
    * doc_id mod 100, so each group holds every alias spelling. Emits the
    * per-row canonical form plus the min-id keeper (one canonical-keyed
    * shuffle; the canonicalization itself is zero-shuffle per-row). */
  val xUrlDedup = Q(
    "x_url_dedup",
    """WITH u AS (SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://'
      |    || (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
      |    || (CASE WHEN doc_id % 2 = 0 THEN 'Example' ELSE 'example' END)
      |    || (doc_id % 20)
      |    || (CASE WHEN doc_id % 2 = 0 THEN '.COM' ELSE '.com' END)
      |    || (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END)
      |    || '/docs/' || (doc_id % 50)
      |    || (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END)
      |    || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || (doc_id % 100)
      |        WHEN doc_id % 3 = 1 THEN '?id=' || (doc_id % 100) || '&utm_campaign=x'
      |        ELSE '?id=' || (doc_id % 100) END)
      |    || (CASE WHEN doc_id % 13 = 0 THEN '#sec2' ELSE '' END) AS url
      |  FROM documents),
      |p1 AS (SELECT doc_id, url,
      |    string_split(url, '#')[1] AS nofrag FROM u),
      |p2 AS (SELECT *, lower(string_split(nofrag, '://')[1]) AS scheme,
      |    string_split(nofrag, '://')[2] AS rest FROM p1),
      |p3 AS (SELECT *, regexp_extract(rest, '^([^/]*)', 1) AS hostport,
      |    regexp_extract(rest, '^[^/]*(.*)$', 1) AS pathq FROM p2),
      |p4 AS (SELECT *,
      |    regexp_replace(regexp_replace(lower(hostport), ':(443|80)$', ''),
      |      '^www\.', '') AS host,
      |    regexp_replace(string_split(pathq, '?')[1], '/+$', '') AS path,
      |    CASE WHEN contains(pathq, '?') THEN string_split(pathq, '?')[2]
      |      ELSE '' END AS query FROM p3),
      |p5 AS (SELECT *, list_sort(list_filter(string_split(query, '&'),
      |      x -> x <> '' AND NOT regexp_matches(x,
      |        '^(utm_[^=]*|fbclid|gclid|ref)='))) AS kept FROM p4),
      |c AS (SELECT doc_id, url,
      |    scheme || '://' || host || path
      |    || (CASE WHEN len(kept) > 0
      |        THEN '?' || array_to_string(kept, '&') ELSE '' END)
      |      AS canonical_url FROM p5)
      |SELECT doc_id, url, canonical_url,
      |  MIN(doc_id) OVER (PARTITION BY canonical_url) AS keep_id
      |FROM c""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val id = col("doc_id")
    def s99(c: org.apache.spark.sql.Column) = c.cast("string")
    val url = concat(
      when(id % 2 === 0, "HTTPS").otherwise("https"), lit("://"),
      when(id % 5 === 0, "www.").otherwise(""),
      when(id % 2 === 0, "Example").otherwise("example"),
      s99(id % 20),
      when(id % 2 === 0, ".COM").otherwise(".com"),
      when(id % 7 === 0, ":443").otherwise(""),
      lit("/docs/"), s99(id % 50),
      when(id % 11 === 0, "/").otherwise(""),
      when(id % 3 === 0, concat(lit("?utm_source=feed&id="), s99(id % 100)))
        .when(id % 3 === 1,
          concat(lit("?id="), s99(id % 100), lit("&utm_campaign=x")))
        .otherwise(concat(lit("?id="), s99(id % 100))),
      when(id % 13 === 0, "#sec2").otherwise(""))
    Tables.documents(s, d)
      .select(id, url.as("url"))
      .withColumn("canonical_url",
        graft.text.TextFns.canonicalizeUrl(col("url")))
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy(col("canonical_url"))))
  }

  /** Curriculum ordering: documents ranked easy→hard (difficulty =
    * n_chars, ties → doc_id), cut into 4 training phases with a
    * deterministic shuffle key WITHIN each phase (md5 of the doc id —
    * curriculum training reads phases in order but must not feed
    * length-sorted batches inside one). The global rank comes from
    * [[graft.ops.Scale.binnedGlobalRank]] (integer difficulty domain =
    * identity bins) — no corpus-sized one-task window; the oracle uses
    * the plain rank/ntile windows it replaces. */
  val xCurriculum = Q(
    "x_curriculum",
    """WITH r AS (SELECT doc_id, n_chars AS difficulty,
      |    row_number() OVER (ORDER BY n_chars, doc_id) AS rnk
      |  FROM documents)
      |SELECT doc_id, difficulty, rnk,
      |  ntile(4) OVER (ORDER BY rnk) AS phase,
      |  substr(md5('cur:' || CAST(doc_id AS VARCHAR)), 1, 8) AS order_key
      |FROM r""".stripMargin) { (s, d) =>
    import graft.ops.Scale
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars").as("difficulty"))
    val n = docs.agg(count(lit(1)).as("__n"))
    Scale.binnedGlobalRank(
      docs.crossJoin(broadcast(n)),
      col("difficulty"), Seq(col("difficulty").asc, col("doc_id").asc),
      binAsc = true, "rnk")
      .select(col("doc_id"), col("difficulty"), col("rnk"),
        Scale.ntileFromRank(col("rnk"), col("__n"), 4).as("phase"),
        substring(md5(concat(lit("cur:"), col("doc_id").cast("string"))),
          1, 8).as("order_key"))
  }

  /** Per-source document cap (the domain-cap anti-boilerplate policy —
    * no single domain may contribute more than k = 10 documents; keep the
    * LONGEST k, ties → doc_id). Implemented with the bounded TopKAgg
    * aggregate, NOT a per-source rank window: partial aggregation trims
    * each map task's share of a source to k rows BEFORE the exchange, so
    * one giant domain (the 100 TB failure mode of the window form — all
    * its rows sort in one task) costs k·tasks shuffled rows like any
    * other. Oracle = the window form it replaces bit-for-bit. */
  val xSourceCap = Q(
    "x_source_cap",
    """SELECT source, doc_id, n_chars, rk FROM (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents) t WHERE rk <= 10""".stripMargin) { (s, d) =>
    val topk = graft.functions.TopKAgg.topK(10)
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(topk(col("n_chars").cast("double"), col("doc_id")).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("source"), col("s.id").as("doc_id"),
        col("s.score").cast("long").as("n_chars"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** Quantile normalization across sources: each document's length is
    * replaced by the GLOBAL distribution's value at the same quantile —
    * the calibration that makes per-source scores comparable when sources
    * have different length profiles. Per-source rank r_s → quantile
    * q_ppm = (r_s−1)·10⁶ div (n_s−1) → global target rank
    * 1 + (r_s−1)(N−1) div (n_s−1) → the global value at that rank. All
    * integer; the global rank table comes from
    * [[graft.ops.Scale.binnedGlobalRank]] (no corpus-sized window); the
    * per-source rank from [[graft.ops.Scale.binnedGroupRank]] over
    * (source, n_chars) bins, so no raw-row window partitions on the
    * handful of source values. */
  val xQuantileNorm = Q(
    "x_quantile_norm",
    """WITH r AS (SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS rs,
      |    COUNT(*) OVER (PARTITION BY source) AS ns
      |  FROM documents),
      |g AS (SELECT n_chars AS norm_value,
      |    row_number() OVER (ORDER BY n_chars, doc_id) AS rg
      |  FROM documents),
      |t AS (SELECT COUNT(*) AS n FROM documents),
      |q AS (SELECT r.doc_id, r.source, r.n_chars,
      |    (r.rs - 1) * 1000000 // greatest(r.ns - 1, 1) AS q_ppm,
      |    1 + ((r.rs - 1) * (t.n - 1)) // greatest(r.ns - 1, 1) AS rg
      |  FROM r, t)
      |SELECT q.doc_id, q.source, q.n_chars, q.q_ppm, g.norm_value
      |FROM q JOIN g USING (rg)""".stripMargin) { (s, d) =>
    import graft.ops.Scale
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
    // per-source rank via the (source, n_chars) bin — lengths are a
    // bounded integer domain, so no raw-row window ever partitions on
    // the handful of source values; ns is a broadcast source dimension
    val ns = docs.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val r = Scale.binnedGroupRank(docs, Seq(col("source")), col("n_chars"),
        Seq(col("doc_id").asc), binAsc = true, "rs")
      .withColumn("rs", col("rs").cast("long"))
      .join(broadcast(ns), Seq("source"))
    val g = Scale.binnedGlobalRank(docs, col("n_chars"),
      Seq(col("n_chars").asc, col("doc_id").asc), binAsc = true, "rg")
      .select(col("n_chars").as("norm_value"), col("rg").cast("long").as("rg"))
    val t = docs.agg(count(lit(1)).as("__n"))
    r.crossJoin(broadcast(t))
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr("(rs - 1) * 1000000 div greatest(ns - 1, 1)").as("q_ppm"),
        expr("1 + ((rs - 1) * (__n - 1)) div greatest(ns - 1, 1)").as("rg"))
      .join(g, Seq("rg"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("q_ppm"),
        col("norm_value"))
  }

  /** Length-sorted batching meter: padding waste of arrival-order vs
    * length-sorted batch assembly (batch = 32 docs per shard; a batch
    * pads every member to its max length, so waste = Σ(max·n − Σlen)).
    * Sorting within the shard is the standard training-efficiency
    * technique; this query QUANTIFIES it per shard in exact tokens and
    * ppm. Windows are shard-partitioned (bounded); one scan feeds both
    * policies. */
  val xBatchPadding = Q(
    "x_batch_padding",
    """WITH t AS (SELECT doc_id, doc_id % 4 AS shard,
      |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
      |      AS n_tokens
      |  FROM documents),
      |a AS (SELECT shard, n_tokens,
      |    (row_number() OVER (PARTITION BY shard ORDER BY doc_id) - 1) // 32
      |      AS batch FROM t),
      |b AS (SELECT shard, n_tokens,
      |    (row_number() OVER (PARTITION BY shard
      |       ORDER BY n_tokens, doc_id) - 1) // 32 AS batch FROM t),
      |pa AS (
      |  SELECT 'arrival' AS policy, shard, batch, COUNT(*) AS n,
      |    MAX(n_tokens) AS mx, SUM(n_tokens) AS s FROM a GROUP BY 2, 3
      |  UNION ALL
      |  SELECT 'sorted', shard, batch, COUNT(*), MAX(n_tokens),
      |    SUM(n_tokens) FROM b GROUP BY 2, 3)
      |SELECT policy, shard, COUNT(*) AS n_batches,
      |  CAST(SUM(mx * n - s) AS BIGINT) AS pad_tokens,
      |  CAST(SUM(mx * n - s) * 1000000 // SUM(mx * n) AS BIGINT)
      |    AS waste_ppm
      |FROM pa GROUP BY 1, 2""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val t = Tables.documents(s, d).select(
      col("doc_id"), (col("doc_id") % 4).as("shard"),
      graft.text.TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
    def batched(name: String, order: Seq[org.apache.spark.sql.Column]) =
      t.withColumn("rn", row_number().over(
        Window.partitionBy(col("shard")).orderBy(order: _*)).cast("long"))
        .select(lit(name).as("policy"), col("shard"), col("n_tokens"),
          expr("(rn - 1) div 32").as("batch"))
    val both = batched("arrival", Seq(col("doc_id").asc))
      .unionByName(batched("sorted", Seq(col("n_tokens").asc, col("doc_id").asc)))
    both.groupBy(col("policy"), col("shard"), col("batch"))
      .agg(count(lit(1)).as("n"), max(col("n_tokens")).as("mx"),
        sum(col("n_tokens")).as("s"))
      .groupBy(col("policy"), col("shard"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("mx") * col("n") - col("s")).as("pad_tokens"),
        expr("sum(mx * n - s) * 1000000 div sum(mx * n)").as("waste_ppm"))
  }

  val all: Seq[Q] = Seq(xSplit, xPack, xPackStraddle, xScrub, xSample,
    xDecontaminate,
    xIncremental, xMixRebalance, xWeightedSample, xBudgetSelect, xChunk,
    xChunkCdc, xNovelty,
    xWinsorize, xShard, xInterleave, xUrlDedup, xCurriculum, xSourceCap,
    xQuantileNorm, xBatchPadding, xMixTemperature, xWinsorizeCont)
}
