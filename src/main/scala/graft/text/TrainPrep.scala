package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators beyond dedup/quality: the steps a
  * large-scale LLM data pipeline runs between "cleaned documents" and
  * "training shards".
  *
  *  - [[hashSplit]] — deterministic train/val/test assignment by content-
  *    independent hash of the document id: stable under re-runs, re-
  *    partitioning and corpus growth (a doc never migrates between
  *    splits), the property random sampling lacks;
  *  - [[sequentialPack]] — token-budget bin assignment: documents are
  *    packed into consecutive context-window bins in a deterministic key
  *    order via a running token total. One window per ordering key — at
  *    scale, partition the corpus (e.g. by shard) and pack per shard so
  *    the window never sees unbounded groups;
  *  - [[scrubPii]] — email/phone scrubbing with per-document hit counts
  *    (regexp-based, engine-portable patterns).
  */
object TrainPrep {

  /** Deterministic split by md5-derived hash bucket (per-mille).
    * Thresholds: test < `testPerMille` ≤ val < `valPerMille`+`testPerMille`
    * ≤ train. */
  def hashSplit(
      docs: DataFrame, idCol: String,
      testPerMille: Int = 50, valPerMille: Int = 50): Column = {
    val bucket = TextFns.portableHash(col(idCol).cast("string"), lit("split")) % 1000
    when(bucket < testPerMille, "test")
      .when(bucket < testPerMille + valPerMille, "val")
      .otherwise("train")
  }

  /** Leakage-safe train/val/test split: documents are assigned at DEDUP-
    * CLUSTER granularity, not per document — every member of a near-dup
    * cluster hashes on the cluster id, so two near-copies can never land
    * on opposite sides of the split (per-doc hashing leaks test content
    * into train through its near-duplicates, inflating eval scores).
    * `clusters` is a (doc_id, cluster_id) membership table (e.g. GraphX
    * connected components over LSH pairs); unclustered documents fall back
    * to their own id as a singleton cluster. One doc-keyed shuffle join;
    * the split itself is map-side hashing — no extra wide stage over the
    * per-doc split. */
  def clusterSplit(
      docs: DataFrame, idCol: String, clusters: DataFrame,
      testPerMille: Int = 50, valPerMille: Int = 50): DataFrame = {
    val cl = clusters.select(col(clusters.columns(0)).as(idCol),
      col(clusters.columns(1)).as("cluster_id"))
    val keyed = docs.select(col(idCol)).join(cl, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
    val bucket =
      TextFns.portableHash(col("cluster_id").cast("string"), lit("split")) % 1000
    keyed.select(col(idCol), col("cluster_id"),
      when(bucket < testPerMille, "test")
        .when(bucket < testPerMille + valPerMille, "val")
        .otherwise("train").as("split"))
  }

  /** Pack documents into consecutive token-budget bins per SHARD: within a
    * shard, bin i holds the documents whose running token total (in
    * `orderCol` order) falls in (i·budget, (i+1)·budget]. The shard column
    * partitions the window — at 100 TB an unpartitioned running total
    * funnels the whole corpus through one task, so packing is always
    * shard-local (shards are what a training loader consumes anyway).
    * Deterministic given (shard, order). */
  def sequentialPack(
      docs: DataFrame, shardCol: Column, orderCol: String,
      tokenCountCol: Column, budget: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .withColumn("shard", shardCol)
      .withColumn("n_tokens", tokenCountCol)
      .withColumn("running", sum(col("n_tokens")).over(w))
      // greatest(..., 0): a shard-leading zero-token doc has running = 0
      // and must land in bin 0, not bin -1
      .withColumn("bin",
        floor(greatest(col("running") - 1, lit(0)) / budget).cast("long"))
  }

  /** Deterministic stratified sampling: keep a row iff its content-
    * independent hash bucket (per-mille of the id, salt "sample") falls
    * below the stratum's rate. The same doc always gets the same verdict
    * under re-runs, re-partitioning and corpus growth — the reproducibility
    * property `df.sample()` lacks — and per-stratum rates are how training
    * mixes are actually specified (upweight rare sources, downsample web).
    * Rates are a when-cascade over SORTED keys (map order never leaks into
    * the plan). */
  def stratifiedSample(
      docs: DataFrame, idCol: String, stratumCol: Column,
      ratesPerMille: Map[String, Int], defaultPerMille: Int): DataFrame = {
    val bucket =
      TextFns.portableHash(col(idCol).cast("string"), lit("sample")) % 1000
    val rate = ratesPerMille.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPerMille)) { case (acc, (k, v)) =>
        when(stratumCol === k, lit(v)).otherwise(acc)
      }
    docs.filter(bucket < rate)
  }

  /** Source-budget rebalancing: compute each source's keep-rate FROM THE
    * DATA — rate‰ = min(1000, budget·1000 ⌊/⌋ source_tokens) — then apply
    * the deterministic hash filter. Equalizes per-source token budgets
    * (the "don't let one crawl dominate the mix" knob) with zero driver
    * logic: the 20-row totals dimension broadcasts back onto the corpus,
    * and integer floor division keeps the rates engine-exact. */
  def equalizeSourceBudgets(
      docs: DataFrame, idCol: String, sourceCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    val totals = docs.groupBy(col(sourceCol))
      .agg(sum(TextFns.tokenCount(col(textCol)).cast("long")).as("src_tokens"))
      .withColumn("rate_pm",
        when(col("src_tokens") > 0,
          least(lit(1000L), expr(s"(${budgetTokens} * 1000) div src_tokens")))
          .otherwise(lit(1000L)))
      .select(col(sourceCol), col("rate_pm"))
    docs.join(broadcast(totals), Seq(sourceCol))
      .filter(TextFns.portableHash(col(idCol).cast("string"), lit("mix")) % 1000
        < col("rate_pm"))
      .select(col(idCol), col(sourceCol), col("rate_pm"))
  }

  /** Benchmark decontamination: for every TRAIN-split document, the number
    * of distinct word `n`-gram shingles it shares with the eval (test)
    * split, plus the contaminated verdict. The production shape: the eval
    * shingle set is tiny relative to the corpus, so it is broadcast and the
    * train-side shingle table never shuffles for the overlap join — the
    * only wide exchange is the per-doc hit count. Real pipelines use
    * 8–13-gram shingles; `n` is a parameter. */
  def contaminationReport(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val splits = docs.select(col(idCol).as("doc_id"),
      hashSplit(docs, idCol).as("split"))
    val sh = graft.dedup.Dedup.shingles(docs, idCol, textCol, n)
    val evalSh = sh
      .join(splits.filter(col("split") === "test"), Seq("doc_id"), "left_semi")
      .select(col("shingle")).distinct()
    val train = splits.filter(col("split") === "train").select(col("doc_id"))
    val hits = sh
      .join(train, Seq("doc_id"), "left_semi")
      .join(broadcast(evalSh), Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    train.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** N-gram novelty: fraction of a document's distinct shingles whose
    * FIRST owner over the whole corpus (min doc id) is the document
    * itself — the data-selection signal that ranks later near-copies
    * and boilerplate-heavy documents low WITHOUT pairwise comparison
    * (cost: one shuffle on the shingle key + one per-doc aggregate, vs
    * the quadratic candidate joins of the pair-based dedups). Fixed-point
    * ppm (integral division, engine-exact). Documents shorter than `n`
    * words have no shingles and no report row. Output: (doc_id,
    * n_shingles, n_novel, novelty_ppm). */
  def noveltyReport(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val sh = graft.dedup.Dedup.shingles(docs, idCol, textCol, n)
    val firstOwner = sh.groupBy(col("shingle"))
      .agg(min(col("doc_id")).as("first_doc"))
    sh.join(firstOwner, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("doc_id") === col("first_doc"), lit(1))).as("n_novel"))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_shingles"))
  }

  /** Content-defined chunking (the dedup-friendly chunker): a chunk
    * boundary falls AFTER every word whose content hash ≡ 0 mod
    * `avgTokens`, so expected chunk length is avgTokens and — unlike
    * x_chunk's fixed stride — boundaries are stable under upstream
    * insertions/deletions (an edit re-chunks only its own neighborhood,
    * so chunk-level dedup still matches everything downstream of the
    * edit). One doc-keyed window + one doc-keyed aggregate. Output:
    * (doc_id, chunk_id, chunk_text, n_tokens). */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      avgTokens: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "word")))
      .withColumn("bd",
        when(pmod(TextFns.portableHash(col("word"), lit("cdc")),
          lit(avgTokens.toLong)) === 0, 1L).otherwise(0L))
      .withColumn("chunk_id", coalesce(sum(col("bd")).over(w), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("pos"), col("word")))),
          s => s("word")), " ").as("chunk_text"),
        count(lit(1)).as("n_tokens"))
  }

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b[0-9]{2,3}-[0-9]{3,4}-[0-9]{3,4}\\b"

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES), in
    * fixed point: each row gets priority −ln(u)/w with u a deterministic
    * hash-uniform in (0,1] and w the row's weight; the k SMALLEST
    * priorities per stratum are the weighted sample. ln is quantized to
    * integer microunits BEFORE the weight division ((negLnMicro·10⁶) ⌊/⌋ w)
    * so the ordering key is a BIGINT both engines reproduce — the one
    * transcendental call takes identically-rounded double inputs on both
    * sides and a 1-ulp ln discrepancy can only flip the floor at a ~2⁻³⁰
    * boundary. One ranking window per stratum, no global shuffle beyond
    * it; selection is re-run-stable under corpus growth the way all the
    * hash-keyed sampling here is. */
  def weightedSampleTopK(
      docs: DataFrame, idCol: String, strataCol: String, weightCol: String,
      k: Int, salt: String = "wsample"): DataFrame = {
    val u = pmod(TextFns.portableHash(col(idCol).cast("string"), lit(salt)),
      lit(1000000L)) + lit(1L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("priority"), col(idCol))
    docs
      .withColumn("__u_ppm", u)
      .withColumn("__neg_ln_micro",
        graft.core.QuantLn.negLnMicro(col("__u_ppm") / 1000000.0))
      .withColumn("priority", expr(s"(__neg_ln_micro * 1000000) div $weightCol"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__u_ppm", "__neg_ln_micro", "__rn")
  }

  /** Greedy token-budget corpus selection: order a stratum's documents by
    * a quality key (descending) and keep the prefix whose running token
    * total stays within the budget — the "fill the training mix with the
    * best docs first" step. Quality and tokens are integers so the cutoff
    * is engine-exact.
    *
    * Scale shape: the running total routes through
    * [[graft.ops.Scale.binnedGroupRunningSum]] with the quality value as
    * the bin — strata are typically a handful of languages/sources, so a
    * raw-row window partitioned by the stratum would carry
    * ~corpus/|strata| rows per task (the x_len_quantiles straggler
    * class). With quality binning the only per-row window partitions on
    * (stratum, quality), and the cross-bin offsets live on the bounded
    * (stratum × quality) aggregate. Caller contract: `qualityCol` is a
    * bounded integral score (e.g. milli-units in 0..1000). */
  def budgetSelect(
      docs: DataFrame, strataCol: String, qualityCol: String,
      orderCol: String, tokenCol: String, budget: Long): DataFrame =
    graft.ops.Scale.binnedGroupRunningSum(
        docs, Seq(col(strataCol)), col(qualityCol),
        Seq(col(orderCol)), col(tokenCol), binAsc = false, "running")
      .filter(col("running") <= budget)

  /** Sequence packing — the concat-then-chunk layout LLM pretraining
    * actually feeds the model: documents are concatenated in a
    * deterministic stream order (doc_id asc) and the token stream is cut
    * every `capacity` tokens. Per document: its exclusive start offset in
    * the stream, the first/last chunk it lands in, and whether it
    * STRADDLES a chunk boundary (the attention-mask/split accounting a
    * packing pipeline needs).
    *
    * Scale shape: the global running sum routes through
    * [[graft.ops.Scale.binnedGroupRunningSum]] with doc_id-block bins
    * (id div 2¹⁶ — the contrastiveTriplets binning), so no raw-row
    * partitionless window exists: the cumulative pass runs over the
    * bounded bin aggregate, the in-bin window over one id block. A
    * zero-token document occupies no stream space: it lands wholly in
    * the chunk at its offset (first = last, no straddle).
    * Output: (doc_id, n_tokens, start_off, first_chunk, last_chunk,
    * straddles). */
  def sequencePacking(
      docs: DataFrame, idCol: String, textCol: String,
      capacity: Long): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    val base = docs.select(col(idCol).as("doc_id"),
      TextFns.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    graft.ops.Scale.binnedGroupRunningSum(
        base, Seq(lit(1)), expr("doc_id div 65536"),
        Seq(col("doc_id").asc), col("n_tokens"), binAsc = true, "cum")
      .withColumn("start_off", col("cum") - col("n_tokens"))
      .withColumn("first_chunk", expr(s"start_off div $capacity"))
      .withColumn("last_chunk", expr(
        s"(start_off + greatest(n_tokens, 1L) - 1L) div $capacity"))
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        col("first_chunk"), col("last_chunk"),
        (col("first_chunk") =!= col("last_chunk")).as("straddles"))
  }

  /** Scrub emails and phone-shaped numbers, counting hits per document. */
  def scrubPii(text: Column): (Column, Column, Column) = {
    val emails = size(regexp_extract_all(text, lit(EmailRe), lit(0)))
    val phones = size(regexp_extract_all(text, lit(PhoneRe), lit(0)))
    val scrubbed = regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
    (scrubbed, emails.cast("long"), phones.cast("long"))
  }

  /** Winsorize an integer column at exact [loQ, hiQ] rank-select bounds
    * (outlier clipping before length/score statistics): the bounds are
    * the deterministic "smallest value with cumulative count ≥ ⌈q·N⌉"
    * used everywhere else here — never an interpolated percentile — and
    * reach the corpus as a one-row broadcast, so the clamp itself is a
    * map-side expression over one scan. The cumulative window runs over
    * the DISTINCT-VALUE domain (bounded), not the corpus.
    *
    * GUARDED contract: `valueCol` must be an integral type. The
    * partitionless cumulative window below is whitelisted in
    * PlanAuditSpec precisely because its input is the distinct-value
    * aggregate of a bounded integer domain; a continuous DOUBLE column
    * would make that domain corpus-sized and the window a one-task
    * straggler — the failure mode the audit bans elsewhere. Continuous
    * metrics go through [[Sketches.histogramBins]] first. */
  def winsorize(df: DataFrame, valueCol: String,
      loQ: Double = 0.05, hiQ: Double = 0.95): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"winsorize: valueCol '$valueCol' is $dt — the distinct-value " +
        "cumulative window is only scale-safe over a bounded integer " +
        "domain. Bin continuous metrics first (Sketches.histogramBins) " +
        "or cast explicitly after quantizing.")
    val v = col(valueCol).cast("long")
    val wCum = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val vals = df.select(v.as("__v")).groupBy(col("__v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    def bound(q: Double, name: String) =
      vals.filter(col("cum") >= ceil(lit(q) * col("n")))
        .agg(min(col("__v")).as(name))
    val bounds = bound(loQ, "lo").crossJoin(bound(hiQ, "hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("clamped", least(greatest(v, col("lo")), col("hi")))
      .withColumn("was_clipped", v =!= col("clamped"))
      .drop("lo", "hi")
  }

  /** Deterministic global training-order shuffle + balanced shard
    * assignment — the step between "selected corpus" and "shard files a
    * training loader streams": every document gets an exact global
    * position `pos` (1..n) under a content-independent md5 order (stable
    * across re-runs and re-partitioning, unlike `orderBy(rand())`), a
    * round-robin `shard` in 0..nShards-1 (shard sizes differ by at most
    * one), and its 1-based `pos_in_shard`.
    *
    * The global order comes from [[graft.ops.Scale.binnedGlobalRank]] over
    * fixed-width cells of the 56-bit hash domain — md5 output is uniform,
    * so the `bins` cells are balanced by construction and no corpus-sized
    * single-partition window ever runs. Round-robin (not contiguous
    * blocks) so every shard is itself an unbiased sample of the corpus —
    * a loader reading any shard prefix sees the full mix. */
  def shardAssign(
      docs: DataFrame, idCol: String, nShards: Int,
      bins: Int = 4096): DataFrame = {
    require(nShards > 0, "shardAssign: nShards must be positive")
    val width = (1L << 56) / bins
    val hashed = docs.withColumn("__h",
      TextFns.portableHash(col(idCol).cast("string"), lit("shard")))
    graft.ops.Scale.binnedGlobalRank(hashed,
        expr(s"__h div ${width}L"),
        Seq(col("__h").asc, col(idCol).asc),
        binAsc = true, rankCol = "pos")
      .withColumn("shard", expr(s"(pos - 1) % $nShards"))
      .withColumn("pos_in_shard", expr(s"(pos - 1) div $nShards + 1"))
      .drop("__h")
  }

  /** Deterministic weighted interleave of sources — the mixture SCHEDULE
    * (not just the mixture proportions): a global reading order in which a
    * source with weight w contributes one document per 1/w "virtual time"
    * units, i.e. weight-4 and weight-1 sources interleave 4:1 all the way
    * down the corpus instead of concatenating. This is weighted fair
    * queueing: each document's virtual finish time is
    * `vt = rn·10⁶ ⌊/⌋ w` (rn = its position in its source's own
    * hash-shuffled stream), and the global order is (vt, source, rn) —
    * pure integer arithmetic, engine-exact.
    *
    * Scale: the per-source rank is a window PARTITIONED by source; the
    * global position again routes through
    * [[graft.ops.Scale.binnedGlobalRank]], with fixed-width vt cells from
    * a broadcast max — never a corpus-sized one-task window. */
  def interleaveOrder(
      docs: DataFrame, idCol: String, sourceCol: String, weight: Column,
      bins: Int = 4096): DataFrame = {
    // per-source rank: NOT a raw-row window partitioned by source (a
    // handful of sources → corpus/|sources| rows per window task) —
    // binnedGroupRank over 2^16 uniform cells of the 56-bit hash keeps
    // every (source, cell) partition ~|source|/65536 rows
    // persisted: binnedGlobalRank below reads vt THREE times (offset
    // aggregate, main branch, cell-width max) — without the cache each
    // read would re-execute the whole grouped-rank chain
    val vt = graft.ops.Scale.binnedGroupRank(
        docs.withColumn("__h",
          TextFns.portableHash(col(idCol).cast("string"), lit("ilv"))),
        Seq(col(sourceCol)), shiftright(col("__h"), 40),
        Seq(col("__h").asc, col(idCol).asc), binAsc = true, "rn")
      .withColumn("rn", col("rn").cast("long"))
      .withColumn("w", weight.cast("long"))
      .withColumn("vt", expr("(rn * 1000000) div w"))
      .drop("__h")
      .persist()
    val cellWidth = vt.agg(max(col("vt")).as("mx"))
      .select(expr(s"greatest((mx + ${bins - 1}) div $bins, 1L)").as("__w"))
    graft.ops.Scale.binnedGlobalRank(
        vt.crossJoin(broadcast(cellWidth)),
        expr("vt div __w"),
        Seq(col("vt").asc, col(sourceCol).asc, col("rn").asc),
        binAsc = true, rankCol = "pos")
      .drop("__w")
  }

  /** Materialize [[shardAssign]] output as training shards: one
    * `shard=N/` parquet directory per shard, rows inside each shard laid
    * down in `pos_in_shard` order (a loader reads the files and replays
    * the exact global shuffle without sorting anything). One hash exchange
    * on the shard id; each task writes its shards' files already sorted. */
  def writeShards(sharded: DataFrame, outDir: String): Unit =
    sharded
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos_in_shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
}
