package graft.sim

import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`): brute-force cosine top-k as the correctness baseline,
  * random-hyperplane LSH bucketing as the scale path.
  *
  * Cosine is a sequential left-fold over the zipped arrays (zip_with +
  * aggregate) in double precision — bit-identical to an independent engine's
  * sequential fold (the DuckDB oracle uses list_reduce), so the scores
  * themselves are oracle-comparable, not just the ranks.
  *
  * Scale: the brute-force path broadcasts the candidate side (ANN corpora
  * that fit a broadcast; otherwise block-partitioned cross join) — O(n²·d).
  * The LSH path buckets each vector once (O(n·planes·d)) and only joins
  * within buckets; recall is tunable via plane count and multi-probe.
  */
object Similarity {

  /** Exact sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Raw dot of two double arrays: the native DotProduct expression (same
    * left-to-right fold, primitive loop — see graft.functions.DotProduct).
    * Requires DotProduct.register on the session (done by the entry
    * points below). */
  private def dotD(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Shared emit: rank candidate pairs (vec_id, neighbor, cos) per query
    * vector by cosine desc with neighbor-id tie-break, keep the top k. */
  private[sim] def topKFromPairs(pairs: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank").cast("long").as("rank"),
        col("neighbor"), col("cos"))
  }

  /** Fixed-COUNT meter query set: the `s` ids with the smallest
    * md5(CAST(id AS STRING)) (hex compares lexicographically; id
    * tie-break for the astronomically-unlikely collision). A meter that
    * samples a fixed FRACTION (id % 4) is still quadratic — O(n²/4) at
    * 100× data is 2500× the pairs; a fixed COUNT keeps every brute meter
    * at O(s·n) with CONSTANT s forever. The selection itself is one
    * TakeOrderedAndProject over the (id, hash) projection — a per-
    * partition top-s then a driver merge of s·tasks rows, never a global
    * sort — and both the hash (md5 of the decimal string) and the
    * ordering replicate verbatim in the DuckDB oracle:
    * `ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT s`.
    * Output: one `qid` column. */
  def meterQueryIds(emb: DataFrame, idCol: String, s: Int = 256): DataFrame =
    emb.select(col(idCol).as("qid"),
        md5(col(idCol).cast("string").cast("binary")).as("__h"))
      .orderBy(col("__h").asc, col("qid").asc)
      .limit(s)
      .select(col("qid"))

  /** Brute-force cosine top-k neighbors per vector.
    * Output: (vec_id, rank, neighbor, cos), rank 1..k by cos desc with
    * neighbor-id tie-break.
    * The float→double cast happens once per vector BEFORE the O(n²) pair
    * join (same values as casting inside the product, so the oracle still
    * matches bit-exact), leaving only mul/add in the hot loop.
    * `queryIds` restricts the QUERY side only (the corpus side always
    * ranks in full) — the recall-meter discipline: exact answers for a
    * FIXED-COUNT deterministic query set ([[meterQueryIds]], broadcast
    * semi-join) cost O(s·corpus) with constant s, never O(corpus²) nor
    * the still-quadratic fixed fraction. `queryPred` remains for
    * predicate-shaped restrictions (spec ground truths). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      queryPred: Column = lit(true),
      queryIds: Option[DataFrame] = None): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    graft.functions.L2Squared.register(emb.sparkSession)
    val withNorm = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val queries = queryIds.foldLeft(withNorm.filter(queryPred))((df, q) =>
      df.join(broadcast(q), col("id") === col("qid"), "left_semi"))
    val pairs = queries.toDF("vec_id", "va", "na")
      .join(broadcast(withNorm.toDF("neighbor", "vb", "nb")),
        col("vec_id") =!= col("neighbor"))
      .select(col("vec_id"), col("neighbor"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
    aggTopKFromPairs(pairs, k)
  }

  /** Top-k from a candidate-pair stream via the bounded TopKAgg aggregate
    * instead of a window: partial aggregation reduces each map task's
    * share of a key to k rows BEFORE the exchange, so the shuffle carries
    * O(k·tasks) rows per key instead of every candidate pair — the
    * difference between shipping n² rows and shipping n·k at the
    * brute-force baseline's scale. Bit-identical to [[topKFromPairs]]
    * (exact double comparisons, same neighbor-id tie-break; proven in
    * SimilaritySpec). */
  def aggTopKFromPairs(pairs: DataFrame, k: Int): DataFrame = {
    val topk = graft.functions.TopKAgg.topK(k)
    pairs.groupBy(col("vec_id"))
      .agg(topk(col("cos"), col("neighbor")).as("top"))
      .select(col("vec_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.id").as("neighbor"), col("s.score").as("cos"))
  }

  /** Distance-ordered twin of [[aggTopKFromPairs]]: keeps the k SMALLEST
    * `dist` per vec_id (id tie-break) by aggregating on the negated score
    * — IEEE negation is exact, so ordering and emitted values are
    * bit-identical to the `dist asc` window form. */
  def aggBottomKFromPairs(pairs: DataFrame, k: Int): DataFrame = {
    val topk = graft.functions.TopKAgg.topK(k)
    pairs.groupBy(col("vec_id"))
      .agg(topk(-col("dist"), col("neighbor")).as("top"))
      .select(col("vec_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.id").as("neighbor"), (-col("s.score")).as("dist"))
  }

  /** Filtered vector search — exact cosine top-k where the NEIGHBOR side
    * must satisfy `predicate` (the production "vector search with a
    * metadata filter" shape). PRE-filter strategy: the predicate
    * restricts the corpus side BEFORE candidate generation, so it
    * reaches the parquet scan as a pushed filter and every query still
    * gets its full k when ≥k neighbors qualify — the post-filter
    * alternative (search, then filter the k results) silently returns
    * fewer. Queries are unfiltered: every vector asks "who are my k
    * nearest QUALIFYING neighbors". At 100 TB the filtered side feeds
    * the same IVF/LSH candidate machinery; here it rides the broadcast
    * brute-force baseline (the filter only ever shrinks that side).
    * Output: (vec_id, rank, neighbor, cos) like [[bruteForceTopK]]. */
  def filteredTopK(emb: DataFrame, idCol: String, vecCol: String,
      predicate: Column, k: Int): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    graft.functions.L2Squared.register(emb.sparkSession)
    val withNorm = emb.withColumn("__keep", predicate)
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"), col("__keep"))
      .withColumn("nrm", norm(col("v")))
    val pairs = withNorm.select(col("id").as("vec_id"), col("v").as("va"),
        col("nrm").as("na"))
      .join(broadcast(withNorm.filter(col("__keep"))
          .select(col("id").as("neighbor"), col("v").as("vb"),
            col("nrm").as("nb"))),
        col("vec_id") =!= col("neighbor"))
      .select(col("vec_id"), col("neighbor"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
    aggTopKFromPairs(pairs, k)
  }

  /** Semantic decontamination report — the embedding analog of the
    * n-gram TrainPrep.contaminationReport: for every non-benchmark
    * vector, the max cosine against ANY benchmark vector and the
    * contaminated verdict at `threshold`. The benchmark side (an eval
    * suite) is tiny relative to the corpus — broadcast — so the corpus
    * is scanned once and the only shuffle is the per-vector max partial
    * aggregation. Output: (vec_id, max_cos, contaminated). */
  def semanticContamination(emb: DataFrame, idCol: String, vecCol: String,
      isBenchmark: Column, threshold: Double): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    graft.functions.L2Squared.register(emb.sparkSession)
    val withNorm = emb.withColumn("__bm", isBenchmark)
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"), col("__bm"))
      .withColumn("nrm", norm(col("v")))
    val bench = withNorm.filter(col("__bm"))
      .select(col("v").as("vb"), col("nrm").as("nb"))
    val train = withNorm.filter(!col("__bm"))
      .select(col("id").as("vec_id"), col("v").as("va"), col("nrm").as("na"))
    // LEFT broadcast pairing (not an inner cross join) so an EMPTY
    // benchmark set reports every corpus vector as clean (null max_cos)
    // instead of an empty frame — same single corpus scan either way
    train.join(broadcast(bench), lit(true), "left")
      .select(col("vec_id"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .groupBy(col("vec_id"))
      .agg(max(col("cos")).as("max_cos"))
      .select(col("vec_id"), col("max_cos"),
        coalesce(col("max_cos") >= threshold, lit(false)).as("contaminated"))
  }

  /** Deterministic ±1 hyperplane components: md5(seed:plane:dim) low bit.
    * Computed once on the driver (planes × dim tiny), shipped as literals —
    * the planes are part of the plan, not data. */
  def hyperplanes(planes: Int, dim: Int, seed: String = "graft-lsh"): Seq[Seq[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until planes).map(p => (0 until dim).map { i =>
      val h = md.digest(s"$seed:$p:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1.0 else -1.0
    })
  }

  /** LSH plane count DERIVED from corpus cardinality — the growth policy
    * as CODE, not prose (round-8 verdict: the registered queries ran a
    * fixture constant that would leave buckets 100× overfull at 100×
    * data): the smallest p with `2^p ≥ n / targetBucket` (so the MEAN
    * bucket holds ≈ targetBucket vectors), clamped to [minPlanes,
    * maxPlanes]. Integer arithmetic (`ceil(log2(ceil(n/target)))` via
    * leading-zero count) so the driver-side value is exact; a SQL
    * replica computes `ceil(log2(n / target))` in floats, which agrees
    * for every n because ceil∘log2 is constant on each (2^(k-1), 2^k]
    * and n/target is exactly representable. [[hyperplanes]] generates
    * plane j independently of the total count (md5 of (seed, j, i)), so
    * a p-plane bucket id is always a PREFIX of the maxPlanes-plane
    * one — growing the corpus refines buckets without re-seeding. */
  def planesFor(n: Long, targetBucket: Int = 256,
      minPlanes: Int = 4, maxPlanes: Int = 16): Int = {
    val m = (math.max(1L, n) + targetBucket - 1) / targetBucket
    val raw = if (m <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.max(minPlanes, math.min(maxPlanes, raw))
  }

  /** LSH bucket id: sign bits of the projections onto `planes` fixed
    * hyperplanes. */
  def bucketOf(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val proj = aggregate(
        zip_with(v, typedlit(p), (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF-flat approximate top-k with deterministic sampled centroids:
    * every vector whose id is divisible by `centroidStep` is a centroid;
    * each vector is assigned to its nearest centroid (cosine, id
    * tie-break); queries probe only their own cell. Deterministic end to
    * end, so the DuckDB oracle replicates it exactly. At 100 TB the
    * centroid set stays a broadcast dimension and the cell join is a hash
    * shuffle on the cell id.
    *
    * `cellCap` bounds the NEIGHBOR side of the in-cell join to the
    * `cellCap` vectors closest to the cell centroid (cosine desc, id
    * tie-break — deterministic, so the oracle replicates the cap): a hot
    * cell under a skewed embedding distribution would otherwise make the
    * in-cell self-join quadratic in that cell's population. Queries are
    * never dropped — only their candidate pool is bounded.
    *
    * `nprobe` is the OTHER half of the standard IVF recall/cost dial:
    * each query probes its `nprobe` nearest cells (corpus membership
    * stays single-cell), so the candidate pool grows nprobe× and the
    * neighbors lost to a cell-boundary cut come back — the exact FAISS
    * nlist/nprobe trade, still deterministic and oracle-replicable
    * (probe set = assignment ranks 1..nprobe). A (query, neighbor) pair
    * surfaces at most once: the neighbor's home cell either is or is not
    * in the query's distinct probe set. */
  def ivfTopK(
      emb: DataFrame, idCol: String, vecCol: String, k: Int,
      centroidStep: Long = 40, cellCap: Int = 512,
      nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    ivfTopKFromAssignments(
      ivfAssignments(emb, idCol, vecCol, centroidStep, maxRank = nprobe),
      k, cellCap, nprobe)
  }

  /** The persistable IVF ASSIGNMENT table: one row per (vector, centroid
    * rank ≤ `maxRank`) with the vector, its norm, the centroid id and the
    * assignment cosine — rank 1 is corpus membership, ranks 1..nprobe the
    * probe set. The corpus×centroid broadcast product is THE expensive
    * step of every IVF query; computed once per (session, corpus) and
    * parqueted, all nprobe ≤ `maxRank` consumers derive from the table
    * (doubles round-trip parquet bit-exact — pinned with the LSH index by
    * x_ann_index_persisted). Schema: (id, v, nrm, cid, ccos, arn). */
  def ivfAssignments(emb: DataFrame, idCol: String, vecCol: String,
      centroidStep: Long = 40, maxRank: Int = 2): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    graft.functions.L2Squared.register(emb.sparkSession)
    val base = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val centroids = base.filter(col("id") % centroidStep === 0)
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    // centroid ranking per vector (cosine desc, centroid id asc): rank 1
    // is the home cell (corpus membership), ranks 1..nprobe the probe set
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("ccos").desc, col("cid").asc)
    base.join(broadcast(centroids), lit(true))
      .select(col("id"), col("v"), col("nrm"), col("cid"),
        (dotD(col("v"), col("cv")) / (col("nrm") * col("cnrm"))).as("ccos"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") <= maxRank)
  }

  /** [[ivfTopK]] over a prebuilt (persisted) [[ivfAssignments]] table —
    * the table must have been built with maxRank ≥ `nprobe`. */
  def ivfTopKFromAssignments(assignments: DataFrame, k: Int,
      cellCap: Int = 512, nprobe: Int = 1): DataFrame = {
    graft.functions.DotProduct.register(assignments.sparkSession)
    graft.functions.L2Squared.register(assignments.sparkSession)
    val assigned = assignments.filter(col("arn") === 1)
      .select(col("id"), col("v"), col("nrm"), col("cid"), col("ccos"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("ccos").desc, col("id").asc)
    val capped = assigned.withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= cellCap)
      .select(col("id"), col("v"), col("nrm"), col("cid"))
    val probes = assignments.filter(col("arn") <= nprobe)
      .select(col("id"), col("v"), col("nrm"), col("cid"))
    val pairs = probes
      .toDF("vec_id", "va", "na", "cell")
      .join(capped.toDF("neighbor", "vb", "nb", "cell"), Seq("cell"))
      .filter(col("vec_id") =!= col("neighbor"))
      .select(col("vec_id"), col("neighbor"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
    aggTopKFromPairs(pairs, k)
  }

  /** INCREMENTAL IVF ANN — the maintenance twin of
    * [[ivfTopKFromAssignments]] (the [[binaryTopKIncremental]] discipline
    * applied to the coarse-quantizer index): an incoming batch searches
    * the SETTLED corpus's persisted assignment table, never re-assigning
    * the corpus. Centroid IDENTITY comes from the same deterministic id
    * rule the index was built with (`id % centroidStep == 0` —
    * [[ivfAssignments]]'s rule), and the centroid VECTORS read off the
    * table's own rows (zero recompute); deriving the set from distinct
    * ASSIGNED cids instead would silently drop a centroid that received
    * zero assignments (an exact-cosine tie losing every vector to a
    * lower-id colinear centroid) and skew the batch's probe ranking —
    * the round-8 advisory. Each batch vector ranks against the
    * broadcast centroids for its `nprobe` probe cells, and candidates
    * pair batch-probe × cellCap'd corpus members through the cell hash
    * join. Per-batch cost: O(batch × centroids) for assignment (the
    * irreducible coarse-quantizer product — centroids stay a broadcast
    * dimension, ~√n of the corpus) + the bucket-local rerank; the corpus
    * is never rescanned. Batch and corpus ids must be disjoint (sides of
    * a snapshot split). Output: (vec_id, rank, neighbor, cos), vec_id
    * from the batch, neighbor from the corpus. */
  def ivfTopKIncremental(corpusAssignments: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, k: Int, cellCap: Int = 512,
      nprobe: Int = 1, centroidStep: Long = 40): DataFrame = {
    // centroidStep MUST equal the value the assignment table was built
    // with ([[ivfAssignments]]) — a mismatched step filters a wrong
    // centroid set and silently skews every probe ranking

    require(nprobe >= 1, "nprobe must be >= 1")
    graft.functions.DotProduct.register(batch.sparkSession)
    graft.functions.L2Squared.register(batch.sparkSession)
    // centroid vectors out of the assignment table: a centroid id is a
    // corpus id, so its (v, nrm) sits in the table's arn=1 row — and the
    // SET is the id rule, never the assigned-cid image (see scaladoc)
    val centroids = corpusAssignments
      .filter(col("arn") === 1 && col("id") % centroidStep === 0)
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val b = batch.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("ccos").desc, col("cid").asc)
    val probes = b.join(broadcast(centroids), lit(true))
      .select(col("id"), col("v"), col("nrm"), col("cid"),
        (dotD(col("v"), col("cv")) / (col("nrm") * col("cnrm"))).as("ccos"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") <= nprobe)
      .select(col("id"), col("v"), col("nrm"), col("cid"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("ccos").desc, col("id").asc)
    val capped = corpusAssignments.filter(col("arn") === 1)
      .withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= cellCap)
      .select(col("id"), col("v"), col("nrm"), col("cid"))
    // sides are disjoint snapshots, so no self-pair filter is needed and
    // a (batch, corpus) pair surfaces once per distinct probe cell —
    // probe cells are distinct by construction
    val pairs = probes.toDF("vec_id", "va", "na", "cell")
      .join(capped.toDF("neighbor", "vb", "nb", "cell"), Seq("cell"))
      .select(col("vec_id"), col("neighbor"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
    aggTopKFromPairs(pairs, k)
  }

  /** Approximate top-k: exact cosine ranking restricted to bucket-local
    * candidates. `probes = 0` joins only the home bucket; `probes = 1`
    * additionally probes every bucket at Hamming distance 1 (flip each
    * sign bit once) — the standard multi-probe recall/cost dial. The query
    * side explodes its probe set; the corpus side stays bucketed once, so
    * the join fan-out is (planes+1)× the single-probe candidates, never a
    * cross join. */
  /** Shared LSH candidate machinery: bucket the corpus once, explode the
    * query side's probe set (home bucket + every Hamming-1 neighbor when
    * `probes` ≥ 1), join on bucket equality. The probe values are pairwise
    * DISTINCT (xor with distinct masks) and each corpus vector sits in ONE
    * bucket, so a (query, corpus) pair can surface through at most one
    * probe — no dedup pass is needed after the join.
    *
    * `bucketCap` is the hot-bucket guard (the `cellCap` of [[ivfTopK]] /
    * [[pqTopK]], ported here): the CORPUS side of the bucket join is
    * bounded to the `bucketCap` highest-norm vectors of each bucket (norm
    * desc, id asc — deterministic, so an oracle replicates the cap
    * exactly). Without it the in-bucket join is (n/2^planes)² per bucket
    * — and real embedding distributions produce hot buckets far worse
    * than uniform. Queries are never dropped, only their candidate pool
    * is bounded (the IVF list-length trade). The row_number + filter
    * shape gets Spark's WindowGroupLimit pushdown, so each partition is
    * pre-truncated to `bucketCap` rows map-side before the final rank.
    * At corpus scale `planes` must also grow ~log₂(n) so the bucket
    * domain keeps pace with the data (see PLANS.md). */
  /** `carryCols` ride along both sides (query AND capped corpus) APPENDED
    * after the (id, v, nrm, bucket) prefix — so a pairwise predicate (a
    * label, a language, a shard) joins zero extra tables into the pair
    * stream instead of shuffling the probe-exploded frame against a
    * dimension. */
  /** The persistable LSH INDEX of a corpus: one row per vector with its
    * normalized double vector `v`, norm `nrm`, sign-bit `bucket`, and any
    * `carryCols` appended — everything the candidate machinery derives
    * per row, and nothing query-dependent. This is the corpus-side
    * artifact worth computing ONCE per (session, corpus) and parqueting
    * (the persist-and-derive discipline): every LSH consumer then derives
    * its probe-exploded query side and hot-bucket-capped corpus side from
    * the table instead of re-projecting the raw embeddings. Doubles and
    * longs round-trip parquet bit-exact, so table-derived results are
    * bit-identical to recomputed ones (pinned by x_ann_index_persisted). */
  def lshIndex(emb: DataFrame, idCol: String, vecCol: String,
      planes: Int, dim: Int, carryCols: Seq[String] = Nil): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    graft.functions.L2Squared.register(emb.sparkSession)
    val hp = hyperplanes(planes, dim)
    emb.select(col(idCol).as("id") +:
        transform(col(vecCol), x => x.cast("double")).as("v") +:
        carryCols.map(col): _*)
      .withColumn("nrm", norm(col("v")))
      .withColumn("bucket", bucketOf(col("v"), hp))
      .select(col("id") +: col("v") +: col("nrm") +: col("bucket") +:
        carryCols.map(col): _*)
  }

  /** Candidate sides derived from a prebuilt [[lshIndex]] frame. */
  private def lshCandidatesFromIndex(
      indexed: DataFrame, planes: Int, probes: Int,
      bucketCap: Int, carryCols: Seq[String] = Nil,
      capAlso: Seq[String] = Nil): (DataFrame, DataFrame) = {
    graft.functions.DotProduct.register(indexed.sparkSession)
    graft.functions.L2Squared.register(indexed.sparkSession)
    val probeBuckets =
      if (probes <= 0) array(col("bucket"))
      else array(col("bucket") +:
        (0 until planes).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*)
    val queries = indexed
      .select(col("id") +: col("v") +: col("nrm") +:
        explode(probeBuckets).as("bucket") +: carryCols.map(col): _*)
    // capAlso extends the cap key (e.g. a partition column when the
    // bucket join itself is partition-scoped): the bound then applies
    // per (bucket, capAlso...) cell
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy((col("bucket") +: capAlso.map(col)): _*)
      .orderBy(col("nrm").desc, col("id").asc)
    val corpus = indexed
      .withColumn("__crn", row_number().over(wBucket))
      .filter(col("__crn") <= bucketCap)
      .select(col("id") +: col("v") +: col("nrm") +: col("bucket") +:
        carryCols.map(col): _*)
    (queries, corpus)
  }

  private def lshCandidates(
      emb: DataFrame, idCol: String, vecCol: String,
      planes: Int, dim: Int, probes: Int,
      bucketCap: Int, carryCols: Seq[String] = Nil,
      capAlso: Seq[String] = Nil): (DataFrame, DataFrame) =
    lshCandidatesFromIndex(
      lshIndex(emb, idCol, vecCol, planes, dim, carryCols),
      planes, probes, bucketCap, carryCols, capAlso)

  def lshTopK(
      emb: DataFrame, idCol: String, vecCol: String, k: Int,
      planes: Int = 6, dim: Int = 64, probes: Int = 0,
      bucketCap: Int = 512): DataFrame =
    lshTopKFromIndex(lshIndex(emb, idCol, vecCol, planes, dim),
      k, planes, probes, bucketCap)

  /** [[lshTopK]] over a prebuilt (persisted) [[lshIndex]] frame. */
  def lshTopKFromIndex(indexed: DataFrame, k: Int, planes: Int,
      probes: Int = 0, bucketCap: Int = 512): DataFrame = {
    val (queries, corpus) =
      lshCandidatesFromIndex(indexed, planes, probes, bucketCap)
    val pairs = queries.toDF("vec_id", "va", "na", "bucket")
      .join(corpus.toDF("neighbor", "vb", "nb", "bucket"), Seq("bucket"))
      .filter(col("vec_id") =!= col("neighbor"))
      .select(col("vec_id"), col("neighbor"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
    aggTopKFromPairs(pairs, k)
  }

  /** Sequential-fold squared L2 distance in double precision — the native
    * [[graft.functions.L2Squared]] primitive loop (identical left-to-right
    * IEEE fold as `zip_with + aggregate` with zero init ≡ DuckDB
    * list_reduce over the same zip, so every oracle comparison holds
    * bit-exact; the native form stays inside whole-stage codegen where
    * the interpreted lambda fold dominated the assignment joins).
    * Requires `graft_l2sq` on the session (GraftExtensions injects it;
    * the entry points also register imperatively). */
  def l2sq(a: Column, b: Column): Column =
    call_function("graft_l2sq", a, b)

  /** IVF-PQ approximate top-k — the FAISS-style 100 TB ANN design: a
    * coarse quantizer restricts candidates to one cell, and ranking inside
    * the cell runs on PRODUCT-QUANTIZED codes (m sub-space codewords per
    * vector) instead of raw vectors, via a precomputed codeword-pair
    * distance table. At scale the corpus holds m small ints per vector
    * (64 bytes of floats → 8 codes), the codebook and distance table stay
    * broadcast dimensions, and the cell join shuffles codes, not vectors.
    *
    * Deterministic end to end (sampled coarse centroids at id %
    * `coarseStep`; sampled codebook at id % `codeStep` capped below
    * `codeMax` so codebook size is corpus-bounded; L2² assignment with id
    * tie-breaks; exact decimal sum over the m per-subspace distances), so
    * the DuckDB oracle replicates codes AND distances bit-exact.
    *
    * Output: (vec_id, rank, neighbor, dist) — dist is the symmetric PQ
    * approximation Σ_j d²(codeword(a,j), codeword(b,j)), rank 1..k
    * ascending with neighbor-id tie-break.
    */
  def pqTopK(
      emb: DataFrame, idCol: String, vecCol: String, k: Int,
      coarseStep: Long = 40, codeStep: Long = 100, codeMax: Long = 3000,
      m: Int = 8, subDim: Int = 8, cellCap: Int = 512): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    graft.functions.L2Squared.register(emb.sparkSession)
    // squared norm: sequential fold, matches the oracle's list_reduce
    def norm2(v: Column): Column =
      aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x)
    // fail fast on a dim mismatch: a short vector would yield NULL-poisoned
    // sub-slice distances that rank NULLS FIRST in Spark but NULLS LAST in
    // DuckDB — better to abort than silently diverge. assert_true is a
    // per-row guard that stays distributed (no driver collect) and costs
    // one comparison per vector.
    val dimOk = (v: Column) => when(
      assert_true(size(v) === m * subDim,
        lit(s"pqTopK: embedding dim must equal m*subDim = ${m * subDim}"))
        .isNull, v)
    val base = emb.select(col(idCol).as("id"),
      dimOk(transform(col(vecCol), x => x.cast("double"))).as("v"))
      .withColumn("n2", norm2(col("v")))
    // coarse quantizer: nearest sampled centroid by L2² (id tie-break),
    // via |a|² + |c|² − 2·a·c so the n·centroids hot loop runs through
    // the native codegen'd dot expression, not a per-pair lambda fold
    val cents = base.filter(col("id") % coarseStep === 0)
      .select(col("id").as("cid"), col("v").as("cv"), col("n2").as("cn2"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("cd2").asc, col("cid").asc)
    val cells = base.join(broadcast(cents), lit(true))
      .select(col("id"), col("v"), col("cid"),
        (col("n2") + col("cn2")
          - lit(2.0) * call_function("graft_dot", col("v"), col("cv")))
          .as("cd2"))
      .withColumn("rn", row_number().over(wAssign)).filter(col("rn") === 1)
      .select(col("id"), col("v"), col("cid").as("cell"), col("cd2"))
    // hot-cell guard (same rationale as ivfTopK's cellCap): the NEIGHBOR
    // side of the in-cell code join is bounded to the cellCap vectors
    // closest to their coarse centroid (L2² asc, id asc — deterministic,
    // oracle-replicated); queries are never dropped
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell")).orderBy(col("cd2").asc, col("id").asc)
    val cappedIds = cells.withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= cellCap)
      .select(col("id"))
    // per-subspace views: j-th slice of the vector / codebook entry
    def subSlices(v: Column) =
      transform(sequence(lit(0), lit(m - 1)),
        j => slice(v, j * subDim + 1, lit(subDim)))
    val cb = base.filter(col("id") % codeStep === 0 && col("id") < codeMax)
      .select(col("id").as("pid"), posexplode(subSlices(col("v"))))
      .toDF("pid", "j", "psub")
    // encode: per (vector, subspace) the nearest codeword (L2², pid asc)
    val wEnc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"), col("j")).orderBy(col("d2").asc, col("pid").asc)
    val codes = cells
      .select(col("id"), col("cell"), posexplode(subSlices(col("v"))))
      .toDF("id", "cell", "j", "vsub")
      .join(broadcast(cb), Seq("j"))
      .select(col("id"), col("cell"), col("j"), col("pid"),
        l2sq(col("vsub"), col("psub")).as("d2"))
      .withColumn("rn", row_number().over(wEnc)).filter(col("rn") === 1)
      .select(col("id"), col("cell"), col("j"), col("pid").as("code"))
    // codeword-pair distance table: m × |codebook|² rows, stays broadcast
    val cdist = cb.toDF("pa", "jj", "pva")
      .join(cb.toDF("pb", "jj2", "pvb"), col("jj") === col("jj2"))
      .select(col("jj"), col("pa"), col("pb"),
        l2sq(col("pva"), col("pvb")).as("d2"))
    // cell-local pairs ranked by the table-sum distance; the per-subspace
    // distances sum through DECIMAL so the total is order-independent
    val pairs = codes.toDF("vec_id", "cell", "j", "ca")
      .join(codes.join(cappedIds, Seq("id"), "left_semi")
        .toDF("neighbor", "cell", "j", "cb_"), Seq("cell", "j"))
      .filter(col("vec_id") =!= col("neighbor"))
      .join(broadcast(cdist), col("j") === col("jj")
        && col("ca") === col("pa") && col("cb_") === col("pb"))
      .groupBy(col("vec_id"), col("neighbor"))
      .agg(sum(col("d2").cast("decimal(28,12)")).cast("double").as("dist"))
    aggBottomKFromPairs(pairs, k)
  }

  /** Scalar-quantized (SQ8) approximate top-k — the per-tensor-scale
    * int8 quantization production vector stores run when PQ's codebook is
    * overkill: ONE global [gmin, gmax] grid over every component, each
    * component coded to ⌊(x−gmin)·255⁄(gmax−gmin)⌋ clamped to [0,255],
    * pair distance = Σ(Δcode)² · ((gmax−gmin)/255)². The Σ(Δcode)² runs
    * entirely in BIGINT (exact, order-free); the scale factor is applied
    * once per pair as two double multiplies with fixed operand order — so
    * codes AND approximate distances replicate bit-exact on the oracle.
    * Integer ordering == scaled ordering (positive scale), and 1-byte
    * codes cut the brute-force scan's memory bandwidth 4× vs float32 —
    * the variant's whole point at 100 TB (the candidate-pair stream still
    * reduces through the bounded top-k aggregate, never a window).
    * Output: (vec_id, rank, neighbor, dist), rank 1..k by dist asc,
    * neighbor-id tie-break. */
  /** The SQ8 code table: one global [gmin, gmax] grid, codes as exact
    * small integers carried in a DOUBLE array so the per-pair fold runs
    * through the native DotProduct primitive loop (the interpreted
    * zip_with/aggregate form measured 9x slower); Σ(Δc)² = Σa² + Σb² −
    * 2Σab — every term an exact integer < 2^53, so the distance value is
    * bit-identical to the direct BIGINT fold the oracle runs. */
  private def sq8Coded(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val v = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    // the [gmin, gmax] grid is a ONE-ROW reduction — folded driver-side
    // (the bounded-metadata pattern sketchAdvisedJoin set) and planted as
    // plan literals, so the coded table needs no one-row cross join at
    // all: the registered SQ8 plan stays BNLJ-free end to end (the plan
    // audit pins that), and the literal doubles are the same exact values
    // the oracle's aggregate computes.
    val grid = v.select(explode(col("v")).as("x"))
      .agg(min(col("x")).as("gmin"), max(col("x")).as("gmax")).head()
    val (gmin, gmax) = (grid.getDouble(0), grid.getDouble(1))
    v.select(col("id"),
        transform(col("v"), x =>
          least(lit(255L), greatest(lit(0L),
            floor((x - lit(gmin)) * lit(255.0) / (lit(gmax) - lit(gmin)))
              .cast("long"))).cast("double")).as("c"),
        lit(gmin).as("gmin"), lit(gmax).as("gmax"))
      .withColumn("s2", dotD(col("c"), col("c")))
  }

  /** SQ8 pair distances (polarization identity, fixed operand order). */
  private def sq8Dist(sa: Column, sb: Column, ca: Column, cb: Column,
      gmin: Column, gmax: Column): Column =
    (sa + sb - lit(2.0) * dotD(ca, cb)) *
      ((gmax - gmin) / lit(255.0)) * ((gmax - gmin) / lit(255.0))

  /** Two-stage SQ8 top-k — retrieve-then-rerank (round-7 verdict: the
    * previous all-pairs broadcast NLJ was correct at test SF and dead at
    * 100×): stage 1 shortlists each query's `oversample`·k Hamming-
    * nearest 1-bit sign codes through the BANDED bucket join
    * ([[hammingShortlist]] — the same candidate generator binaryTopK
    * runs; both quantizations estimate the same angular distance, so the
    * sign-code shortlist is the natural coarse filter for the finer SQ8
    * grid), stage 2 computes SQ8 distances on the shortlist ONLY. Every
    * stage is integer-or-fixed-order-float, so codes, shortlist and
    * distances replicate bit-exact on the oracle. Cost: one banded
    * bucket join + O(n·oversample·k) SQ8 folds — never n² pairs, and no
    * whole-corpus broadcast. Output: (vec_id, rank, neighbor, dist). */
  def sq8TopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      oversample: Int = 4, inDim: Int = 64, bits: Int = 63,
      bands: Int = 9, seed: String = "graft-bq"): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    graft.functions.L2Squared.register(emb.sparkSession)
    val codes = binaryCodes(emb, idCol, vecCol, inDim, bits, seed)
    val shortlist = hammingShortlist(codes, oversample * k, bits, bands)
    val coded = sq8Coded(emb, idCol, vecCol)
    val pairs = shortlist
      .join(coded.toDF("vec_id", "ca", "gmin", "gmax", "sa"), Seq("vec_id"))
      .join(coded.select(col("id").as("neighbor"), col("c").as("cb"),
        col("s2").as("sb")), Seq("neighbor"))
      .select(col("vec_id"), col("neighbor"),
        sq8Dist(col("sa"), col("sb"), col("ca"), col("cb"),
          col("gmin"), col("gmax")).as("dist"))
    aggBottomKFromPairs(pairs, k)
  }

  /** The EXACT all-pairs SQ8 ranking — O(n²) with a whole-corpus
    * broadcast, so it is NOT registered as a query: it exists as the
    * ground truth [[sq8TopK]]'s recall is asserted against in
    * SimilaritySpec (the bruteForceTopK ↔ lshTopK pairing applied to the
    * quantized family). */
  def sq8TopKExact(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    graft.functions.L2Squared.register(emb.sparkSession)
    val coded = sq8Coded(emb, idCol, vecCol)
    val pairs = coded.toDF("vec_id", "ca", "gmin", "gmax", "sa")
      .join(broadcast(coded.select(col("id").as("neighbor"),
        col("c").as("cb"), col("s2").as("sb"))),
        col("vec_id") =!= col("neighbor"))
      .select(col("vec_id"), col("neighbor"),
        sq8Dist(col("sa"), col("sb"), col("ca"), col("cb"),
          col("gmin"), col("gmax")).as("dist"))
    aggBottomKFromPairs(pairs, k)
  }

  /** Near-duplicate pairs via multi-probe LSH candidates: (a < b, cos ≥
    * threshold). Candidate generation is the same bucketed join as
    * [[lshTopK]] — cost O(n·planes·d) + bucket-local joins, never an
    * all-pairs cross join — and verification is the exact cosine on
    * candidates only. Deterministic end to end (md5-derived hyperplanes),
    * so an independent engine replicates candidates AND scores exactly. */
  def lshNearDupPairs(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double,
      planes: Int = 6, dim: Int = 64, probes: Int = 1,
      bucketCap: Int = 512): DataFrame =
    lshNearDupPairsFromIndex(lshIndex(emb, idCol, vecCol, planes, dim),
      threshold, planes, probes, bucketCap)

  /** [[lshNearDupPairs]] over a prebuilt (persisted) [[lshIndex]] frame. */
  def lshNearDupPairsFromIndex(indexed: DataFrame, threshold: Double,
      planes: Int, probes: Int = 1, bucketCap: Int = 512): DataFrame = {
    val (queries, corpus) =
      lshCandidatesFromIndex(indexed, planes, probes, bucketCap)
    queries.toDF("a", "va", "na", "bucket")
      .join(corpus.toDF("b", "vb", "nb", "bucket"), Seq("bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** PARTITION-SCOPED near-duplicate pairs — dedup within a language /
    * source / shard only (cross-partition pairs are not duplicates by
    * definition in a stratified corpus): [[lshNearDupPairs]] with the
    * partition column PUSHED INTO the bucket join key, so cross-partition
    * candidates never materialize at all — strictly fewer candidate pairs
    * than post-filtering the unscoped join, and the hot-bucket cap
    * applies per (partition, bucket). Output: (part, a < b, cos ≥
    * threshold). */
  def lshNearDupPairsWithin(
      emb: DataFrame, idCol: String, vecCol: String, partCol: String,
      threshold: Double, planes: Int = 6, dim: Int = 64, probes: Int = 1,
      bucketCap: Int = 512): DataFrame =
    lshNearDupPairsWithinFromIndex(
      lshIndex(emb.select(col(idCol).as("__wid"), col(vecCol).as("__wvec"),
          col(partCol).as("__wpart")),
        "__wid", "__wvec", planes, dim, carryCols = Seq("__wpart")),
      "__wpart", threshold, planes, probes, bucketCap)

  /** [[lshNearDupPairsWithin]] over a prebuilt [[lshIndex]] frame that
    * carries the partition column (name it via `partCol`). */
  def lshNearDupPairsWithinFromIndex(indexed: DataFrame, partCol: String,
      threshold: Double, planes: Int, probes: Int = 1,
      bucketCap: Int = 512): DataFrame = {
    val (queries, corpus) = lshCandidatesFromIndex(
      indexed.select(col("id"), col("v"), col("nrm"), col("bucket"),
        col(partCol).as("__wpart")),
      planes, probes, bucketCap,
      carryCols = Seq("__wpart"), capAlso = Seq("__wpart"))
    queries.toDF("a", "va", "na", "bucket", "part")
      .join(corpus.toDF("b", "vb", "nb", "bucket", "part"),
        Seq("bucket", "part"))
      .filter(col("a") < col("b"))
      .select(col("part"), col("a"), col("b"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Cross-snapshot embedding near-dups — the embedding twin of
    * [[graft.dedup.Dedup.crossSnapshotNearDups]]: the incoming batch's
    * multi-probe buckets join the settled corpus's HOME buckets only, so
    * candidates pair new×old and cost scales with the batch, never
    * corpus². The corpus bucket table is computable once and persisted at
    * scale (8 bytes + vector per row); determinism and the
    * one-pair-per-candidate property follow from the shared machinery
    * (each corpus vector sits in one bucket; probe values are distinct).
    * Output: (new_id, old_id, cos) with cos ≥ threshold. */
  def crossSnapshotEmbNearDups(corpus: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      planes: Int = 6, dim: Int = 64, probes: Int = 1,
      bucketCap: Int = 512): DataFrame =
    crossSnapshotEmbNearDupsFromIndex(
      lshIndex(corpus, idCol, vecCol, planes, dim),
      lshIndex(batch, idCol, vecCol, planes, dim),
      threshold, planes, probes, bucketCap)

  /** [[crossSnapshotEmbNearDups]] over prebuilt [[lshIndex]] frames — the
    * settled corpus's index is exactly the artifact a persisted table
    * serves across batches (compute once, probe forever); the batch index
    * is one batch's worth of projection work. The hot-bucket cap applies
    * to the corpus index AS GIVEN, so slice before passing when the
    * persisted table is a superset. */
  def crossSnapshotEmbNearDupsFromIndex(corpusIdx: DataFrame,
      batchIdx: DataFrame, threshold: Double, planes: Int,
      probes: Int = 1, bucketCap: Int = 512): DataFrame = {
    val (queries, _) =
      lshCandidatesFromIndex(batchIdx, planes, probes, bucketCap)
    val (_, corpusBk) =
      lshCandidatesFromIndex(corpusIdx, planes, 0, bucketCap)
    queries.toDF("new_id", "va", "na", "bucket")
      .join(corpusBk.toDF("old_id", "vb", "nb", "bucket"), Seq("bucket"))
      .select(col("new_id"), col("old_id"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Hard-negative mining — per vector, the k highest-cosine neighbors
    * whose LABEL differs (the retrieval-training staple: the negatives
    * worth contrasting are the near-misses, not random draws). The
    * label predicate is pairwise (depends on both sides), so it composes
    * as a filter over the candidate pairs rather than a corpus pre-filter
    * ([[filteredTopK]]'s shape); ranking runs through the bounded top-k
    * aggregate and the negative's label rides along via one broadcast
    * id→label dimension join.
    *
    * This brute form broadcasts the corpus against itself — Θ(n²) pairs.
    * It is the RECALL METER for [[hardNegativesLsh]], the registered
    * scale path (exactly the bruteForceTopK ↔ lshTopK pairing); restrict
    * `queries` to a deterministic sample when metering a large corpus. */
  def hardNegatives(
      emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int, queryPred: Column = lit(true),
      queryIds: Option[DataFrame] = None): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    graft.functions.L2Squared.register(emb.sparkSession)
    val base = emb.select(col(idCol).as("id"), col(labelCol).as("lbl"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val queries = queryIds.foldLeft(base.filter(queryPred))((df, q) =>
      df.join(broadcast(q), col("id") === col("qid"), "left_semi"))
    val pairs = queries.toDF("vec_id", "la", "va", "na")
      .join(broadcast(base.toDF("neighbor", "lb", "vb", "nb")),
        col("la") =!= col("lb"))
      .select(col("vec_id"), col("neighbor"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
    aggTopKFromPairs(pairs, k)
      .join(broadcast(base.select(col("id").as("neighbor"),
        col("lbl").as("neg_label"))), Seq("neighbor"))
      .select(col("vec_id"), col("rank"), col("neighbor"),
        col("neg_label"), col("cos"))
  }

  /** The SCALE form of hard-negative mining: candidates come from the
    * multi-probe LSH bucket machinery ([[lshCandidates]] — corpus
    * bucketed once and hot-bucket-capped, query probe set exploded,
    * bucket equi-join), the different-label filter prunes the pair
    * stream before the exact cosine, and ranking runs through the
    * bounded top-k aggregate. Hard negatives are near vectors by
    * construction, so bucket-local search loses none of the high-cosine
    * tail a contrastive batch actually wants (recall vs the brute meter
    * asserted in SimilaritySpec). The negative's label attaches through
    * a plain equi-join of the (id → label) projection against the n·k
    * result — shuffle-sized by the OUTPUT, never the pair stream.
    * Output: (vec_id, rank, neighbor, neg_label, cos), rank 1..k. */
  def hardNegativesLsh(
      emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int, planes: Int = 6, dim: Int = 64, probes: Int = 1,
      bucketCap: Int = 512): DataFrame =
    hardNegativesLshFromIndex(
      lshIndex(emb.select(col(idCol).as("__hid"), col(vecCol).as("__hvec"),
          col(labelCol).as("__hlbl")),
        "__hid", "__hvec", planes, dim, carryCols = Seq("__hlbl")),
      "__hlbl", k, planes, probes, bucketCap)

  /** [[hardNegativesLsh]] over a prebuilt [[lshIndex]] frame that carries
    * the label column (name it via `labelCol`). */
  def hardNegativesLshFromIndex(indexed: DataFrame, labelCol: String,
      k: Int, planes: Int, probes: Int = 1,
      bucketCap: Int = 512): DataFrame = {
    val labels = indexed.select(col("id"), col(labelCol).as("lbl"))
    // the label RIDES THROUGH the candidate machinery (carryCols), so the
    // pair stream needs no label-dimension joins at all; only the final
    // neg_label attach touches the n·k OUTPUT
    val (queries, corpus) = lshCandidatesFromIndex(
      indexed.select(col("id"), col("v"), col("nrm"), col("bucket"),
        col(labelCol).as("__hlbl")),
      planes, probes, bucketCap, carryCols = Seq("__hlbl"))
    val q = queries.toDF("vec_id", "va", "na", "bucket", "la")
    val c = corpus.toDF("neighbor", "vb", "nb", "bucket", "lb")
    val pairs = q.join(c, Seq("bucket"))
      .filter(col("la") =!= col("lb"))
      .select(col("vec_id"), col("neighbor"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
    aggTopKFromPairs(pairs, k)
      .join(labels.select(col("id").as("neighbor"), col("lbl").as("neg_label")),
        Seq("neighbor"))
      .select(col("vec_id"), col("rank"), col("neighbor"),
        col("neg_label"), col("cos"))
  }

  /** Brute-force squared-L2 top-k — the distance-metric sibling of
    * [[bruteForceTopK]] (same meter discipline: `queryPred` bounds the
    * QUERY side, corpus ranks in full; same broadcast-pair + bounded
    * top-k aggregate shape). Distances run through the native
    * [[graft.functions.L2Squared]] sequential fold, bit-identical to the
    * oracle's list_reduce over the zipped difference squares.
    * Output: (vec_id, rank, neighbor, dist), rank 1..k by dist asc with
    * neighbor-id tie-break. */
  def bruteForceTopKL2(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      queryPred: Column = lit(true),
      queryIds: Option[DataFrame] = None): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    graft.functions.L2Squared.register(emb.sparkSession)
    val base = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val queries = queryIds.foldLeft(base.filter(queryPred))((df, q) =>
      df.join(broadcast(q), col("id") === col("qid"), "left_semi"))
    val pairs = queries.toDF("vec_id", "va")
      .join(broadcast(base.toDF("neighbor", "vb")),
        col("vec_id") =!= col("neighbor"))
      .select(col("vec_id"), col("neighbor"),
        l2sq(col("va"), col("vb")).as("dist"))
    aggBottomKFromPairs(pairs, k)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) — the hybrid-
    * retrieval staple: two rankers' top-k lists for the same query set
    * (lexical BM25 + dense ANN in production; any (vec_id, rank, neighbor)
    * frames here) fuse by score Σᵢ 1/(kConst + rankᵢ), missing entries
    * contribute 0, final ranking by fused score desc with neighbor-id
    * tie-break. Every fused score is a fixed-order sum of two exact IEEE
    * divisions of small integers, so an independent engine replicates the
    * scores AND the ranking bit-exact (ties are broken by id regardless).
    *
    * Scale: the inputs are n·k rank lists (each produced by its own scale
    * path — IVF/LSH for dense, posting-list top-k for lexical), so fusion
    * touches n·(kA+kB) rows total: one hash full-outer join keyed by
    * (query, candidate) + the bounded top-k aggregate. No corpus-sized
    * shuffle anywhere — fusion cost is output-sized by construction.
    * Output: (vec_id, rank, neighbor, rrf), rank 1..k. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, kConst: Int = 60): DataFrame = {
    val ar = a.select(col("vec_id"), col("neighbor"), col("rank").as("__ra"))
    val br = b.select(col("vec_id"), col("neighbor"), col("rank").as("__rb"))
    // full outer: a candidate ranked by either side scores; USING-column
    // join coalesces the (vec_id, neighbor) keys
    val fused = ar.join(br, Seq("vec_id", "neighbor"), "full_outer")
      .select(col("vec_id"), col("neighbor"),
        (coalesce(lit(1.0) / (lit(kConst.toLong) + col("__ra")), lit(0.0))
          + coalesce(lit(1.0) / (lit(kConst.toLong) + col("__rb")), lit(0.0)))
          .as("cos"))
    aggTopKFromPairs(fused, k).withColumnRenamed("cos", "rrf")
  }

  /** {+1,−1,0} projection weight from the portable md5 family
    * (h(seed:j:k) mod 6 → 0:+1, 1:−1, else 0; density 1/3) — driver-side
    * plan constant, replicated verbatim by the SQL oracles. */
  private def rpWeight(seed: String, j: Int, k: Int): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$j:$k".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(14)
    java.lang.Long.parseLong(hex, 16) % 6 match {
      case 0 => 1L
      case 1 => -1L
      case _ => 0L
    }
  }

  /** Binary (1-bit) quantized ANN — the fourth quantization path beside
    * SQ8 / PQ / JL: each vector packs to ONE 64-bit sign code (bit b =
    * sign of the b-th sparse random projection of the ⌊v·10⁶⌋-quantized
    * vector), candidates are the `oversample`·k Hamming-nearest codes
    * (bit_count(xor) — random-hyperplane LSH theory: Hamming distance on
    * sign codes estimates angular distance), and the final k are an EXACT
    * cosine rerank of those candidates — the standard two-stage
    * retrieve-then-rerank a production vector store runs.
    *
    * Scale: codes are 8 bytes/vector (12.5 GB per billion vectors — the
    * side that broadcasts or bucket-joins where raw vectors cannot);
    * stage-1 cost is one popcount per pair vs 64 mul-adds, and stage 2
    * touches only |queries|·oversample·k raw vectors. Every quantity is
    * integer (codes, Hamming) or the exact brute-force float contract
    * (rerank cosine), so the whole two-stage pipeline oracle-replicates
    * bit-for-bit. Output: (vec_id, rank, neighbor, cos), rank 1..k. */
  /** The 1-bit sign codes behind [[binaryTopK]], exposed because the code
    * table is the PERSISTABLE artifact at scale (8 bytes/vector, computed
    * once, reused across every query batch). Bit b = sign of the b-th
    * sparse random projection of the ⌊v·10⁶⌋-quantized vector. */
  def binaryCodes(emb: DataFrame, idCol: String, vecCol: String,
      inDim: Int, bits: Int, seed: String): DataFrame = {
    // DATA-FLOW projection (explode ⋈ broadcast weight table ⋈ sum), not
    // plan-literal sums as in randomProjection: at 63 output bits the
    // literal form is one ~1300-op expression whose janino compilation
    // costs seconds per plan (measured 2-3s) and risks the 64KB
    // interpreted fallback. The weight table is inDim×bits/3 rows —
    // broadcast, engine-replicable, and the join/aggregate shapes are the
    // same narrow per-vector work at any corpus size.
    val spark = emb.sparkSession
    import spark.implicits._
    val wDf = (for {
      j <- 0 until inDim
      b <- 0 until bits
      w = rpWeight(seed, j, b) if w != 0L
    } yield (j, b, w)).toDF("j", "k", "w")
    val q = transform(col(vecCol),
      x => floor(x.cast("double") * 1000000d).cast("long"))
    emb.select(col(idCol).as("id"), posexplode(q).as(Seq("j", "qv")))
      .join(broadcast(wDf), Seq("j"))
      .groupBy(col("id"), col("k"))
      .agg(sum(col("qv") * col("w")).as("proj"))
      .groupBy(col("id"))
      .agg(sum(when(col("proj") >= 0,
        expr("shiftleft(CAST(1 AS BIGINT), k)")).otherwise(0L)).as("code"))
  }

  /** Banded Hamming CANDIDATE pairs over a 64-bit code table `(id, code)`
    * — the directed-ANN twin of [[graft.dedup.Dedup.signatureNearDupPairs]]'
    * banding (same pigeonhole: a pair at Hamming < bands must agree
    * exactly on ≥1 of the `bands` contiguous bit slices, so the bucket
    * equi-join on (band, key) sees agreeing slices only, NEVER the
    * all-pairs table). Directed (both (a,b) and (b,a) emitted — top-k
    * needs every query's view), deduped across bands, Hamming distance
    * attached as `dist`. Candidate volume is Σ_bucket |bucket|² per band
    * — n²/2^width in the uniform case, linear-ish for sign codes of a
    * clustered corpus — versus the previous stage-1's unconditional n².
    * Recall contract: pairs at Hamming ≥ bands MAY be missed (standard
    * banded-LSH recall dial: more bands = wider radius = more
    * candidates); the shortlist consumer reranks exactly, so misses cost
    * recall, never wrong scores. */
  /** Default band count for a code width: the most bands whose keys stay
    * ≥ 4 bits (more bands = wider recall radius; wider keys = fewer
    * chance collisions) — 9×7-bit bands at the registered 63 bits. */
  def defaultBands(bits: Int): Int =
    (1 to bits).filter(b => bits % b == 0 && bits / b >= 4)
      .maxOption.getOrElse(1)

  /** One (band, key) row per (code, band) — the shared banding step. */
  private def bandedCodes(codes: DataFrame, bits: Int,
      bands: Int): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    val width = bits / bands
    val bandStructs = (0 until bands).map { j =>
      struct(lit(j).as("band"),
        shiftright(col("code"), j * width)
          .bitwiseAND(lit((1L << width) - 1)).as("key"))
    }
    codes.select(col("id"), col("code"),
      explode(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("code"),
        col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** First-matching-band predicate: TRUE iff `band` is the LOWEST band
    * index on which the two codes agree — the classic LSH emit-once rule.
    * A pair sharing m bands meets in the join m times; this per-row
    * expression keeps exactly the first meeting, replacing the DISTINCT
    * that would otherwise SHUFFLE the whole candidate stream (the largest
    * intermediate of the banded family — at corpus scale, removing that
    * exchange means candidates flow join → filter → partial top-k without
    * ever being rehashed). Replicated verbatim by the oracles'
    * list_position form. */
  private def firstMatchingBand(ca: Column, cb: Column, band: Column,
      bits: Int, bands: Int): Column = {
    val width = bits / bands
    val eqs = array((0 until bands).map { j =>
      shiftright(ca, j * width).bitwiseAND(lit((1L << width) - 1)) ===
        shiftright(cb, j * width).bitwiseAND(lit((1L << width) - 1))
    }: _*)
    band === (array_position(eqs, lit(true)) - 1)
  }

  def hammingBandCandidates(codes: DataFrame, bits: Int,
      bands: Int): DataFrame = {
    val banded = bandedCodes(codes, bits, bands)
    banded.toDF("vec_id", "ca", "band", "key")
      .join(banded.toDF("neighbor", "cb", "band", "key"), Seq("band", "key"))
      .filter(col("vec_id") =!= col("neighbor"))
      .filter(firstMatchingBand(col("ca"), col("cb"), col("band"), bits, bands))
      .select(col("vec_id"), col("neighbor"),
        bit_count(col("ca").bitwiseXOR(col("cb"))).cast("double").as("dist"))
  }

  /** Cross-snapshot banded Hamming candidates — the INCREMENTAL form of
    * [[hammingBandCandidates]] (the embedding-code twin of
    * [[graft.dedup.Dedup.signatureCrossSnapshotPairs]]): the incoming
    * batch's band keys join the settled corpus's persisted band table,
    * new→old candidates only, so per-batch cost is O(batch·bands) plus
    * the bucketed join — never corpus². The corpus band table (id, code,
    * band, key — bands·|corpus| small rows) is the persistable artifact
    * at scale, appended as batches settle. */
  def hammingBandCandidatesCross(batchCodes: DataFrame,
      corpusCodes: DataFrame, bits: Int, bands: Int): DataFrame =
    bandedCodes(batchCodes, bits, bands).toDF("vec_id", "ca", "band", "key")
      .join(bandedCodes(corpusCodes, bits, bands)
        .toDF("neighbor", "cb", "band", "key"), Seq("band", "key"))
      .filter(firstMatchingBand(col("ca"), col("cb"), col("band"), bits, bands))
      .select(col("vec_id"), col("neighbor"),
        bit_count(col("ca").bitwiseXOR(col("cb"))).cast("double").as("dist"))

  /** Stage-1 shortlist shared by [[binaryTopK]] and [[sq8TopK]]: the
    * `n` Hamming-nearest BANDED candidates per query (distance asc,
    * neighbor-id tie-break through the bounded top-k aggregate) —
    * retrieve-then-rerank's retrieve, costed by the bucket join, not n². */
  def hammingShortlist(codes: DataFrame, n: Int, bits: Int,
      bands: Int): DataFrame =
    aggBottomKFromPairs(hammingBandCandidates(codes, bits, bands), n)
      .select(col("vec_id"), col("neighbor"))

  def binaryTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      oversample: Int = 4, inDim: Int = 64, bits: Int = 64,
      seed: String = "graft-bq", bands: Int = 0): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    graft.functions.L2Squared.register(emb.sparkSession)
    // computed once, probed from both sides of the pair join — the code
    // table is the artifact a vector store persists. Stage 1 generates
    // candidates through the BANDED bucket join (round-7 verdict: the
    // all-pairs popcount was the one quadratic left in the family), so
    // the pair stream is bucket-local; stage 2 reranks exactly.
    val nBands = if (bands > 0) bands else defaultBands(bits)
    val codes = binaryCodes(emb, idCol, vecCol, inDim, bits, seed).persist()
    val shortlist = hammingShortlist(codes, oversample * k, bits, nBands)
    val withNorm = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val rerank = shortlist
      .join(withNorm.toDF("vec_id", "va", "na"), Seq("vec_id"))
      .join(withNorm.toDF("neighbor", "vb", "nb"), Seq("neighbor"))
      .select(col("vec_id"), col("neighbor"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
    aggTopKFromPairs(rerank, k)
  }

  /** INCREMENTAL binary-quantized ANN — search an incoming batch against
    * the settled corpus only (the maintenance query a vector store runs
    * as data arrives, so the index never recomputes over corpus²):
    * stage 1 = cross-snapshot banded candidates
    * ([[hammingBandCandidatesCross]] — batch band keys join the
    * persisted corpus band table, new→old pairs only), stage 2 = exact
    * cosine rerank of each batch vector's `oversample`·k Hamming-nearest
    * corpus codes. Deterministic end to end, so codes, candidates and
    * rerank floats all oracle-replicate. Output: (vec_id, rank,
    * neighbor, cos) with vec_id from the batch, neighbor from the
    * corpus. */
  def binaryTopKIncremental(corpus: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, k: Int, oversample: Int = 4,
      inDim: Int = 64, bits: Int = 63, seed: String = "graft-bq",
      bands: Int = 0): DataFrame = {
    graft.functions.DotProduct.register(corpus.sparkSession)
    graft.functions.L2Squared.register(corpus.sparkSession)
    val nBands = if (bands > 0) bands else defaultBands(bits)
    val corpusCodes = binaryCodes(corpus, idCol, vecCol, inDim, bits, seed)
    val batchCodes = binaryCodes(batch, idCol, vecCol, inDim, bits, seed)
    val shortlist = aggBottomKFromPairs(
      hammingBandCandidatesCross(batchCodes, corpusCodes, bits, nBands),
      oversample * k)
      .select(col("vec_id"), col("neighbor"))
    def withNorm(df: DataFrame) = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val rerank = shortlist
      .join(withNorm(batch).toDF("vec_id", "va", "na"), Seq("vec_id"))
      .join(withNorm(corpus).toDF("neighbor", "vb", "nb"), Seq("neighbor"))
      .select(col("vec_id"), col("neighbor"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
    aggTopKFromPairs(rerank, k)
  }

  /** Filtered vector search at SCALE — the bucket-join twin of
    * [[filteredTopK]] (which rides the broadcast brute baseline): the
    * metadata predicate restricts the CORPUS side BEFORE the hot-bucket
    * cap (so the cap budget is spent on qualifying vectors and a query
    * still gets its full k when ≥k qualifying neighbors share its probe
    * set), queries stay unfiltered, candidates come from the multi-probe
    * bucket equi-join, scores are exact cosines on candidates only —
    * never an all-pairs join against the filtered corpus. */
  def filteredTopKLshFromIndex(indexed: DataFrame, predicate: Column,
      k: Int, planes: Int, probes: Int = 1,
      bucketCap: Int = 512): DataFrame = {
    val (queries, _) =
      lshCandidatesFromIndex(indexed, planes, probes, bucketCap)
    val (_, corpus) = lshCandidatesFromIndex(
      indexed.filter(predicate), planes, probes, bucketCap)
    val pairs = queries
      .select(col("id").as("vec_id"), col("v").as("va"),
        col("nrm").as("na"), col("bucket"))
      .join(corpus.select(col("id").as("neighbor"), col("v").as("vb"),
        col("nrm").as("nb"), col("bucket")), Seq("bucket"))
      .filter(col("vec_id") =!= col("neighbor"))
      .select(col("vec_id"), col("neighbor"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
    aggTopKFromPairs(pairs, k)
  }

  /** Sparse random projection (Achlioptas-style) for embedding
    * dimensionality reduction: out_k = Σⱼ w(j,k)·qⱼ where qⱼ =
    * ⌊vⱼ·10⁶⌋ (BIGINT quantization, the same float→double→floor contract
    * as SQ8 codes) and w(j,k) ∈ {+1,−1,0} is derived from the portable md5
    * family (h(seed:j:k) mod 6 → 0:+1, 1:−1, else 0 — expected density
    * 1/3). Every term is an exact integer, so projections are
    * bit-replicable across engines.
    *
    * Scale shape: the weight matrix is inDim×outDim — part of the PLAN
    * (literal sums over the nonzero entries, whole-stage codegen), not
    * data. One corpus scan, zero joins, zero shuffles; the 16-row
    * explode per vector is narrow. This is the standard cheap pre-pass
    * that shrinks 100 TB of wide embeddings before any pairwise stage
    * (JL lemma: pairwise distances preserved within ε at outDim =
    * O(log n / ε²)).
    *
    * Output: (vec_id, k, proj_q) — long format, outDim rows per vector. */
  def randomProjection(
      emb: DataFrame, idCol: String, vecCol: String,
      inDim: Int = 64, outDim: Int = 16,
      seed: String = "graft-rp"): DataFrame = {
    def weight(j: Int, k: Int): Long = rpWeight(seed, j, k)
    val q = transform(col(vecCol),
      x => floor(x.cast("double") * 1000000d).cast("long"))
    val projs = array((0 until outDim).map { k =>
      val terms = (0 until inDim).flatMap { j =>
        weight(j, k) match {
          case 0L => None
          case w  => Some(element_at(col("__q"), j + 1) * lit(w))
        }
      }
      if (terms.isEmpty) lit(0L) else terms.reduce(_ + _)
    }: _*)
    // build the 16-sum array in its OWN Project (whole-stage codegen splits
    // oversized expression trees there; the Generate operator cannot, and
    // inlining the sums into posexplode trips the 64KB JVM method limit
    // into an interpreted fallback)
    emb.select(col(idCol).as("vec_id"), q.as("__q"))
      .select(col("vec_id"), projs.as("__p"))
      .select(col("vec_id"), posexplode(col("__p")).as(Seq("k", "proj_q")))
      .select(col("vec_id"), col("k").cast("long").as("k"), col("proj_q"))
  }

  /** Greedy k-center coreset selection (farthest-point traversal) — the
    * diversity-sampling step a curation pipeline runs when it wants k
    * maximally-spread exemplars rather than cluster centroids (the
    * 2-approximation of the k-center objective; the DEITA-style "pick
    * what's far from everything picked so far" selector). Deterministic:
    * the seed is the minimum id, each round picks the vector maximizing
    * its exact-fold L2² distance to the nearest already-selected center
    * (ties → lowest id), so both engines replay the identical traversal.
    *
    * Scale: round i is ONE pass over the running (vec_id, v, dmin) frame
    * with a one-row broadcast (the new center) folded through `least` —
    * each round computes ONE new distance per vector. The running frame
    * and each round's argmax row are localCheckpoint'ed (the GraphOps
    * iterative-closure discipline): the checkpoint truncates the lineage
    * to a LogicalRDD, so the plan stays CONSTANT-sized per round — each
    * round's frame references the argmax twice (union row + broadcast),
    * and without truncation the logical plan grows exponentially in k,
    * with ANALYSIS time (not execution) coming to dominate by round ~6
    * (measured on mmrSelect: 3^k plan copies, 39 s to plan round 6's
    * one-row argmax). k rounds = k linear passes, no pairwise joins, no
    * windows. The argmax is a TakeOrderedAndProject (top-1 per
    * partition, merged at the driver), never a global sort shuffle. k is
    * a small constant (coresets are picked to fit a human or a prompt,
    * not the corpus).
    *
    * Fault-tolerance tradeoff (round-6 advice, accepted deliberately):
    * localCheckpoint is NON-RELIABLE — blocks live on executor storage,
    * so on a multi-executor cluster an executor loss mid-selection fails
    * the job instead of recomputing from lineage (which was truncated on
    * purpose). That is the right trade here: the alternative costs are a
    * reliable `checkpoint()` to a checkpoint dir (per-round distributed
    * FS writes for a frame that is rebuilt in seconds) or the 3^k plan
    * blow-up. If these selectors ever run as a long job on a preemptible
    * cluster, set a checkpoint dir and swap `localCheckpoint(true)` for
    * `checkpoint(true)` — the semantics are otherwise identical.
    *
    * Output: (sel_rank 1..k, vec_id, radius) — radius is the selected
    * vector's min distance at selection time (null for the seed); the
    * sequence of radii is non-increasing and radius_k bounds the covering
    * radius of the first k-1 centers.
    *
    * k > corpus contract (documented, oracle-replicated): once every
    * vector is selected, every dmin is 0 and the argmax tie-break
    * re-picks the minimum id with radius 0 — the caller reads radius = 0
    * as "corpus exhausted" (exact duplicates also select at radius 0, so
    * a zero radius means no NEW diversity either way). */
  def kCenterGreedy(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // like every sibling entry point: works on sessions built without
    // GraftExtensions (l2sq resolves graft_l2sq by name)
    graft.functions.DotProduct.register(emb.sparkSession)
    graft.functions.L2Squared.register(emb.sparkSession)
    val base = emb.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    // eager localCheckpoint per round: truncates lineage so every round's
    // plan is constant-sized (see scaladoc), materializes exactly once,
    // and nothing lingers in the cache manager after return
    val seed = base.orderBy(col("vec_id").asc).limit(1).localCheckpoint(true)
    var out = Vector(seed.select(lit(1L).as("sel_rank"), col("vec_id"),
      lit(null).cast("double").as("radius")))
    var d = base
      .crossJoin(broadcast(seed.select(col("v").as("cv"))))
      .select(col("vec_id"), col("v"), l2sq(col("v"), col("cv")).as("dmin"))
      .localCheckpoint(true)
    for (i <- 2 to k) {
      val ci = d.orderBy(col("dmin").desc, col("vec_id").asc).limit(1)
        .localCheckpoint(true)
      out :+= ci.select(lit(i.toLong).as("sel_rank"), col("vec_id"),
        col("dmin").as("radius"))
      if (i < k) {
        d = d.crossJoin(broadcast(ci.select(col("v").as("cv"))))
          .select(col("vec_id"), col("v"),
            least(col("dmin"), l2sq(col("v"), col("cv"))).as("dmin"))
          .localCheckpoint(true)
      }
    }
    out.reduce(_.unionByName(_))
  }

  /** Greedy MMR (maximal-marginal-relevance) selection — the
    * relevance-AND-diversity curation selector (Carbonell & Goldstein
    * 1998, distance flavor): round 1 picks the most RELEVANT vector,
    * every later round the argmax of `rel + λ·dmin(v, selected)` — the
    * relevance-weighted sibling of [[kCenterGreedy]] (λ→∞ recovers pure
    * k-center, λ=0 pure top-k by relevance). Relevance here is the
    * exact-fold squared norm `dot(v, v)` (a deterministic, data-dependent
    * stand-in for a model score; callers with a real score column can
    * pre-scale their vectors). Deterministic: exact-double folds, score
    * ties → lowest id, λ a double literal, so both engines replay the
    * identical selection (the x_mmr_select oracle unrolls the same
    * rounds). Same per-round shape and plan-bounding discipline as
    * [[kCenterGreedy]]: one pass over the running (vec_id, v, rel, dmin)
    * frame with a one-row broadcast per round, each round's frame and
    * argmax localCheckpoint'ed. The checkpoint is LOAD-BEARING here:
    * every round references the argmax row twice and the running frame
    * twice (anti-join + broadcast), so the un-truncated logical plan
    * grows 3^k — measured 60,000 scan nodes and 39 s of pure ANALYSIS
    * for round 6's one-row argmax before the fix (56 s total vs 2 s for
    * the checkpointed form). */
  def mmrSelect(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, lambda: Double = 0.5): DataFrame = {
    require(k >= 1, "k must be >= 1")
    graft.functions.DotProduct.register(emb.sparkSession)
    graft.functions.L2Squared.register(emb.sparkSession)
    val base = emb.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("rel", dotD(col("v"), col("v")))
    val seed = base.orderBy(col("rel").desc, col("vec_id").asc).limit(1)
      .localCheckpoint(true)
    var out = Vector(seed.select(lit(1L).as("sel_rank"), col("vec_id"),
      col("rel").as("score")))
    // a selected row must LEAVE the candidate frame (unlike k-center,
    // where dmin = 0 retires it, a high-relevance row would be re-picked
    // forever) — one-row broadcast anti-joins, no driver collect
    // the picked id is re-ALIASED before each anti-join: the checkpointed
    // one-row frame shares its attribute ids with the running frame (a
    // LogicalRDD keeps its source attrs), and an un-aliased projection
    // would make the join's two sides expose the same attribute
    var d = base
      .join(seed.select(col("vec_id").as("__picked")),
        col("vec_id") === col("__picked"), "left_anti")
      .crossJoin(broadcast(seed.select(col("v").as("cv"))))
      .select(col("vec_id"), col("v"), col("rel"),
        l2sq(col("v"), col("cv")).as("dmin"))
      .localCheckpoint(true)
    for (i <- 2 to k) {
      val score = col("rel") + lit(lambda) * col("dmin")
      val ci = d.orderBy(score.desc, col("vec_id").asc).limit(1)
        .localCheckpoint(true)
      out :+= ci.select(lit(i.toLong).as("sel_rank"), col("vec_id"),
        score.as("score"))
      if (i < k) {
        d = d.join(ci.select(col("vec_id").as("__picked")),
            col("vec_id") === col("__picked"), "left_anti")
          .crossJoin(broadcast(ci.select(col("v").as("cv"))))
          .select(col("vec_id"), col("v"), col("rel"),
            least(col("dmin"), l2sq(col("v"), col("cv"))).as("dmin"))
          .localCheckpoint(true)
      }
    }
    out.reduce(_.unionByName(_))
  }
}
