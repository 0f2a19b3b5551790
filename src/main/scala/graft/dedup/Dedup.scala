package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFns

/** Document deduplication for training-data pipelines: exact (hash-groupBy),
  * n-gram Jaccard (inverted-index pair join), MinHash+LSH (shingle → minhash
  * signature → banded bucket join → verified Jaccard), SimHash (weighted
  * bit-vote signature → banded bucket join → Hamming filter).
  *
  * All hashes are [[TextFns.portableHash]] (md5-derived 56-bit ints) so an
  * independent SQL engine reproduces every signature bit-for-bit — the
  * DuckDB oracles in DedupQueries are full replicas, not spot checks.
  *
  * Scale: the exact/inverted-index paths shuffle on content keys (hash
  * partitioning, no driver state). The all-pairs Jaccard join is the
  * correctness baseline; MinHash-LSH is the 100 TB path — candidate
  * generation cost is O(docs × bands) with bucket-local joins, and the
  * verification join touches only candidate pairs.
  */
object Dedup {

  /** Exact-duplicate groups by bag-of-words fingerprint: one row per
    * distinct fingerprint with the kept (min) id and group size. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextFns.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"),
        concat_ws("|", array_sort(collect_list(col(idCol).cast("string"))))
          .as("doc_ids"))

  /** Distinct word n-gram shingles per document (docs shorter than n words
    * produce none). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val words = TextFns.tokens(col(textCol))
    docs
      .filter(size(words) >= n)
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + lit(1), lit(n)))))).as("shingle"))
  }

  /** All document pairs sharing ≥1 shingle, with exact Jaccard similarity
    * of their shingle sets. `threshold` ≤ 0 keeps every co-occurring pair.
    * Pairs are (a < b); the single double division is engine-portable. */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.toDF("a", "shingle")
      .join(sh.toDF("b", "shingle"), Seq("shingle"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.toDF("a", "na"), Seq("a"))
      .join(counts.toDF("b", "nb"), Seq("b"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signatures: one row per doc with columns s0..s{numHashes-1},
    * where s_i = min over shingles of portableHash(shingle, salt=i).
    * Single hash-aggregate pass — numHashes min-columns share one shuffle. */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val mins = (0 until numHashes).map(i =>
      min(TextFns.portableHash(col("shingle"), lit(i.toString))).as(s"s$i"))
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH near-duplicate pairs: band the signature, bucket-join on
    * (band index, band key), then verify candidates with exact Jaccard.
    * Returns (a, b, jaccard) with jaccard ≥ threshold. */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minhashSignatures(docs, idCol, textCol, n, numHashes)
    val bandStructs = (0 until bands).map { j =>
      struct(lit(j).as("band"),
        concat_ws(",", (0 until rows).map(r => col(s"s${j * rows + r}")): _*).as("key"))
    }
    val banded = sig.select(col("doc_id"),
      explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = banded.toDF("a", "band", "key")
      .join(banded.toDF("b", "band", "key"), Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    // verification: exact Jaccard on candidates only (join prunes the
    // all-pairs table down to LSH candidates before the filter)
    cand.join(
      ngramJaccardPairs(docs, idCol, textCol, n, threshold = Double.MinValue),
      Seq("a", "b"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** SimHash signatures (`bits`-wide, default 32): per word-frequency vote —
    * bit b of the signature is set iff Σ_word (±freq) ≥ 0, where the sign is
    * bit b of the word's portable hash. */
  def simhashSignatures(
      docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 32): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(TextFns.tokens(col(textCol))).as("word"))
    val wf = words.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("f"))
      .withColumn("h", TextFns.portableHash(col("word"), lit("sim")))
    val votes: Seq[Column] = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1, col("f"))
        .otherwise(-col("f"))).as(s"v$b"))
    val voted = wf.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sig = (0 until bits).map(b =>
      when(col(s"v$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    voted.select(col("doc_id"), sig.as("sig"))
  }

  /** SimHash near-duplicate pairs: split the signature into `bands` byte
    * bands, bucket-join, keep pairs with Hamming distance ≤ maxHamming. */
  def simhashNearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 32, bands: Int = 4, maxHamming: Int = 6): DataFrame = {
    val width = bits / bands
    val sig = simhashSignatures(docs, idCol, textCol, bits)
    val bandStructs = (0 until bands).map { j =>
      struct(lit(j).as("band"),
        shiftright(col("sig"), j * width).bitwiseAND(lit((1L << width) - 1)).as("key"))
    }
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.toDF("a", "sig_a", "band", "key")
      .join(banded.toDF("b", "sig_b", "band", "key"), Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
