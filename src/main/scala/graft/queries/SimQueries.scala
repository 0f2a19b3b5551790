package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.multimodal.Multimodal
import graft.sim.Similarity

/** Similarity-search and multimodal-plumbing queries. The brute-force ANN
  * oracle reproduces the exact double-precision fold (list_reduce ≡
  * zip_with+aggregate with zero init), so cosine scores compare bit-exact. */
object SimQueries {

  private val normCte =
    """WITH nrm AS (SELECT vec_id, embedding,
      |  sqrt(list_reduce(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
      |  FROM embeddings)
      |""".stripMargin

  val xAnnTopK = Q(
    "x_ann_topk",
    normCte +
      """, p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor,
        |  list_reduce(list_transform(list_zip(a.embedding, b.embedding),
        |    z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (s, t) -> s + t)
        |    / (a.nrm * b.nrm) AS cos
        |  FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id)
        |SELECT vec_id, rank, neighbor, cos FROM (
        |  SELECT vec_id, neighbor, cos,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor) AS rank
        |  FROM p) WHERE rank <= 5""".stripMargin) { (s, d) =>
    Similarity.bruteForceTopK(Tables.embeddings(s, d), "vec_id", "embedding", k = 5)
  }

  /** IVF-flat ANN with deterministic sampled centroids — the second scale
    * path, fully oracle-replicated (assignment + probe both in SQL). */
  val xAnnIvf = Q(
    "x_ann_ivf",
    normCte +
      """, cent AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cnrm
        |           FROM nrm WHERE vec_id % 40 = 0),
        |assigned AS (
        |  SELECT vec_id, embedding, nrm, cid FROM (
        |    SELECT n.vec_id, n.embedding, n.nrm, c.cid,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        (list_reduce(list_transform(list_zip(n.embedding, c.cv),
        |           z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (s, t) -> s + t)
        |         / (n.nrm * c.cnrm)) DESC, c.cid) AS arn
        |    FROM nrm n CROSS JOIN cent c) WHERE arn = 1),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor,
        |  list_reduce(list_transform(list_zip(a.embedding, b.embedding),
        |    z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (s, t) -> s + t)
        |    / (a.nrm * b.nrm) AS cos
        |  FROM assigned a JOIN assigned b
        |    ON a.cid = b.cid AND a.vec_id <> b.vec_id)
        |SELECT vec_id, rank, neighbor, cos FROM (
        |  SELECT vec_id, neighbor, cos,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor) AS rank
        |  FROM p) WHERE rank <= 5""".stripMargin) { (s, d) =>
    Similarity.ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding",
      k = 5, centroidStep = 40)
  }

  /** LSH-bucketed approximate top-k — the 100 TB path; probabilistic
    * candidate sets are engine-specific, so this carries a rows-only check
    * plus unit-tested recall against the brute-force baseline. */
  val xAnnLsh = Q.noOracle("x_ann_lsh") { (s, d) =>
    Similarity.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding",
      k = 5, planes = 6, dim = 64, probes = 1)
  }

  /** Multimodal plumbing: synthesized binary payloads through the batched
    * partition-local extractor; byte length + digest are oracle-checked. */
  val xMediaFeatures = Q(
    "x_media_features",
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest
      |FROM documents""".stripMargin) { (s, d) =>
    Multimodal.documentFeatures(s, Tables.documents(s, d))
      .toDF()
      .select(col("media_id"), col("n_bytes").cast("long").as("n_bytes"),
        col("digest"))
  }

  /** Full decode path incl. the stubbed feature vector (deterministic fake
    * decode — rows-only check; the vector shape/batching is unit-tested). */
  val xMediaDecode = Q.noOracle("x_media_decode") { (s, d) =>
    Multimodal.documentFeatures(s, Tables.documents(s, d)).toDF()
  }

  val all: Seq[Q] = Seq(xAnnTopK, xAnnIvf, xAnnLsh, xMediaFeatures, xMediaDecode)
}
