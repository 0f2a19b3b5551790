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

  val all: Seq[Q] = Seq(xSplit, xPack, xScrub)
}
