package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.sources.Sinks

/** Driver-checkable queries for the non-parquet source/sink operators:
  * S12 (KEGG flat-record parse) and S3/S22 (chunked CSV sink), each
  * exercised end-to-end with a DuckDB oracle over the same tables.
  */
object SourceQueries {

  /** S12: synthesize KEGG-style flat records from the supplier table
    * (keyword sections + an indented continuation line, kegg_local.py:
    * 211-274 shape), parse them back with the distributed parser, emit
    * (rec_id, section, value). The oracle states the expected parse
    * directly from the table — a genuine round-trip check of keyword
    * extraction, continuation-line folding, and value reassembly. */
  val s12FlatRecords = Q(
    "s12_flat_records",
    """SELECT s_suppkey AS rec_id, 'ENTRY' AS section,
      |  CAST(s_suppkey AS VARCHAR) AS value FROM supplier
      |UNION ALL
      |SELECT s_suppkey, 'NAME',
      |  s_name || ' ' || CAST(s_acctbal AS VARCHAR) FROM supplier
      |UNION ALL
      |SELECT s_suppkey, 'NATION', CAST(s_nationkey AS VARCHAR) FROM supplier"""
      .stripMargin) { (s, d) =>
    val records = Tables.supplier(s, d).select(
      col("s_suppkey").as("rec_id"),
      concat_ws("\n",
        concat(lit("ENTRY       "), col("s_suppkey")),
        concat(lit("NAME        "), col("s_name")),
        // continuation line (indented; starts with a digit or '-', so the
        // keyword regex cannot misread it as a new section)
        concat(lit("            "), col("s_acctbal").cast("string")),
        concat(lit("NATION      "), col("s_nationkey"))).as("record"))
    Sinks.flatRecordFieldsKeyed(records)
  }

  /** S3/S22: chunked-CSV sink round trip — write the nation table through
    * the chunked header-CSV sink (Neo4j escaping at the boundary, 7 rows
    * per file so chunking actually happens), read the files back, emit the
    * parsed rows. The oracle replicates the boundary escaping in SQL. */
  val s3CsvRoundtrip = Q(
    "s3_csv_roundtrip",
    """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
      |  translate(n_name || '|' || n_regionkey, '''|', '^,') AS props
      |FROM nation""".stripMargin) { (s, d) =>
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_rt").toString
    Sinks.chunkedCsv(
      Tables.nation(s, d).select(col("n_nationkey"),
        // pipe-encoded props cell so the sink's Neo4j escaping (F4) is
        // actually visible in the round-tripped bytes
        concat(col("n_name"), lit("|"), col("n_regionkey")).as("props")),
      dir, maxRecordsPerFile = 7)
    s.read.option("header", "true").csv(dir)
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("props"))
  }

  val all: Seq[Q] = Seq(s12FlatRecords, s3CsvRoundtrip)
}
