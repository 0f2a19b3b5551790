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

  /** S12 through the DSv2 splittable source (graft.sources.v2
    * .KeggFlatSource): the SAME oracle as s12_flat_records, but the flat
    * records round-trip through real files and come back via
    * `format("kegg-flat")` with a small splitSize so byte-range splits and
    * record-boundary alignment are exercised on the driver path too (not
    * just in KeggFlatSourceSpec). The source's stable `offset` keys the
    * parse; the emitted rec_id is re-keyed from each record's ENTRY
    * section (a broadcast-sized self-join on the record key). */
  val s12Dsv2Scan = Q(
    "s12_dsv2_scan",
    """SELECT s_suppkey AS rec_id, 'ENTRY' AS section,
      |  CAST(s_suppkey AS VARCHAR) AS value FROM supplier
      |UNION ALL
      |SELECT s_suppkey, 'NAME',
      |  s_name || ' ' || CAST(s_acctbal AS VARCHAR) FROM supplier
      |UNION ALL
      |SELECT s_suppkey, 'NATION', CAST(s_nationkey AS VARCHAR) FROM supplier"""
      .stripMargin) { (s, d) =>
    val dir = java.nio.file.Files.createTempDirectory("graft_kegg_dsv2").toString
    Tables.supplier(s, d).select(
      concat(
        lit("ENTRY       "), col("s_suppkey"), lit("\n"),
        lit("NAME        "), col("s_name"), lit("\n"),
        lit("            "), col("s_acctbal").cast("string"), lit("\n"),
        lit("NATION      "), col("s_nationkey"), lit("\n///")).as("value"))
      .write.mode("overwrite").text(dir)
    val src = s.read.format("kegg-flat")
      .option("path", dir).option("splitSize", "4096").load()
      .select(col("offset").as("rec_id"), col("record"))
    val parsed = Sinks.flatRecordFieldsKeyed(src)
    val keys = parsed.filter(col("section") === "ENTRY")
      .select(col("rec_id"), col("value").cast("long").as("entry_id"))
    parsed.join(broadcast(keys), Seq("rec_id"))
      .select(col("entry_id").as("rec_id"), col("section"), col("value"))
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

  /** F1/F2/F3 scalar cleanup functions, driver-checked: comma-number parse
    * round trip (format_number → commaLong inverts it), xref-list cleanup
    * (empty segments dropped), versioned-id base strip. */
  val fCleanupPack = Q(
    "f_cleanup_pack",
    """SELECT s_suppkey,
      |  CAST(s_suppkey AS BIGINT) AS parsed_key,
      |  s_name || '|' || s_nationkey AS xrefs,
      |  'X' || s_suppkey AS base_id
      |FROM supplier""".stripMargin) { (s, d) =>
    import graft.core.ColFns
    Tables.supplier(s, d).select(
      col("s_suppkey"),
      ColFns.commaLong(format_number(col("s_suppkey"), 0)).as("parsed_key"),
      concat_ws("|", ColFns.stripXrefs(
        concat(col("s_name"), lit(";;"), col("s_nationkey"), lit(";"))))
        .as("xrefs"),
      ColFns.idBase(concat(lit("X"), col("s_suppkey"), lit("."),
        col("s_nationkey"))).as("base_id"))
  }

  /** P10 config-driven projection, driver-checked: conform against a
    * registry label with a selected-but-absent prop — the cast and the
    * typed null-fill are visible in the output schema. */
  val p10Conform = Q(
    "p10_conform",
    """SELECT 'mm:' || s_suppkey AS id, 'molecular_mixture' AS label,
      |  s_name AS type, CAST(s_acctbal AS DOUBLE) AS full_mwt,
      |  CAST(NULL AS DOUBLE) AS qed_score
      |FROM supplier""".stripMargin) { (s, d) =>
    val df = Tables.supplier(s, d).select(
      concat(lit("mm:"), col("s_suppkey")).as("id"),
      lit("molecular_mixture").as("label"),
      col("s_name").as("type"), col("s_acctbal").as("full_mwt"))
    graft.core.SchemaRegistry.conformNodes(df, "molecular_mixture",
      selected = Set("type", "full_mwt", "qed_score"))
  }

  val all: Seq[Q] = Seq(s12FlatRecords, s12Dsv2Scan, s3CsvRoundtrip,
    fCleanupPack, p10Conform)
}
