package graft.sources.v2

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for KEGG-style `///`-delimited flat-record files
  * (S12, reference kegg_local.py:211-274 record framing).
  *
  * The built-in text source can split this format only by treating `///`
  * as a line separator, which caps parallelism at one task per FILE. This
  * source is byte-range SPLITTABLE the way the 100 TB layout needs: each
  * file is planned into `splitSize`-byte input partitions and every reader
  * aligns itself to record boundaries exactly like Hadoop text splits do —
  * a reader whose split starts mid-record skips forward to the first
  * delimiter line ending at or after its start offset, and the reader
  * owning a record's START byte consumes the whole record even when it
  * straddles the split end. Every byte belongs to exactly one reader's
  * records for ANY split size (property-tested in KeggFlatSourceSpec
  * across split sizes down to 16 bytes).
  *
  * Schema: `offset BIGINT` (byte offset of the record frame's first byte
  * within its file — a stable, partition-count-independent record id,
  * unlike monotonically_increasing_id), `file STRING`, `record STRING`
  * (raw record text, delimiter and surrounding blank padding stripped).
  * Column pruning is pushed down: a scan that only needs `offset` never
  * materializes record strings (the byte scan still runs — boundaries are
  * data-dependent — but per-record string allocation does not; asserted
  * on the scan's readSchema in KeggFlatSourceSpec). Parsing into
  * (section, value) rows stays OUT of the source, in the declarative plan
  * (`Sinks.flatRecordFieldsKeyed`), where Catalyst can prune/push/codegen
  * it — the source does IO and record framing only.
  *
  * Options: `path` (file or directory; directories list non-hidden
  * files), `splitSize` (target bytes per input partition, default
  * 128 MiB).
  */
class KeggFlatSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kegg-flat"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeggFlatSource.schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KeggFlatTable(new CaseInsensitiveStringMap(properties))
}

object KeggFlatSource {
  val schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("record", StringType, nullable = false)))
}

private[v2] class KeggFlatTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"kegg-flat(${options.get("path")})"
  override def schema(): StructType = KeggFlatSource.schema
  // ACCEPT_ANY_SCHEMA: the logical table schema (offset/file/record) is
  // the READ shape; offset/file are placement-derived, so a write carries
  // only `record` — the analyzer must not demand the derived columns, and
  // the WriteBuilder enforces the (record STRING) contract itself.
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new KeggFlatScanBuilder(o)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val path = Option(info.options.get("path"))
      .orElse(Option(options.get("path")))
      .getOrElse(throw new IllegalArgumentException(
        "kegg-flat write: 'path' option is required"))
    val fields = info.schema().fields
    require(fields.length == 1 && fields(0).name == "record" &&
      fields(0).dataType == StringType,
      s"kegg-flat write expects exactly (record STRING); got " +
        info.schema().simpleString +
        " — offset/file are read-side derived columns, not writable")
    new KeggFlatWriteBuilder(path)
  }
}

/** The aggregate shapes the source evaluates split-locally
  * ([[SupportsPushDownAggregates]]): group-by-free COUNT(*) / MIN(offset)
  * / MAX(offset). */
private[v2] sealed trait KeggAgg
private[v2] case object KeggCountStar extends KeggAgg
private[v2] case object KeggMinOffset extends KeggAgg
private[v2] case object KeggMaxOffset extends KeggAgg

/** Filter pushdown (the parquet footer-min/max analog for this format):
  * `offset` range bounds and `file` equality are applied EXACTLY by the
  * source — qualifying splits are the only ones planned (an offset
  * window over a 100 TB directory plans O(window) input partitions, not
  * O(corpus)), the reader skips non-qualifying frames without
  * materializing their strings and STOPS once past the upper bound —
  * so accepted filters are consumed, not returned as residual.
  *
  * Aggregate pushdown (planning-time analog of the same idea, the
  * SupportsPushDownAggregates exercise): group-by-free COUNT(*) /
  * MIN(offset) / MAX(offset) are computed INSIDE each split's reader —
  * one partial row per split crosses the wire instead of every record
  * (frames are still walked; boundaries are data-dependent — but no
  * record string is ever materialized). Pushdown is PARTIAL
  * (supportCompletePushDown stays false): Spark's final aggregate merges
  * the per-split rows (SUM of counts, MIN of mins), which is exactly the
  * multi-partition contract. Pushed filters compose — only qualifying
  * frames are counted. */
private[v2] class KeggFlatScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {
  private var required: StructType = KeggFlatSource.schema
  private var offsetLo: Long = Long.MinValue // inclusive
  private var offsetHi: Long = Long.MaxValue // inclusive
  private var fileEq: Option[String] = None
  private var accepted: Array[Filter] = Array.empty
  private var aggSpecs: Option[Seq[KeggAgg]] = None
  private var limit: Option[Int] = None

  /** Limit pushdown — PARTIAL by contract (isPartiallyPushed defaults
    * true): each split's reader stops walking frames after `limit`
    * qualifying records, and Spark's global Limit above takes the final
    * cut across splits. On a LIMIT-k probe of a 100 TB directory this is
    * the difference between parsing every frame of every split and
    * parsing at most k frames per split — planning still prunes splits
    * first via the pushed offset/file filters. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    def offsetRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames.toSeq == Seq("offset")
        case _ => false
      }
    if (aggregation.groupByExpressions.nonEmpty) return false
    val specs = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(KeggCountStar)
      case m: Min if offsetRef(m.column) => Some(KeggMinOffset)
      case m: Max if offsetRef(m.column) => Some(KeggMaxOffset)
      case _ => None
    }
    if (specs.isEmpty || specs.exists(_.isEmpty)) false
    else { aggSpecs = Some(specs.flatten); true }
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order regardless of the requested order
    required = StructType(
      KeggFlatSource.schema.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def num(v: Any): Option[Long] = v match {
      case n: java.lang.Number => Some(n.longValue())
      case _ => None
    }
    val (ours, residual) = filters.partition {
      case GreaterThan("offset", v) => num(v).isDefined
      case GreaterThanOrEqual("offset", v) => num(v).isDefined
      case LessThan("offset", v) => num(v).isDefined
      case LessThanOrEqual("offset", v) => num(v).isDefined
      case EqualTo("offset", v) => num(v).isDefined
      case EqualTo("file", _: String) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThan("offset", v) =>
        offsetLo = math.max(offsetLo, num(v).get + 1)
      case GreaterThanOrEqual("offset", v) =>
        offsetLo = math.max(offsetLo, num(v).get)
      case LessThan("offset", v) =>
        offsetHi = math.min(offsetHi, num(v).get - 1)
      case LessThanOrEqual("offset", v) =>
        offsetHi = math.min(offsetHi, num(v).get)
      case EqualTo("offset", v) =>
        offsetLo = math.max(offsetLo, num(v).get)
        offsetHi = math.min(offsetHi, num(v).get)
      case EqualTo("file", f: String) => fileEq = Some(f)
      case _ => ()
    }
    accepted = ours
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = {
    val path = options.get("path")
    require(path != null, "kegg-flat: 'path' option is required")
    val splitSize = Option(options.get("splitSize")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    require(splitSize > 0, "kegg-flat: splitSize must be positive")
    val readSchema = aggSpecs match {
      case Some(specs) => StructType(specs.zipWithIndex.map {
        case (KeggCountStar, i) =>
          StructField(s"count_$i", LongType, nullable = false)
        case (KeggMinOffset, i) =>
          StructField(s"min_offset_$i", LongType, nullable = true)
        case (KeggMaxOffset, i) =>
          StructField(s"max_offset_$i", LongType, nullable = true)
      })
      case None => required
    }
    new KeggFlatScan(path, splitSize, readSchema, offsetLo, offsetHi, fileEq,
      aggSpecs, limit)
  }
}

/** Splits planned by the scan after static pushdown AND runtime pruning —
  * a driver-side SQL metric (shows on the BatchScan node in the UI), the
  * observable proof that [[SupportsRuntimeFiltering]] pruned whole files
  * before any task launched. */
private[v2] class PlannedSplitsMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "plannedSplits"
  override def description(): String =
    "byte-range splits planned (post filter/runtime pruning)"
}

private[v2] class KeggFlatScan(
    path: String, splitSize: Long, required: StructType,
    offsetLo: Long, offsetHi: Long, fileEq: Option[String],
    aggSpecs: Option[Seq[KeggAgg]] = None, limit: Option[Int] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"kegg-flat path=$path splitSize=$splitSize " +
      s"cols=${required.fieldNames.mkString(",")} " +
      s"PushedOffsets=[$offsetLo,$offsetHi] PushedFile=${fileEq.getOrElse("*")}" +
      aggSpecs.map(ss => s" PushedAggregates=[${ss.mkString(",")}]")
        .getOrElse("") +
      limit.map(l => s" PushedLimit=$l").getOrElse("")

  /** Runtime (DPP-style) pruning on the `file` column: when this scan is
    * equi-joined on `file` to a selective side, Spark collects that side's
    * file values first and calls [[filter]] with an `In`/`EqualTo` before
    * [[planInputPartitions]] — whole files drop out of planning, the V2
    * analog of dynamic partition pruning (only metadata is touched either
    * way; at 100 TB this is the difference between planning O(matched
    * files) and O(directory) splits). Static pushed filters still apply —
    * runtime pruning only ever intersects. */
  private var runtimeFiles: Option[Set[String]] = None
  @volatile private var plannedSplits: Long = -1L

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // advertise `file` only when it survives column pruning — Spark
    // resolves these against the PRUNED read schema, and an unresolvable
    // attribute fails analysis on scans that don't read `file` at all
    if (required.fieldNames.contains("file"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("file"))
    else Array.empty

  override def filter(filters: Array[Filter]): Unit = {
    val sets = filters.collect {
      case In("file", vs) => vs.collect { case v: String => v }.toSet
      case EqualTo("file", v: String) => Set(v)
    }
    if (sets.nonEmpty)
      runtimeFiles = Some(sets.reduce(_ intersect _))
  }

  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new PlannedSplitsMetric)

  override def reportDriverMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    if (plannedSplits < 0) Array.empty
    else Array(new org.apache.spark.sql.connector.metric.CustomTaskMetric {
      override def name(): String = "plannedSplits"
      override def value(): Long = plannedSplits
    })

  override def planInputPartitions(): Array[InputPartition] = {
    // driver-side planning touches only file METADATA (names + lengths)
    val conf = new Configuration()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files: Seq[FileStatus] =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
          .sortBy(_.getPath.getName)
      else Seq(fs.getFileStatus(root))
    val planned = files
      .filter(st => fileEq.forall(_ == st.getPath.toString))
      .filter(st => runtimeFiles.forall(_.contains(st.getPath.toString)))
      .flatMap { st =>
        val len = st.getLen
        if (len == 0) Nil
        else (0L until len by splitSize)
          // a split owns the frames STARTING inside it, so it can hold a
          // qualifying offset iff [start, start+length) meets [lo, hi]
          .filter(start => start <= offsetHi &&
            math.min(start + splitSize, len) - 1 >= offsetLo)
          .map { start =>
            KeggFlatPartition(
              st.getPath.toString, start, math.min(splitSize, len - start))
          }
      }.toArray[InputPartition]
    plannedSplits = planned.length.toLong
    planned
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KeggFlatReaderFactory(required, offsetLo, offsetHi, aggSpecs, limit)
}

private[v2] case class KeggFlatPartition(file: String, start: Long, length: Long)
    extends InputPartition

private[v2] class KeggFlatReaderFactory(
    required: StructType, offsetLo: Long, offsetHi: Long,
    aggSpecs: Option[Seq[KeggAgg]] = None, limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    aggSpecs match {
      case Some(specs) =>
        new KeggFlatAggReader(p.asInstanceOf[KeggFlatPartition], specs,
          offsetLo, offsetHi)
      case None =>
        // per-split limit: the reader stops walking frames after `limit`
        // emitted records (the global cut happens in Spark's Limit above)
        new KeggFlatReader(p.asInstanceOf[KeggFlatPartition], required,
          offsetLo, offsetHi, limit.map(_.toLong).getOrElse(Long.MaxValue))
    }
}

/** Split-local partial aggregation: wraps the frame-walking reader with an
  * offset-only pruned schema (record strings never materialize) and emits
  * ONE row per split — (count / min / max) in the pushed order, min/max
  * NULL for an empty split (Spark's final merge ignores nulls; a 0 count
  * sums correctly). */
private[v2] class KeggFlatAggReader(
    part: KeggFlatPartition, specs: Seq[KeggAgg],
    offsetLo: Long, offsetHi: Long)
    extends PartitionReader[InternalRow] {
  private val inner = new KeggFlatReader(part,
    StructType(Seq(StructField("offset", LongType, nullable = false))),
    offsetLo, offsetHi)
  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    var n = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    while (inner.next()) {
      val off = inner.get().getLong(0)
      n += 1
      if (off < mn) mn = off
      if (off > mx) mx = off
    }
    row = InternalRow.fromSeq(specs.map {
      case KeggCountStar => java.lang.Long.valueOf(n)
      case KeggMinOffset => if (n == 0) null else java.lang.Long.valueOf(mn)
      case KeggMaxOffset => if (n == 0) null else java.lang.Long.valueOf(mx)
    })
    done = true
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = inner.close()
}

/** Streams one byte-range split in a single buffered pass, O(one record)
  * memory: record bytes accumulate only while a record is being assembled
  * and only if the `record` column survived pruning.
  *
  * Framing contract: a delimiter is a line that is exactly `///`; the
  * frame after it starts at the byte following its newline. A frame whose
  * content is all whitespace emits no row (both in pruned and unpruned
  * mode — `hasContent` is tracked on raw bytes so the row COUNT never
  * depends on pruning). A record belongs to the split containing its
  * frame's first byte.
  */
private[v2] class KeggFlatReader(
    part: KeggFlatPartition, required: StructType,
    offsetLo: Long = Long.MinValue, offsetHi: Long = Long.MaxValue,
    limit: Long = Long.MaxValue)
    extends PartitionReader[InternalRow] {

  /** Records emitted so far — the pushed-limit budget (per split). */
  private var emitted: Long = 0L

  private val needRecord = required.fieldNames.contains("record")
  private val fieldGetters: Array[(Long, String) => Any] =
    required.fields.map { f =>
      f.name match {
        case "offset" => (off: Long, _: String) => java.lang.Long.valueOf(off)
        case "file" => (_: Long, _: String) => UTF8String.fromString(part.file)
        case "record" => (_: Long, rec: String) => UTF8String.fromString(rec)
      }
    }

  private val hPath = new Path(part.file)
  private val fs = hPath.getFileSystem(new Configuration())
  private val fileLen = fs.getFileStatus(hPath).getLen
  private val in = new java.io.BufferedInputStream(fs.open(hPath), 64 * 1024)
  private val splitEnd = part.start + part.length

  /** Absolute offset of the next unread byte. */
  private var pos: Long = 0L

  // Align to the first frame owned by this split. Split 0 owns the frame
  // at byte 0. Any other split seeks back far enough to see a "\n///\n"
  // delimiter whose END lands exactly on its start byte (5 bytes), then
  // scans forward for the first delimiter line ending at or after
  // `start`; the frame it opens is this split's first. A candidate only
  // counts when its preceding byte is a newline (or it sits at file
  // offset 0) — a content line merely ENDING in /// is not framing.
  locally {
    if (part.start == 0L) { skipFully(0L) }
    else {
      val from = math.max(0L, part.start - 5)
      skipFully(from)
      var boundary = -1L
      // last 5 bytes read, as a rolling window; window(4) is newest
      val w = Array.fill(5)(-1)
      var b = read()
      while (boundary < 0 && b >= 0) {
        System.arraycopy(w, 1, w, 0, 4); w(4) = b
        val delimLine = w(1) == '/' && w(2) == '/' && w(3) == '/' && w(4) == '\n' &&
          (w(0) == '\n' || pos - 4 == 0L)
        if (delimLine && pos >= part.start) boundary = pos
        else b = read()
      }
      if (boundary < 0) pos = fileLen // no boundary in range: nothing here
    }
  }

  private var current: InternalRow = _
  private val buf = new java.io.ByteArrayOutputStream()
  private var line = new Array[Byte](256)
  private var lineLen = 0

  override def next(): Boolean = {
    if (emitted >= limit) return false
    while (pos < splitEnd && pos < fileLen) {
      val frameStart = pos
      // frames arrive in increasing offset order: past the pushed upper
      // bound nothing later in this split can qualify — stop scanning
      if (frameStart > offsetHi) return false
      // below the lower bound the frame must still be WALKED (boundaries
      // are data-dependent) but never materialized or emitted
      val emit = frameStart >= offsetLo
      buf.reset()
      var hasContent = false
      var sawDelim = false
      var atEof = false
      while (!sawDelim && !atEof) {
        val got = readLine()
        if (!got) atEof = true
        else if (isDelimLine) sawDelim = true
        else {
          var i = 0
          while (!hasContent && i < lineLen) {
            val c = line(i)
            if (c != ' ' && c != '\t' && c != '\r') hasContent = true
            i += 1
          }
          if (needRecord && emit) { buf.write(line, 0, lineLen); buf.write('\n') }
        }
      }
      if (hasContent && emit) {
        val rec =
          if (needRecord)
            buf.toString("UTF-8").replaceAll("^\\s+|\\s+$", "")
          else ""
        current = InternalRow.fromSeq(
          fieldGetters.map(g => g(frameStart, rec)).toIndexedSeq)
        emitted += 1
        return true
      }
      // all-whitespace frame: fall through and try the next frame
    }
    false
  }

  /** Reads one `\n`-terminated line into `line`/`lineLen` (terminator
    * consumed, not stored). False when EOF arrived before any byte.
    * Advances `pos`. */
  private def readLine(): Boolean = {
    if (pos >= fileLen) return false
    lineLen = 0
    var b = read()
    if (b < 0) return false
    while (b >= 0 && b != '\n') {
      if (lineLen == line.length) line = util.Arrays.copyOf(line, line.length * 2)
      line(lineLen) = b.toByte
      lineLen += 1
      b = read()
    }
    true
  }

  /** The current line is a delimiter iff it is exactly `///` (strict LF
    * framing — matches the split-alignment scan above). */
  private def isDelimLine: Boolean =
    lineLen == 3 && line(0) == '/' && line(1) == '/' && line(2) == '/'

  private def read(): Int = {
    val b = in.read()
    if (b >= 0) pos += 1
    b
  }

  private def skipFully(target: Long): Unit = {
    var remaining = target - pos
    while (remaining > 0) {
      val skipped = in.skip(remaining)
      if (skipped <= 0) { if (in.read() < 0) return else remaining -= 1 }
      else remaining -= skipped
    }
    pos = target
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

// ---- write surface (SupportsWrite: the sink side of the format) --------

/** DSv2 BATCH WRITE for the kegg-flat format — the sink half of the
  * source API (SupportsWrite + TRUNCATE): each task streams its rows as
  * `record\n///\n` frames into a task-private `.tmp` file (task attempts
  * are isolated, so speculative/retried attempts never interleave), the
  * task commit message carries the tmp path, and the DRIVER commit
  * renames every tmp to its final `part-NNNNN.flat` name — an
  * all-or-nothing publish with abort cleaning tmps (no half-visible
  * output under retries). Truncate (SaveMode.Overwrite) deletes prior
  * `.flat` files inside the driver commit, after all tasks succeeded.
  * Written files round-trip through the byte-range-splittable reader
  * (property: read(write(df)) ≡ df.records — KeggFlatSourceSpec + the
  * s12_dsv2_write oracle row). */
private[v2] class KeggFlatWriteBuilder(path: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write = {
    val t = doTruncate
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new KeggFlatBatchWrite(path, t)
    }
  }
}

private[v2] case class KeggFlatCommit(tmpPath: String)
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[v2] class KeggFlatBatchWrite(path: String, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  // job-unique suffix so an APPEND can never collide with (and silently
  // replace) a prior job's part files of the same index
  private val jobId = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new KeggFlatWriterFactory(path)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(new Configuration())
    if (!fs.exists(root)) fs.mkdirs(root)
    if (truncate)
      fs.listStatus(root).filter(s => s.isFile &&
          s.getPath.getName.endsWith(".flat"))
        .foreach(s => fs.delete(s.getPath, false))
    messages.zipWithIndex.foreach {
      case (KeggFlatCommit(tmp), i) =>
        fs.rename(new Path(tmp), new Path(root, f"part-$i%05d-$jobId.flat"))
      case _ => ()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    messages.foreach {
      case KeggFlatCommit(tmp) => fs.delete(new Path(tmp), false)
      case _ => ()
    }
  }
}

private[v2] class KeggFlatWriterFactory(path: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new KeggFlatDataWriter(path, partitionId, taskId)
}

/** Streams frames to a task-private tmp file; rows where `record` is NULL
  * are skipped (a NULL frame has no representation in the format). */
private[v2] class KeggFlatDataWriter(path: String, partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val tmp = new Path(path,
    f".part-$partitionId%05d-$taskId.flat.tmp")
  private val fs = tmp.getFileSystem(new Configuration())
  private val out = new java.io.BufferedOutputStream(fs.create(tmp, true), 64 * 1024)

  override def write(row: InternalRow): Unit =
    if (!row.isNullAt(0)) {
      out.write(row.getUTF8String(0).toString.getBytes("UTF-8"))
      out.write("\n///\n".getBytes("UTF-8"))
    }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    KeggFlatCommit(tmp.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tmp, false)
  }

  override def close(): Unit = ()
}
