package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.execution.GraftStreamingBridge
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.SnapshotTable

/** STREAMING change feed over the snapshot table —
  * `spark.readStream.format("graft-snapshot-cdf")` (options: `path`,
  * `keyCols` comma-separated, optional `startingVersion`) — the Delta
  * "readChangeFeed" streaming shape: table VERSIONS are the stream's
  * offsets, so each micro-batch is exactly the row-level changes of the
  * version window `(lastCommitted, latest]` computed by
  * [[SnapshotTable.changesBetween]] (O(changed partitions) per version
  * step, the snapshot never rescanned), and Structured Streaming's
  * offset log gives exactly-once delivery across restarts for free —
  * a replayed trigger re-reads the SAME version window from the
  * immutable manifests and produces the identical batch.
  *
  * First batch semantics: with no `startingVersion` the stream
  * BASELINES — the full snapshot at the first observed version arrives
  * as `insert` rows (the [[SnapshotTable.changesSinceOrRebase]] shape),
  * then incremental windows follow; with `startingVersion = v` the first
  * batch is the changes of `(v, latest]` (the consumer already holds
  * v's state). Vacuum past a checkpointed version fails the stream
  * LOUDLY through [[SnapshotTable.changesBetween]]'s manifest check —
  * retention (`keepVersions`) is the stream's downtime budget, the same
  * contract as the open table formats'.
  *
  * V1 [[Source]] rather than a DSv2 MicroBatchStream because the batch
  * is COMPUTED (per-version diffs are joins over manifest-selected
  * files), not read from static partitions — the V1 contract's
  * getBatch-returns-a-DataFrame is exactly that hook (the same reason
  * Delta's streaming source is V1). Schema is pinned at stream start
  * from the table's recorded schema header. */
class SnapshotCdfSource extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot-cdf"

  private def feedSchema(dir: String, keyCols: Seq[String]): StructType = {
    val v = SnapshotTable.currentVersion(dir)
    val table = SnapshotTable.schemaAt(dir, v).getOrElse(
      throw new IllegalArgumentException(
        s"table $dir (v$v) records no schema header — the stream needs " +
          "the recorded schema to pin its feed shape"))
    val missing = keyCols.filterNot(table.fieldNames.contains)
    require(missing.isEmpty,
      s"keyCols name columns the table does not have: ${missing.mkString(", ")}")
    val keys = keyCols.map(k => table(k))
    val vals = table.fields.filterNot(f => keyCols.contains(f.name)).toSeq
    StructType((StructField("change_type", StringType) +: (keys ++ vals)) :+
      StructField("change_version", LongType, nullable = false))
  }

  private def params(parameters: Map[String, String]): (String, Seq[String]) = {
    val dir = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot-cdf: 'path' (the table directory) is required"))
    val keys = parameters.getOrElse("keycols",
      parameters.getOrElse("keyCols", throw new IllegalArgumentException(
        "graft-snapshot-cdf: 'keyCols' (comma-separated key columns) is " +
          "required — the change feed diffs on them")))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    (dir, keys)
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (dir, keys) = params(parameters)
    (shortName(), feedSchema(dir, keys))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (dir, keys) = params(parameters)
    val starting = parameters.get("startingversion")
      .orElse(parameters.get("startingVersion")).map(_.toLong)
    new SnapshotCdfStream(sqlContext.sparkSession, dir, keys,
      feedSchema(dir, keys), starting)
  }
}

private[v2] class SnapshotCdfStream(spark: SparkSession, tableDir: String,
    keyCols: Seq[String], feedSchema: StructType,
    startingVersion: Option[Long]) extends Source {

  override def schema: StructType = feedSchema

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json().trim.toLong
  }

  override def getOffset: Option[Offset] = {
    val v = SnapshotTable.currentVersion(tableDir)
    if (v <= 0L) None else Some(LongOffset(v))
  }

  /** Column order pinned to [[schema]]; change_version stamped per step
    * by changesBetween, per-row lit for the baseline batch. */
  private def ordered(df: DataFrame): DataFrame =
    df.select(feedSchema.fieldNames.map(col).toSeq: _*)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = versionOf(end)
    val batch = start.map(versionOf).orElse(startingVersion) match {
      case Some(from) if from >= to =>
        // replay edge: nothing new in the window
        ordered(SnapshotTable.changesBetween(spark, tableDir, to, to, keyCols))
          .limit(0)
      case Some(from) =>
        ordered(SnapshotTable.changesBetween(spark, tableDir, from, to, keyCols))
      case None =>
        // baseline: the full snapshot AT the offered version as inserts
        val full = SnapshotTable.readAt(spark, tableDir, to)
        ordered(full
          .withColumn("change_type", lit("insert"))
          .withColumn("change_version", lit(to)))
    }
    GraftStreamingBridge.asStreaming(spark, batch)
  }

  override def stop(): Unit = ()
}
