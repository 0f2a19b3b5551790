package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query; queries with ANSI-SQL-expressible semantics also carry a
  * DuckDB oracle (hash-compared by the driver at sf0.01).
  */
object SparkEntry {

  /** All registered queries, in registry order. */
  def registry: Seq[Q] =
    CoreQueries.all ++ TpchQueries.all ++ PipelineQueries.all ++ IntegrationQueries.all ++
      EdgeMergeQueries.all ++
      RegulationQueries.all ++ NodeBuilderQueries.all ++
      GraphQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimQueries.all ++ SourceQueries.all ++
      TrainPrepQueries.all ++ EventQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full PPI-analog integration pipeline (SURVEY §7.1 step 3). */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.ppiFlagship.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val names = registry.map(_.name)
    require(names.distinct.size == names.size,
      "duplicate query names: " +
        names.diff(names.distinct).distinct.mkString(", "))
    registry.map(q => q.name -> q.fn).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
