package graft


/** Dev tool: print the formatted physical plan of registered queries —
  * used to audit pushdown (PushedFilters/ReadSchema), join strategies
  * (broadcast vs sort-merge) and exchange reuse. Usage:
  *   runMain graft.Explain <sfDir> <queryName> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // the shared builder (Sessions) so plan audits always run under the
    // exact configs Verify/Bench use — a bespoke builder here drifted
    // once (missing the NTZ-inference setting) and broke only this tool
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
