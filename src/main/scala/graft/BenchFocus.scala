package graft
import org.apache.spark.sql.SparkSession

/** Focused repeat-measurement harness: time a subset of registered queries
  * N times each in one warmed JVM. Usage:
  *   runMain graft.BenchFocus <sfDir> <reps> <query>[,<query>...]
  * Prints one line per (query, rep) plus a median summary — the tool for
  * separating real plan regressions from single-run JIT/GC noise.
  */
object BenchFocus {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, repsS, names) = args
    val reps = repsS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val picked = names.split(",").toSeq
    val times = picked.map { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[focus] $n rep$r: $dt%.2f s")
        dt
      }
      n -> ts.sorted.apply(reps / 2)
    }
    times.foreach { case (n, med) => println(f"[focus] MEDIAN $n: $med%.2f s") }
    spark.stop()
  }
}
