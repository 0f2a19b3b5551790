package graft

import org.apache.spark.sql.SparkSession

/** Driver-smoke rehearsal: run `SparkEntry.entry` in a VANILLA session
  * (no engine-specific configs), exactly like the round driver does, and
  * assert rows > 0. Guards against `entry` accidentally depending on
  * session extensions / legacy-parquet configs only our own mains set. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows: $n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
