package graft.queries

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** Pipeline observability: `observe()` metrics ride the SAME action as
  * the query (no second scan) — the mechanism a production job uses to
  * publish row counts / quality gauges per run without paying an extra
  * aggregation pass. At 100 TB a separate metrics query would rescan the
  * fact table; an observation is free. */
class ObservabilitySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("observe() collects exact counts and sums on the main action, and " +
    "agrees with the dedicated aggregate") {
    val obs = Observation("ingest-metrics")
    val events = Tables.events(spark, sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        count(when(col("value").isNull, lit(1))).as("n_null_value"),
        sum((col("value").cast("decimal(18,4)") * 10000).cast("long"))
          .as("sum_vq"))
    // one action drives BOTH the query result and the metrics
    val total = events.filter(col("event_type") === "purchase").count()
    val m = obs.get
    val expected = Tables.events(spark, sf)
      .agg(count(lit(1)),
        sum((col("value").cast("decimal(18,4)") * 10000).cast("long")))
      .head()
    assert(m("n_rows") === expected.getLong(0))
    assert(m("n_null_value") === 0L)
    assert(m("sum_vq") === expected.getLong(1))
    assert(total > 0)
  }

  test("a second action re-observes fresh metrics on a new Observation") {
    val obs = Observation()
    val df = Tables.nation(spark, sf).observe(obs, count(lit(1)).as("n"))
    df.count()
    assert(obs.get("n") === Tables.nation(spark, sf).count())
  }
}
