package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke: every registered query runs at sf0.001 and returns rows (the
  * full value-level gate is the DuckDB oracle — scripts/check_oracle.py
  * locally, the driver's Verify+DuckDB compare per round). */
class QueriesSmokeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and returns rows at sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key is a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
