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

  // The driver's oracle harness sorts both result frames with pandas before
  // hashing; an Array/Map cell crashes that sort (TypeError: unhashable
  // type) and reds the gate regardless of semantics — it happened to
  // x_media_decode in round 1 and to three node builders in round 3. Every
  // registered query must flatten multi-valued props (Q.pipeBoundary: the
  // reference's own pipe-join CSV codec, drug.py:1370).
  test("no registered query emits Array/Map top-level columns") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val bad = graft.Q.complexCols(q.fn(spark, sf))
      if (bad.isEmpty) None else Some(s"${q.name}: ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty,
      s"oracle-unsortable columns (wrap with Q.pipeBoundary): " +
        offenders.mkString("; "))
  }
}
