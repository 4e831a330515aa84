package graft.ops

import graft.SparkTestBase
import graft.SparkEntry

/** Sanity: every cataloged query runs and returns rows at sf0.001.
  * (Value-level correctness is the DuckDB oracle gate's job —
  * tools/check_oracle.py replicates it locally.) */
class RelationalSpec extends SparkTestBase {

  Relational.catalog.foreach { q =>
    test(s"${q.name} executes and returns rows at sf0.001") {
      val n = q.fn(spark, sf0001).count()
      assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("every query has a unique name and every oracle key exists") {
    val defs = SparkEntry.allDefs
    val names = SparkEntry.queries.keySet
    assert(names.size === defs.size, "duplicate query names would drop entries")
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
  }

  test("entry() returns rows (driver t1 smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct lands within 5% of exact") {
    Relational.approxDistinct(spark, sf0001).collect().foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx=$approx exact=$exact for ${r.getString(0)}")
    }
  }
}
