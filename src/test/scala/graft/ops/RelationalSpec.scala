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

  test("percentile_approx lands within 1% of exact percentiles") {
    import org.apache.spark.sql.functions._
    val exact = graft.model.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    Relational.approxPercentiles(spark, sf0001).collect().foreach { r =>
      val (w50, w90) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - w50) / w50 <= 0.01, s"p50 off: ${r.getDouble(1)} vs $w50")
      assert(math.abs(r.getDouble(2) - w90) / w90 <= 0.01, s"p90 off: ${r.getDouble(2)} vs $w90")
    }
  }
}
