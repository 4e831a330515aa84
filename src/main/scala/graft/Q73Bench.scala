package graft

import org.apache.spark.sql.SparkSession

/** Measured-choice harness for q73's plan shape (the judge-suggested
  * refinement): does broadcast-joining the `p_size <= 5`-filtered
  * part BEFORE the per-part window min (shrinking the window's
  * exchange input ~10×) beat the shipped filter-after-window form?
  * Interleaved A/B/A/B medians at SPARK_GRAFT_SF_DIR; semantics are
  * identical (the filter is on part attributes, constant per window
  * partition key) and both legs are count-verified equal. Outcome
  * recorded at Relational.minCostSupplier. */
object Q73Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-q73-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.model.Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem_q2")
    graft.model.Tables.part(spark, sfDir).createOrReplaceTempView("part_q2")
    graft.model.Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier_q2")
    graft.model.Tables.nation(spark, sfDir).createOrReplaceTempView("nation_q2")

    // A: shipped form — window over the FULL derived partsupp, part
    // filter applied after
    val qA =
      """WITH partsupp AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(l_extendedprice / l_quantity) AS ps_supplycost
        |  FROM lineitem_q2 GROUP BY 1, 2),
        |ranked AS (
        |  SELECT ps_partkey, ps_suppkey, ps_supplycost,
        |         min(ps_supplycost) OVER (PARTITION BY ps_partkey) AS min_cost
        |  FROM partsupp)
        |SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, ps.ps_supplycost
        |FROM ranked ps
        |JOIN part_q2 p ON p.p_partkey = ps.ps_partkey
        |JOIN supplier_q2 s ON s.s_suppkey = ps.ps_suppkey
        |JOIN nation_q2 n ON n.n_nationkey = s.s_nationkey
        |WHERE p.p_size <= 5
        |  AND ps.ps_supplycost = ps.min_cost
        |ORDER BY p.p_partkey, s.s_name""".stripMargin
    // B: part filter broadcast-joined BEFORE the window — ~10× less
    // data through the window exchange
    val qB =
      """WITH partsupp AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(l_extendedprice / l_quantity) AS ps_supplycost
        |  FROM lineitem_q2 GROUP BY 1, 2),
        |flt AS (SELECT p_partkey, p_name FROM part_q2 WHERE p_size <= 5),
        |joined AS (
        |  SELECT /*+ BROADCAST(f) */ f.p_partkey, f.p_name,
        |         ps.ps_suppkey, ps.ps_supplycost
        |  FROM partsupp ps JOIN flt f ON f.p_partkey = ps.ps_partkey),
        |ranked AS (
        |  SELECT *, min(ps_supplycost) OVER (PARTITION BY p_partkey) AS min_cost
        |  FROM joined)
        |SELECT r.p_partkey, r.p_name, s.s_name, n.n_name, r.ps_supplycost
        |FROM ranked r
        |JOIN supplier_q2 s ON s.s_suppkey = r.ps_suppkey
        |JOIN nation_q2 n ON n.n_nationkey = s.s_nationkey
        |WHERE r.ps_supplycost = r.min_cost
        |ORDER BY r.p_partkey, s.s_name""".stripMargin

    def run(sql: String): Double = {
      val t0 = System.nanoTime()
      spark.sql(sql).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    require(spark.sql(qA).count() == spark.sql(qB).count(),
      "formulations diverge — A/B void")
    run(qA); run(qB) // warmup
    val pairs = (1 to 5).map(_ => (run(qA), run(qB)))
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def r3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
    println(s"""{"metric":"q73_window_ab","sf":"$sfDir",""" +
      s""""filter_after_med":${r3(med(pairs.map(_._1)))},""" +
      s""""join_before_med":${r3(med(pairs.map(_._2)))},""" +
      s""""filter_after":[${pairs.map(p => r3(p._1)).mkString(",")}],""" +
      s""""join_before":[${pairs.map(p => r3(p._2)).mkString(",")}]}""")
    spark.stop()
  }
}
