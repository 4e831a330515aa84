package graft

import org.apache.spark.sql.SparkSession

/** Dev aid: dumps formatted physical plans for representative queries
  * so scan pushdown / join strategy / codegen coverage can be
  * inspected (run: sbt "runMain graft.PlanCheck [names...]").
  *
  * Checked invariants (see COVERAGE.md §plans): PushedFilters reach
  * the parquet scan, ReadSchema is pruned to referenced columns,
  * small dims build BroadcastHashJoin, global top-k plans
  * TakeOrderedAndProject (never a full sort), aggregations carry
  * partial_* (map-side combine) before the exchange.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE wraps any exchange-bearing plan in AdaptiveSparkPlanExec,
      // whose codegen stages only materialize at execution — a
      // plan.collect sees ZERO WholeStageCodegenExec nodes, so with
      // AQE on the sweep silently force-compiled only map-only plans.
      // The generated constructs are the same either way; compiling
      // the non-adaptive plan covers every stage.
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if (args.headOption.contains("--codegen-sweep")) {
      // force-compile every query's WholeStageCodegen sources with
      // Janino: an incompatible construct otherwise only WARNs at run
      // time and silently degrades to interpreted execution (this is
      // how the TopBigramCount Long::sum fallback was caught).
      // Queries that run side-effecting snapshot commits during plan
      // construction are skipped — the gate runs them.
      val sideEffecting = Set("q110_zorder_box", "q111_zorder_partitioned",
        "q135_optimize_incremental")
      graft.functions.VectorFunctions.register(spark)
      var bad = 0
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot(q => q._1.startsWith("ev") || sideEffecting(q._1))
        .foreach { case (n, fn) =>
          try {
            val plan = fn(spark, dir).queryExecution.executedPlan
            val stages = org.apache.spark.sql.graftbridge.CodegenBridge.compileWholeStage(plan)
            println(s"[codegen] $n: $stages stage(s) compiled")
          } catch { case e: Throwable =>
            bad += 1
            println(s"[codegen] $n FAILED: ${String.valueOf(e).take(300)}")
          }
        }
      println(s"[codegen] sweep done, $bad failure(s)")
      if (bad > 0) {
        // a CI/gate invocation must SEE the regression — the whole
        // point of the sweep is that a codegen fallback is otherwise a
        // silent WARN
        spark.stop()
        sys.exit(1)
      }
    } else {
      val names = if (args.nonEmpty) args.toSeq
        else Seq("q01_tpch_q1", "q02_scan_projection", "q04_broadcast_join",
          "q05_join_agg_topk", "q09_range_join_bands", "q18_topk")
      names.foreach { n =>
        println(s"\n========== $n ==========")
        SparkEntry.queries(n)(spark, dir).explain("formatted")
      }
    }
    spark.stop()
  }
}
