package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Run-over-run metric history + drift detection — the anomaly-check
  * half of the Deequ shape: every VerificationSuite run can append
  * its metrics (keyed by a caller tag, e.g. the processing date), and
  * later runs assert each metric stayed within a relative tolerance
  * of the previous run. Catches the silent failures a single-run
  * check can't (e.g. row count halves but every constraint still
  * passes).
  *
  * Storage is plain append-mode parquet — same durability story as
  * the lake layers, readable by any engine.
  */
object MetricsRepository {

  /** Append one run's constraint metrics. */
  def append(spark: SparkSession, path: String, runTag: String,
      result: VerificationResult): Unit = {
    import spark.implicits._
    val rows = for {
      cr <- result.checkResults
      c <- cr.results
    } yield (runTag, cr.description, c.constraint, c.metric, c.success)
    rows.toDF("run_tag", "check", "constraint", "metric", "success")
      .repartition(1)
      .write.mode("append").parquet(path)
  }

  def history(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  final case class Drift(constraint: String, previous: Double, current: Double,
      relativeChange: Double)

  /** Compare a run against the latest earlier run (by tag ordering);
    * returns constraints whose metric moved more than `tolerance`
    * relatively. Empty history → no drift. */
  def driftFrom(spark: SparkSession, path: String, currentTag: String,
      tolerance: Double): Seq[Drift] = {
    import spark.implicits._
    val h = history(spark, path)
    val prevTag = h.filter(col("run_tag") < currentTag)
      .agg(max("run_tag")).head().getString(0)
    if (prevTag == null) return Nil
    val prev = h.filter(col("run_tag") === prevTag)
      .select(col("constraint"), col("metric").as("previous"))
    val cur = h.filter(col("run_tag") === currentTag)
      .select(col("constraint"), col("metric").as("current"))
    prev.join(cur, "constraint")
      .withColumn("rel",
        abs(col("current") - col("previous")) /
          greatest(abs(col("previous")), lit(1e-12)))
      .filter(col("rel") > tolerance)
      .select(col("constraint"), col("previous"), col("current"), col("rel"))
      .as[(String, Double, Double, Double)]
      .collect()
      .map(t => Drift(t._1, t._2, t._3, t._4))
      .toSeq
  }
}
