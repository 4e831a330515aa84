package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native data-quality engine with the shape of the reference's Deequ
  * usage (reference jobs/ev_sessions_silver_etl_clean.py:135-164):
  * a Check accumulates constraints; VerificationSuite compiles every
  * scan-expressible constraint into ONE DataFrame aggregation (single
  * pass over the data, map-side combinable — scales to any input
  * size), plus one groupBy job per grouping constraint (uniqueness).
  *
  * Metric semantics preserved from Deequ (documented in SURVEY.md
  * §3/E3), including the NULL divergences vs the row-level rules:
  *  - isNonNegative passes NULL values (row rule `distance` fires on
  *    NULL — both behaviors are kept, in their respective layers);
  *  - isComplete is the fraction of non-null values;
  *  - isContainedIn passes NULL values (Deequ's predicate is
  *    `col IS NULL OR col IN (...)`; presence is isComplete's job);
  *  - uniqueness is the fraction of rows whose value occurs exactly
  *    once.
  */
sealed trait CheckLevel
object CheckLevel {
  case object Error extends CheckLevel
  case object Warning extends CheckLevel
}

/** One constraint = a named metric + an assertion over it.
  * `metricExpr` is Some(aggregate Column) for scan constraints (fused
  * into the shared single-pass agg); `grouping` is Some(column name)
  * for constraints needing a per-value groupBy (uniqueness).
  */
final case class Constraint(
    name: String,
    metricExpr: Option[Column],
    grouping: Option[String],
    assertion: Double => Boolean)

object Constraints {
  private def fraction(cond: Column): Column =
    avg(when(cond, 1.0).otherwise(0.0))

  def isComplete(c: String): Constraint =
    Constraint(s"Completeness($c)", Some(fraction(col(c).isNotNull)), None, _ == 1.0)

  /** NULL values are compliant (Deequ isNonNegative semantics). */
  def isNonNegative(c: String): Constraint =
    Constraint(s"NonNegative($c)", Some(fraction(col(c).isNull || col(c) >= 0)), None, _ == 1.0)

  /** NULL values are compliant (Deequ's isContainedIn predicate is
    * `col IS NULL OR col IN (...)`; completeness is a separate check). */
  def isContainedIn(c: String, domain: Seq[String]): Constraint =
    Constraint(s"ContainedIn($c)", Some(fraction(col(c).isNull || col(c).isin(domain: _*))), None, _ == 1.0)

  def isUnique(c: String): Constraint =
    Constraint(s"Uniqueness($c)", None, Some(c), _ == 1.0)

  def hasMin(c: String, assertion: Double => Boolean): Constraint =
    Constraint(s"Minimum($c)", Some(min(col(c)).cast("double")), None, assertion)

  def hasMax(c: String, assertion: Double => Boolean): Constraint =
    Constraint(s"Maximum($c)", Some(max(col(c)).cast("double")), None, assertion)

  def hasMean(c: String, assertion: Double => Boolean): Constraint =
    Constraint(s"Mean($c)", Some(avg(col(c))), None, assertion)

  def satisfies(predicate: Column, name: String): Constraint =
    Constraint(s"Compliance($name)", Some(fraction(predicate)), None, _ == 1.0)

  /** Fraction of non-null values matching an anchored regex; NULLs
    * are non-compliant (a pattern check implies presence). */
  def hasPattern(c: String, regex: String,
      assertion: Double => Boolean = _ == 1.0): Constraint =
    Constraint(s"Pattern($c)", Some(fraction(col(c).rlike(regex))), None, assertion)

  /** Row count as a metric (Deequ Size) — rides the fused scan pass.
    * Mostly useful with a [[MetricsRepository]] history: a batch whose
    * volume halves passes every fraction check but fails size drift. */
  def hasSize(assertion: Double => Boolean = _ >= 0): Constraint =
    Constraint("Size", Some(count(lit(1)).cast("double")), None, assertion)
}

final case class Check(
    level: CheckLevel,
    description: String,
    constraints: Seq[Constraint] = Nil) {
  def isComplete(c: String): Check = add(Constraints.isComplete(c))
  def isNonNegative(c: String): Check = add(Constraints.isNonNegative(c))
  def isContainedIn(c: String, domain: Seq[String]): Check = add(Constraints.isContainedIn(c, domain))
  def isUnique(c: String): Check = add(Constraints.isUnique(c))
  def satisfies(predicate: Column, name: String): Check = add(Constraints.satisfies(predicate, name))
  def hasPattern(c: String, regex: String): Check = add(Constraints.hasPattern(c, regex))
  def hasSize(assertion: Double => Boolean): Check = add(Constraints.hasSize(assertion))
  def add(c: Constraint): Check = copy(constraints = constraints :+ c)
}

final case class ConstraintResult(constraint: String, metric: Double, success: Boolean)
final case class CheckResult(description: String, level: CheckLevel, results: Seq[ConstraintResult]) {
  def success: Boolean = results.forall(_.success)
}
final case class VerificationResult(checkResults: Seq[CheckResult]) {
  /** "Success" | "Warning" | "Error" — mirrors the driver-side gate
    * the reference applies to vr.status. */
  def status: String = {
    val failed = checkResults.filterNot(_.success)
    if (failed.isEmpty) "Success"
    else if (failed.exists(_.level == CheckLevel.Error)) "Error"
    else "Warning"
  }
}

object VerificationSuite {

  def run(df: DataFrame, checks: Seq[Check]): VerificationResult = {
    val all = checks.flatMap(_.constraints)

    // One fused aggregation job for every scan constraint — N metrics,
    // one pass (the Deequ shared-scan optimization).
    val scanCs = all.filter(_.metricExpr.isDefined)
    val scanMetrics: Map[String, Double] =
      if (scanCs.isEmpty) Map.empty
      else {
        val aggs = scanCs.zipWithIndex.map { case (c, i) => c.metricExpr.get.as(s"m$i") }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        scanCs.zipWithIndex.map { case (c, i) =>
          c.name -> (if (row.isNullAt(i)) Double.NaN else row.getDouble(i))
        }.toMap
      }

    // One groupBy job per distinct uniqueness column. The groupBy
    // shuffles on the checked column — partial aggregation keeps the
    // shuffle proportional to distinct values, not rows.
    val groupCols = all.flatMap(_.grouping).distinct
    val groupMetrics: Map[String, Double] = groupCols.map { c =>
      val counts = df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      val r = counts.agg(
        sum(when(col("cnt") === 1, col("cnt")).otherwise(lit(0L))).as("uniq"),
        sum(col("cnt")).as("total")).head()
      val metric =
        if (r.isNullAt(1) || r.getLong(1) == 0L) Double.NaN
        else r.getLong(0).toDouble / r.getLong(1).toDouble
      c -> metric
    }.toMap

    val results = checks.map { check =>
      CheckResult(check.description, check.level, check.constraints.map { c =>
        val metric = c.grouping match {
          case Some(g) => groupMetrics(g)
          case None    => scanMetrics(c.name)
        }
        ConstraintResult(c.name, metric, !metric.isNaN && c.assertion(metric))
      })
    }
    VerificationResult(results)
  }
}
