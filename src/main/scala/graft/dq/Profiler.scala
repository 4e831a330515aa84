package graft.dq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling + constraint suggestion — the remaining two
  * members of the Deequ family the reference's bundled dependency
  * ships (ColumnProfilerRunner / ConstraintSuggestionRunner,
  * reference `dependencies/deequ-2.0.10-spark-3.5.jar` + `pydeequ
  * .zip`, SURVEY.md §1): a profile is the per-column statistical
  * summary an operator reads before writing checks by hand, and
  * suggestions close the loop by DERIVING the checks from the
  * profile — the onboarding path for putting a new dataset under DQ
  * without reading it first.
  *
  * Scale shape: the whole profile is ONE fused aggregation job over
  * one scan (the VerificationSuite shared-scan discipline) —
  * completeness, distinct count, and numeric min/max/mean for every
  * column ride a single `df.agg(...)`. Distinct counts default to
  * HLL++ (`approx_count_distinct`, the only thing Deequ itself uses
  * at scale); `exactDistinct = true` switches to `count(DISTINCT)`
  * (Catalyst plans the multi-column distinct through one Expand —
  * rows × distinct-columns shuffle volume, the oracle-grade mode for
  * test scale). Suggestion adds at most ONE more bounded job: the
  * value list of a low-cardinality string column, collected only
  * AFTER the profile proved the cardinality bound. */
object Profiler {

  final case class ColumnProfile(column: String, dtype: String,
      completeness: Double, distinctCount: Long, rowCount: Long,
      minValue: Option[Double], maxValue: Option[Double],
      mean: Option[Double])

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  def profile(df: DataFrame,
      exactDistinct: Boolean = false): Seq[ColumnProfile] = {
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "cannot profile a zero-column frame")
    val aggs = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        avg(when(c.isNotNull, 1.0).otherwise(0.0)).as(s"__c_${f.name}"),
        (if (exactDistinct) countDistinct(c)
         else approx_count_distinct(c)).as(s"__d_${f.name}")) ++
        (if (isNumeric(f.dataType))
          Seq(min(c).cast("double").as(s"__mn_${f.name}"),
            max(c).cast("double").as(s"__mx_${f.name}"),
            avg(c.cast("double")).as(s"__av_${f.name}"))
        else Nil)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(row.fieldIndex("__n"))
    def dbl(name: String): Double = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) Double.NaN else row.getDouble(i)
    }
    def dblOpt(name: String): Option[Double] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getDouble(i))
    }
    fields.map { f =>
      ColumnProfile(f.name, f.dataType.simpleString,
        dbl(s"__c_${f.name}"),
        row.getLong(row.fieldIndex(s"__d_${f.name}")), n,
        if (isNumeric(f.dataType)) dblOpt(s"__mn_${f.name}") else None,
        if (isNumeric(f.dataType)) dblOpt(s"__mx_${f.name}") else None,
        if (isNumeric(f.dataType)) dblOpt(s"__av_${f.name}") else None)
    }
  }

  final case class Suggestion(column: String, suggestion: String,
      detail: String)

  /** Derive checks from a profile — deterministic rules, stated here
    * because the q140 oracle re-encodes them in SQL:
    *  - completeness == 1.0            → isComplete
    *  - complete AND distinct == rows  → isUnique
    *  - numeric AND min >= 0           → isNonNegative
    *  - string AND 1 <= distinct <= maxDomain
    *                                   → isContainedIn(sorted values)
    * Every suggested constraint holds BY CONSTRUCTION on the frame it
    * was derived from (the q140 gate re-verifies that through
    * VerificationSuite anyway — a rule/constraint semantics drift
    * would fail loudly there, not ship silently). */
  def suggestConstraints(df: DataFrame, maxDomain: Int = 8)
      : Seq[(Suggestion, Constraint)] = {
    val profs = profile(df, exactDistinct = true)
    val stringCols = df.schema.fields
      .filter(_.dataType == StringType).map(_.name).toSet
    profs.sortBy(_.column).flatMap { p =>
      val complete =
        if (p.completeness == 1.0)
          Seq((Suggestion(p.column, "isComplete", ""),
            Constraints.isComplete(p.column)))
        else Nil
      val unique =
        if (p.completeness == 1.0 && p.distinctCount == p.rowCount)
          Seq((Suggestion(p.column, "isUnique", ""),
            Constraints.isUnique(p.column)))
        else Nil
      val nonNeg =
        if (p.minValue.exists(_ >= 0))
          Seq((Suggestion(p.column, "isNonNegative", ""),
            Constraints.isNonNegative(p.column)))
        else Nil
      val contained =
        if (stringCols(p.column) && p.distinctCount >= 1 &&
            p.distinctCount <= maxDomain) {
          // bounded by construction: the profile just proved
          // cardinality <= maxDomain, so this collect is <= maxDomain
          // short strings
          val values = df.select(col(p.column)).na.drop()
            .distinct().orderBy(col(p.column))
            .collect().map(_.getString(0)).toSeq
          Seq((Suggestion(p.column, "isContainedIn", values.mkString(",")),
            Constraints.isContainedIn(p.column, values)))
        } else Nil
      complete ++ unique ++ nonNeg ++ contained
    }
  }
}
