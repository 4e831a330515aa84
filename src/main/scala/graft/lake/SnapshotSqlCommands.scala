package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}
import org.apache.spark.sql.types.LongType

/** SQL-statement surface for registered snapshot tables — the
  * remaining Iceberg-v2 row-level syntax the reference's gold table
  * declares (`format-version=2`, reference
  * jobs/ev_sessions_gold_etl.py:147-149):
  *
  *   MERGE INTO t USING s ON t.k = s.k
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  *   DELETE FROM t WHERE p
  *
  * [[ResolveSnapshotRelation]] rewrites the parsed `MergeIntoTable` /
  * `DeleteFromTable` nodes into these runnable commands when the
  * target's single-part name is registered in [[SnapshotCatalog]];
  * Spark then executes them eagerly like any DDL/DML command. Each
  * returns the committed version as a one-row result. The MERGE form
  * supported is exactly [[SnapshotTable.merge]]'s semantics — full-row
  * upsert keyed by the ON equality columns; conditional or
  * column-level actions raise a clear error instead of silently
  * diverging.
  */
private[lake] object SnapshotSqlCommands {

  /** ON-clause → merge key columns: a conjunction of `t.c = s.c`
    * equalities (either side may be unqualified; both must name the
    * same column). */
  def keyColsOf(cond: Expression): Seq[String] = {
    def nameOf(e: Expression): Option[String] = e match {
      case u: UnresolvedAttribute => Some(u.nameParts.last)
      case a: Attribute           => Some(a.name)
      case _                      => None
    }
    cond match {
      case And(l, r) => keyColsOf(l) ++ keyColsOf(r)
      case EqualTo(l, r) =>
        (nameOf(l), nameOf(r)) match {
          case (Some(a), Some(b)) if a.equalsIgnoreCase(b) => Seq(a)
          case _ => throw new UnsupportedOperationException(
            s"snapshot MERGE ON clause must equate the same column on both sides, got: $l = $r")
        }
      case other => throw new UnsupportedOperationException(
        "snapshot MERGE ON clause must be a conjunction of column equalities, got: " + other.sql)
    }
  }
}

/** `MERGE INTO <registered> USING ... ON ... UPDATE SET * / INSERT *`
  * → [[SnapshotTable.merge]]. */
case class SnapshotMergeCommand(table: String, path: String,
    source: LogicalPlan, keyCols: Seq[String]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val src = DatasetBridge.ofRows(spark, source)
    Seq(Row(SnapshotTable.merge(src, path, keyCols)))
  }
}

/** Any other MERGE shape — conditional matched update/delete,
  * conditional insert, `WHEN NOT MATCHED BY SOURCE` — →
  * [[SnapshotTable.mergeClauses]]. Clause conditions/values ride as
  * Columns (see [[SnapshotUpdateCommand]]'s note) qualified by the
  * statement's own target/source aliases. */
case class SnapshotMergeClausesCommand(table: String, path: String,
    source: LogicalPlan, sourceAlias: String, keyCols: Seq[String],
    matched: Seq[MergeMatchedClause], notMatched: Seq[MergeInsert],
    notMatchedBySource: Seq[MergeMatchedClause],
    schemaEvolution: Boolean = false) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val src = DatasetBridge.ofRows(spark, source)
    Seq(Row(SnapshotTable.mergeClauses(src, path, keyCols,
      matched, notMatched, notMatchedBySource,
      targetAlias = table, sourceAlias = sourceAlias,
      schemaEvolution = schemaEvolution)))
  }
}

/** `UPDATE <registered> SET c = e, ... WHERE p` →
  * [[SnapshotTable.update]]. */
case class SnapshotUpdateCommand(table: String, path: String,
    assignments: Seq[(String, org.apache.spark.sql.Column)],
    condition: org.apache.spark.sql.Column) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(SnapshotTable.update(spark, path, assignments, condition,
      sqlAlias = Some(table))))
}

/** `DELETE FROM <registered> WHERE p` → [[SnapshotTable.delete]]. */
case class SnapshotDeleteCommand(table: String, path: String,
    condition: org.apache.spark.sql.Column) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(SnapshotTable.delete(spark, path, condition, sqlAlias = Some(table))))
}

/** `ALTER TABLE <registered> ADD CONSTRAINT n CHECK (e)` →
  * [[SnapshotTable.addCheckConstraint]] (validates existing rows,
  * then publishes a metadata-only commit). */
case class SnapshotAddConstraintCommand(table: String, path: String,
    name: String, conditionSql: String) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(SnapshotTable.addCheckConstraint(spark, path, name, conditionSql)))
}

/** `ALTER TABLE <registered> DROP CONSTRAINT [IF EXISTS] n` →
  * [[SnapshotTable.dropCheckConstraint]]. */
case class SnapshotDropConstraintCommand(table: String, path: String,
    name: String, ifExists: Boolean) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    if (ifExists && !SnapshotTable.checkConstraints(spark, path).contains(name))
      Seq(Row(SnapshotTable.latestVersion(spark, path).getOrElse(0L)))
    else
      Seq(Row(SnapshotTable.dropCheckConstraint(spark, path, name)))
}
