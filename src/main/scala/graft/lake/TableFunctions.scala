package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

/** Table-valued SQL functions over registered snapshot tables —
  * the Delta `table_changes` surface, injected via
  * `SparkSessionExtensions.injectTableFunction`:
  *
  *   SELECT * FROM table_changes('fact', 2, 5)   -- (v2, v5] deltas
  *   SELECT * FROM table_changes('fact', 2)      -- v2 → latest
  *
  * The TVF expands at resolution time into the same logical plan
  * [[SnapshotTable.changes]] builds (manifest-diff-scoped IO, DV
  * position deltas, compact-skip) — no new execution path, just the
  * SQL spelling of the existing change feed. */
object TableFunctions {

  def tableChanges(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2 || exprs.length == 3,
      "table_changes(table_name, from_version[, to_version])")
    def constOf(e: Expression, what: String): Any = {
      require(e.foldable, s"table_changes: $what must be a constant")
      e.eval()
    }
    val name = constOf(exprs(0), "table_name") match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"table_changes: table_name must be a string, got $other")
    }
    def longOf(e: Expression, what: String): Long = constOf(e, what) match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"table_changes: $what must be an integer, got $other")
    }
    val spark = SparkSession.active
    val path = SnapshotCatalog.pathOf(name).getOrElse(
      throw new IllegalArgumentException(
        s"table_changes: unknown snapshot table '$name' — register it " +
          "via SnapshotCatalog.register or CREATE TABLE ... USING graft-snapshot"))
    val from = longOf(exprs(1), "from_version")
    val to =
      if (exprs.length == 3) longOf(exprs(2), "to_version")
      else SnapshotTable.latestVersion(spark, path).getOrElse(
        throw new IllegalArgumentException(s"no committed version at $path"))
    SnapshotTable.changes(spark, path, from, to).queryExecution.analyzed
  }
}
