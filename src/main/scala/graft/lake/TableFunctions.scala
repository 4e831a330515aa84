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
  *   SELECT * FROM table_changes('fact', '2026-01-01 00:00:00', ...)
  *     -- TIMESTAMP bounds (Delta's form): start = changes committed
  *     -- AT OR AFTER the timestamp, end = last commit at or before
  *     -- it; numbers and timestamps mix freely per argument
  *
  * The TVF expands at resolution time into the same logical plan
  * [[SnapshotTable.changes]] builds (manifest-diff-scoped IO, DV
  * position deltas, compact-skip) — no new execution path, just the
  * SQL spelling of the existing change feed. */
object TableFunctions {

  def tableChanges(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length >= 2 && exprs.length <= 4,
      "table_changes(table_name, from_version_or_ts[, to_version_or_ts" +
        "[, include_row_ids]])")
    def constOf(e: Expression, what: String): Any = {
      require(e.foldable, s"table_changes: $what must be a constant")
      e.eval()
    }
    val name = constOf(exprs(0), "table_name") match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"table_changes: table_name must be a string, got $other")
    }
    val spark = SparkSession.active
    val path = SnapshotCatalog.pathOf(name).getOrElse(
      throw new IllegalArgumentException(
        s"table_changes: unknown snapshot table '$name' — register it " +
          "via SnapshotCatalog.register or CREATE TABLE ... USING graft-snapshot"))
    def latest: Long = SnapshotTable.latestVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $path"))
    // a timestamp bound resolves through commit times; which edge it
    // snaps to depends on the argument position (see the class doc)
    def tsOf(e: Expression, v: Any): Option[Long] = e.dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        Some(v.asInstanceOf[Long] / 1000L)
      case _ => v match {
        case s: UTF8String if s.toString.exists(!_.isDigit) =>
          Some(graft.sources.StartingTimestamp.millis(s.toString))
        case _ => None
      }
    }
    def boundOf(e: Expression, what: String, start: Boolean): Long = {
      val v = constOf(e, what)
      tsOf(e, v) match {
        case Some(ms) =>
          if (start)
            // exclusive from = (first version at/after ts) - 1
            SnapshotTable.firstVersionAtOrAfter(spark, path, ms)
              .getOrElse(latest + 1) - 1
          else SnapshotCatalog.versionAsOf(spark, path, ms)
        case None => v match {
          case n: java.lang.Number => n.longValue()
          case s: UTF8String => s.toString.toLong
          case other => throw new IllegalArgumentException(
            s"table_changes: $what must be a version number or timestamp, got $other")
        }
      }
    }
    val from = boundOf(exprs(1), "from_version", start = true)
    val to =
      if (exprs.length >= 3) boundOf(exprs(2), "to_version", start = false)
      else latest
    // optional 4th arg: carry the stable `_row_id` column (requires a
    // row-tracking table) — the SQL spelling of
    // changes(..., includeRowIds = true)
    val includeRowIds = exprs.length == 4 && (constOf(exprs(3),
        "include_row_ids") match {
      case b: java.lang.Boolean => b.booleanValue()
      case s: UTF8String => s.toString.toBoolean
      case other => throw new IllegalArgumentException(
        s"table_changes: include_row_ids must be a boolean, got $other")
    })
    SnapshotTable.changes(spark, path, from, to, namesAsOf = None,
      includeRowIds = includeRowIds).queryExecution.analyzed
  }
}
