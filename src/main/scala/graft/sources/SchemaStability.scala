package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructField}

import graft.lake.SnapshotTable

/** Post-capture schema-stability guard SHARED by both streaming
  * sources (`graft-snapshot` and `graft-changes`) — the
  * restart-to-adopt contract (Delta's streaming behavior on schema
  * change):
  *
  * A streaming query captures the table's schema + logical→physical
  * column mapping ONCE at query (re)start. Versions at or before the
  * capture are legitimately different eras — the captured mapping
  * translates them (physical names are stable, so pre-rename files
  * serve values under the post-rename logical name). But a schema
  * change AFTER the capture is one the capture cannot see:
  *
  *  - DROP (incl. DROP + re-ADD of the same logical name, which mints
  *    a FRESH physical name the stale mapping can't resolve) would
  *    silently null-fill genuinely present values;
  *  - RENAME would silently keep serving values under the stale
  *    logical name;
  *  - type WIDENING would surface as a raw decode ClassCastException
  *    (Group path) or a requested-schema mismatch (vectorized path).
  *
  * None of those may pass silently. Every batch whose end version is
  * past the capture verifies, BEFORE planning any read, that each
  * captured column's stable physical name still resolves to the same
  * (logical name, type) at that version — one cached-manifest header
  * read riding the version walk the batch already performs. On any
  * divergence the query fails LOUDLY with a restart-to-adopt message;
  * a restarted query re-captures and replays the same offset ranges
  * exactly-once under the new schema. Columns ADDED after the capture
  * stay invisible until a restart (they are absent from the captured
  * schema, never mis-resolved) — also the Delta semantics.
  */
private[sources] object SchemaStability {

  /** (logical, physical, type) of every data column at a version —
    * hidden partition columns are layout, not data, and are excluded
    * on both sides of the comparison. */
  private def fieldsAt(spark: SparkSession, path: String,
      v: Long): Seq[(String, String, DataType)] = {
    val cm = SnapshotTable.columnMappingAt(spark, path, v)
    SnapshotTable.schemaOf(spark, path, Some(v))
      .getOrElse(throw new IllegalStateException(
        s"version $v of $path records no schema"))
      .fields.filterNot(_.name.startsWith("__p_")).toSeq
      .map(f => (f.name, cm.getOrElse(f.name, f.name), f.dataType))
  }

  /** Fail loudly if any captured column was dropped / renamed /
    * retyped between the capture and `to`. No-op when `to` does not
    * pass the captured version (pre-capture eras are served via the
    * captured mapping, not checked). */
  def requireStable(spark: SparkSession, path: String,
      capturedVersion: Long, capturedColmap: Map[String, String],
      capturedFields: Seq[StructField], to: Long): Unit = {
    if (to <= capturedVersion) return
    val byPhys = fieldsAt(spark, path, to)
      .map { case (l, p, t) => p -> ((l, t)) }.toMap
    capturedFields.foreach { f =>
      val p = capturedColmap.getOrElse(f.name, f.name)
      byPhys.get(p) match {
        case None => throw new IllegalStateException(
          s"column '${f.name}' of $path was DROPPED during the stream " +
            s"(by version $to) — restart the query to adopt the new schema")
        case Some((l, _)) if l != f.name => throw new IllegalStateException(
          s"column '${f.name}' of $path was RENAMED to '$l' during the stream " +
            s"(by version $to) — restart the query to adopt the new schema")
        case Some((_, t)) if t != f.dataType => throw new IllegalStateException(
          s"column '${f.name}' of $path changed type ${f.dataType.simpleString} → " +
            s"${t.simpleString} during the stream (by version $to) — restart " +
            "the query to adopt the widened schema")
        case _ => ()
      }
    }
  }
}
