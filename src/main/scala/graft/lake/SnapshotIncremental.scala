package graft.lake

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental (streaming-style) consumption of a snapshot table: an
  * offset-checkpointed reader that hands each new commit range to a
  * processing function exactly once per successful run — the
  * Delta/Iceberg `startingVersion` + change-feed consumption pattern,
  * driving incremental ETL off the table the same way the reference's
  * downstream jobs re-read the gold table per run (reference
  * jobs/ev_sessions_gold_etl.py reprocesses by partition; this reads
  * by COMMIT, so a consumer never rescans data it has seen).
  *
  * Two read modes:
  *  - `AppendOnly` (default): each batch reads ONLY the files the new
  *    commits added — O(new data) IO, zero shuffle. A commit that
  *    removed or rewrote files (merge/delete/update/compact) would
  *    re-emit carried-over rows, so it fails loudly, naming the
  *    offending version and operation.
  *  - `Cdc`: each batch is [[SnapshotTable.changes]] over the range —
  *    inserts AND deletes, tagged `_change_type`/`_commit_version`,
  *    rewrite-safe at the cost of the multiset diff.
  *
  * Offsets live in a tiny checkpoint file advanced ONLY after the
  * batch function returns, so a crash mid-batch replays that batch on
  * restart — at-least-once from the reader, exactly-once end-to-end
  * when paired with an idempotent sink (e.g.
  * [[graft.streaming.EventStreams]]'s merge-upsert sink, where
  * re-merging a replayed batch converges).
  */
object SnapshotIncremental {

  sealed trait Mode
  case object AppendOnly extends Mode
  case object Cdc extends Mode

  /** Rows the commits in (fromVersion, toVersion] contributed.
    * AppendOnly: the added files' rows, read directly (verified
    * append-only via the manifest file sets, not just the recorded op
    * names). Cdc: the tagged change feed. */
  def readBetween(spark: SparkSession, path: String, fromVersion: Long,
      toVersion: Long, mode: Mode = AppendOnly): DataFrame = mode match {
    case Cdc => SnapshotTable.changes(spark, path, fromVersion, toVersion)
    case AppendOnly =>
      require(fromVersion <= toVersion,
        s"fromVersion $fromVersion must be <= toVersion $toVersion")
      // verify no step removed files — op names are advisory; the
      // file sets are the truth
      ((fromVersion + 1) to toVersion).foreach { v =>
        val prev =
          if (v == 1) Set.empty[String]
          else SnapshotTable.readManifest(spark, path, v - 1).map(_.filePath).toSet
        val cur = SnapshotTable.readManifest(spark, path, v).map(_.filePath).toSet
        val removed = prev -- cur
        require(removed.isEmpty,
          s"version $v of $path is not append-only (op=" +
            s"${SnapshotTable.opOf(spark, path, v).getOrElse("unknown")}, " +
            s"${removed.size} file(s) removed) — consume with Mode=Cdc")
      }
      val from =
        if (fromVersion == 0) Set.empty[String]
        else SnapshotTable.readManifest(spark, path, fromVersion).map(_.filePath).toSet
      val (schema, toEntries) = (SnapshotTable.schemaOf(spark, path, Some(toVersion)),
        SnapshotTable.readManifest(spark, path, toVersion))
      val added = toEntries.filterNot(e => from(e.filePath))
      if (added.isEmpty)
        SnapshotTable.read(spark, path, Some(toVersion)).limit(0)
      else SnapshotTable.readGroups(spark, added, schema)
  }

  private val offsetName = "^offset-(\\d+)$".r

  /** Last version a successful [[processNew]] consumed through, if
    * any. Offsets are monotone write-once files (`offset-<v>`), so
    * the cursor is the max present — there is no delete-then-rename
    * window in which a crash could lose the checkpoint and trigger a
    * full-history replay. */
  def lastConsumed(spark: SparkSession, checkpointDir: String): Option[Long] = {
    val f = SnapshotTable.fs(spark, checkpointDir)
    val dir = new Path(checkpointDir)
    if (!f.exists(dir)) None
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case offsetName(v) => v.toLong }
      .maxOption
  }

  /** Retention floor for a consumer checkpoint directory — the
    * version the consumer's NEXT batch diffs against, which vacuum
    * must keep (with everything after). Accepts BOTH consumer kinds:
    * a [[SnapshotIncremental]] checkpoint (offset-<v> files) and a
    * Structured Streaming checkpointLocation of the graft-snapshot
    * source (offsets/commits layout — the floor is the end offset of
    * the last COMMITTED batch). A checkpoint with no progress yet
    * floors at 0, protecting the whole history. */
  private[graft] def consumedFloor(spark: SparkSession, dir: String): Long = {
    val f = SnapshotTable.fs(spark, dir)
    val offsets = new Path(s"$dir/offsets")
    if (!f.exists(offsets)) return lastConsumed(spark, dir).getOrElse(0L)
    val num = "^(\\d+)$".r
    val commitsDir = new Path(s"$dir/commits")
    val committed =
      if (!f.exists(commitsDir)) Nil
      else f.listStatus(commitsDir).map(_.getPath.getName)
        .collect { case num(n) => n.toLong }.toSeq
    committed.maxOption match {
      case None => 0L
      case Some(batch) =>
        // offsets/<batch>: "v1" line, metadata json, then one line per
        // source — ours is the plain version number
        val in = f.open(new Path(s"$dir/offsets/$batch"))
        val content = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        content.split("\n").map(_.trim).filter(_.nonEmpty).lastOption
          .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(0L)
    }
  }

  private def writeOffset(spark: SparkSession, checkpointDir: String, v: Long): Unit = {
    val f = SnapshotTable.fs(spark, checkpointDir)
    f.mkdirs(new Path(checkpointDir))
    val next = new Path(s"$checkpointDir/offset-$v")
    val out = f.create(next, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // best-effort cleanup of superseded cursors — a crash here leaves
    // extra files, and max-wins reading stays correct
    f.listStatus(new Path(checkpointDir)).map(_.getPath)
      .filter(p => offsetName.findFirstIn(p.getName).isDefined && p.getName != s"offset-$v")
      .foreach(p => f.delete(p, false))
  }

  /** Run `fn` over everything committed since the checkpoint (or the
    * table's beginning on first run). The offset advances only after
    * `fn` returns, so a failed batch is replayed on the next call.
    * Returns the (firstVersion, lastVersion) range consumed, or None
    * when there is nothing new. */
  def processNew(spark: SparkSession, path: String, checkpointDir: String,
      mode: Mode = AppendOnly)(fn: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val from = lastConsumed(spark, checkpointDir).getOrElse(0L)
    val latest = SnapshotTable.latestVersion(spark, path).getOrElse(0L)
    if (latest <= from) return None
    fn(readBetween(spark, path, from, latest, mode), from + 1, latest)
    writeOffset(spark, checkpointDir, latest)
    Some((from + 1, latest))
  }
}
