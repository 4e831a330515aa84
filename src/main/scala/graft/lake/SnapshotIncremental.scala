package graft.lake

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

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
  /** [[Cdc]] plus the stable `_row_id` column (requires a row-tracking
    * table): a stateful consumer keys its state by row identity —
    * update images pair exactly even under keyless rewrites. */
  case object CdcWithRowIds extends Mode

  /** Files the commits in (fromVersion, toVersion] added, plus the
    * schema recorded at toVersion — ONE manifest read per version in
    * the range (each step's file set carries forward as the next
    * step's base; no manifest is opened twice). `onRemoved` fires for
    * every version that removed/rewrote files, letting the caller
    * enforce append-only with its own message — op names are advisory;
    * the file sets are the truth. The third result element is the
    * CARRIED files whose deletion vector changed within the range
    * (latest entry, so its dv is the current one) — a DV-aware
    * `ignoreChanges` consumer re-emits their still-live rows; an
    * append-only consumer sees them via `onRemoved` first. The added
    * entries likewise carry their LATEST dv, so a file appended and
    * then DV'd inside one range is emitted without its dead rows.
    * Shared by the batch-driven reader below and
    * [[graft.sources.SnapshotStreamSource]]'s microbatch planner. */
  private[graft] def addedBetween(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long,
      onRemoved: Option[(Long, Int) => Unit] = None)
      : (Option[StructType], Seq[SnapshotTable.Entry], Seq[SnapshotTable.Entry]) = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    val fromEntries =
      if (fromVersion == 0) Nil
      else SnapshotTable.readManifest(spark, path, fromVersion)
    val fromSet: Set[String] = fromEntries.map(_.filePath).toSet
    val fromDv: Map[String, Option[(String, Long)]] =
      fromEntries.map(e => e.filePath -> e.dv).toMap
    var prevSet = fromSet
    // a deletion-vector change removes ROWS without removing files —
    // for append-only verification it counts as a removal too
    var prevDv: Map[String, Option[(String, Long)]] = fromDv
    var schema: Option[StructType] = None
    var entries: Seq[SnapshotTable.Entry] = Nil
    ((fromVersion + 1) to toVersion).foreach { v =>
      val m = SnapshotTable.readManifestFull(spark, path, v)
      val curSet = m.entries.map(_.filePath).toSet
      onRemoved.foreach { cb =>
        val removed = prevSet.diff(curSet).size
        val dvChanged = m.entries.count(e =>
          prevSet(e.filePath) && prevDv.getOrElse(e.filePath, None) != e.dv)
        if (removed + dvChanged > 0) cb(v, removed + dvChanged)
      }
      prevSet = curSet
      prevDv = m.entries.map(e => e.filePath -> e.dv).toMap
      schema = m.schema
      entries = m.entries
    }
    val dvChanged = entries.filter(e =>
      fromSet(e.filePath) && fromDv.getOrElse(e.filePath, None) != e.dv)
    (schema, entries.filterNot(e => fromSet(e.filePath)), dvChanged)
  }

  /** Rows the commits in (fromVersion, toVersion] contributed.
    * AppendOnly: the added files' rows, read directly (verified
    * append-only via the manifest file sets, not just the recorded op
    * names). Cdc: the tagged change feed. */
  def readBetween(spark: SparkSession, path: String, fromVersion: Long,
      toVersion: Long, mode: Mode = AppendOnly): DataFrame = mode match {
    case Cdc => SnapshotTable.changes(spark, path, fromVersion, toVersion)
    case CdcWithRowIds => SnapshotTable.changes(spark, path, fromVersion,
      toVersion, namesAsOf = None, includeRowIds = true)
    case AppendOnly =>
      val (schema, added, _) = addedBetween(spark, path, fromVersion, toVersion,
        onRemoved = Some { (v, n) =>
          throw new IllegalArgumentException(
            s"version $v of $path is not append-only (op=" +
              s"${SnapshotTable.opOf(spark, path, v).getOrElse("unknown")}, " +
              s"$n file(s) removed) — consume with Mode=Cdc")
        })
      if (added.isEmpty)
        SnapshotTable.read(spark, path, Some(toVersion)).limit(0)
      else {
        val raw = SnapshotTable.readGroups(spark, added, schema,
          SnapshotTable.readManifestFull(spark, path, toVersion).colmap)
        // hidden partition columns are layout, not data
        raw.drop(raw.columns.filter(_.startsWith("__p_")).toSeq: _*)
      }
  }

  /** Consume a long version range in bounded sub-ranges: yields
    * `(rangeFrom, rangeTo, rows)` per batch of at most
    * `maxVersionsPerBatch` versions, each batch the same frame
    * [[readBetween]] would give for that sub-range. This bounds the
    * PLAN, not just the data: a Cdc read of `(0, 500]` is otherwise
    * one 500-branch union of diff subtrees, while 10 batches of 50
    * keep every plan tree (and its shuffle count) commit-sized. The
    * iterator is lazy — each sub-range's manifests are read when the
    * consumer advances to it. */
  def readBatched(spark: SparkSession, path: String, fromVersion: Long,
      toVersion: Long, maxVersionsPerBatch: Long,
      mode: Mode = AppendOnly): Iterator[(Long, Long, DataFrame)] = {
    require(maxVersionsPerBatch >= 1, "maxVersionsPerBatch must be >= 1")
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    (fromVersion until toVersion by maxVersionsPerBatch).iterator.map { s =>
      val e = math.min(toVersion, s + maxVersionsPerBatch)
      (s + 1, e, readBetween(spark, path, s, e, mode))
    }
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
    * With `maxVersionsPerBatch` the backlog is consumed in bounded
    * sub-ranges ([[readBatched]]), the offset advancing after EACH
    * sub-range — a consumer resuming after a long pause replays at
    * most one bounded batch, not the whole backlog. Returns the
    * (firstVersion, lastVersion) range consumed, or None when there
    * is nothing new. */
  def processNew(spark: SparkSession, path: String, checkpointDir: String,
      mode: Mode = AppendOnly, maxVersionsPerBatch: Option[Long] = None)(
      fn: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val from = lastConsumed(spark, checkpointDir).getOrElse(0L)
    val latest = SnapshotTable.latestVersion(spark, path).getOrElse(0L)
    if (latest <= from) return None
    maxVersionsPerBatch match {
      case None =>
        fn(readBetween(spark, path, from, latest, mode), from + 1, latest)
        writeOffset(spark, checkpointDir, latest)
      case Some(m) =>
        readBatched(spark, path, from, latest, m, mode).foreach {
          case (f, t, df) =>
            fn(df, f, t)
            writeOffset(spark, checkpointDir, t)
        }
    }
    Some((from + 1, latest))
  }
}
