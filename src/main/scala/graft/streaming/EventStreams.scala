package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.etl.SilverClean
import graft.lake.LakeWriter
import graft.model.EvSchemas

/** Structured Streaming surface (SURVEY.md §2.9): the reference is
  * pure batch with event-triggered orchestration; this module is the
  * streaming-native equivalent — the same transform logic (shared
  * with the batch modules, not duplicated) over `readStream`, with
  * watermarks, windowed/session aggregation, stateful dedup and
  * custom per-key state.
  *
  * Scale posture: every aggregation keys on (window/session, group
  * key) so state is bounded by the watermark horizon; file sources
  * shard by input file, and foreachBatch writes reuse the same
  * dynamic-partition-overwrite sink as batch (idempotent re-runs per
  * microbatch epoch).
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Streaming read of the events table layout, normalized to
    * whole-second TimestampType (matching model.Tables.events).
    *
    * The stored `ts` has two eras: legacy ns-epoch Longs (surfaced
    * under spark.sql.legacy.parquet.nanosAsLong) and native µs
    * TIMESTAMP. A file stream source needs its schema up front, so we
    * sniff the directory ONCE with a driver-side batch read — footer
    * metadata only, no data scan — and branch the normalization the
    * same way the batch reader does.
    *
    * If the directory has no files yet at stream start, the sniff
    * can't infer anything ("Unable to infer schema") — fall back to
    * the declared raw schema (ns-epoch Long era) so the stream can
    * start on an empty directory and pick files up as they arrive,
    * like the pre-sniff explicit-schema reader could. A directory
    * mixing both eras is a layout error and still fails loudly at
    * read time. */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    val stored =
      try spark.read.parquet(path).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage != null && e.getMessage.contains("infer schema") =>
          EvSchemas.eventsRaw
      }
    val raw = spark.readStream.schema(stored).parquet(path)
    stored("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_seconds(expr("ts DIV 1000000000")))
      case _ =>
        raw.withColumn("ts", date_trunc("second", col("ts")))
    }
  }

  /** Unbounded synthetic event stream off the built-in rate source —
    * the soak-test input: rows arrive forever at `rowsPerSecond`, so
    * any state a downstream operator fails to evict grows without
    * bound (exactly what a watermark must prevent). The rate source's
    * own timestamp becomes event time. */
  def rateEvents(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        pmod(col("value"), lit(97)).as("user_id"),
        lit("soak").as("event_type"),
        (col("value") % 10).cast("double").as("value"))

  /** Tumbling-window counts with a watermark bounding state. */
  def windowedCounts(events: DataFrame,
      windowLen: String = "5 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Session windows per user (gap-merged), watermarked. */
  def sessionCounts(events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))

  /** Stateful exact dedup on event_id, state expiring with the
    * watermark (the streaming analogue of exact dedup in
    * ops.TextDedup). */
  def dedupedEvents(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join: each purchase joins the SAME user's
    * signup that happened at-or-before it, within a bounded
    * event-time range — the attribution-join shape. Both sides are
    * watermarked and the join condition bounds purchase_ts relative
    * to signup_ts, which is what lets the engine EVICT buffered
    * signup state once the watermark passes the range (an unbounded
    * condition would buffer both streams forever). State per key is
    * one window of signups, not the stream's history. */
  def purchaseAttributionJoin(events: DataFrame,
      maxGap: String = "interval 2 hours",
      watermark: String = "1 hour"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", watermark)
    purchases.join(signups,
      col("user_id") === col("s_user_id") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(maxGap))
      .select("event_id", "user_id", "purchase_ts", "signup_ts", "value")
  }

  /** Streaming exact dedup by CONTENT fingerprint — the ingest-time
    * half of the dedup family (ops.TextDedup.exactDuplicates is the
    * batch half): the first occurrence of a normalized-text md5 wins,
    * later copies arriving within the watermark window are dropped.
    * State holds one fingerprint row per distinct doc inside the
    * horizon and is evicted past it, so endless ingest cannot grow
    * state without bound — the trade every streaming dedup makes:
    * duplicates separated by more than the watermark re-enter (catch
    * those in the batch dedup pass). */
  def dedupDocsByContent(docs: DataFrame,
      tsCol: String = "ingest_ts",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", md5(lower(col("text"))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Custom keyed state via mapGroupsWithState: running per-user
    * totals across microbatches. */
  def userRunningTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Event], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          evs.foreach { e => n += 1; tot += e.value }
          val next = UserTotal(uid, n, tot)
          state.update(next)
          next
      }
  }

  final case class SessionSummary(user_id: Long, n_events: Long,
      start: java.sql.Timestamp, end: java.sql.Timestamp)
  /** Internal state of [[userSessions]] — public only because the
    * state encoder's generated code must reach the accessors. */
  final case class OpenSession(n: Long, startMs: Long, endMs: Long)

  /** Completed-session emission via flatMapGroupsWithState with an
    * EVENT-TIME timeout: a user's session stays open in state while
    * events keep arriving within `gap`; once the watermark passes
    * last-event + gap the state times out and the finished session is
    * emitted exactly once (Append mode). State per key is O(1) — the
    * open session only — so the operator scales with concurrent open
    * sessions, not history. */
  def userSessions(events: Dataset[Event],
      gapMinutes: Int = 30,
      watermark: String = "30 minutes"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMillis = gapMinutes * 60000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[Event], state: GroupState[OpenSession]) =>
          def summary(s: OpenSession) = SessionSummary(uid, s.n,
            new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs))
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(summary(s))
          } else {
            // split the batch's events on in-batch gaps: sessions that
            // visibly closed inside the batch are emitted immediately;
            // the trailing one stays open awaiting the timeout. (A
            // late event within the watermark but beyond an observed
            // gap starts a NEW session — divergence from
            // session_window's buffer-until-watermark, documented.)
            val times = evs.map(_.ts.getTime).toArray
            java.util.Arrays.sort(times)
            val out = scala.collection.mutable.ArrayBuffer[SessionSummary]()
            var cur = state.getOption
            times.foreach { t =>
              cur = cur match {
                case Some(s) if t - s.endMs <= gapMillis =>
                  // min: a late (within-watermark) event may precede
                  // the open session's start
                  Some(OpenSession(s.n + 1, math.min(s.startMs, t), math.max(s.endMs, t)))
                case Some(s) =>
                  out += summary(s)
                  Some(OpenSession(1L, t, t))
                case None => Some(OpenSession(1L, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // the timeout must sit beyond the current watermark
              state.setTimeoutTimestamp(
                math.max(s.endMs + gapMillis, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Switch stateful-streaming state to the RocksDB provider: state
    * lives off-heap/on-disk per executor instead of in the JVM heap —
    * the configuration for large keyspaces (millions of sessions/
    * users) where HDFS-backed in-memory state would OOM. Takes effect
    * for queries STARTED after the call. */
  def useRocksDBStateStore(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** One-shot batch drain (Trigger.AvailableNow): process everything
    * available at start across as many rate-limited microbatches as
    * needed, then stop on its own — the scheduled-ingest mode (cron
    * backfill) that still keeps streaming checkpoints/exactly-once. */
  def drainToParquet(events: DataFrame, outPath: String, checkpoint: String,
      maxFilesPerTrigger: Int = 1000): StreamingQuery =
    events.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming MERGE sink: upsert every microbatch into a
    * [[graft.lake.SnapshotTable]] by key — the streaming half of the
    * Iceberg-v2 row-level story: late corrections arriving on the
    * stream UPDATE the fact table in place (stats-pruned file
    * rewrite) instead of appending duplicates. Restart/retry safe
    * without the `_batch_id` partition trick: replaying an epoch
    * re-merges the same rows, matched keys are re-updated to the
    * same values and the epoch's earlier inserts become no-op
    * updates, so a retried batch converges to the same table state.
    * Rows are deduplicated on the key within each batch (merge's
    * unique-source precondition); cross-row conflicts inside one
    * batch should be resolved upstream. */
  def streamMergeSnapshot(rows: DataFrame, tablePath: String,
      keyCols: Seq[String], checkpoint: String,
      partitionCols: Seq[String] = Nil): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val src = batch.dropDuplicates(keyCols)
        if (!src.isEmpty)
          graft.lake.SnapshotTable.merge(src, tablePath, keyCols, partitionCols): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming CLAUSE-merge upsert sink: each microbatch runs one
    * [[graft.lake.SnapshotTable.mergeClauses]] statement against the
    * snapshot table — the conditional-upsert shape
    * ("update only if newer, delete tombstones, insert the rest")
    * that plain replace-merge cannot express. Unlike replace-merge,
    * clause semantics are NOT naturally replay-idempotent (a matched
    * DELETE followed by a replay would re-INSERT), so each epoch
    * commits under a transaction watermark (Delta's txnAppId/
    * txnVersion): the merge and the watermark publish atomically, a
    * replayed epoch is skipped before any job runs, and a crash
    * between commit and checkpoint can never double-apply. `appId`
    * defaults to a checkpoint-derived identity, stable across
    * restarts.
    *
    * Duplicate keys WITHIN a microbatch: mergeClauses requires a
    * unique-keyed source, so the batch is reduced to one row per key
    * first. Pass `latestBy` (an ordering column, e.g. an event
    * timestamp) to keep the row with the LARGEST value per key
    * deterministically — the usual foreachBatch upsert pattern.
    * Without it the sink falls back to `dropDuplicates(keyCols)`,
    * which keeps an ARBITRARY row per key (nondeterministic across
    * retries) — fine only when upstream guarantees at most one row
    * per key per epoch. */
  def streamMergeClausesSnapshot(rows: DataFrame, tablePath: String,
      keyCols: Seq[String],
      matched: Seq[graft.lake.MergeMatchedClause] = Nil,
      notMatched: Seq[graft.lake.MergeInsert] = Nil,
      notMatchedBySource: Seq[graft.lake.MergeMatchedClause] = Nil,
      checkpoint: String, appId: Option[String] = None,
      latestBy: Option[String] = None): StreamingQuery = {
    val app = appId.getOrElse(s"graft-merge-clauses:$checkpoint")
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val src = latestPerKey(batch, keyCols, latestBy)
        if (!src.isEmpty)
          graft.lake.SnapshotTable.mergeClauses(src, tablePath, keyCols,
            matched, notMatched, notMatchedBySource,
            txn = Some((app, epoch))): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One row per key: the max-`latestBy` row when an ordering column
    * is given (deterministic up to ties on that column), else
    * dropDuplicates' arbitrary pick. */
  private def latestPerKey(batch: DataFrame, keyCols: Seq[String],
      latestBy: Option[String]): DataFrame = latestBy match {
    case None => batch.dropDuplicates(keyCols)
    case Some(ord) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy(col(ord).desc_nulls_last)
      batch.withColumn("__graft_rn", row_number().over(w))
        .filter(col("__graft_rn") === 1).drop("__graft_rn")
  }

  /** Streaming silver ETL: bronze CSVs arriving in a directory →
    * identical clean/validate logic as the batch job → per-microbatch
    * partitioned good/quarantine writes. Demonstrates that the
    * cleaning layer is execution-mode-agnostic (same SilverClean
    * functions drive batch and stream).
    *
    * Idempotency: the sink leads with a `_batch_id` partition column,
    * so the dynamic partition overwrite only ever replaces partitions
    * of the epoch being written — a retried microbatch rewrites its
    * own `_batch_id=N` output (exactly-once per epoch) and can never
    * erase rows that earlier batches wrote into the same
    * (event_date, stationId). Readers see `_batch_id` as an extra
    * hive partition column and drop it. */
  def streamSilverCsv(spark: SparkSession, csvDir: String,
      silverPath: String, quarantinePath: String): StreamingQuery = {
    val bronze = spark.readStream
      .option("header", true)
      .schema(EvSchemas.bronze)
      .csv(csvDir)
    val cleaned = SilverClean.withQuarantineReasons(SilverClean.normalize(bronze))
    cleaned.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val epoch = batch.withColumn("_batch_id", lit(batchId)).persist()
        val (good, bad) = SilverClean.split(epoch)
        LakeWriter.writePartitioned(good, silverPath,
          Seq("_batch_id", "event_date", "stationId"))
        LakeWriter.writePartitioned(bad, quarantinePath,
          Seq("_batch_id", "event_date", "stationId"))
        epoch.unpersist(): Unit
      }
      .start()
  }
}
