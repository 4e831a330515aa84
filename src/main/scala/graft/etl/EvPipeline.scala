package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.dq.VerificationSuite
import graft.lake.LakeWriter

/** End-to-end medallion pipeline: bronze CSV → silver (clean +
  * validate + quarantine) → gold (features + partition-overwrite
  * fact table). Mirrors the two reference jobs' control flow
  * (E1/E2 in SURVEY.md §3) with the Python-era inefficiency removed:
  * the cleaned frame is persisted once instead of recomputing the
  * scan+clean subtree for every action (the reference re-ran it ~8×).
  */
final case class SilverConfig(
    inputCsv: String,
    silverPath: String,
    quarantinePath: String,
    secondaryPartition: String = "stationId",
    failMode: String = "quarantine")

final case class SilverResult(goodCount: Long, badCount: Long, dqStatus: String)

final case class GoldConfig(
    silverPath: String,
    db: String = "ev_sessions_gold",
    table: String = "fact_ev_session",
    eventDate: Option[String] = None)

object EvPipeline {

  /** Silver job (reference jobs/ev_sessions_silver_etl_clean.py). */
  def runSilver(spark: SparkSession, cfg: SilverConfig): SilverResult = {
    val bronze = SilverClean.readBronzeCsv(spark, cfg.inputCsv)
    val cleaned = SilverClean.withQuarantineReasons(SilverClean.normalize(bronze))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val vr = VerificationSuite.run(cleaned, Seq(SilverClean.silverCheck))
      if (cfg.failMode == "fail_job" && vr.status != "Success")
        throw new RuntimeException(s"Data quality FAILED: ${vr.status}")

      val (good, bad) = SilverClean.split(cleaned)
      val partCols =
        if (cleaned.columns.contains(cfg.secondaryPartition))
          Seq("event_date", cfg.secondaryPartition)
        else Seq("event_date")

      LakeWriter.writePartitioned(good, cfg.silverPath, partCols)
      LakeWriter.writePartitioned(bad, cfg.quarantinePath, partCols)

      val badCount = bad.count()
      if (badCount > 0 && cfg.failMode.toLowerCase == "fail_job")
        throw new RuntimeException(s"Quality gate failed: $badCount quarantined rows")
      SilverResult(good.count(), badCount, vr.status)
    } finally cleaned.unpersist()
  }

  /** Gold job (reference jobs/ev_sessions_gold_etl.py). Returns rows
    * loaded (0 = nothing to process, early exit). */
  def runGold(spark: SparkSession, cfg: GoldConfig): Long = {
    val silver = spark.read.parquet(cfg.silverPath)
      .select(GoldFeatures.silverProjection.map(silverCol => silver_col(silverCol)): _*)
    val filtered = GoldFeatures.eventDateFilter(silver, cfg.eventDate)
    if (filtered.isEmpty) return 0L
    val gold = GoldFeatures.derive(filtered)
    GoldFeatures.createFactTable(spark, cfg.db, cfg.table)
    // insertInto is positional: order columns as the DDL declares
    // them, partition column last.
    val ordered = gold.select(
      "sessionId", "userId", "stationId", "locationId",
      "kwhTotal", "dollars", "distance", "chargeTimeHrs",
      "facilityType", "platform", "weekday", "created", "ended",
      "session_duration_minutes", "avg_cost_per_kwh", "event_date")
    LakeWriter.overwritePartitions(ordered, s"`${cfg.db}`.`${cfg.table}`")
    spark.table(s"`${cfg.db}`.`${cfg.table}`").count()
  }

  private def silver_col(name: String) = org.apache.spark.sql.functions.col(name)

  /** Gold job against the snapshot-table layer — the closest
    * re-expression of the reference's Iceberg fact table
    * (jobs/ev_sessions_gold_etl.py:147-156: `USING iceberg` v2 +
    * `writeTo(t).overwritePartitions()`): every load is a versioned
    * commit replacing only the touched event_date partitions, with
    * time travel across loads. Returns (version, rowsNow). */
  def runGoldSnapshot(spark: SparkSession, silverPath: String,
      tablePath: String, eventDate: Option[String] = None): (Long, Long) = {
    val silver = spark.read.parquet(silverPath)
      .select(GoldFeatures.silverProjection.map(silver_col): _*)
    val filtered = GoldFeatures.eventDateFilter(silver, eventDate)
    if (filtered.isEmpty) {
      val rows = graft.lake.SnapshotTable.latestVersion(spark, tablePath)
        .map(_ => graft.lake.SnapshotTable.read(spark, tablePath).count()).getOrElse(0L)
      return (graft.lake.SnapshotTable.latestVersion(spark, tablePath).getOrElse(0L), rows)
    }
    val gold = GoldFeatures.derive(filtered)
    val v = graft.lake.SnapshotTable.overwritePartitions(
      gold, tablePath, Seq("event_date"))
    (v, graft.lake.SnapshotTable.read(spark, tablePath).count())
  }

  /** Incremental gold job: silver lives in a SNAPSHOT table and gold
    * advances by consuming only the silver commits it has not seen —
    * the scalable form of the reference's per-run gold rebuild
    * (jobs/ev_sessions_gold_etl.py re-derives whole event_date
    * partitions each run; at 100 TB a load that re-reads the full
    * silver layer per run is the bottleneck, so this reads O(new
    * commits) instead). Each batch derives the gold features for the
    * NEW silver rows only and row-level-MERGEs them into the gold
    * snapshot keyed by sessionId. The SnapshotIncremental offset
    * advances only after the merge commits, and re-merging a replayed
    * batch converges — so a crash anywhere replays to the same gold
    * state (the same idempotency contract as remergeRepaired).
    *
    * Apply-order contract: WITHIN a batch the latest observation per
    * key wins (see below); ACROSS batches, commit order is apply
    * order — last writer wins, the standard apply semantics for an
    * ordered feed. This assumes silver commits land in observation
    * order (true of the silver job, which appends as it ingests); a
    * feed that can redeliver OLDER readings in later commits would
    * need gold to carry the observation timestamp and the merge to
    * compare against it before overwriting.
    *
    * Returns (consumedRange, goldVersion, goldRows); None range when
    * nothing new. */
  def runGoldIncremental(spark: SparkSession, silverTablePath: String,
      goldTablePath: String, checkpointDir: String): (Option[(Long, Long)], Long, Long) = {
    val range = graft.lake.SnapshotIncremental.processNew(
      spark, silverTablePath, checkpointDir) { (newSilver, _, _) =>
      // a batch may carry several versions of one session (the fixture
      // plants a duplicated sessionId; real feeds redeliver) — MERGE
      // requires unique keys, so keep the latest observation per key
      // (created desc, ended desc — the CDC upsert norm, deterministic
      // because (sessionId, created, ended) identifies a reading)
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, row_number}
      val w = Window.partitionBy("sessionId")
        .orderBy(col("created").desc, col("ended").desc)
      val latest = newSilver
        .select(GoldFeatures.silverProjection.map(silver_col): _*)
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
      graft.lake.SnapshotTable.merge(GoldFeatures.derive(latest), goldTablePath,
        keyCols = Seq("sessionId"), partitionCols = Seq("event_date"))
      ()
    }
    val v = graft.lake.SnapshotTable.latestVersion(spark, goldTablePath).getOrElse(0L)
    val rows = if (v == 0L) 0L else graft.lake.SnapshotTable.count(spark, goldTablePath)
    (range, v, rows)
  }

  /** Quarantine repair-and-remerge (SURVEY.md §2.7: re-merging
    * repaired quarantine rows is the natural lakehouse flow the
    * reference leaves manual). `repair` is a caller-provided
    * transform over the quarantined frame; rows whose rules all pass
    * after repair are merged into the silver layer, rows still
    * failing stay quarantined. Returns (remerged, stillBad) counts.
    *
    * Idempotency: the touched silver partitions are REBUILT as
    * (existing rows minus any with a rescued sessionId) ∪ rescued and
    * written with dynamic partition overwrite — so a retry after a
    * partial failure (e.g. the quarantine overwrite below crashed)
    * converges to the same silver state instead of appending the
    * rescued rows a second time.
    */
  def remergeRepaired(
      spark: SparkSession,
      quarantinePath: String,
      silverPath: String,
      repair: DataFrame => DataFrame,
      secondaryPartition: String = "stationId"): (Long, Long) = {
    import org.apache.spark.sql.functions.{broadcast, col}
    // A streaming-produced layer leads with a `_batch_id` partition
    // (EventStreams.streamSilverCsv exactly-once scheme). Writing the
    // batch layout (event_date, stationId) under the same root would
    // plant a second, conflicting partition scheme and break partition
    // discovery — so keep `_batch_id` leading in everything we write
    // (rescued rows carry their original batch id through the repair),
    // and refuse a half-streamed pair outright.
    val streamed = hasBatchIdLayout(spark, quarantinePath)
    require(streamed == hasBatchIdLayout(spark, silverPath),
      s"silver ($silverPath) and quarantine ($quarantinePath) disagree on the " +
        "_batch_id streaming layout — remerge would mix partition schemes under one root")
    val bad = spark.read.parquet(quarantinePath).drop("quarantine_reason")
    val repaired = SilverClean.withQuarantineReasons(repair(bad))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // materialize BEFORE rewriting the quarantine path we read from
      repaired.count()
      val (nowGood, stillBad) = SilverClean.split(repaired)
      val partCols =
        (if (streamed) Seq("_batch_id") else Nil) ++ Seq("event_date", secondaryPartition)
      // counts FIRST: the quarantine overwrite below refreshes that
      // path's cache entries, after which these plans would recompute
      // against the rewritten files
      val rescuedCount = nowGood.count()
      val stillBadCount = stillBad.count()
      if (rescuedCount > 0) {
        // existing silver rows of the touched partitions only (semi
        // join on a broadcast of the few touched keys), minus rows a
        // previous partially-failed remerge already rescued
        val touched = nowGood.select(partCols.map(col): _*).distinct()
        val silverNow = spark.read.parquet(silverPath)
        val existing = silverNow
          .select(nowGood.columns.map(c =>
            silverNow.col(c).cast(nowGood.schema(c).dataType).as(c)): _*)
          .join(broadcast(touched), partCols, "left_semi")
          .join(nowGood.select("sessionId"), Seq("sessionId"), "left_anti")
        val combined = existing.unionByName(nowGood)
        // stage through a temp dir: Spark (correctly) refuses to
        // overwrite a path that also feeds the plan being executed
        val tmp = s"${silverPath.stripSuffix("/")}_remerge_staging"
        combined.write.mode("overwrite").option("compression", "zstd").parquet(tmp)
        val staged = spark.read.parquet(tmp)
        LakeWriter.writePartitioned(staged, silverPath, partCols)
        val f = new org.apache.hadoop.fs.Path(tmp)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        f.delete(new org.apache.hadoop.fs.Path(tmp), true): Unit
      }
      // FULL (static) overwrite: dynamic mode would leave stale
      // copies of rescued rows in partitions stillBad doesn't touch
      val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      try stillBad.write.mode("overwrite").option("compression", "zstd")
        .partitionBy(partCols: _*).parquet(quarantinePath)
      finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
      (rescuedCount, stillBadCount)
    } finally repaired.unpersist()
  }

  /** True when `path`'s first-level dirs carry the streaming sink's
    * leading `_batch_id=` partition. */
  private def hasBatchIdLayout(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.exists(p) && f.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("_batch_id="))
  }
}
