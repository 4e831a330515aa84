package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.QDef

/** EV-pipeline queries for the driver's correctness gate. Each runs
  * the full silver-clean semantics (SilverClean) over the checked-in
  * fixture CSV (data/ev_fixture.csv — covers every dataset quirk from
  * FIXTURES.md §1) and carries a DuckDB oracle that replicates the
  * same cleaning in SQL over `read_csv` of the same file, so the EV
  * surface is hash-checked exactly like the relational catalog.
  *
  * The testdata sfDir argument is ignored — the EV surface has its
  * own input contract (bronze CSV), independent of scale factor.
  */
object EvQueries {

  val fixturePath: String =
    sys.env.getOrElse("GRAFT_EV_FIXTURE", "/root/repo/data/ev_fixture.csv")

  /** Cleaned + rule-tagged frame (shared subtree of every EV query). */
  def tagged(spark: SparkSession): DataFrame =
    SilverClean.withQuarantineReasons(
      SilverClean.normalize(SilverClean.readBronzeCsv(spark, fixturePath)))

  private def good(spark: SparkSession): DataFrame =
    SilverClean.split(tagged(spark))._1

  // ---- Spark sides --------------------------------------------------

  def silverGood(spark: SparkSession, dir: String): DataFrame =
    good(spark).select(
      "sessionId", "userId", "stationId", "locationId", "kwhTotal", "dollars",
      "distance", "chargeTimeHrs", "facilityType", "platform", "weekday",
      "created", "ended", "event_date", "managerVehicle")
      .orderBy("sessionId")

  def quarantineReasons(spark: SparkSession, dir: String): DataFrame =
    SilverClean.split(tagged(spark))._2
      .select(explode(col("quarantine_reason")).as("reason"))
      .groupBy("reason").agg(count(lit(1)).as("n"))
      .orderBy("reason")

  def goldFeatures(spark: SparkSession, dir: String): DataFrame =
    GoldFeatures.derive(good(spark))
      .select("sessionId", "event_date", "session_duration_minutes", "avg_cost_per_kwh")
      .orderBy("sessionId")

  def avgDurationPerLocation(spark: SparkSession, dir: String): DataFrame =
    GoldFeatures.derive(good(spark))
      .groupBy("locationId")
      .agg(
        count(lit(1)).as("n_sessions"),
        round(avg(col("session_duration_minutes")), 4).as("avg_duration_minutes"))
      .orderBy("locationId")

  def peakHourPerStation(spark: SparkSession, dir: String): DataFrame = {
    val hourly = good(spark)
      .groupBy(col("stationId"), hour(col("created")).as("peak_hour"))
      .agg(count(lit(1)).as("n_sessions"))
    val w = Window.partitionBy(col("stationId"))
      .orderBy(col("n_sessions").desc, col("peak_hour").asc)
    hourly.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("stationId", "peak_hour", "n_sessions")
      .orderBy("stationId")
  }

  def platformShare(spark: SparkSession, dir: String): DataFrame = {
    val counts = good(spark).groupBy("platform").agg(count(lit(1)).as("n_sessions"))
    counts
      .withColumn("share",
        round(col("n_sessions") / sum(col("n_sessions")).over(Window.partitionBy()), 6))
      .orderBy("platform")
  }

  /** README metric "utilization ratio" (SURVEY.md §2.3 J5 explode
    * variant): unroll each session's [created, ended] span into hour
    * rows, then distinct utilized hours / active-span hours per
    * station. */
  def stationUtilization(spark: SparkSession, dir: String): DataFrame =
    good(spark)
      .select(col("stationId"), col("created"), col("ended"),
        explode(expr(
          "sequence(date_trunc('hour', created), date_trunc('hour', ended), interval 1 hour)"))
          .as("hr"))
      .groupBy("stationId")
      .agg(
        countDistinct(col("hr")).as("utilized_hours"),
        round(countDistinct(col("hr")) /
          ((max(col("ended")).cast("long") - min(col("created")).cast("long")) / lit(3600.0)), 6)
          .as("utilization"))
      .orderBy("stationId")

  // ---- DuckDB oracles ----------------------------------------------

  /** SQL replica of SilverClean.normalize + rowRules over the same
    * CSV: all-varchar read (matching Spark's post-cast state),
    * NULLIF('') for Spark's empty-field→null, the fix_year string
    * surgery including its 14-char seconds-truncation, literal-map
    * decodes with pass-through, and the 11 quarantine rules
    * (facilityType rule coalesced to FALSE on NULL, matching Spark's
    * `when` not firing on NULL conditions). */
  private val prefix: String =
    s"""WITH raw AS (
       |  SELECT * FROM read_csv('$fixturePath', header=true, all_varchar=true)
       |), c1 AS (
       |  SELECT
       |    NULLIF(sessionId,'') AS sessionId, NULLIF(userId,'') AS userId,
       |    NULLIF(stationId,'') AS stationId, NULLIF(locationId,'') AS locationId,
       |    TRY_CAST(NULLIF(kwhTotal,'') AS DOUBLE) AS kwhTotal,
       |    TRY_CAST(NULLIF(dollars,'') AS DOUBLE) AS dollars,
       |    TRY_CAST(NULLIF(distance,'') AS DOUBLE) AS distance,
       |    TRY_CAST(NULLIF(chargeTimeHrs,'') AS DOUBLE) AS chargeTimeHrs,
       |    NULLIF(facilityType,'') AS facilityType0, NULLIF(platform,'') AS platform,
       |    NULLIF(weekday,'') AS weekday0,
       |    NULLIF(created,'') AS created_s, NULLIF(ended,'') AS ended_s,
       |    TRY_CAST(NULLIF(managerVehicle,'') AS INT) AS managerVehicle
       |  FROM raw
       |), fx AS (
       |  SELECT *,
       |    CASE WHEN substring(created_s,1,2)='00'
       |         THEN '20' || substring(created_s,3,14) ELSE created_s END AS created_f,
       |    CASE WHEN substring(ended_s,1,2)='00'
       |         THEN '20' || substring(ended_s,3,14) ELSE ended_s END AS ended_f
       |  FROM c1
       |), c2 AS (
       |  -- the year-fixed strings are seconds-truncated ("…HH:MM");
       |  -- DuckDB's TIMESTAMP cast needs seconds, so fall back to
       |  -- strptime for that form (Spark's to_timestamp accepts both)
       |  SELECT *,
       |    coalesce(TRY_CAST(created_f AS TIMESTAMP),
       |             TRY_STRPTIME(created_f, '%Y-%m-%d %H:%M')) AS created,
       |    coalesce(TRY_CAST(ended_f AS TIMESTAMP),
       |             TRY_STRPTIME(ended_f, '%Y-%m-%d %H:%M')) AS ended
       |  FROM fx
       |), silver AS (
       |  SELECT sessionId, userId, stationId, locationId, kwhTotal, dollars,
       |    distance, chargeTimeHrs,
       |    CASE WHEN facilityType0 IN ('1','2','3','4') THEN
       |      CASE facilityType0 WHEN '1' THEN 'Manufacturing' WHEN '2' THEN 'Office'
       |           WHEN '3' THEN 'Research and Development' WHEN '4' THEN 'Other' END
       |      ELSE facilityType0 END AS facilityType,
       |    platform,
       |    CASE WHEN weekday0 IN ('Mon','Tue','Wed','Thu','Fri','Sat','Sun') THEN
       |      CASE weekday0 WHEN 'Mon' THEN 'Monday' WHEN 'Tue' THEN 'Tuesday'
       |           WHEN 'Wed' THEN 'Wednesday' WHEN 'Thu' THEN 'Thursday'
       |           WHEN 'Fri' THEN 'Friday' WHEN 'Sat' THEN 'Saturday'
       |           WHEN 'Sun' THEN 'Sunday' END
       |      ELSE weekday0 END AS weekday,
       |    created, ended, CAST(created AS DATE) AS event_date, managerVehicle
       |  FROM c2
       |), flagged AS (
       |  SELECT *,
       |    (sessionId IS NULL) AS r_session_null,
       |    (userId IS NULL) AS r_user_null,
       |    (stationId IS NULL) AS r_station_null,
       |    (locationId IS NULL) AS r_location_null,
       |    (kwhTotal IS NULL OR kwhTotal <= 0) AS r_kwh,
       |    (dollars IS NULL OR dollars < 0) AS r_dollars,
       |    (distance IS NULL OR distance < 0) AS r_distance,
       |    (chargeTimeHrs IS NULL OR chargeTimeHrs <= 0) AS r_duration,
       |    coalesce(facilityType NOT IN
       |      ('Manufacturing','Office','Research and Development','Other'), FALSE) AS r_ftype,
       |    (created IS NULL OR ended IS NULL) AS r_ts_null,
       |    (created IS NOT NULL AND ended IS NOT NULL AND ended <= created) AS r_end_before
       |  FROM silver
       |), marked AS (
       |  SELECT *, (r_session_null OR r_user_null OR r_station_null OR r_location_null
       |             OR r_kwh OR r_dollars OR r_distance OR r_duration OR r_ftype
       |             OR r_ts_null OR r_end_before) AS is_bad
       |  FROM flagged
       |)""".stripMargin

  private val silverGoodSql =
    s"""$prefix
       |SELECT sessionId, userId, stationId, locationId, kwhTotal, dollars, distance,
       |  chargeTimeHrs, facilityType, platform, weekday, created, ended, event_date,
       |  managerVehicle
       |FROM marked WHERE NOT is_bad ORDER BY sessionId""".stripMargin

  private val quarantineReasonsSql =
    s"""$prefix
       |SELECT reason, n FROM (
       |  SELECT 'sessionId_null' AS reason, count(*) FILTER (WHERE r_session_null) AS n FROM marked
       |  UNION ALL SELECT 'userId_null', count(*) FILTER (WHERE r_user_null) FROM marked
       |  UNION ALL SELECT 'stationId_null', count(*) FILTER (WHERE r_station_null) FROM marked
       |  UNION ALL SELECT 'locationId_null', count(*) FILTER (WHERE r_location_null) FROM marked
       |  UNION ALL SELECT 'kwhTotal_non_positive', count(*) FILTER (WHERE r_kwh) FROM marked
       |  UNION ALL SELECT 'dollars_negative', count(*) FILTER (WHERE r_dollars) FROM marked
       |  UNION ALL SELECT 'distance_negative_or_zero', count(*) FILTER (WHERE r_distance) FROM marked
       |  UNION ALL SELECT 'duration_invalid', count(*) FILTER (WHERE r_duration) FROM marked
       |  UNION ALL SELECT 'facilityType_invalid', count(*) FILTER (WHERE r_ftype) FROM marked
       |  UNION ALL SELECT 'timestamp_null', count(*) FILTER (WHERE r_ts_null) FROM marked
       |  UNION ALL SELECT 'end_before_start', count(*) FILTER (WHERE r_end_before) FROM marked
       |) t WHERE n > 0 ORDER BY reason""".stripMargin

  private val goldFeaturesSql =
    s"""$prefix
       |SELECT sessionId, event_date,
       |  (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes,
       |  CASE WHEN kwhTotal > 0 THEN dollars / kwhTotal END AS avg_cost_per_kwh
       |FROM marked WHERE NOT is_bad ORDER BY sessionId""".stripMargin

  private val avgDurationSql =
    s"""$prefix
       |SELECT locationId, count(*) AS n_sessions,
       |  round(avg((epoch(ended) - epoch(created)) / 60.0), 4) AS avg_duration_minutes
       |FROM marked WHERE NOT is_bad GROUP BY locationId ORDER BY locationId""".stripMargin

  private val peakHourSql =
    s"""$prefix,
       |hourly AS (
       |  SELECT stationId, CAST(hour(created) AS INT) AS peak_hour, count(*) AS n_sessions
       |  FROM marked WHERE NOT is_bad GROUP BY 1, 2
       |), ranked AS (
       |  SELECT stationId, peak_hour, n_sessions,
       |    row_number() OVER (PARTITION BY stationId
       |                       ORDER BY n_sessions DESC, peak_hour ASC) AS rn
       |  FROM hourly
       |)
       |SELECT stationId, peak_hour, n_sessions FROM ranked WHERE rn = 1
       |ORDER BY stationId""".stripMargin

  private val platformShareSql =
    s"""$prefix
       |SELECT platform, count(*) AS n_sessions,
       |  round(CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER () AS DOUBLE), 6) AS share
       |FROM marked WHERE NOT is_bad GROUP BY platform ORDER BY platform""".stripMargin

  /** Gold fact through the snapshot-table layer: commit all clean
    * rows, then reprocess one partition via overwritePartitions, and
    * report row counts per readable version — exercising versioned
    * commits + time travel end-to-end in the gate. Oracle: versions
    * are 1 (append) and 2 (same-content partition overwrite), and
    * both row counts equal the clean-row count the oracle derives
    * from the same CSV — so the versioning semantics are checked
    * against independently computed numbers, not engine echoes. */
  def snapshotVersions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-snap-gate").toString + "/fact"
    // persist: the commit + min() + overwrite actions below would each
    // recompute the full CSV clean subtree otherwise
    // coalesce(1): 37 rows across ~13 date partitions — without it
    // every commit write launches a full default-parallelism task set
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "event_date", "session_duration_minutes")
      .coalesce(1)
      .persist()
    try {
      graft.lake.SnapshotTable.append(gold, path, Seq("event_date"))
      val oneDate = gold.select(min(col("event_date"))).head().getDate(0)
      graft.lake.SnapshotTable.overwritePartitions(
        gold.filter(col("event_date") === oneDate), path, Seq("event_date"))
      graft.lake.SnapshotTable.versions(spark, path).map { v =>
        (v, graft.lake.SnapshotTable.read(spark, path, Some(v)).count())
      }.toDF("version", "n_rows").orderBy("version")
    } finally { gold.unpersist(); () }
  }

  /** Row-level MERGE through the snapshot layer: commit the gold
    * fact, then upsert a correction batch — the three lowest
    * sessionIds re-priced to a -1.0 marker plus one brand-new session
    * — via SnapshotTable.merge, and read the latest version back.
    * Unlike ev08 this has a full DuckDB oracle: the merged state is
    * plain SQL over the same cleaned rows, so the row-level-upsert
    * semantics (update matched, insert unmatched, leave the rest) are
    * hash-verified, not just row-counted. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-merge-gate").toString + "/fact"
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "event_date", "session_duration_minutes")
      .coalesce(1)
      .persist()
    try {
      graft.lake.SnapshotTable.append(gold, path, Seq("event_date"))
      val updates = gold.orderBy("sessionId").limit(3)
        .withColumn("session_duration_minutes", lit(-1.0))
      val minDate = gold.select(min(col("event_date"))).head().getDate(0)
      val inserts = Seq(("merged-new", 42.0))
        .toDF("sessionId", "session_duration_minutes")
        .select(col("sessionId"), lit(minDate).as("event_date"),
          col("session_duration_minutes"))
      graft.lake.SnapshotTable.merge(updates.unionByName(inserts), path,
        keyCols = Seq("sessionId"), partitionCols = Seq("event_date"))
      graft.lake.SnapshotTable.read(spark, path)
        .select("sessionId", "session_duration_minutes")
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  /** The same row-level surface as ev09, driven through SQL TEXT: the
    * gold fact is registered in the SnapshotCatalog and mutated with
    * `MERGE INTO ... UPDATE SET * / INSERT *` and `DELETE FROM ...
    * WHERE` statements, which the injected resolution rule routes to
    * SnapshotTable.merge/delete (the Iceberg-v2 statement surface the
    * reference's gold table declares; jobs/ev_sessions_gold_etl.py:
    * 147-149). Oracle: the merged-then-deleted state is plain SQL
    * over the same cleaned rows, so statement routing AND row-level
    * semantics are hash-verified end-to-end. */
  def sqlMergeDelete(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-sqldml-gate").toString + "/fact"
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "event_date", "session_duration_minutes")
      .coalesce(1)
      .persist()
    try {
      graft.lake.SnapshotTable.append(gold, path, Seq("event_date"))
      val updates = gold.orderBy("sessionId").limit(3)
        .withColumn("session_duration_minutes", lit(-1.0))
      val minDate = gold.select(min(col("event_date"))).head().getDate(0)
      val inserts = Seq(("merged-new", 42.0))
        .toDF("sessionId", "session_duration_minutes")
        .select(col("sessionId"), lit(minDate).as("event_date"),
          col("session_duration_minutes"))
      updates.unionByName(inserts).createOrReplaceTempView("ev10_src")
      graft.lake.SnapshotCatalog.register("ev10_fact", path)
      try {
        spark.sql(
          """MERGE INTO ev10_fact t USING ev10_src s
            |ON t.sessionId = s.sessionId
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
        spark.sql(
          "DELETE FROM ev10_fact WHERE session_duration_minutes > 120").collect()
      } finally graft.lake.SnapshotCatalog.unregister("ev10_fact")
      graft.lake.SnapshotTable.read(spark, path)
        .select("sessionId", "session_duration_minutes")
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  /** Row-level UPDATE through SQL TEXT: the gold fact is registered
    * and mutated with `UPDATE ... SET ... WHERE`, which the injected
    * resolution rule routes to SnapshotTable.update — the third
    * statement of the Iceberg-v2 row-level DML surface (MERGE ev10,
    * DELETE ev10, UPDATE here; reference jobs/ev_sessions_gold_etl
    * .py:147-149). The SET expression references the column being
    * updated, so pre-update-row semantics (not a sequential
    * reassignment) are part of what the oracle hash-verifies. */
  def sqlUpdate(spark: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("graft-sqlupd-gate").toString + "/fact"
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "event_date", "session_duration_minutes")
      .coalesce(1)
      .persist()
    try {
      graft.lake.SnapshotTable.append(gold, path, Seq("event_date"))
      graft.lake.SnapshotCatalog.register("ev11_fact", path)
      try spark.sql(
        """UPDATE ev11_fact
          |SET session_duration_minutes = session_duration_minutes - 1000
          |WHERE session_duration_minutes > 120""".stripMargin).collect()
      finally graft.lake.SnapshotCatalog.unregister("ev11_fact")
      graft.lake.SnapshotTable.read(spark, path)
        .select("sessionId", "session_duration_minutes")
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val sqlUpdateSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes
       |  FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId,
       |  CASE WHEN session_duration_minutes > 120
       |       THEN session_duration_minutes - 1000
       |       ELSE session_duration_minutes END AS session_duration_minutes
       |FROM gold ORDER BY sessionId""".stripMargin

  /** Change-data feed over the snapshot layer: append (v1), merge a
    * correction batch (v2), row-level delete (v3), then read
    * `SnapshotTable.changes(1, 3)` — the incremental-consumption
    * surface (Iceberg incremental read / Delta CDF) over the same
    * commits ev09/ev10 verify. Oracle: every delete/insert row of
    * both commits is independently derivable in SQL from the cleaned
    * CSV, so the feed's row-level diff semantics (update = delete of
    * the old values + insert of the new, carried-over rows cancel)
    * are hash-verified, not just counted. */
  def changeFeed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-cdc-gate").toString + "/fact"
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "event_date", "session_duration_minutes")
      .coalesce(1)
      .persist()
    try {
      graft.lake.SnapshotTable.append(gold, path, Seq("event_date"))
      val updates = gold.orderBy("sessionId").limit(3)
        .withColumn("session_duration_minutes", lit(-1.0))
      val minDate = gold.select(min(col("event_date"))).head().getDate(0)
      val inserts = Seq(("merged-new", 42.0))
        .toDF("sessionId", "session_duration_minutes")
        .select(col("sessionId"), lit(minDate).as("event_date"),
          col("session_duration_minutes"))
      graft.lake.SnapshotTable.merge(updates.unionByName(inserts), path,
        keyCols = Seq("sessionId"), partitionCols = Seq("event_date"))
      graft.lake.SnapshotTable.delete(spark, path,
        col("session_duration_minutes") > 120)
      graft.lake.SnapshotTable.changes(spark, path, 1L, 3L)
        .select("sessionId", "session_duration_minutes", "_change_type",
          "_commit_version")
        .orderBy("_commit_version", "_change_type", "sessionId")
    } finally { gold.unpersist(); () }
  }

  private val changeFeedSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes
       |  FROM marked WHERE NOT is_bad
       |), upd AS (
       |  SELECT sessionId FROM gold ORDER BY sessionId LIMIT 3
       |), merged AS (
       |  SELECT sessionId,
       |    CASE WHEN sessionId IN (SELECT sessionId FROM upd)
       |         THEN -1.0 ELSE session_duration_minutes END AS session_duration_minutes
       |  FROM gold
       |  UNION ALL SELECT 'merged-new', 42.0
       |), feed AS (
       |  -- v2 (merge records its keys): updated rows emit CDF
       |  -- update_preimage/update_postimage pairs; the new row inserts
       |  SELECT sessionId, -1.0 AS session_duration_minutes,
       |    'update_postimage' AS _change_type, CAST(2 AS BIGINT) AS _commit_version FROM upd
       |  UNION ALL SELECT 'merged-new', 42.0, 'insert', CAST(2 AS BIGINT)
       |  UNION ALL SELECT g.sessionId, g.session_duration_minutes, 'update_preimage', CAST(2 AS BIGINT)
       |    FROM gold g WHERE g.sessionId IN (SELECT sessionId FROM upd)
       |  -- v3 (delete): rows over the threshold at the v2 state
       |  UNION ALL SELECT sessionId, session_duration_minutes, 'delete', CAST(3 AS BIGINT)
       |    FROM merged WHERE session_duration_minutes > 120
       |)
       |SELECT sessionId, session_duration_minutes, _change_type, _commit_version
       |FROM feed ORDER BY _commit_version, _change_type, sessionId""".stripMargin

  /** Deletion-vector deletes end-to-end: the gold fact takes two
    * deleteWithVectors commits (the over-threshold rows, then one
    * more row — exercising the merged REPLACEMENT DV on a file
    * already carrying one) WITHOUT rewriting a single data file. The
    * output carries the surviving rows plus two behavioral-contract
    * columns the oracle pins: `files_unchanged` (the live file set
    * and count is identical across all three versions, and both
    * delete commits record op=delete_dv — i.e. the deletes really
    * were metadata+DV, not rewrites) and `meta_count` (the
    * metadata-only count that must see through DVs). Row content and
    * both contract columns are hash-verified against the same
    * cleaned CSV in SQL. */
  def dvDelete(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-dv-gate").toString + "/fact"
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "event_date", "session_duration_minutes")
      .coalesce(1)
      .persist()
    try {
      graft.lake.SnapshotTable.append(gold, path, Seq("event_date"))
      graft.lake.SnapshotTable.deleteWithVectors(spark, path,
        col("session_duration_minutes") > 120)
      val victim = graft.lake.SnapshotTable.read(spark, path)
        .agg(min(col("sessionId"))).as[String].head()
      graft.lake.SnapshotTable.deleteWithVectors(spark, path,
        col("sessionId") === victim)
      val hist = graft.lake.SnapshotTable.history(spark, path)
        .select("version", "n_files").as[(Long, Int)].collect().toMap
      val filesUnchanged = hist(1L) == hist(3L) &&
        graft.lake.SnapshotTable.opOf(spark, path, 2L).contains("delete_dv") &&
        graft.lake.SnapshotTable.opOf(spark, path, 3L).contains("delete_dv")
      val metaCount = graft.lake.SnapshotTable.count(spark, path)
      graft.lake.SnapshotTable.read(spark, path)
        .select("sessionId", "session_duration_minutes")
        .withColumn("files_unchanged", lit(filesUnchanged))
        .withColumn("meta_count", lit(metaCount))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val dvDeleteSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes
       |  FROM marked WHERE NOT is_bad
       |), kept1 AS (
       |  SELECT * FROM gold WHERE NOT session_duration_minutes > 120
       |), victim AS (
       |  SELECT min(sessionId) AS v FROM kept1
       |), final AS (
       |  SELECT * FROM kept1 WHERE sessionId <> (SELECT v FROM victim)
       |)
       |SELECT sessionId, session_duration_minutes,
       |  true AS files_unchanged,
       |  (SELECT CAST(count(*) AS BIGINT) FROM final) AS meta_count
       |FROM final ORDER BY sessionId""".stripMargin

  /** Incremental consumption through the offset-checkpointed reader:
    * the gold fact lands in two append commits (the 20 lowest
    * sessionIds, then the rest), and SnapshotIncremental.processNew
    * is called after each — so batch 1 must see exactly the first
    * commit's rows and batch 2 ONLY the second's (never a rescan).
    * Oracle: both batch row counts and version ranges are derived
    * from the same cleaned CSV in SQL, so the exactly-once range
    * accounting is hash-verified. */
  def incrementalFeed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-inc-gate").toString
    val path = base + "/fact"
    val ckpt = base + "/ckpt"
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "event_date", "session_duration_minutes")
      .coalesce(1)
      .persist()
    try {
      val first = gold.orderBy("sessionId").limit(20)
      val rest = gold.join(first.select("sessionId"), Seq("sessionId"), "left_anti")
      var batches = Seq.empty[(Long, Long, Long, Long)]
      def consume(batch: Long): Unit =
        graft.lake.SnapshotIncremental.processNew(spark, path, ckpt) { (df, from, to) =>
          batches :+= ((batch, from, to, df.count()))
        }
      graft.lake.SnapshotTable.append(first, path, Seq("event_date"))
      consume(1L)
      graft.lake.SnapshotTable.append(rest, path, Seq("event_date"))
      consume(2L)
      batches.toDF("batch", "from_version", "to_version", "n_rows")
        .orderBy("batch")
    } finally { gold.unpersist(); () }
  }

  private val incrementalFeedSql =
    s"""$prefix,
       |n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM marked WHERE NOT is_bad)
       |SELECT CAST(1 AS BIGINT) AS batch, CAST(1 AS BIGINT) AS from_version,
       |  CAST(1 AS BIGINT) AS to_version, CAST(20 AS BIGINT) AS n_rows FROM n
       |UNION ALL SELECT 2, 2, 2, total - 20 FROM n
       |ORDER BY batch""".stripMargin

  /** The flagship incremental pipeline end-to-end: silver lands in a
    * snapshot table in two append commits, runGoldIncremental runs
    * after each, and the final GOLD table is read back. The oracle
    * re-derives it in SQL: latest-observation dedup per sessionId
    * (the fixture's planted duplicate exercises the rule) then the
    * gold feature derivation — so batch accounting, per-batch dedup,
    * and the keyed MERGE composition are all hash-verified. */
  def incrementalGold(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-incgold-gate").toString
    val silverTable = base + "/silver"
    val goldTable = base + "/gold"
    val ckpt = base + "/ckpt"
    val silver = good(spark).coalesce(1).persist()
    try {
      // key-range split (not limit): a duplicated key must land whole
      // in one batch or the anti-join-style split would drop a copy
      val first = silver.filter(col("sessionId") < "2000")
      val rest = silver.filter(col("sessionId") >= "2000")
      graft.lake.SnapshotTable.append(first, silverTable, Seq("event_date"))
      EvPipeline.runGoldIncremental(spark, silverTable, goldTable, ckpt)
      graft.lake.SnapshotTable.append(rest, silverTable, Seq("event_date"))
      EvPipeline.runGoldIncremental(spark, silverTable, goldTable, ckpt)
      graft.lake.SnapshotTable.read(spark, goldTable)
        .select("sessionId", "session_duration_minutes", "avg_cost_per_kwh")
        .orderBy("sessionId")
    } finally { silver.unpersist(); () }
  }

  private val incrementalGoldSql =
    s"""$prefix,
       |latest AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY sessionId
       |      ORDER BY created DESC, ended DESC) AS rn
       |    FROM marked WHERE NOT is_bad
       |  ) WHERE rn = 1
       |)
       |SELECT sessionId,
       |  (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes,
       |  CASE WHEN kwhTotal > 0 THEN dollars / kwhTotal END AS avg_cost_per_kwh
       |FROM latest ORDER BY sessionId""".stripMargin

  private val sqlMergeDeleteSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes
       |  FROM marked WHERE NOT is_bad
       |), upd AS (
       |  SELECT sessionId FROM gold ORDER BY sessionId LIMIT 3
       |), merged AS (
       |  SELECT sessionId,
       |    CASE WHEN sessionId IN (SELECT sessionId FROM upd)
       |         THEN -1.0 ELSE session_duration_minutes END AS session_duration_minutes
       |  FROM gold
       |  UNION ALL SELECT 'merged-new', 42.0
       |)
       |SELECT sessionId, session_duration_minutes FROM merged
       |WHERE NOT session_duration_minutes > 120
       |ORDER BY sessionId""".stripMargin

  private val mergeUpsertSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes
       |  FROM marked WHERE NOT is_bad
       |), upd AS (
       |  SELECT sessionId FROM gold ORDER BY sessionId LIMIT 3
       |)
       |SELECT sessionId,
       |  CASE WHEN sessionId IN (SELECT sessionId FROM upd)
       |       THEN -1.0 ELSE session_duration_minutes END AS session_duration_minutes
       |FROM gold
       |UNION ALL SELECT 'merged-new', 42.0
       |ORDER BY sessionId""".stripMargin

  private val snapshotVersionsSql =
    s"""$prefix,
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM marked WHERE NOT is_bad)
       |SELECT CAST(1 AS BIGINT) AS version, n_rows FROM n
       |UNION ALL SELECT CAST(2 AS BIGINT), n_rows FROM n
       |ORDER BY version""".stripMargin

  private val stationUtilizationSql =
    s"""$prefix,
       |hrs AS (
       |  SELECT stationId, created, ended,
       |    unnest(generate_series(date_trunc('hour', created),
       |                           date_trunc('hour', ended), INTERVAL 1 HOUR)) AS hr
       |  FROM marked WHERE NOT is_bad
       |)
       |SELECT stationId, count(DISTINCT hr) AS utilized_hours,
       |  round(count(DISTINCT hr) /
       |        ((epoch(max(ended)) - epoch(min(created))) / 3600.0), 6) AS utilization
       |FROM hrs GROUP BY stationId ORDER BY stationId""".stripMargin

  /** Files the frame's scans actually read (post-execution metric;
    * AQE stages are leaf nodes and must be walked into explicitly). */
  private def scannedFiles(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    def files(p: SparkPlan): Long =
      p.collect {
        case a: AdaptiveSparkPlanExec => files(a.executedPlan)
        case q: QueryStageExec        => files(q.plan)
        case s: FileSourceScanExec    => s.metrics("numFiles").value
      }.sum
    files(df.queryExecution.executedPlan)
  }

  /** Hidden partitioning (Iceberg partition-transform shape): the
    * gold fact is created with `months(created)` — the user never
    * writes, names, or filters on a partition column — and consumed
    * through readWhere with a plain timestamp predicate. Verified
    * against the oracle: the surviving rows equal the SQL filter, the
    * derived column never surfaces (`hidden_absent`), the transform
    * is recorded (`transform_ok`), and the scan PHYSICALLY pruned to
    * a strict subset of the table's files (`pruned`, from the
    * executed plan's numFiles metric — non-vacuous because the
    * fixture spans many months). */
  def hiddenPartitioning(spark: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("graft-hp-gate").toString + "/fact"
    val gold = good(spark).select(col("sessionId"), col("created"), col("kwhTotal"))
      .coalesce(1)
      .persist()
    try {
      graft.lake.SnapshotTable.appendTransformed(gold, path, Seq("months(created)"))
      val cut = gold.select(date_trunc("MONTH", max(col("created"))))
        .head().getTimestamp(0)
      def q = graft.lake.SnapshotTable.readWhere(spark, path,
        col("created") >= lit(cut))
      val hiddenAbsent = !q.columns.exists(_.startsWith("__p_"))
      val transformOk = graft.lake.SnapshotTable.partitionTransforms(spark, path)
        .sameElements(Seq("months(created)"))
      val total = graft.lake.SnapshotTable.liveFiles(spark, path).size
      val scanned = scannedFiles(q)
      val pruned = scanned > 0 && scanned < total
      q.withColumn("hidden_absent", lit(hiddenAbsent))
        .withColumn("transform_ok", lit(transformOk))
        .withColumn("pruned", lit(pruned))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val hiddenPartitioningSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, created, kwhTotal FROM marked WHERE NOT is_bad
       |), cut AS (
       |  SELECT date_trunc('month', max(created)) AS c FROM gold
       |)
       |SELECT sessionId, created, kwhTotal,
       |  true AS hidden_absent, true AS transform_ok, true AS pruned
       |FROM gold WHERE created >= (SELECT c FROM cut)
       |ORDER BY sessionId""".stripMargin

  /** Tags + RESTORE through the gate: commit the gold fact, tag it
    * `golden`, corrupt it with a DELETE, then RESTORE — the final
    * table must hash-match the ORIGINAL gold (the oracle recomputes
    * it straight from the CSV, so the restore really did undo the
    * delete), with contract columns proving the tag resolves to v1,
    * the deleted state stayed time-travelable, and the restore wrote
    * no data files (v3 references v1's exact file set). */
  def restoreTags(spark: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("graft-restore-gate").toString + "/fact"
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "event_date", "session_duration_minutes")
      .coalesce(1)
      .persist()
    try {
      graft.lake.SnapshotTable.append(gold, path, Seq("event_date"))   // v1
      graft.lake.SnapshotTable.tag(spark, path, "golden")
      graft.lake.SnapshotTable.delete(spark, path,
        col("session_duration_minutes") > 120)                         // v2
      graft.lake.SnapshotTable.restore(spark, path, 1L)                // v3
      val tagOk = graft.lake.SnapshotTable.tagVersion(spark, path, "golden")
        .contains(1L)
      val deletedStateRows = graft.lake.SnapshotTable.read(spark, path, Some(2L)).count()
      // delete's SQL semantics keep predicate-NULL rows — mirror that
      val midStateOk = deletedStateRows ==
        graft.lake.SnapshotTable.read(spark, path)
          .filter(!coalesce(col("session_duration_minutes") > 120, lit(false))).count()
      val noRewrite = graft.lake.SnapshotTable.readManifest(spark, path, 3L)
        .map(_.filePath).toSet ==
        graft.lake.SnapshotTable.readManifest(spark, path, 1L).map(_.filePath).toSet
      val restoreOp = graft.lake.SnapshotTable.opOf(spark, path, 3L).contains("restore")
      graft.lake.SnapshotTable.read(spark, path)
        .select("sessionId", "session_duration_minutes")
        .withColumn("tag_ok", lit(tagOk))
        .withColumn("mid_state_ok", lit(midStateOk))
        .withColumn("no_rewrite", lit(noRewrite))
        .withColumn("restore_op", lit(restoreOp))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val restoreTagsSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes
       |  FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, session_duration_minutes,
       |  true AS tag_ok, true AS mid_state_ok,
       |  true AS no_rewrite, true AS restore_op
       |FROM gold ORDER BY sessionId""".stripMargin

  /** Full DSv2-catalog lifecycle through the gate, all in SQL — the
    * reference's Glue-catalog workflow (`CREATE TABLE` in a
    * configured catalog, `INSERT INTO`, `MERGE INTO`, `DELETE FROM`,
    * time travel; reference jobs/ev_sessions_gold_etl.py:125-150) with
    * zero `register()` calls: the gold fact is CREATEd as
    * `cat.gold.fact PARTITIONED BY (months(created))`, loaded by
    * `INSERT INTO ... SELECT`, merged (3 earliest sessions → −1 plus
    * one new row), trimmed by `DELETE`, and read back — hash-checked
    * against the CSV-derived oracle. Contract columns: the table
    * lists in SHOW TABLES (`catalog_ok`), `VERSION AS OF` the insert
    * commit still counts every original row (`tt_ok`), and the hidden
    * month column never surfaces (`hidden_ok`). A fresh warehouse and
    * catalog name per run — Spark caches catalog instances, so a
    * reused name would pin the first run's warehouse. */

  /** Deletion vectors on a PERCENT-ENCODING layout: the fact is
    * hive-partitioned by a value containing ':' (escapes to a
    * literal '%' in the directory name, the form that silently
    * no-opped DV deletes before round 16 — SnapshotTable.scanFileKey
    * now pairs files by the raw scan path with a percent-decode-
    * fixpoint fallback). The gate proves the delete actually lands
    * (survivor set hash-matches the oracle), the partition value
    * round-trips through the escaping on read-back (`slot` column),
    * and the commit is DV-metadata-only (`files_unchanged`). */
  def dvDeleteEscaped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-dvesc gate").toString + "/fact"
    val gold = GoldFeatures.derive(good(spark))
      .select(col("sessionId"),
        concat(lit("s:"), substring(col("sessionId"), 1, 1)).as("slot"),
        col("session_duration_minutes"))
      .coalesce(1)
      .persist()
    try {
      graft.lake.SnapshotTable.append(gold, path, Seq("slot"))
      graft.lake.SnapshotTable.deleteWithVectors(spark, path,
        col("session_duration_minutes") > 120)
      val hist = graft.lake.SnapshotTable.history(spark, path)
        .select("version", "n_files").as[(Long, Int)].collect().toMap
      val filesUnchanged = hist(1L) == hist(2L) &&
        graft.lake.SnapshotTable.opOf(spark, path, 2L).contains("delete_dv")
      graft.lake.SnapshotTable.read(spark, path)
        .select("sessionId", "slot", "session_duration_minutes")
        .withColumn("files_unchanged", lit(filesUnchanged))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val dvDeleteEscapedSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes
       |  FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, concat('s:', substr(sessionId, 1, 1)) AS slot,
       |  session_duration_minutes, true AS files_unchanged
       |FROM gold WHERE NOT session_duration_minutes > 120
       |ORDER BY sessionId""".stripMargin



  /** Pruned TRACKED read (readWhereWithRowIds): an incremental
    * consumer's predicate must reach the manifest skippers while the
    * scan still carries stable `_row_id`s — at 10^6 files the
    * alternative (full readWithRowIds then filter) is the wrong
    * plan. The fact lands as a 4-file clustered write on a UNIQUE
    * sort key, so row ids are globally monotone in it (bases assign
    * in sorted entry order), making the ABSOLUTE ids
    * oracle-computable as row_number()-1; the gate reads the first
    * half by key and proves (a) values+ids hash-match, (b) the scan
    * physically pruned (executed-plan numFiles, strict subset). */
  def readWhereRowIdsGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-rwrid-gate")
      .toString + "/fact"
    import graft.lake.SnapshotTable
    import org.apache.spark.sql.types._
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"))
      .withColumn("skey", concat(col("sessionId"), lit("|"),
        floor(col("kwhTotal") * 100).cast("int").cast("string")))
      .persist()
    try {
      SnapshotTable.create(spark, t, StructType(Seq(
        StructField("skey", StringType), StructField("sessionId", StringType),
        StructField("kwhTotal", DoubleType))), rowTracking = true)
      SnapshotTable.appendClustered(
        gold.select("skey", "sessionId", "kwhTotal"), t, "skey", numFiles = 4)
      val total = SnapshotTable.liveFiles(spark, t).size
      val k = (gold.count() / 2).toInt
      val mid = gold.select("skey").orderBy("skey").as[String]
        .take(k).last
      val q = SnapshotTable.readWhereWithRowIds(spark, t, col("skey") <= mid)
      val scanned = scannedFiles(q.select("skey"))
      val pruned = scanned >= 1 && scanned < total
      q.select(col("_row_id"), col("sessionId"),
          round(col("kwhTotal"), 2).as("kwh"))
        .withColumn("pruned", lit(pruned))
        .orderBy("_row_id")
    } finally { gold.unpersist(); () }
  }

  private val readWhereRowIdsSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal,
       |    sessionId || '|' || CAST(CAST(floor(kwhTotal * 100) AS INT) AS VARCHAR) AS skey
       |  FROM marked WHERE NOT is_bad
       |), ids AS (
       |  SELECT *, row_number() OVER (ORDER BY skey) - 1 AS rid FROM gold
       |), cnt AS (SELECT CAST(count(*) / 2 AS INT) AS k FROM gold)
       |SELECT CAST(rid AS BIGINT) AS _row_id, sessionId,
       |  round(kwhTotal, 2) AS kwh, true AS pruned
       |FROM ids WHERE rid < (SELECT k FROM cnt)
       |ORDER BY _row_id""".stripMargin

  /** Deep clone + truncate lifecycle through pure SQL: tag the gold
    * fact, `CREATE TABLE ... DEEP CLONE ... VERSION AS OF 'tag'` (an
    * independent physical copy), then TRUNCATE the source (O(1)
    * metadata commit) and reload it with one fresh row — the clone
    * must still serve the tagged state byte-exactly while the source
    * serves only the reload, and the source's pre-truncate version
    * stays time-travelable. */
  def cloneTruncateGate(spark: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("graft-ct-gate").toString
    val cat = "evct_" + java.util.UUID.randomUUID.toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val gold = good(spark).select(col("sessionId"), col("kwhTotal")).persist()
    try {
      gold.createOrReplaceTempView("ev_ct_src")
      spark.sql(s"CREATE NAMESPACE $cat.g")
      spark.sql(s"CREATE TABLE $cat.g.fact (sessionId STRING, kwh DOUBLE) " +
        "USING `graft-snapshot`")                                       // v1
      spark.sql(s"INSERT INTO $cat.g.fact " +
        "SELECT sessionId, kwhTotal FROM ev_ct_src")                    // v2
      spark.sql(s"ALTER TABLE $cat.g.fact CREATE TAG base AS OF VERSION 2")
      spark.sql(s"CREATE TABLE $cat.g.clone DEEP CLONE $cat.g.fact " +
        "VERSION AS OF 'base'")
      spark.sql(s"TRUNCATE TABLE $cat.g.fact")                          // v3
      spark.sql(s"INSERT INTO $cat.g.fact VALUES ('fresh-1', CAST(42.0 AS DOUBLE))")
      val ttOk = spark.sql(
        s"SELECT count(*) FROM $cat.g.fact VERSION AS OF 2").head().getLong(0) ==
        gold.count()
      spark.sql(
        s"""SELECT 'src' AS side, sessionId, round(kwh, 2) AS kwh FROM $cat.g.fact
           |UNION ALL
           |SELECT 'clone', sessionId, round(kwh, 2) FROM $cat.g.clone
           |""".stripMargin)
        .withColumn("tt_ok", lit(ttOk))
        .orderBy("side", "sessionId", "kwh")
    } finally { gold.unpersist(); () }
  }

  private val cloneTruncateSql =
    s"""$prefix,
       |gold AS (SELECT sessionId, kwhTotal FROM marked WHERE NOT is_bad)
       |SELECT * FROM (
       |  SELECT 'src' AS side, 'fresh-1' AS sessionId, 42.0 AS kwh, true AS tt_ok
       |  UNION ALL
       |  SELECT 'clone', sessionId, round(kwhTotal, 2), true FROM gold
       |)
       |ORDER BY side, sessionId, kwh""".stripMargin

  /** DML addressed by `_row_id` (the incremental-consumer correction
    * shape): on the ev45 clustered tracked fixture — where absolute
    * row ids equal the skey rank, so the oracle can compute them —
    * a SQL `DELETE WHERE _row_id < k` drops the first quarter and a
    * SQL `UPDATE ... WHERE _row_id >= 3k` flags the last; survivors
    * keep their ids through both rewrites (read back via
    * readWithRowIds and hash-pinned against row_number()). */
  def dmlRowIdsGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-dmlrid-gate")
      .toString + "/fact"
    import graft.lake.{SnapshotCatalog, SnapshotTable}
    import org.apache.spark.sql.types._
    val reg = "ev_dmlrid_" + java.util.UUID.randomUUID.toString.take(8)
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"))
      .withColumn("skey", concat(col("sessionId"), lit("|"),
        floor(col("kwhTotal") * 100).cast("int").cast("string")))
      .persist()
    try {
      SnapshotTable.create(spark, t, StructType(Seq(
        StructField("skey", StringType), StructField("sessionId", StringType),
        StructField("kwhTotal", DoubleType))), rowTracking = true)
      SnapshotTable.appendClustered(
        gold.select("skey", "sessionId", "kwhTotal"), t, "skey", numFiles = 4)
      SnapshotCatalog.register(reg, t)
      val n = gold.count()
      val k = (n / 4).toInt
      spark.sql(s"DELETE FROM $reg WHERE _row_id < $k")
      spark.sql(s"UPDATE $reg SET kwhTotal = -1.0 WHERE _row_id >= ${3 * k}")
      SnapshotTable.readWithRowIds(spark, t)
        .select(col("_row_id"), col("sessionId"),
          round(col("kwhTotal"), 2).as("kwh"))
        .orderBy("_row_id")
    } finally { SnapshotCatalog.unregister(reg); gold.unpersist(); () }
  }

  private val dmlRowIdsSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal,
       |    sessionId || '|' || CAST(CAST(floor(kwhTotal * 100) AS INT) AS VARCHAR) AS skey
       |  FROM marked WHERE NOT is_bad
       |), ids AS (
       |  SELECT *, row_number() OVER (ORDER BY skey) - 1 AS rid FROM gold
       |), cnt AS (SELECT CAST(count(*) / 4 AS INT) AS k FROM gold)
       |SELECT CAST(rid AS BIGINT) AS _row_id, sessionId,
       |  round(CASE WHEN rid >= 3 * (SELECT k FROM cnt) THEN -1.0
       |             ELSE kwhTotal END, 2) AS kwh
       |FROM ids WHERE rid >= (SELECT k FROM cnt)
       |ORDER BY _row_id""".stripMargin

  /** `MERGE WITH SCHEMA EVOLUTION` (Delta's autoMerge shape): the
    * source carries a column the target lacks — the statement first
    * evolves the target (nullable add, metadata-only), then star
    * actions expand over the POST-evolution schema. Matched rows get
    * the new column's value, untouched rows read NULL, inserted rows
    * carry it. */
  def mergeEvolutionGate(spark: SparkSession, dir: String): DataFrame = {
    val t = java.nio.file.Files.createTempDirectory("graft-mevo-gate")
      .toString + "/fact"
    import graft.lake.{SnapshotCatalog, SnapshotTable}
    val gold = good(spark).select(col("sessionId"), col("kwhTotal")).persist()
    val reg = "ev_mevo_fact_" + java.util.UUID.randomUUID.toString.take(8)
    try {
      SnapshotTable.append(
        gold.select(col("sessionId"), col("kwhTotal").as("kwh")), t)
      SnapshotCatalog.register(reg, t)
      gold.filter(col("kwhTotal") >= 10.0)
        .groupBy(col("sessionId"))
        .agg(max(col("kwhTotal")).as("kwh"))
        .withColumn("units", floor(col("kwh")).cast("int"))
        .unionByName(spark.range(1).select(lit("mevo-new").as("sessionId"),
          lit(7.5).as("kwh"), lit(7).cast("int").as("units")))
        .createOrReplaceTempView("ev_mevo_src")
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $reg t USING ev_mevo_src s
           |ON t.sessionId = s.sessionId
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *
           |""".stripMargin)
      spark.sql(s"SELECT sessionId, round(kwh, 2) AS kwh, units FROM $reg")
        .orderBy("sessionId", "kwh")
    } finally { SnapshotCatalog.unregister(reg); gold.unpersist(); () }
  }

  private val mergeEvolutionSql =
    s"""$prefix,
       |gold AS (SELECT sessionId, kwhTotal FROM marked WHERE NOT is_bad),
       |src AS (
       |  SELECT sessionId, max(kwhTotal) AS kwh,
       |    CAST(floor(max(kwhTotal)) AS INT) AS units
       |  FROM gold WHERE kwhTotal >= 10.0 GROUP BY sessionId
       |  UNION ALL SELECT 'mevo-new', 7.5, 7
       |)
       |SELECT * FROM (
       |  SELECT COALESCE(s.sessionId, t.sessionId) AS sessionId,
       |    round(COALESCE(s.kwh, t.kwhTotal), 2) AS kwh, s.units
       |  FROM gold t FULL OUTER JOIN src s ON t.sessionId = s.sessionId
       |)
       |ORDER BY sessionId, kwh""".stripMargin

  /** `_row_id` as a SQL METADATA column (Delta row-tracking's read
    * shape): the same clustered tracked table as ev45, read through a
    * GraftCatalog name with `SELECT _row_id, ... WHERE skey <= mid` —
    * AddMetadataColumns injects the column, the injected rule
    * substitutes readWhereWithRowIds, and the executed plan proves
    * file pruning survived the metadata-column path. Absolute ids are
    * oracle-computable because rid bases assign in lexicographic file
    * order over the skey-clustered layout (see ev45). */
  def sqlRowIdsGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-sqlrid-gate").toString
    val cat = "evrid_" + java.util.UUID.randomUUID.toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    import graft.lake.SnapshotTable
    import org.apache.spark.sql.types._
    val t = s"$wh/gold/fact"
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"))
      .withColumn("skey", concat(col("sessionId"), lit("|"),
        floor(col("kwhTotal") * 100).cast("int").cast("string")))
      .persist()
    try {
      SnapshotTable.create(spark, t, StructType(Seq(
        StructField("skey", StringType), StructField("sessionId", StringType),
        StructField("kwhTotal", DoubleType))), rowTracking = true)
      SnapshotTable.appendClustered(
        gold.select("skey", "sessionId", "kwhTotal"), t, "skey", numFiles = 4)
      val total = SnapshotTable.liveFiles(spark, t).size
      val k = (gold.count() / 2).toInt
      val mid = gold.select("skey").orderBy("skey").as[String].take(k).last
      // SELECT * must NOT leak the metadata column
      val starClean = !spark.sql(s"SELECT * FROM $cat.gold.fact").columns
        .exists(_.equalsIgnoreCase("_row_id"))
      def q = spark.sql(
        s"""SELECT _row_id, sessionId, round(kwhTotal, 2) AS kwh
           |FROM $cat.gold.fact WHERE skey <= '$mid'""".stripMargin)
      val scanned = scannedFiles(q)
      val pruned = scanned >= 1 && scanned < total
      q.withColumn("pruned", lit(pruned && starClean)).orderBy("_row_id")
    } finally { gold.unpersist(); () }
  }

  private val sqlRowIdsSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal,
       |    sessionId || '|' || CAST(CAST(floor(kwhTotal * 100) AS INT) AS VARCHAR) AS skey
       |  FROM marked WHERE NOT is_bad
       |), ids AS (
       |  SELECT *, row_number() OVER (ORDER BY skey) - 1 AS rid FROM gold
       |), cnt AS (SELECT CAST(count(*) / 2 AS INT) AS k FROM gold)
       |SELECT CAST(rid AS BIGINT) AS _row_id, sessionId,
       |  round(kwhTotal, 2) AS kwh, true AS pruned
       |FROM ids WHERE rid < (SELECT k FROM cnt)
       |ORDER BY _row_id""".stripMargin

  /** Full-clause MERGE through pure SQL (the SQL:2003 / Delta clause
    * surface beyond the reference's Iceberg-v2 `UPDATE SET * / INSERT
    * *` upsert, reference jobs/ev_sessions_gold_etl.py:147-156):
    * conditional matched update AND matched delete, conditional
    * insert, and both NOT MATCHED BY SOURCE forms in ONE statement
    * over the gold fact. The oracle recomputes the post-merge state
    * relationally (matched rows split by the update condition,
    * unmatched target rows split by the NMBS conditions, anti-joined
    * source rows filtered by the insert condition). */
  def mergeClausesGate(spark: SparkSession, dir: String): DataFrame = {
    val t = java.nio.file.Files.createTempDirectory("graft-mc-gate")
      .toString + "/fact"
    import graft.lake.{SnapshotCatalog, SnapshotTable}
    val gold = good(spark).select(col("sessionId"), col("kwhTotal")).persist()
    val reg = "ev_mc_fact_" + java.util.UUID.randomUUID.toString.take(8)
    try {
      SnapshotTable.append(
        gold.select(col("sessionId"), col("kwhTotal").as("kwh"),
          lit("base").as("status")), t)
      SnapshotCatalog.register(reg, t)
      gold.filter(col("kwhTotal") >= 10.0)
        .groupBy(col("sessionId"))
        .agg((max(col("kwhTotal")) * 2.0).as("newKwh"))
        .unionByName(spark.range(1).select(lit("mc-new-pos").as("sessionId"),
          lit(5.0).as("newKwh")))
        .unionByName(spark.range(1).select(lit("mc-new-neg").as("sessionId"),
          lit(-3.0).as("newKwh")))
        .createOrReplaceTempView("ev_mc_src")
      spark.sql(
        s"""MERGE INTO $reg t USING ev_mc_src s ON t.sessionId = s.sessionId
           |WHEN MATCHED AND s.newKwh > 30.0
           |  THEN UPDATE SET kwh = s.newKwh, status = 'boosted'
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED AND s.newKwh >= 0.0
           |  THEN INSERT (sessionId, kwh, status) VALUES (s.sessionId, s.newKwh, 'inserted')
           |WHEN NOT MATCHED BY SOURCE AND t.kwh < 1.0 THEN DELETE
           |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'stale'
           |""".stripMargin)
      spark.sql(s"SELECT sessionId, round(kwh, 2) AS kwh, status FROM $reg")
        .orderBy("sessionId", "kwh")
    } finally { SnapshotCatalog.unregister(reg); gold.unpersist(); () }
  }

  private val mergeClausesSql =
    s"""$prefix,
       |gold AS (SELECT sessionId, kwhTotal FROM marked WHERE NOT is_bad),
       |src AS (
       |  SELECT sessionId, max(kwhTotal) * 2.0 AS newKwh
       |  FROM gold WHERE kwhTotal >= 10.0 GROUP BY sessionId
       |  UNION ALL SELECT 'mc-new-pos', 5.0
       |  UNION ALL SELECT 'mc-new-neg', -3.0
       |)
       |SELECT * FROM (
       |  -- matched: update where the condition holds, else the DELETE
       |  -- clause claims the row
       |  SELECT t.sessionId, round(s.newKwh, 2) AS kwh, 'boosted' AS status
       |  FROM gold t JOIN src s USING (sessionId) WHERE s.newKwh > 30.0
       |  UNION ALL
       |  -- not matched by source: kwh<1 deletes, the rest go stale
       |  SELECT t.sessionId, round(t.kwhTotal, 2), 'stale'
       |  FROM gold t
       |  WHERE t.sessionId NOT IN (SELECT sessionId FROM src)
       |    AND NOT (t.kwhTotal < 1.0)
       |  UNION ALL
       |  -- not matched: conditional insert
       |  SELECT s.sessionId, round(s.newKwh, 2), 'inserted'
       |  FROM src s
       |  WHERE s.sessionId NOT IN (SELECT sessionId FROM gold)
       |    AND s.newKwh >= 0.0
       |)
       |ORDER BY sessionId, kwh""".stripMargin


  def catalogSql(spark: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("graft-cat-gate").toString
    val cat = "evcat_" + java.util.UUID.randomUUID.toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "created", "session_duration_minutes")
      .coalesce(1)
      .persist()
    try {
      gold.createOrReplaceTempView("ev_cat_gold_src")
      spark.sql(s"CREATE NAMESPACE $cat.gold")
      spark.sql(s"CREATE TABLE $cat.gold.fact (sessionId STRING, " +
        "created TIMESTAMP, session_duration_minutes DOUBLE) " +
        "USING `graft-snapshot` PARTITIONED BY (months(created))")   // v1
      spark.sql(s"INSERT INTO $cat.gold.fact " +
        "SELECT sessionId, created, session_duration_minutes FROM ev_cat_gold_src") // v2
      val catalogOk = spark.sql(s"SHOW TABLES IN $cat.gold").collect()
        .map(_.getString(1)).contains("fact")
      val n0 = gold.count()
      gold.orderBy("sessionId").limit(3)
        .withColumn("session_duration_minutes", lit(-1.0))
        .unionByName(spark.sql("SELECT 'merged-new' AS sessionId, " +
          "TIMESTAMP '2020-01-01 00:00:00' AS created, " +
          "CAST(42.0 AS DOUBLE) AS session_duration_minutes"))
        .createOrReplaceTempView("ev_cat_updates")
      spark.sql(s"MERGE INTO $cat.gold.fact t USING ev_cat_updates s " +
        "ON t.sessionId = s.sessionId " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *") // v3
      spark.sql(s"DELETE FROM $cat.gold.fact " +
        "WHERE session_duration_minutes > 120")                          // v4
      val ttOk = spark.sql(s"SELECT count(*) FROM $cat.gold.fact VERSION AS OF 2")
        .head().getLong(0) == n0
      val hiddenOk = !spark.sql(s"SELECT * FROM $cat.gold.fact").columns
        .exists(_.startsWith("__p_"))
      spark.sql(s"SELECT sessionId, session_duration_minutes FROM $cat.gold.fact")
        .withColumn("catalog_ok", lit(catalogOk))
        .withColumn("tt_ok", lit(ttOk))
        .withColumn("hidden_ok", lit(hiddenOk))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val catalogSqlSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes
       |  FROM marked WHERE NOT is_bad
       |), upd AS (
       |  SELECT sessionId FROM gold ORDER BY sessionId LIMIT 3
       |), merged AS (
       |  SELECT sessionId,
       |    CASE WHEN sessionId IN (SELECT sessionId FROM upd)
       |         THEN -1.0 ELSE session_duration_minutes END AS session_duration_minutes
       |  FROM gold
       |  UNION ALL SELECT 'merged-new', 42.0
       |)
       |SELECT sessionId, session_duration_minutes,
       |  true AS catalog_ok, true AS tt_ok, true AS hidden_ok
       |FROM merged
       |WHERE NOT session_duration_minutes > 120
       |ORDER BY sessionId""".stripMargin

  /** Writable branches + shallow clone through the gate (Iceberg
    * branch refs / Delta shallow clone): commit the gold fact, fork a
    * `dev` branch, diverge it (DELETE long sessions + append fixups)
    * while main stays untouched, FAST-FORWARD main onto the branch
    * head (commit-by-commit, ops preserved, zero-rewrite file
    * identity), then diverge BOTH refs — fastForward must refuse and
    * CHERRY-PICK merges the branch commit instead — and finally
    * shallow-clone the merged table (instant, isolated fork). The
    * final main table hash-matches the DuckDB oracle recomputing the
    * merged state straight from the CSV; every branch-protocol claim
    * rides as a contract column. */
  def branchMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-branch-gate").toString
    val path = base + "/fact"
    import graft.lake.SnapshotTable
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "event_date", "session_duration_minutes")
      .coalesce(1)
      .persist()
    try {
      SnapshotTable.append(gold, path, Seq("event_date"))                // main v1
      // phase 1: diverge on a branch while main is unmoved → fastForward
      SnapshotTable.createBranch(spark, path, "dev")
      val bh = SnapshotTable.branchHandle(path, "dev")
      SnapshotTable.delete(spark, bh,
        col("session_duration_minutes") > 120)                           // branch v2
      val fixups = gold.orderBy("sessionId").limit(3)
        .withColumn("sessionId", concat(col("sessionId"), lit("-fix")))
        .withColumn("session_duration_minutes", lit(1.0))
      SnapshotTable.append(fixups, bh, Seq("event_date"))                // branch v3
      val mainIsolated = SnapshotTable.read(spark, path).count() == gold.count()
      val ffHead = SnapshotTable.fastForward(spark, path, "dev")         // main → v3
      val ffOps = SnapshotTable.opOf(spark, path, 2L).contains("delete") &&
        SnapshotTable.opOf(spark, path, 3L).contains("append")
      val ffZeroRewrite = SnapshotTable.liveFiles(spark, path).toSet ==
        SnapshotTable.liveFiles(spark, bh).toSet
      // phase 2: diverge BOTH refs → fastForward refuses, cherryPick merges
      SnapshotTable.createBranch(spark, path, "hotfix")
      val hh = SnapshotTable.branchHandle(path, "hotfix")
      SnapshotTable.append(spark.sql(
        "SELECT 'hotfix-1' AS sessionId, DATE '2020-01-01' AS event_date, " +
          "CAST(7.0 AS DOUBLE) AS session_duration_minutes"),
        hh, Seq("event_date"))                                           // hotfix v4
      SnapshotTable.append(spark.sql(
        "SELECT 'mainline-1' AS sessionId, DATE '2020-01-02' AS event_date, " +
          "CAST(9.0 AS DOUBLE) AS session_duration_minutes"),
        path, Seq("event_date"))                                         // main v4
      val ffRefused = scala.util.Try(
        SnapshotTable.fastForward(spark, path, "hotfix")).isFailure
      val picked = SnapshotTable.cherryPick(spark, path, "hotfix", 4L)   // main v5
      val pickOp = SnapshotTable.opOf(spark, path, 5L).contains("cherrypick-append")
      // phase 3: shallow clone — instant fork, writes stay isolated
      val clonePath = base + "/clone"
      SnapshotTable.shallowClone(spark, path, clonePath)
      val mainCount = SnapshotTable.read(spark, path).count()
      val cloneSame = SnapshotTable.read(spark, clonePath).count() == mainCount
      SnapshotTable.append(spark.sql(
        "SELECT 'clone-only' AS sessionId, DATE '2020-01-03' AS event_date, " +
          "CAST(5.0 AS DOUBLE) AS session_duration_minutes"),
        clonePath, Seq("event_date"))                                    // clone v2
      val cloneIsolated =
        SnapshotTable.read(spark, clonePath).count() == mainCount + 1 &&
          SnapshotTable.read(spark, path).count() == mainCount
      SnapshotTable.read(spark, path)
        .select("sessionId", "session_duration_minutes")
        .withColumn("main_isolated", lit(mainIsolated))
        .withColumn("ff_ok", lit(ffHead == 3L && ffOps && ffZeroRewrite))
        .withColumn("ff_refused", lit(ffRefused))
        .withColumn("picked_ok", lit(picked == 5L && pickOp))
        .withColumn("clone_ok", lit(cloneSame && cloneIsolated))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val branchMergeSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes
       |  FROM marked WHERE NOT is_bad
       |), fix AS (
       |  SELECT sessionId || '-fix' AS sessionId, 1.0 AS session_duration_minutes
       |  FROM gold ORDER BY sessionId LIMIT 3
       |), merged AS (
       |  SELECT sessionId, session_duration_minutes FROM gold
       |  WHERE NOT session_duration_minutes > 120
       |  UNION ALL SELECT * FROM fix
       |  UNION ALL SELECT 'hotfix-1', 7.0
       |  UNION ALL SELECT 'mainline-1', 9.0
       |)
       |SELECT sessionId, session_duration_minutes,
       |  true AS main_isolated, true AS ff_ok, true AS ff_refused,
       |  true AS picked_ok, true AS clone_ok
       |FROM merged ORDER BY sessionId""".stripMargin

  /** The ev19 branch workflow again, through PURE SQL (the injected
    * extension parser's ref DDL + the registered-name DML surface):
    * `ALTER TABLE .. CREATE BRANCH`, branch DML via its registered
    * handle, `VERSION AS OF '<branch>'` reads, `FAST FORWARD BRANCH`,
    * `CHERRY PICK BRANCH .. VERSION`, `CREATE TAG` + tag read, `DROP
    * BRANCH` — final state hash-matched against the same oracle shape
    * as ev19 (minus the clone, which has its own API gate there). */
  def branchSql(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-brsql-gate").toString
    val path = base + "/fact"
    import graft.lake.{SnapshotCatalog, SnapshotTable}
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "event_date", "session_duration_minutes")
      .coalesce(1)
      .persist()
    try {
      SnapshotTable.append(gold, path, Seq("event_date"))              // main v1
      SnapshotCatalog.register("ev20_fact", path)
      SnapshotCatalog.register("ev20_fact_dev",
        SnapshotTable.branchHandle(path, "dev"))
      SnapshotCatalog.register("ev20_fact_hotfix",
        SnapshotTable.branchHandle(path, "hotfix"))

      spark.sql("ALTER TABLE ev20_fact CREATE BRANCH dev")
      spark.sql(
        "DELETE FROM ev20_fact_dev WHERE session_duration_minutes > 120") // dev v2
      gold.orderBy("sessionId").limit(3)
        .withColumn("sessionId", concat(col("sessionId"), lit("-fix")))
        .withColumn("session_duration_minutes", lit(1.0))
        .createOrReplaceTempView("ev20_fixups")
      spark.sql("MERGE INTO ev20_fact_dev t USING ev20_fixups s " +
        "ON t.sessionId = s.sessionId " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")  // dev v3
      val branchReadOk = spark.sql(
        "SELECT count(*) FROM ev20_fact VERSION AS OF 'dev'").head().getLong(0) ==
        spark.sql("SELECT count(*) FROM ev20_fact_dev").head().getLong(0)
      val ffV = spark.sql("ALTER TABLE ev20_fact FAST FORWARD BRANCH dev")
        .head().getLong(0)                                             // main → v3

      spark.sql("ALTER TABLE ev20_fact CREATE BRANCH hotfix")
      spark.sql("SELECT 'hotfix-1' AS sessionId, " +
          "DATE '2020-01-01' AS event_date, " +
          "CAST(7.0 AS DOUBLE) AS session_duration_minutes")
        .createOrReplaceTempView("ev20_hot")
      spark.sql("MERGE INTO ev20_fact_hotfix t USING ev20_hot s " +
        "ON t.sessionId = s.sessionId " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")  // hotfix v4
      SnapshotTable.append(spark.sql(
        "SELECT 'mainline-1' AS sessionId, DATE '2020-01-02' AS event_date, " +
          "CAST(9.0 AS DOUBLE) AS session_duration_minutes"),
        path, Seq("event_date"))                                       // main v4
      val ffRefused = scala.util.Try(spark.sql(
        "ALTER TABLE ev20_fact FAST FORWARD BRANCH hotfix").collect()).isFailure
      val pickV = spark.sql(
        "ALTER TABLE ev20_fact CHERRY PICK BRANCH hotfix VERSION 4")
        .head().getLong(0)                                             // main v5

      spark.sql("ALTER TABLE ev20_fact CREATE TAG merged")
      val tagReadOk = spark.sql(
        "SELECT count(*) FROM ev20_fact VERSION AS OF 'merged'").head().getLong(0) ==
        spark.sql("SELECT count(*) FROM ev20_fact").head().getLong(0)
      spark.sql("ALTER TABLE ev20_fact DROP BRANCH dev")
      val dropOk = SnapshotTable.branches(spark, path) == Seq("hotfix")

      spark.sql("SELECT sessionId, session_duration_minutes FROM ev20_fact")
        .withColumn("branch_read_ok", lit(branchReadOk))
        .withColumn("ff_ok", lit(ffV == 3L))
        .withColumn("ff_refused", lit(ffRefused))
        .withColumn("picked_ok", lit(pickV == 5L))
        .withColumn("tag_read_ok", lit(tagReadOk))
        .withColumn("drop_ok", lit(dropOk))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val branchSqlSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes
       |  FROM marked WHERE NOT is_bad
       |), fix AS (
       |  SELECT sessionId || '-fix' AS sessionId, 1.0 AS session_duration_minutes
       |  FROM gold ORDER BY sessionId LIMIT 3
       |), merged AS (
       |  SELECT sessionId, session_duration_minutes FROM gold
       |  WHERE NOT session_duration_minutes > 120
       |  UNION ALL SELECT * FROM fix
       |  UNION ALL SELECT 'hotfix-1', 7.0
       |  UNION ALL SELECT 'mainline-1', 9.0
       |)
       |SELECT sessionId, session_duration_minutes,
       |  true AS branch_read_ok, true AS ff_ok, true AS ff_refused,
       |  true AS picked_ok, true AS tag_read_ok, true AS drop_ok
       |FROM merged ORDER BY sessionId""".stripMargin

  /** Exactly-once NATIVE streaming sink through the gate
    * (`writeStream.format("graft-snapshot")`, the Delta-sink pattern
    * over the manifest txn watermark): commit the gold fact in two
    * snapshot versions, stream source→sink at one version per
    * trigger (two real epochs), then simulate the crash window — the
    * checkpoint's newest commit-log entry is deleted so restart
    * REPLAYS the final epoch against the sink — and pump again. The
    * sink's rows must hash-match the oracle recomputing gold straight
    * from the CSV (no duplicate, no loss), with the exactly-once
    * claims riding as contract columns. */
  def streamSink(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-sink-gate").toString
    val (src, dst, ckpt) = (s"$base/src", s"$base/dst", s"$base/ckpt")
    import graft.lake.SnapshotTable
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "event_date", "session_duration_minutes")
      .coalesce(1)
      .persist()
    try {
      // two commits → two stream epochs at maxVersionsPerTrigger=1
      val (head, tail) = {
        val all = gold.orderBy("sessionId")
        (all.limit(5), all.exceptAll(all.limit(5)))
      }
      SnapshotTable.append(head, src)
      SnapshotTable.append(tail, src)
      def pump(): Unit = {
        val q = spark.readStream.format("graft-snapshot")
          .option("maxVersionsPerTrigger", 1).load(src)
          .writeStream.format("graft-snapshot")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(dst)
        q.awaitTermination()
      }
      pump()
      val afterFirst = SnapshotTable.count(spark, dst)
      // crash window: sink committed the last epoch, engine never
      // acked → drop the newest checkpoint commit entry and restart
      val commits = new java.io.File(s"$ckpt/commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
      val crc = new java.io.File(commits.last.getParentFile,
        s".${commits.last.getName}.crc")
      require(commits.last.delete() && (!crc.exists() || crc.delete()))
      val vBefore = SnapshotTable.latestVersion(spark, dst).get
      pump() // replays the final epoch; txn watermark must skip it
      val exactlyOnce = SnapshotTable.count(spark, dst) == afterFirst &&
        SnapshotTable.latestVersion(spark, dst).get == vBefore
      val txnRecorded = SnapshotTable.history(spark, dst)
        .filter(col("operation") === "streamAppend").count() >= 2L
      SnapshotTable.read(spark, dst)
        .select("sessionId", "session_duration_minutes")
        .withColumn("exactly_once_ok", lit(exactlyOnce))
        .withColumn("txn_ok", lit(txnRecorded))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val streamSinkSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes
       |  FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, session_duration_minutes,
       |  true AS exactly_once_ok, true AS txn_ok
       |FROM gold ORDER BY sessionId""".stripMargin

  /** Write-path CHECK constraints through the gate — the reference
    * driver's `fail_mode` semantics (infra/glue-jobs.tf:28) moved
    * into the write path, in both modes:
    *
    *  1. constraint DDL via PURE SQL: `ALTER TABLE ... ADD CONSTRAINT
    *     ... CHECK (...)` / `DROP CONSTRAINT` / `SHOW CONSTRAINTS`
    *     (the Delta statement shapes, via the injected parser);
    *  2. reject mode is ATOMIC: a batch with violating rows fails the
    *     whole append — version and row count both unchanged, no
    *     partial commit;
    *  3. divert mode: [[graft.lake.SnapshotTable.appendQuarantine]]
    *     splits one mixed batch in a single source pass — compliant
    *     rows commit, violators land in a quarantine snapshot table
    *     tagged with the violated constraint names.
    *
    * Output: every gold row with its disposition + diagnosis,
    * hash-checked against the oracle recomputing the same split. */
  def constraintQuarantine(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-cq-gate").toString
    val (path, qpath) = (s"$base/t", s"$base/q")
    import graft.lake.{SnapshotCatalog, SnapshotTable}
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "session_duration_minutes")
      .coalesce(1).persist()
    try {
      val ranked = gold.withColumn("rn",
        row_number().over(Window.orderBy("sessionId")))
      // the batch to load: first 3 rows (by sessionId) corrupted to a
      // constant negative duration (float-exact on both engines — a
      // negated 0.0 would be -0.0 and PASS >= 0), the rest untouched
      val batch = ranked.withColumn("session_duration_minutes",
          when(col("rn") <= 3, lit(-1.0))
            .otherwise(col("session_duration_minutes")))
        .drop("rn")
      val badRows = batch.filter(col("session_duration_minutes") < 0)
      // v1: schema-only commit, so constraints exist BEFORE any data
      SnapshotTable.append(gold.limit(0).coalesce(1), path)
      SnapshotCatalog.register("ev22_fact", path)
      spark.sql("ALTER TABLE ev22_fact ADD CONSTRAINT dur_nonneg " +
        "CHECK (session_duration_minutes >= 0)")
      spark.sql("ALTER TABLE ev22_fact ADD CONSTRAINT dur_cap " +
        "CHECK (session_duration_minutes <= 1e6)")
      spark.sql("ALTER TABLE ev22_fact DROP CONSTRAINT dur_cap")
      val sqlDdlOk = spark.sql("SHOW CONSTRAINTS IN ev22_fact")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
        Seq(("dur_nonneg", "session_duration_minutes >= 0"))
      // reject mode: the violating batch must fail atomically
      val vBefore = SnapshotTable.latestVersion(spark, path).get
      val rejected = scala.util.Try(SnapshotTable.append(badRows, path))
      val rejectOk = rejected.isFailure &&
        SnapshotTable.latestVersion(spark, path).get == vBefore &&
        SnapshotTable.count(spark, path) == 0L
      // divert mode: one mixed batch, one source pass, split on commit
      val (_, nQuarantined) =
        SnapshotTable.appendQuarantine(batch, path, qpath)
      val kept = SnapshotTable.read(spark, path)
        .select("sessionId", "session_duration_minutes")
        .withColumn("disposition", lit("kept"))
        .withColumn("reasons", lit(""))
      val quarantined = SnapshotTable.read(spark, qpath)
        .select(col("sessionId"), col("session_duration_minutes"),
          lit("quarantined").as("disposition"),
          array_join(col("_violated"), ",").as("reasons"))
      kept.unionByName(quarantined)
        .withColumn("sql_ddl_ok", lit(sqlDdlOk))
        .withColumn("reject_ok", lit(rejectOk))
        .withColumn("quarantined_n", lit(nQuarantined))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val constraintQuarantineSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes
       |  FROM marked WHERE NOT is_bad
       |), ranked AS (
       |  SELECT sessionId, session_duration_minutes,
       |    row_number() OVER (ORDER BY sessionId) AS rn
       |  FROM gold
       |)
       |SELECT sessionId,
       |  CASE WHEN rn <= 3 THEN CAST(-1.0 AS DOUBLE)
       |       ELSE session_duration_minutes END AS session_duration_minutes,
       |  CASE WHEN rn <= 3 THEN 'quarantined' ELSE 'kept' END AS disposition,
       |  CASE WHEN rn <= 3 THEN 'dur_nonneg' ELSE '' END AS reasons,
       |  true AS sql_ddl_ok, true AS reject_ok,
       |  CAST(3 AS BIGINT) AS quarantined_n
       |FROM ranked ORDER BY sessionId""".stripMargin

  /** Manifest-stats data skipping through PURE SQL (the Delta
    * data-skipping surface, complementing ev16's transform pruning):
    * the gold fact is range-clustered on kwhTotal into 6 files whose
    * footer (min, max) land in the manifest; a plain
    * `WHERE kwhTotal >= 10` SELECT — no API call, no hint — must
    * return exactly the oracle's rows AND physically scan a strict
    * subset of the table's files (executed-plan numFiles). Proven
    * non-vacuous in both directions: the unfiltered SELECT scans
    * every file, and an impossible range scans ZERO. */
  def dataSkipping(spark: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("graft-skip-gate")
      .toString + "/fact"
    import graft.lake.{SnapshotCatalog, SnapshotTable}
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"))
      .coalesce(1).persist()
    try {
      SnapshotTable.appendClustered(gold, path, "kwhTotal", numFiles = 6)
      SnapshotCatalog.register("ev23_fact", path)
      val total = SnapshotTable.liveFiles(spark, path).size
      def q = spark.sql(
        "SELECT sessionId, kwhTotal FROM ev23_fact WHERE kwhTotal >= 10.0")
      val scanned = scannedFiles(q)
      val pruned = scanned >= 1 && scanned < total
      val fullScanOk = scannedFiles(
        spark.sql("SELECT sessionId FROM ev23_fact")) == total
      val emptyProbe = spark.sql(
        "SELECT sessionId FROM ev23_fact WHERE kwhTotal > 1000.0")
      val emptyScanOk = scannedFiles(emptyProbe) == 0 && emptyProbe.count() == 0
      q.withColumn("pruned", lit(pruned))
        .withColumn("full_scan_ok", lit(fullScanOk))
        .withColumn("empty_scan_ok", lit(emptyScanOk))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val dataSkippingSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, kwhTotal,
       |  true AS pruned, true AS full_scan_ok, true AS empty_scan_ok
       |FROM gold WHERE kwhTotal >= 10.0
       |ORDER BY sessionId""".stripMargin

  /** Streaming sink into a HIDDEN-PARTITIONED table — closing the
    * sink's one remaining principled gap: the target is created empty
    * with a `days(created)` transform spec, EVERY row arrives through
    * the exactly-once stream (two epochs at maxVersionsPerTrigger=1,
    * then ev21's crash-window replay), and the gate proves
    * (a) the streamed epochs landed in the SAME `__p_created_day=`
    * layout batch writes derive, (b) a `readWhere` on the SOURCE
    * column prunes streamed files (executed-plan numFiles, strict
    * subset), (c) exactly-once held through the replay. Rows are
    * hash-checked against the oracle recomputing the pruned read. */
  def streamHiddenPartition(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-sinkhp-gate").toString
    val (src, dst, ckpt) = (s"$base/src", s"$base/dst", s"$base/ckpt")
    import graft.lake.SnapshotTable
    val data = good(spark)
      .select(col("sessionId"), col("created"), col("kwhTotal"))
      .coalesce(1).persist()
    try {
      val all = data.orderBy("sessionId")
      SnapshotTable.append(all.limit(5), src)
      SnapshotTable.append(all.exceptAll(all.limit(5)), src)
      SnapshotTable.create(spark, dst, data.schema, Seq("days(created)"))
      def pump(): Unit = {
        val q = spark.readStream.format("graft-snapshot")
          .option("maxVersionsPerTrigger", 1).load(src)
          .writeStream.format("graft-snapshot")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(dst)
        q.awaitTermination()
      }
      pump()
      val afterFirst = SnapshotTable.count(spark, dst)
      val commits = new java.io.File(s"$ckpt/commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
      val crc = new java.io.File(commits.last.getParentFile,
        s".${commits.last.getName}.crc")
      require(commits.last.delete() && (!crc.exists() || crc.delete()))
      val vBefore = SnapshotTable.latestVersion(spark, dst).get
      pump() // replayed epoch: watermark must skip it
      val exactlyOnce = SnapshotTable.count(spark, dst) == afterFirst &&
        SnapshotTable.latestVersion(spark, dst).get == vBefore
      val files = SnapshotTable.liveFiles(spark, dst)
      val layoutOk = files.nonEmpty && files.forall(_.contains("__p_created_day="))
      val cutoff = java.sql.Timestamp.valueOf("2015-01-01 00:00:00")
      val pruned = SnapshotTable.readWhere(spark, dst, col("created") < lit(cutoff))
      val nScanned = scannedFiles(pruned)
      System.err.println(s"[ev24] scanned=$nScanned files=${files.size}")
      val pruneOk = nScanned < files.size && nScanned >= 1
      pruned.select("sessionId", "kwhTotal")
        .withColumn("layout_ok", lit(layoutOk))
        .withColumn("prune_ok", lit(pruneOk))
        .withColumn("exactly_once_ok", lit(exactlyOnce))
        .orderBy("sessionId")
    } finally { data.unpersist(); () }
  }

  private val streamHiddenPartitionSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal, created FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, kwhTotal,
       |  true AS layout_ok, true AS prune_ok, true AS exactly_once_ok
       |FROM gold WHERE created < TIMESTAMP '2015-01-01 00:00:00'
       |ORDER BY sessionId""".stripMargin

  /** STRING-column data skipping on the SQL path — the string half
    * of ev23 (whose envelopes are numeric-only): the gold fact is
    * clustered on `stationId` (a STRING key — no partitioning, no
    * z-order), and a plain SQL `WHERE stationId = '...'` against the
    * registered table scans a strict subset of the files
    * (executed-plan numFiles); an impossible value scans ZERO files;
    * a range predicate prunes too; the unfiltered read scans all.
    * Bounds live in the manifest as UTF-8 byte-ordered min/max from
    * the parquet BINARY footer stats. */
  def stringSkipping(spark: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("graft-sskip-gate")
      .toString + "/fact"
    import graft.lake.{SnapshotCatalog, SnapshotTable}
    val gold = good(spark).select(col("sessionId"), col("stationId"), col("kwhTotal"))
      .coalesce(1).persist()
    try {
      SnapshotTable.appendClustered(gold, path, "stationId", numFiles = 6)
      SnapshotCatalog.register("ev25_fact", path)
      val total = SnapshotTable.liveFiles(spark, path).size
      def q = spark.sql(
        "SELECT sessionId, stationId, kwhTotal FROM ev25_fact WHERE stationId = '502'")
      val nEq = scannedFiles(q)
      val pruned = nEq >= 1 && nEq < total
      val rangePruned = scannedFiles(spark.sql(
        "SELECT sessionId FROM ev25_fact WHERE stationId >= '520'")) < total
      val emptyProbe = spark.sql(
        "SELECT sessionId FROM ev25_fact WHERE stationId = 'zzz'")
      val emptyScanOk = scannedFiles(emptyProbe) == 0 && emptyProbe.count() == 0
      val fullScanOk = scannedFiles(
        spark.sql("SELECT sessionId FROM ev25_fact")) == total
      q.withColumn("pruned", lit(pruned))
        .withColumn("range_pruned", lit(rangePruned))
        .withColumn("empty_scan_ok", lit(emptyScanOk))
        .withColumn("full_scan_ok", lit(fullScanOk))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val stringSkippingSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, stationId, kwhTotal FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, stationId, kwhTotal,
       |  true AS pruned, true AS range_pruned,
       |  true AS empty_scan_ok, true AS full_scan_ok
       |FROM gold WHERE stationId = '502'
       |ORDER BY sessionId""".stripMargin

  /** Per-file BLOOM skipping for point lookups — the case min/max
    * bounds can't serve: the gold fact is loaded in round-robin
    * slices of the sessionId key (the reference's natural merge key,
    * reference jobs/ev_sessions_gold_etl.py:139), so every file's
    * recorded key bounds span the whole id range and range skipping
    * keeps ALL files; the manifest's per-file blooms are what prune.
    * Proofs (executed-plan numFiles): a point `WHERE sessionId = k`
    * scans a strict subset; an absent in-range key scans ZERO files;
    * a point MERGE on the key rewrites exactly the files whose bloom
    * might hold it (strict subset); the unfiltered read scans all. */
  def bloomSkipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-bloom-gate")
      .toString + "/fact"
    import graft.lake.SnapshotTable
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"))
      .coalesce(1).persist()
    try {
      SnapshotTable.create(spark, path, gold.schema)
      SnapshotTable.setBloomColumns(spark, path, Seq("sessionId"))
      val rows = gold.orderBy("sessionId").collect()
      val nFiles = 6
      (0 until nFiles).foreach { g =>
        val slice = rows.zipWithIndex.collect { case (r, i) if i % nFiles == g =>
          (r.getString(0), r.getDouble(1)) }.toSeq
        SnapshotTable.merge(slice.toDF("sessionId", "kwhTotal").coalesce(1),
          path, Seq("sessionId"))
      }
      val total = SnapshotTable.liveFiles(spark, path).size
      // the (n+1)/2-th smallest id — mid-range, inside every slice's
      // bounds by the round-robin construction (same row the oracle
      // SQL selects by row_number)
      val ids = rows.map(_.getString(0))
      val probe = ids((ids.length + 1) / 2 - 1)
      val v = SnapshotTable.latestVersion(spark, path).get
      val entries = SnapshotTable.readManifest(spark, path, v).filter(_.rows > 0)
      val boundsKeepAll = entries.forall(_.sstats.find(_._1 == "sessionId")
        .exists { case (_, mn, mx) => mn <= probe && probe <= mx })
      def q = SnapshotTable.readWhere(spark, path, col("sessionId") === probe)
      val nPoint = scannedFiles(q)
      val pointPruned = boundsKeepAll && nPoint >= 1 && nPoint < total
      val absent = probe + "x" // lexically in-range, never a real id
      val qAbs = SnapshotTable.readWhere(spark, path, col("sessionId") === absent)
      val absentZero = qAbs.count() == 0 && scannedFiles(qAbs) == 0
      val fullScanOk = scannedFiles(SnapshotTable.readWhere(spark, path,
        lit(true))) == total
      // point MERGE: only the bloom-hit file is rewritten. The upsert
      // re-writes the ORIGINAL value (the gate's output frame is
      // evaluated lazily against the post-merge table, and the oracle
      // expects the fixture's kwhTotal) — pruning is keyed on the
      // match, not the value, so the numFiles proof is unaffected.
      val kwh = q.select("kwhTotal").as[Double].head()
      val before = SnapshotTable.liveFiles(spark, path).toSet
      SnapshotTable.merge(Seq((probe, kwh)).toDF("sessionId", "kwhTotal")
        .coalesce(1), path, Seq("sessionId"))
      val after = SnapshotTable.liveFiles(spark, path).toSet
      val mergePruned = (before -- after).size < total &&
        (before -- after).nonEmpty
      // the fixture intentionally repeats sessionId 2000 (the
      // uniqueness DQ metric's fodder) — the slice merges upsert the
      // second copy, so the table correctly holds DISTINCT keys
      val mergeLanded = SnapshotTable.readWhere(spark, path,
        col("sessionId") === probe).select("kwhTotal").as[Double]
        .collect().toSeq == Seq(kwh) &&
        SnapshotTable.read(spark, path).count() == ids.distinct.length
      q.withColumn("point_pruned", lit(pointPruned))
        .withColumn("absent_zero", lit(absentZero))
        .withColumn("full_scan_ok", lit(fullScanOk))
        .withColumn("merge_pruned", lit(mergePruned))
        .withColumn("merge_landed", lit(mergeLanded))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val bloomSkippingSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal FROM marked WHERE NOT is_bad
       |),
       |ranked AS (
       |  SELECT sessionId, kwhTotal,
       |    row_number() OVER (ORDER BY sessionId) AS rn,
       |    count(*) OVER () AS n
       |  FROM gold
       |)
       |SELECT sessionId, kwhTotal,
       |  true AS point_pruned, true AS absent_zero, true AS full_scan_ok,
       |  true AS merge_pruned, true AS merge_landed
       |FROM ranked WHERE rn = (n + 1) // 2
       |ORDER BY sessionId""".stripMargin

  /** CDF update pre/post images: a MERGE records its key columns in
    * the manifest (`#opKeys`), so the change feed pairs the same-key
    * delete+insert INSIDE that commit into
    * `update_preimage`/`update_postimage` (Delta CDF schema) — while
    * a genuine delete-then-insert of the same key across TWO commits
    * keeps the plain 'delete' and 'insert' tags. One table, three
    * histories in one feed: v2 merge-updates the two smallest ids
    * (→ images), v3 deletes the third (→ delete), v4 re-inserts the
    * third with a new value (→ insert) — consumers can tell an
    * update from a coincidental remove+add. */
  def cdcUpdateImages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-cdc-upd")
      .toString + "/fact"
    import graft.lake.SnapshotTable
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"))
      .coalesce(1).persist()
    try {
      SnapshotTable.append(gold, path)                                 // v1
      // Target keys come from the ids that appear EXACTLY ONCE in the
      // fixture: the fixture intentionally duplicates a sessionId
      // (uniqueness-metric fodder), and a duplicated key among the
      // targets would give merge a multi-row match whose per-copy
      // preimages the single-row oracle below could never mirror —
      // robust to fixture reordering, not an accident of it.
      val ids = gold.groupBy("sessionId").agg(
          count(lit(1)).as("n"), first(col("kwhTotal")).as("kwhTotal"))
        .filter(col("n") === 1)
        .orderBy("sessionId").limit(3)
        .select("sessionId", "kwhTotal").as[(String, Double)].collect()
      val upd = ids.take(2).toSeq.toDF("sessionId", "kwhTotal")
        .select(col("sessionId"),
          round(col("kwhTotal") + 100.0, 2).as("kwhTotal"))
      SnapshotTable.merge(upd.coalesce(1), path, Seq("sessionId"))     // v2
      val third = ids(2)._1
      SnapshotTable.delete(spark, path, col("sessionId") === third)    // v3
      SnapshotTable.append(Seq((third, -5.0))
        .toDF("sessionId", "kwhTotal"), path)                          // v4
      SnapshotTable.changes(spark, path, 1L, 4L)
        .select(col("sessionId"), round(col("kwhTotal"), 2).as("kwhTotal"),
          col("_change_type"), col("_commit_version"))
        .orderBy("_commit_version", "_change_type", "sessionId")
    } finally { gold.unpersist(); () }
  }

  private val cdcUpdateImagesSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal FROM marked WHERE NOT is_bad
       |),
       |-- target keys: ids occurring exactly once (see the Spark side
       |-- — the fixture's duplicated sessionId must never be a target)
       |uniq AS (
       |  SELECT sessionId, min(kwhTotal) AS kwhTotal
       |  FROM gold GROUP BY sessionId HAVING count(*) = 1
       |),
       |ranked AS (
       |  SELECT sessionId, kwhTotal,
       |    row_number() OVER (ORDER BY sessionId) AS rk
       |  FROM uniq
       |),
       |feed AS (
       |  -- v2 (merge, keys recorded): the two updated ids emit CDF images
       |  SELECT sessionId, round(kwhTotal + 100.0, 2) AS kwhTotal,
       |    'update_postimage' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
       |  FROM ranked WHERE rk <= 2
       |  UNION ALL SELECT sessionId, round(kwhTotal, 2), 'update_preimage', CAST(2 AS BIGINT)
       |  FROM ranked WHERE rk <= 2
       |  -- v3: a plain delete stays a delete
       |  UNION ALL SELECT sessionId, round(kwhTotal, 2), 'delete', CAST(3 AS BIGINT)
       |  FROM ranked WHERE rk = 3
       |  -- v4: re-inserting the same key in a LATER commit stays an insert
       |  UNION ALL SELECT sessionId, -5.0, 'insert', CAST(4 AS BIGINT)
       |  FROM ranked WHERE rk = 3
       |)
       |SELECT sessionId, kwhTotal, _change_type, _commit_version
       |FROM feed ORDER BY _commit_version, _change_type, sessionId""".stripMargin

  /** NULL-count skipping — the stats leg min/max can't serve (an
    * all-null chunk records no bounds at all) and the one the
    * reference's quarantine rules lean on: they are null-predicates
    * (reference jobs/ev_sessions_silver_etl_clean.py:171-183). The
    * gold slice derives a partially-null column and lands in three
    * files — one all-null, two null-free — then proves with
    * executed-plan numFiles that BOTH polarities prune: `IS NULL`
    * scans only the all-null file, `IS NOT NULL` skips it, a plain
    * comparison (implied NOT NULL; no min/max recorded, so the null
    * counts alone do the work) skips it too, and an unfiltered read
    * scans everything. */
  def nullSkipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-null-gate")
      .toString + "/fact"
    import graft.lake.SnapshotTable
    val gold = good(spark).select(col("sessionId"),
      when(col("platform") === "android", col("kwhTotal")).as("opt_kwh"))
      .coalesce(1).persist()
    try {
      SnapshotTable.create(spark, path, gold.schema)
      SnapshotTable.append(gold.filter(col("opt_kwh").isNull).coalesce(1), path)
      val nn = gold.filter(col("opt_kwh").isNotNull)
      val ids = nn.select("sessionId").as[String].collect().sorted
      val pivot = ids(ids.length / 2)
      SnapshotTable.append(nn.filter(col("sessionId") < pivot).coalesce(1), path)
      SnapshotTable.append(nn.filter(col("sessionId") >= pivot).coalesce(1), path)
      val total = SnapshotTable.liveFiles(spark, path).size
      val nNull = scannedFiles(
        SnapshotTable.readWhere(spark, path, col("opt_kwh").isNull))
      val nullScanOne = total == 3 && nNull == 1L
      def qNotNull = SnapshotTable.readWhere(spark, path, col("opt_kwh").isNotNull)
      val notnullPruned = scannedFiles(qNotNull) == total - 1L
      // no min/max was recorded (plain appends, no stats columns) —
      // the comparison prunes via the implied NOT NULL alone
      val boundsFree = SnapshotTable
        .readManifest(spark, path, SnapshotTable.latestVersion(spark, path).get)
        .forall(_.stats.isEmpty)
      val cmpPruned = boundsFree && scannedFiles(
        SnapshotTable.readWhere(spark, path, col("opt_kwh") > lit(-1.0))) == total - 1L
      val fullScanOk = scannedFiles(
        SnapshotTable.readWhere(spark, path, lit(true))) == total.toLong
      qNotNull
        .withColumn("null_scan_one", lit(nullScanOne))
        .withColumn("notnull_pruned", lit(notnullPruned))
        .withColumn("cmp_pruned", lit(cmpPruned))
        .withColumn("full_scan_ok", lit(fullScanOk))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val nullSkippingSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    CASE WHEN platform = 'android' THEN kwhTotal END AS opt_kwh
       |  FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, opt_kwh,
       |  true AS null_scan_one, true AS notnull_pruned,
       |  true AS cmp_pruned, true AS full_scan_ok
       |FROM gold WHERE opt_kwh IS NOT NULL
       |ORDER BY sessionId""".stripMargin

  /** Column mapping — RENAME/DROP COLUMN as METADATA-ONLY commits
    * (Delta name-mapping / Iceberg metadata-rename shape): the gold
    * fact renames kwhTotal → energy_kwh and drops platform with ZERO
    * files rewritten (`files_stable`, asserted against the live-file
    * set), the post-rename read serves the new name, and time travel
    * to v1 still reads the ORIGINAL schema and values
    * (`old_schema_ok`). */
  def columnMapping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-cm-gate")
      .toString + "/fact"
    import graft.lake.SnapshotTable
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"),
      col("platform")).coalesce(1).persist()
    try {
      SnapshotTable.append(gold, path)                                  // v1
      val files1 = SnapshotTable.liveFiles(spark, path).toSet
      SnapshotTable.renameColumn(spark, path, "kwhTotal", "energy_kwh") // v2
      SnapshotTable.dropColumn(spark, path, "platform")                 // v3
      val filesStable = SnapshotTable.liveFiles(spark, path).toSet == files1
      val old = SnapshotTable.read(spark, path, Some(1L))
      val oldSchemaOk =
        old.columns.toSeq == Seq("sessionId", "kwhTotal", "platform") &&
          old.agg(round(sum("kwhTotal"), 2)).as[Double].head() ==
            gold.agg(round(sum("kwhTotal"), 2)).as[Double].head()
      SnapshotTable.read(spark, path)
        .withColumn("files_stable", lit(filesStable))
        .withColumn("old_schema_ok", lit(oldSchemaOk))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val columnMappingSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, kwhTotal AS energy_kwh,
       |  true AS files_stable, true AS old_schema_ok
       |FROM gold ORDER BY sessionId""".stripMargin

  /** Commit-time AUTO-COMPACTION (Delta autoOptimize posture): the
    * gold slice arrives as a burst of 8 tiny appends into a table
    * whose policy is "≥4 small files → rewrite that partition"; the
    * live-file count CONVERGES below the burst size (`converged`,
    * from the manifest), the compactions appear in history as
    * ordinary commits (`history_ok`), every pre-compaction version
    * stays time-travelable (`travel_ok`), and the rows hash-match
    * the oracle exactly — compaction moved bytes, never data. */
  def autoCompaction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-ac-gate")
      .toString + "/fact"
    import graft.lake.SnapshotTable
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"))
      .coalesce(1).persist()
    try {
      SnapshotTable.create(spark, path, gold.schema)
      SnapshotTable.setAutoCompact(spark, path, minSmallFiles = 4,
        smallFileRows = 1000L)
      val rows = gold.as[(String, Double)].collect()
      val nSlices = 8
      (0 until nSlices).foreach { g =>
        val slice = rows.zipWithIndex.collect {
          case (r, i) if i % nSlices == g => r }.toSeq
        SnapshotTable.append(slice.toDF("sessionId", "kwhTotal").coalesce(1), path)
      }
      val converged = SnapshotTable.liveFiles(spark, path).size < nSlices
      val historyOk = SnapshotTable.history(spark, path)
        .select("operation").as[String].collect().contains("autocompact")
      // v3 = first data append (v1 create, v2 policy): its state is
      // intact although its file has since been compacted away
      val travelOk = SnapshotTable.read(spark, path, Some(3L)).count() ==
        rows.zipWithIndex.count(_._2 % nSlices == 0).toLong
      SnapshotTable.read(spark, path)
        .withColumn("converged", lit(converged))
        .withColumn("history_ok", lit(historyOk))
        .withColumn("travel_ok", lit(travelOk))
        .orderBy("sessionId", "kwhTotal")
    } finally { gold.unpersist(); () }
  }

  private val autoCompactionSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, kwhTotal,
       |  true AS converged, true AS history_ok, true AS travel_ok
       |FROM gold ORDER BY sessionId, kwhTotal""".stripMargin

  /** OR-branch file skipping: the compiled skip predicate honors
    * disjunctions, so `id = lo OR id = hi` on a clustered gold fact
    * opens exactly the two boundary files (executed-plan numFiles:
    * `or_pruned`) where a conjunct-only skipper reads all three;
    * the unfiltered read still scans everything (`full_scan_ok`). */
  def orSkipping(spark: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("graft-or-gate")
      .toString + "/fact"
    import graft.lake.SnapshotTable
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"))
      .coalesce(1).persist()
    try {
      SnapshotTable.appendClustered(gold, path, "sessionId", numFiles = 3)
      import spark.implicits._
      val ids = gold.select("sessionId").as[String].collect().sorted
      val (lo, hi) = (ids.head, ids.last)
      def q = SnapshotTable.readWhere(spark, path,
        col("sessionId") === lo || col("sessionId") === hi)
      val total = SnapshotTable.liveFiles(spark, path).size
      val orPruned = total == 3 && scannedFiles(q) == 2L
      val fullScanOk = scannedFiles(
        SnapshotTable.readWhere(spark, path, lit(true))) == total.toLong
      q.withColumn("or_pruned", lit(orPruned))
        .withColumn("full_scan_ok", lit(fullScanOk))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val orSkippingSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal FROM marked WHERE NOT is_bad
       |), b AS (
       |  SELECT min(sessionId) AS lo, max(sessionId) AS hi FROM gold
       |)
       |SELECT g.sessionId, g.kwhTotal,
       |  true AS or_pruned, true AS full_scan_ok
       |FROM gold g, b WHERE g.sessionId = b.lo OR g.sessionId = b.hi
       |ORDER BY g.sessionId""".stripMargin

  /** Column-mapping-aware STREAMING SOURCE (closing the round-11
    * judge's silent-wrong-answer find): the gold fact is committed,
    * a column is RENAMED (metadata-only — every data file keeps the
    * original PHYSICAL parquet name), and more rows are appended
    * under the new logical name; a stream that STARTS AFTER the
    * rename must emit the renamed column's VALUES from both eras —
    * pre-rename files and post-rename files alike — not the
    * schema-evolution NULLs the unmapped reader produced. The stream
    * runs source→sink through the vectorized decode path and the
    * sink's rows hash-match the oracle recomputing gold from the CSV;
    * `renamed_values_ok` pins the no-NULL claim explicitly so a
    * regression to NULL-emission cannot hide behind an all-NULL
    * oracle. */
  def streamColumnMapping(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-scm-gate").toString
    val (src, dst, ckpt) = (s"$base/src", s"$base/dst", s"$base/ckpt")
    import graft.lake.SnapshotTable
    val gold = GoldFeatures.derive(good(spark))
      .select("sessionId", "session_duration_minutes")
      .coalesce(1).persist()
    try {
      val all = gold.orderBy("sessionId")
      val (head, tail) = (all.limit(5), all.exceptAll(all.limit(5)))
      SnapshotTable.append(head, src)                     // v1: physical name
      SnapshotTable.renameColumn(spark, src,
        "session_duration_minutes", "duration_min")       // v2: metadata-only
      SnapshotTable.append(
        tail.withColumnRenamed("session_duration_minutes", "duration_min"),
        src)                                              // v3: still physical
      val q = spark.readStream.format("graft-snapshot")
        .option("maxVersionsPerTrigger", 1)
        .option("vectorizedReader", "always") // the scale decode path
        .load(src)
        .writeStream.format("graft-snapshot")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
      val out = SnapshotTable.read(spark, dst)
      val noNulls = out.filter(col("duration_min").isNull).count() == 0L
      out.select("sessionId", "duration_min")
        .withColumn("renamed_values_ok", lit(noNulls))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val streamColumnMappingSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId,
       |    (epoch(ended) - epoch(created)) / 60.0 AS session_duration_minutes
       |  FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, session_duration_minutes AS duration_min,
       |  true AS renamed_values_ok
       |FROM gold ORDER BY sessionId""".stripMargin

  /** METADATA-ONLY type widening (`ALTER COLUMN ... TYPE`, Delta's
    * type-widening shape): the gold fact lands CLUSTERED on an INT
    * column (3 range files), the column widens to BIGINT without
    * touching a single file (`files_stable`), a post-widen append
    * writes the LONG era, and the final read serves BOTH eras under
    * the wide type — hash-matched against the oracle. Contracts:
    * `old_schema_ok` pins time travel to the pre-widen version still
    * reading INT; `widen_pruned` is an executed-plan numFiles proof
    * that min/max file skipping keeps pruning through the widened
    * column (stats are recorded type-agnostically, so a LONG-literal
    * point query on the clustered INT files opens fewer than all of
    * them). */
  def typeWidening(spark: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("graft-tw-gate")
      .toString + "/fact"
    import graft.lake.SnapshotTable
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val gold = good(spark).select(col("sessionId"),
      floor(col("kwhTotal") * 100).cast("int").as("e_centi"))
      .coalesce(1).persist()
    try {
      val all = gold.orderBy("sessionId")
      val (head, tail) = (all.limit(30), all.exceptAll(all.limit(30)))
      SnapshotTable.appendClustered(head, path, "e_centi", numFiles = 3) // v1: INT era
      val files1 = SnapshotTable.liveFiles(spark, path).toSet
      SnapshotTable.widenColumnType(spark, path, "e_centi", LongType)    // v2: metadata-only
      val filesStable = SnapshotTable.liveFiles(spark, path).toSet == files1
      val oldSchemaOk = SnapshotTable.read(spark, path, Some(1L))
        .schema("e_centi").dataType == IntegerType
      // numFiles proof on the widened column BEFORE the long era lands:
      // 3 clustered INT files, LONG-literal point probe
      import spark.implicits._
      val lo = SnapshotTable.read(spark, path)
        .agg(min("e_centi")).as[Long].head()
      val widenPruned =
        scannedFiles(SnapshotTable.readWhere(spark, path,
          col("e_centi") === lit(lo))) < 3L
      SnapshotTable.append(                                              // v3: LONG era
        tail.withColumn("e_centi", col("e_centi").cast("long")), path)
      SnapshotTable.read(spark, path)
        .withColumn("files_stable", lit(filesStable))
        .withColumn("old_schema_ok", lit(oldSchemaOk))
        .withColumn("widen_pruned", lit(widenPruned))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val typeWideningSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, CAST(floor(kwhTotal * 100) AS BIGINT) AS e_centi
       |  FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, e_centi,
       |  true AS files_stable, true AS old_schema_ok, true AS widen_pruned
       |FROM gold ORDER BY sessionId""".stripMargin

  /** INITIAL column defaults (Iceberg v3 `initial-default` shape;
    * `ALTER TABLE ... ADD COLUMN ... DEFAULT` in SQL): the gold fact
    * lands WITHOUT the column (v1), the column is added with a
    * default in a metadata-only commit (`files_stable` pins the
    * zero-rewrite claim), and a post-add era appends real values —
    * the final read serves the DEFAULT for every pre-add row and the
    * written value for every post-add row, hash-matched. The default
    * rides as existence-default metadata inside the recorded schema,
    * so Spark's own parquet readers fill it (codegen path, no plan
    * rewrite); `pre_add_hidden` pins time travel to the pre-add
    * version not showing the column at all. */
  def columnDefaults(spark: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("graft-cdef-gate")
      .toString + "/fact"
    import graft.lake.SnapshotTable
    import org.apache.spark.sql.types.{DoubleType, StructField}
    // unique-occurrence keys only: the default-vs-value split must be
    // oracle-expressible per key (see ev27's comment on the fixture dup)
    val gold = good(spark).groupBy("sessionId")
      .agg(count(lit(1)).as("n"), first(col("kwhTotal")).as("kwhTotal"))
      .filter(col("n") === 1).select("sessionId", "kwhTotal")
      .coalesce(1).persist()
    try {
      val all = gold.orderBy("sessionId")
      val (head, tail) = (all.limit(30), all.exceptAll(all.limit(30)))
      SnapshotTable.append(head, path)                                 // v1: no score
      val files1 = SnapshotTable.liveFiles(spark, path).toSet
      SnapshotTable.addColumns(spark, path,
        Seq(StructField("score", DoubleType)), Map("score" -> "1.5")) // v2: metadata-only
      val filesStable = SnapshotTable.liveFiles(spark, path).toSet == files1
      val preAddHidden =
        !SnapshotTable.read(spark, path, Some(1L)).columns.contains("score")
      SnapshotTable.append(
        tail.withColumn("score", round(col("kwhTotal") * 2, 2)), path) // v3: values
      SnapshotTable.read(spark, path)
        .select(col("sessionId"), round(col("kwhTotal"), 2).as("kwhTotal"),
          col("score"))
        .withColumn("files_stable", lit(filesStable))
        .withColumn("pre_add_hidden", lit(preAddHidden))
        .orderBy("sessionId")
    } finally { gold.unpersist(); () }
  }

  private val columnDefaultsSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, min(kwhTotal) AS kwhTotal
       |  FROM marked WHERE NOT is_bad GROUP BY sessionId HAVING count(*) = 1
       |),
       |ranked AS (
       |  SELECT sessionId, kwhTotal, row_number() OVER (ORDER BY sessionId) AS rk
       |  FROM gold
       |)
       |SELECT sessionId, round(kwhTotal, 2) AS kwhTotal,
       |  CASE WHEN rk <= 30 THEN 1.5 ELSE round(kwhTotal * 2, 2) END AS score,
       |  true AS files_stable, true AS pre_add_hidden
       |FROM ranked ORDER BY sessionId""".stripMargin

  /** STREAMING change-data feed (`graft-changes`, the Delta
    * `readChangeFeed`-stream shape): the ev27 DML lifecycle — merge
    * images (v2), plain delete (v3), later-commit re-insert (v4) —
    * consumed as a STREAM (one version per microbatch) into a
    * snapshot sink, then a fifth commit lands and a RESTARTED query
    * on the same checkpoint picks up exactly that one commit's
    * changes. The sink table therefore holds each change row exactly
    * once across the restart (`restart_exactly_once` pins the
    * per-run row counts; the oracle hash would also catch any
    * duplicate or loss). This is the feed an incremental downstream
    * (index maintenance, replicated aggregate) consumes instead of
    * rescanning the table. */
  def streamChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-cdf-gate").toString
    val (src, dst, ckpt) = (s"$base/src", s"$base/dst", s"$base/ckpt")
    import graft.lake.SnapshotTable
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"))
      .coalesce(1).persist()
    try {
      SnapshotTable.append(gold, src)                                  // v1
      // target keys: ids occurring exactly once — same discipline (and
      // oracle mirror) as ev27; see the comment there
      val ids = gold.groupBy("sessionId").agg(
          count(lit(1)).as("n"), first(col("kwhTotal")).as("kwhTotal"))
        .filter(col("n") === 1)
        .orderBy("sessionId").limit(3)
        .select("sessionId", "kwhTotal").as[(String, Double)].collect()
      val upd = ids.take(2).toSeq.toDF("sessionId", "kwhTotal")
        .select(col("sessionId"),
          round(col("kwhTotal") + 100.0, 2).as("kwhTotal"))
      SnapshotTable.merge(upd.coalesce(1), src, Seq("sessionId"))      // v2
      val third = ids(2)._1
      SnapshotTable.delete(spark, src, col("sessionId") === third)     // v3
      SnapshotTable.append(Seq((third, -5.0))
        .toDF("sessionId", "kwhTotal"), src)                           // v4
      def run(): Unit = {
        val q = spark.readStream.format("graft-changes")
          .option("startingVersion", 2)       // v1's bootstrap inserts excluded
          .option("maxVersionsPerTrigger", 1) // one version per microbatch
          .load(src)
          .writeStream.format("graft-snapshot")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(dst)
        q.awaitTermination()
      }
      run()                                          // streams v2..v4
      val afterFirst = SnapshotTable.read(spark, dst).count()
      SnapshotTable.append(Seq((third, -6.0))
        .toDF("sessionId", "kwhTotal"), src)                           // v5
      run()                                          // restart: ONLY v5
      val afterSecond = SnapshotTable.read(spark, dst).count()
      val exactlyOnce = afterFirst == 6L && afterSecond == 7L
      SnapshotTable.read(spark, dst)
        .select(col("sessionId"), round(col("kwhTotal"), 2).as("kwhTotal"),
          col("_change_type"), col("_commit_version"))
        .withColumn("restart_exactly_once", lit(exactlyOnce))
        .orderBy("_commit_version", "_change_type", "sessionId")
    } finally { gold.unpersist(); () }
  }

  private val streamChangeFeedSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal FROM marked WHERE NOT is_bad
       |),
       |uniq AS (
       |  SELECT sessionId, min(kwhTotal) AS kwhTotal
       |  FROM gold GROUP BY sessionId HAVING count(*) = 1
       |),
       |ranked AS (
       |  SELECT sessionId, kwhTotal,
       |    row_number() OVER (ORDER BY sessionId) AS rk
       |  FROM uniq
       |),
       |feed AS (
       |  SELECT sessionId, round(kwhTotal + 100.0, 2) AS kwhTotal,
       |    'update_postimage' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
       |  FROM ranked WHERE rk <= 2
       |  UNION ALL SELECT sessionId, round(kwhTotal, 2), 'update_preimage', CAST(2 AS BIGINT)
       |  FROM ranked WHERE rk <= 2
       |  UNION ALL SELECT sessionId, round(kwhTotal, 2), 'delete', CAST(3 AS BIGINT)
       |  FROM ranked WHERE rk = 3
       |  UNION ALL SELECT sessionId, -5.0, 'insert', CAST(4 AS BIGINT)
       |  FROM ranked WHERE rk = 3
       |  -- v5: the commit only the RESTARTED query consumed
       |  UNION ALL SELECT sessionId, -6.0, 'insert', CAST(5 AS BIGINT)
       |  FROM ranked WHERE rk = 3
       |)
       |SELECT sessionId, kwhTotal, _change_type, _commit_version,
       |  true AS restart_exactly_once
       |FROM feed ORDER BY _commit_version, _change_type, sessionId""".stripMargin

  /** IN-PLACE ADOPTION of plain parquet (`CONVERT TO DELTA` /
    * Iceberg-migrate shape, ev gate): the gold slice is written as
    * ORDINARY hive-partitioned parquet by Spark's own writer — no
    * engine involvement — then [[graft.lake.SnapshotTable.adopt]]
    * publishes version 1 referencing those files where they sit.
    * Contracts: `files_unmoved` pins the zero-copy claim (the live
    * file set IS the original file set), `partition_pruned` is an
    * executed-plan numFiles proof that the adopted partition dirs
    * prune through the recorded stats immediately, and the full
    * read hash-matches the oracle recomputing gold from the CSV. */
  def adoptInPlace(spark: SparkSession, dir: String): DataFrame = {
    val t = java.nio.file.Files.createTempDirectory("graft-adopt-gate")
      .toString + "/fact"
    import graft.lake.SnapshotTable
    val gold = good(spark)
      .select(col("sessionId"), col("platform"), col("kwhTotal"))
      .coalesce(1).persist()
    try {
      gold.write.partitionBy("platform").parquet(t) // plain parquet
      def norm(p: String): String = new java.net.URI(p).getPath
      val orig = spark.read.parquet(t).inputFiles.map(norm).toSet
      SnapshotTable.adopt(spark, t, statsCols = Seq("sessionId"))
      val unmoved = SnapshotTable.liveFiles(spark, t).map(p =>
        norm(new org.apache.hadoop.fs.Path(p).toUri.toString)).toSet == orig
      val pruned = scannedFiles(SnapshotTable.readWhere(spark, t,
        col("platform") === "android")) < orig.size.toLong
      SnapshotTable.read(spark, t)
        .select(col("sessionId"), col("platform"),
          round(col("kwhTotal"), 2).as("kwhTotal"))
        .withColumn("files_unmoved", lit(unmoved))
        .withColumn("partition_pruned", lit(pruned))
        .orderBy("sessionId", "kwhTotal")
    } finally { gold.unpersist(); () }
  }

  private val adoptInPlaceSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, platform, kwhTotal FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, platform, round(kwhTotal, 2) AS kwhTotal,
       |  true AS files_unmoved, true AS partition_pruned
       |FROM gold ORDER BY sessionId, kwhTotal""".stripMargin

  /** DESCRIBE DETAIL (ev gate): the gold slice lands in a snapshot
    * table partitioned by platform (coalesced — one file per platform
    * value), gets renamed (minting the column-mapping reader feature)
    * and constrained, and the SQL statement's single row must carry
    * the manifest-derived facts the oracle recomputes from the CSV:
    * numFiles = distinct platforms, numRows = gold rows, the
    * partition column, the feature list, a positive byte size. */
  def describeDetailGate(spark: SparkSession, dir: String): DataFrame = {
    val t = java.nio.file.Files.createTempDirectory("graft-dd-gate")
      .toString + "/fact"
    import graft.lake.{SnapshotCatalog, SnapshotTable}
    val gold = good(spark)
      .select(col("sessionId"), col("platform"), col("kwhTotal"))
    SnapshotTable.append(gold.coalesce(1), t, Seq("platform"))           // v1
    SnapshotTable.renameColumn(spark, t, "kwhTotal", "kwh")              // v2
    SnapshotTable.addCheckConstraint(spark, t, "kwh_nonneg", "kwh >= 0") // v3
    SnapshotCatalog.register("ev37_dd", t)
    try {
      spark.sql("DESCRIBE DETAIL ev37_dd").select(
        col("format"),
        col("version"),
        col("numFiles").as("num_files"),
        concat_ws(",", col("partitionColumns")).as("partition_columns"),
        concat_ws(",", col("readerFeatures")).as("reader_features"),
        concat_ws(",", col("writerFeatures")).as("writer_features"),
        col("numRows").as("num_rows"),
        (col("sizeInBytes") > 0L).as("has_size"))
    } finally SnapshotCatalog.unregister("ev37_dd")
  }

  private val describeDetailSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, platform, kwhTotal FROM marked WHERE NOT is_bad
       |)
       |SELECT 'graft-snapshot' AS format, CAST(3 AS BIGINT) AS version,
       |  CAST(count(DISTINCT platform) AS BIGINT) AS num_files,
       |  'platform' AS partition_columns,
       |  'column-mapping' AS reader_features,
       |  'check-constraints,column-mapping' AS writer_features,
       |  CAST(count(*) AS BIGINT) AS num_rows,
       |  true AS has_size
       |FROM gold""".stripMargin

  /** ADOPT × LATER SCHEMA LIFECYCLE (ev gate) — the migration story a
    * real user lives: plain hive-partitioned parquet written by
    * Spark's own writer is adopted in place, then the ADOPTED
    * ORIGINALS go through the whole DDL alphabet — rename
    * (column-mapping over files that store pre-mapping names), type
    * widening (metadata-only over int-era files), a deletion-vector
    * delete (no rewrite of the originals), and compaction (which must
    * rewrite under the mapping, materialize the widened type, and
    * drop the DV'd rows). Contracts: `dv_no_rewrite` pins that the DV
    * delete left the adopted file set untouched, `compacted` that
    * compaction collapsed it; the row content must hash-match the
    * oracle recomputing (gold minus the deleted slice) from the CSV
    * under the renamed/widened schema. */
  def adoptLifecycle(spark: SparkSession, dir: String): DataFrame = {
    val t = java.nio.file.Files.createTempDirectory("graft-adopt-life")
      .toString + "/fact"
    import graft.lake.SnapshotTable
    val gold = good(spark).select(col("sessionId"), col("platform"),
      col("kwhTotal"), col("managerVehicle"))
    gold.coalesce(1).write.partitionBy("platform").parquet(t) // plain parquet
    SnapshotTable.adopt(spark, t, statsCols = Seq("sessionId"))          // v1
    val adopted = SnapshotTable.liveFiles(spark, t).toSet
    SnapshotTable.renameColumn(spark, t, "kwhTotal", "kwh")              // v2
    SnapshotTable.widenColumnType(spark, t, "managerVehicle",
      org.apache.spark.sql.types.LongType)                               // v3
    SnapshotTable.deleteWithVectors(spark, t, col("kwh") < 5.0)          // v4
    val dvNoRewrite = SnapshotTable.liveFiles(spark, t).toSet == adopted
    SnapshotTable.compact(spark, t, numFiles = 1)                        // v5
    val compacted = SnapshotTable.liveFiles(spark, t).toSet != adopted
    SnapshotTable.read(spark, t)
      .select(col("sessionId"), col("platform"),
        round(col("kwh"), 2).as("kwh"), col("managerVehicle"))
      .withColumn("dv_no_rewrite", lit(dvNoRewrite))
      .withColumn("compacted", lit(compacted))
      .orderBy("sessionId", "kwh")
  }

  private val adoptLifecycleSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, platform, kwhTotal, managerVehicle
       |  FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, platform, round(kwhTotal, 2) AS kwh,
       |  CAST(managerVehicle AS BIGINT) AS managerVehicle,
       |  true AS dv_no_rewrite, true AS compacted
       |FROM gold WHERE kwhTotal >= 5.0
       |ORDER BY sessionId, kwh""".stripMargin

  /** GENERATED ALWAYS AS columns (ev gate): a catalog table declares
    * `cost_per_kwh` generated from dollars/kwhTotal; an INSERT that
    * omits it derives it, an INSERT providing a WRONG value is
    * rejected row-level (`wrong_value_rejected` contract), and an
    * UPDATE doubling the source column RECOMPUTES it — the oracle
    * recomputes the whole derivation from the CSV. */
  def generatedColumnsGate(spark: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("graft-gen-gate").toString
    val cat = "evgen_" + java.util.UUID.randomUUID.toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"),
      col("dollars")).coalesce(1).persist()
    try {
      gold.createOrReplaceTempView("ev_gen_src")
      spark.sql(s"CREATE NAMESPACE $cat.g")
      spark.sql(s"CREATE TABLE $cat.g.fact (sessionId STRING, " +
        "kwhTotal DOUBLE, dollars DOUBLE, cost_per_kwh DOUBLE " +
        "GENERATED ALWAYS AS (CASE WHEN kwhTotal > 0 THEN " +
        "dollars / kwhTotal ELSE 0.0 END)) USING `graft-snapshot`")  // v1
      spark.sql(s"INSERT INTO $cat.g.fact (sessionId, kwhTotal, dollars) " +
        "SELECT sessionId, kwhTotal, dollars FROM ev_gen_src")       // v2
      val rejected = scala.util.Try(spark.sql(
        s"INSERT INTO $cat.g.fact VALUES ('zz', 1.0, 1.0, 99.0)")).isFailure
      // UPDATE on a SOURCE column must recompute the generated one
      graft.lake.SnapshotTable.update(spark, s"$wh/g/fact",
        Seq("dollars" -> (col("dollars") * 2)), lit(true))           // v3
      graft.lake.SnapshotTable.read(spark, s"$wh/g/fact")
        .select(col("sessionId"), round(col("kwhTotal"), 2).as("kwhTotal"),
          round(col("dollars"), 2).as("dollars"),
          round(col("cost_per_kwh"), 4).as("cost_per_kwh"))
        .withColumn("wrong_value_rejected", lit(rejected))
        .orderBy("sessionId", "kwhTotal")
    } finally { gold.unpersist(); () }
  }

  private val generatedColumnsSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal, dollars * 2 AS dollars
       |  FROM marked WHERE NOT is_bad
       |)
       |SELECT sessionId, round(kwhTotal, 2) AS kwhTotal,
       |  round(dollars, 2) AS dollars,
       |  round(CASE WHEN kwhTotal > 0 THEN dollars / kwhTotal
       |    ELSE 0.0 END, 4) AS cost_per_kwh,
       |  true AS wrong_value_rejected
       |FROM gold ORDER BY sessionId, kwhTotal""".stripMargin

  /** DESCRIBE HISTORY (ev gate): a deterministic append → merge →
    * delete lifecycle, then the statement's rows (newest first) must
    * carry the per-version operation, file count, and LIVE row count
    * the oracle recomputes from the CSV — n_rows is the manifest's
    * footer-count sum net of DVs, no data scan. */
  def describeHistoryGate(spark: SparkSession, dir: String): DataFrame = {
    val t = java.nio.file.Files.createTempDirectory("graft-dh-gate")
      .toString + "/fact"
    import graft.lake.{SnapshotCatalog, SnapshotTable}
    import spark.implicits._
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"))
      .coalesce(1).persist()
    try {
      SnapshotTable.append(gold, t)                                     // v1
      // deterministic merge target: the lexicographically-first
      // UNIQUE sessionId (the fixture duplicates one key)
      val target = gold.groupBy("sessionId").count()
        .filter(col("count") === 1).agg(min("sessionId")).head().getString(0)
      SnapshotTable.merge(Seq((target, -1.0)).toDF("sessionId", "kwhTotal"),
        t, Seq("sessionId"))                                            // v2
      SnapshotTable.delete(spark, t, col("sessionId") === target)       // v3
      SnapshotCatalog.register("ev40_dh", t)
      try spark.sql("DESCRIBE HISTORY ev40_dh")
        .select(col("version"), col("operation"), col("n_rows"))
        .orderBy(col("version").desc)
      finally SnapshotCatalog.unregister("ev40_dh")
    } finally { gold.unpersist(); () }
  }

  private val describeHistorySql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal FROM marked WHERE NOT is_bad
       |),
       |n AS (SELECT count(*) AS c FROM gold)
       |SELECT CAST(3 AS BIGINT) AS version, 'delete' AS operation,
       |  CAST(c - 1 AS BIGINT) AS n_rows FROM n
       |UNION ALL SELECT CAST(2 AS BIGINT), 'merge', CAST(c AS BIGINT) FROM n
       |UNION ALL SELECT CAST(1 AS BIGINT), 'append', CAST(c AS BIGINT) FROM n
       |ORDER BY version DESC""".stripMargin

  /** IDENTITY columns (ev gate): a catalog table declares
    * `sid BIGINT GENERATED ALWAYS AS IDENTITY`; two sorted
    * single-partition appends must assign 1..N then N+1..2N (the
    * watermark persists across commits in the schema metadata), and
    * an INSERT providing an explicit value must be rejected
    * (`wrong_rejected` contract). The oracle recomputes the
    * assignment as row_number over the same deterministic order. */
  def identityColumnsGate(spark: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("graft-id-gate").toString
    val cat = "evid_" + java.util.UUID.randomUUID.toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.g")
    spark.sql(s"CREATE TABLE $cat.g.fact (sid BIGINT GENERATED ALWAYS AS " +
      "IDENTITY, sessionId STRING, kwhTotal DOUBLE) USING `graft-snapshot`")
    val t = s"$wh/g/fact"
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"))
      .orderBy("sessionId", "kwhTotal").coalesce(1)
    graft.lake.SnapshotTable.append(gold, t)                          // ids 1..N
    graft.lake.SnapshotTable.append(
      gold.withColumn("kwhTotal", col("kwhTotal") + 1000.0)
        .orderBy("sessionId", "kwhTotal").coalesce(1), t)             // N+1..2N
    val rejected = scala.util.Try(spark.sql(
      s"INSERT INTO $cat.g.fact VALUES (999, 'zz', 1.0)")).isFailure
    graft.lake.SnapshotTable.read(spark, t)
      .select(col("sid"), col("sessionId"),
        round(col("kwhTotal"), 2).as("kwh"))
      .withColumn("wrong_rejected", lit(rejected))
      .orderBy("sid")
  }

  private val identityColumnsSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal,
       |    row_number() OVER (ORDER BY sessionId, kwhTotal) AS rn
       |  FROM marked WHERE NOT is_bad
       |),
       |n AS (SELECT count(*) AS c FROM gold)
       |SELECT CAST(rn AS BIGINT) AS sid, sessionId,
       |  round(kwhTotal, 2) AS kwh, true AS wrong_rejected FROM gold
       |UNION ALL
       |SELECT CAST(rn + (SELECT c FROM n) AS BIGINT), sessionId,
       |  round(kwhTotal + 1000.0, 2), true FROM gold
       |ORDER BY sid""".stripMargin

  /** ROW TRACKING (ev gate): stable row identity pairing the change
    * feed's update images under a KEYLESS rewrite — the case the
    * opKeys heuristic structurally cannot pair (an `UPDATE ... WHERE`
    * records no key columns; the reference's gold table relies on
    * Iceberg v2 row-level semantics for the same update shape,
    * reference jobs/ev_sessions_gold_etl.py:147-156). A row-tracking
    * table appends the gold rows in one sorted file (ids = position),
    * a predicate UPDATE rewrites the file, and the feed must emit
    * exactly one preimage + one postimage PER ROW ID for the matched
    * rows — carried rows cancel in the diff (same values, same id),
    * so no bare insert/delete rows appear. The oracle recomputes ids
    * as row_number over the same deterministic order. */
  def rowTrackingGate(spark: SparkSession, dir: String): DataFrame = {
    val t = java.nio.file.Files.createTempDirectory("graft-rid-gate")
      .toString + "/fact"
    import graft.lake.SnapshotTable
    import org.apache.spark.sql.types._
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"))
      .orderBy("sessionId", "kwhTotal").coalesce(1).persist()
    try {
      SnapshotTable.create(spark, t, StructType(Seq(
        StructField("sessionId", StringType),
        StructField("kwhTotal", DoubleType))), rowTracking = true)   // v1
      SnapshotTable.append(gold, t)                                   // v2
      val vU = SnapshotTable.update(spark, t,
        Seq("kwhTotal" -> (col("kwhTotal") + 100.0)),
        col("kwhTotal") > 8.0)                                        // v3
      SnapshotTable.changes(spark, t, vU - 1, vU, None,
          includeRowIds = true)
        .select(col("_row_id"), col("_change_type"), col("sessionId"),
          round(col("kwhTotal"), 2).as("kwh"))
        .orderBy("_row_id", "_change_type")
    } finally { gold.unpersist(); () }
  }

  private val rowTrackingSql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal,
       |    row_number() OVER (ORDER BY sessionId, kwhTotal) - 1 AS rid
       |  FROM marked WHERE NOT is_bad
       |)
       |SELECT CAST(rid AS BIGINT) AS _row_id,
       |  'update_preimage' AS _change_type, sessionId,
       |  round(kwhTotal, 2) AS kwh FROM gold WHERE kwhTotal > 8.0
       |UNION ALL
       |SELECT CAST(rid AS BIGINT), 'update_postimage', sessionId,
       |  round(kwhTotal + 100.0, 2) FROM gold WHERE kwhTotal > 8.0
       |ORDER BY _row_id, _change_type""".stripMargin

  /** STREAMING SINK × IDENTITY (ev gate): `writeStream` into a table
    * declaring `sid BIGINT GENERATED ALWAYS AS IDENTITY` — the epoch
    * enrichment must assign values exactly like a batch append would
    * (`high + step * ordinal` per epoch, watermark bumped atomically
    * with the epoch's manifest). Two source commits drain as two
    * rate-limited epochs in commit order, so the assignment is
    * deterministic: the first 5 rows (by the total sort) get 1..5,
    * the rest continue 6..N — the oracle recomputes it as one
    * row_number over the same order. */
  def streamIdentityGate(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-sid-gate").toString
    val (src, dst, ckpt) = (s"$base/src", s"$base/dst", s"$base/ckpt")
    import graft.lake.SnapshotTable
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.util.IdentityColumn
    val gold = good(spark).select(col("sessionId"), col("kwhTotal"))
      .orderBy("sessionId", "kwhTotal").coalesce(1).persist()
    try {
      val head = gold.limit(5)
      val tail = gold.exceptAll(head)
        .orderBy("sessionId", "kwhTotal").coalesce(1)
      SnapshotTable.append(head, src)                                 // v1
      SnapshotTable.append(tail, src)                                 // v2
      SnapshotTable.create(spark, dst, StructType(Seq(
        StructField("sid", LongType, nullable = true, new MetadataBuilder()
          .putLong(IdentityColumn.IDENTITY_INFO_START, 1L)
          .putLong(IdentityColumn.IDENTITY_INFO_STEP, 1L)
          .putBoolean(IdentityColumn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT,
            false).build()),
        StructField("sessionId", StringType),
        StructField("kwhTotal", DoubleType))))
      val q = spark.readStream.format("graft-snapshot")
        .option("maxVersionsPerTrigger", 1)  // one epoch per src commit
        .load(src)
        .writeStream.format("graft-snapshot")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
      SnapshotTable.read(spark, dst)
        .select(col("sid"), col("sessionId"),
          round(col("kwhTotal"), 2).as("kwh"))
        .orderBy("sid")
    } finally { gold.unpersist(); () }
  }

  private val streamIdentitySql =
    s"""$prefix,
       |gold AS (
       |  SELECT sessionId, kwhTotal,
       |    row_number() OVER (ORDER BY sessionId, kwhTotal) AS rn
       |  FROM marked WHERE NOT is_bad
       |)
       |SELECT CAST(rn AS BIGINT) AS sid, sessionId,
       |  round(kwhTotal, 2) AS kwh FROM gold ORDER BY sid""".stripMargin

  val catalog: Seq[QDef] = Seq(
    QDef("ev01_silver_good", silverGood, Some(silverGoodSql)),
    QDef("ev02_quarantine_reasons", quarantineReasons, Some(quarantineReasonsSql)),
    QDef("ev03_gold_features", goldFeatures, Some(goldFeaturesSql)),
    QDef("ev04_avg_duration_per_location", avgDurationPerLocation, Some(avgDurationSql)),
    QDef("ev05_peak_hour_per_station", peakHourPerStation, Some(peakHourSql)),
    QDef("ev06_platform_share", platformShare, Some(platformShareSql)),
    QDef("ev07_station_utilization", stationUtilization, Some(stationUtilizationSql)),
    QDef("ev08_snapshot_versions", snapshotVersions, Some(snapshotVersionsSql)),
    QDef("ev09_merge_upsert", mergeUpsert, Some(mergeUpsertSql)),
    QDef("ev10_sql_merge_delete", sqlMergeDelete, Some(sqlMergeDeleteSql)),
    QDef("ev11_sql_update", sqlUpdate, Some(sqlUpdateSql)),
    QDef("ev12_change_feed", changeFeed, Some(changeFeedSql)),
    QDef("ev13_incremental_read", incrementalFeed, Some(incrementalFeedSql)),
    QDef("ev14_incremental_gold", incrementalGold, Some(incrementalGoldSql)),
    QDef("ev15_dv_delete", dvDelete, Some(dvDeleteSql)),
    QDef("ev16_hidden_partitioning", hiddenPartitioning, Some(hiddenPartitioningSql)),
    QDef("ev17_restore_tags", restoreTags, Some(restoreTagsSql)),
    QDef("ev18_catalog_sql", catalogSql, Some(catalogSqlSql)),
    QDef("ev19_branch_merge", branchMerge, Some(branchMergeSql)),
    QDef("ev20_branch_sql", branchSql, Some(branchSqlSql)),
    QDef("ev21_stream_sink", streamSink, Some(streamSinkSql)),
    QDef("ev22_constraint_quarantine", constraintQuarantine,
      Some(constraintQuarantineSql)),
    QDef("ev23_data_skipping", dataSkipping, Some(dataSkippingSql)),
    QDef("ev24_stream_hidden_partition", streamHiddenPartition,
      Some(streamHiddenPartitionSql)),
    QDef("ev25_string_skipping", stringSkipping, Some(stringSkippingSql)),
    QDef("ev26_bloom_skipping", bloomSkipping, Some(bloomSkippingSql)),
    QDef("ev27_cdc_update_images", cdcUpdateImages, Some(cdcUpdateImagesSql)),
    QDef("ev28_null_skipping", nullSkipping, Some(nullSkippingSql)),
    QDef("ev29_column_mapping", columnMapping, Some(columnMappingSql)),
    QDef("ev30_auto_compaction", autoCompaction, Some(autoCompactionSql)),
    QDef("ev31_or_skipping", orSkipping, Some(orSkippingSql)),
    QDef("ev32_stream_column_mapping", streamColumnMapping,
      Some(streamColumnMappingSql)),
    QDef("ev33_type_widening", typeWidening, Some(typeWideningSql)),
    QDef("ev34_stream_change_feed", streamChangeFeed, Some(streamChangeFeedSql)),
    QDef("ev35_column_defaults", columnDefaults, Some(columnDefaultsSql)),
    QDef("ev36_adopt_in_place", adoptInPlace, Some(adoptInPlaceSql)),
    QDef("ev37_describe_detail", describeDetailGate, Some(describeDetailSql)),
    QDef("ev38_adopt_lifecycle", adoptLifecycle, Some(adoptLifecycleSql)),
    QDef("ev39_generated_columns", generatedColumnsGate, Some(generatedColumnsSql)),
    QDef("ev40_describe_history", describeHistoryGate, Some(describeHistorySql)),
    QDef("ev41_identity_columns", identityColumnsGate, Some(identityColumnsSql)),
    QDef("ev42_row_tracking", rowTrackingGate, Some(rowTrackingSql)),
    QDef("ev43_stream_identity", streamIdentityGate, Some(streamIdentitySql)),
    QDef("ev44_dv_escaped_partitions", dvDeleteEscaped, Some(dvDeleteEscapedSql)),
    QDef("ev45_readwhere_row_ids", readWhereRowIdsGate, Some(readWhereRowIdsSql)),
    QDef("ev46_merge_clauses", mergeClausesGate, Some(mergeClausesSql)),
    QDef("ev47_sql_row_ids", sqlRowIdsGate, Some(sqlRowIdsSql)),
    QDef("ev48_merge_schema_evolution", mergeEvolutionGate, Some(mergeEvolutionSql)),
    QDef("ev49_dml_row_ids", dmlRowIdsGate, Some(dmlRowIdsSql)),
    QDef("ev50_clone_truncate", cloneTruncateGate, Some(cloneTruncateSql)),
  )
}
