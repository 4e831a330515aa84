package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold-layer derived features (reference jobs/ev_sessions_gold_etl.py
  * :83-118) plus the fact-table DDL (:127-150) re-expressed against
  * the Spark session catalog (no Iceberg jar in this environment —
  * dynamic partition overwrite on a managed parquet table reproduces
  * `overwritePartitions` semantics; snapshots/time-travel are out of
  * scope, see SURVEY.md §7.4).
  */
object GoldFeatures {

  /** The 14-column silver projection the gold job reads (:83-87). */
  val silverProjection: Seq[String] = Seq(
    "sessionId", "userId", "stationId", "locationId",
    "kwhTotal", "dollars", "distance", "chargeTimeHrs",
    "facilityType", "platform", "weekday", "created", "ended", "event_date")

  /** Derived fields (:106-118). `avg_cost_per_kwh` has NO otherwise
    * branch in the reference — kwhTotal <= 0 (or NULL) yields NULL;
    * preserved exactly. Duration uses whole-second timestamps, so
    * unix_timestamp arithmetic is exact.
    */
  def derive(silver: DataFrame): DataFrame =
    silver
      .withColumn("session_duration_minutes",
        (unix_timestamp(col("ended")) - unix_timestamp(col("created"))) / lit(60.0))
      .withColumn("avg_cost_per_kwh",
        when(col("kwhTotal") > 0, col("dollars") / col("kwhTotal")))

  /** Optional single-partition reprocess filter (:90-92) — a
    * partition-pruning equality predicate on the partition key. */
  def eventDateFilter(df: DataFrame, eventDate: Option[String]): DataFrame =
    eventDate.filter(_.nonEmpty).fold(df)(d => df.filter(col("event_date") === to_date(lit(d))))

  /** Fact-table DDL (:128-150), parquet partitioned by event_date.
    * The location is explicit and partitions are recovered after
    * (re-)registration: a fresh session's in-memory catalog forgets
    * the table while its warehouse directory persists, and a plain
    * managed CREATE would then fail with LOCATION_ALREADY_EXISTS —
    * the explicit-LOCATION + MSCK shape is idempotent across
    * sessions, matching the reference's re-runnable Glue jobs. */
  def createFactTable(spark: SparkSession, db: String, table: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = s"${warehouse.stripSuffix("/")}/$db.db/$table"
    // MSCK needs the location to exist (first create on a fresh
    // warehouse would otherwise FileNotFound)
    val p = new org.apache.hadoop.fs.Path(loc)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS `$db`.`$table` (
         |  sessionId STRING, userId STRING, stationId STRING, locationId STRING,
         |  kwhTotal DOUBLE, dollars DOUBLE, distance DOUBLE, chargeTimeHrs DOUBLE,
         |  facilityType STRING, platform STRING, weekday STRING,
         |  created TIMESTAMP, ended TIMESTAMP,
         |  session_duration_minutes DOUBLE, avg_cost_per_kwh DOUBLE,
         |  event_date DATE
         |) USING parquet
         |PARTITIONED BY (event_date)
         |LOCATION '$loc'""".stripMargin)
    spark.sql(s"MSCK REPAIR TABLE `$db`.`$table`")
  }
}
