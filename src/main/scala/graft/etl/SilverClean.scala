package graft.etl

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dq.{Check, CheckLevel}

/** Silver-layer cleaning semantics (reference
  * jobs/ev_sessions_silver_etl_clean.py:57-205), re-expressed as
  * composable Column functions — everything stays inside whole-stage
  * codegen (no UDFs), literal maps fold at plan time.
  */
object SilverClean {

  /** One-hot/raw columns dropped on entry (reference :63). */
  val droppedColumns: Seq[String] =
    Seq("Mon", "Tues", "Wed", "Thurs", "Fri", "Sat", "Sun", "reportedZip", "startTime", "endTime")

  val stringColumns: Seq[String] =
    Seq("sessionId", "userId", "stationId", "locationId", "facilityType", "platform", "weekday")
  val doubleColumns: Seq[String] =
    Seq("kwhTotal", "dollars", "distance", "chargeTimeHrs")

  /** facilityType code → descriptive name (reference :98-103). */
  val facilityTypeMap: ListMap[String, String] = ListMap(
    "1" -> "Manufacturing", "2" -> "Office",
    "3" -> "Research and Development", "4" -> "Other")

  val facilityTypeDomain: Seq[String] = facilityTypeMap.values.toSeq

  /** Weekday abbreviation → full name (reference :113-121). Note the
    * keys are the 3-letter forms; off-domain values (e.g. "Thurs")
    * pass through unchanged — reference behavior, preserved. */
  val weekdayMap: ListMap[String, String] = ListMap(
    "Mon" -> "Monday", "Tue" -> "Tuesday", "Wed" -> "Wednesday",
    "Thu" -> "Thursday", "Fri" -> "Friday", "Sat" -> "Saturday", "Sun" -> "Sunday")

  /** Year repair for the damaged `00`-prefixed timestamps (reference
    * :83-87). Faithful to the original, including its quirk: the
    * repaired string is `"20" + substring(s, 3, 14)` — 14 chars only,
    * so "0014-11-18 15:40:26" becomes "2014-11-18 15:40" and the
    * SECONDS ARE DROPPED (to_timestamp zero-fills them). Rows with
    * sane years keep full precision.
    */
  def fixYear(c: Column): Column =
    when(substring(c, 1, 2) === "00",
      concat(lit("20"), substring(c, 3, 14))).otherwise(c)

  /** Literal-map decode with pass-through for off-domain keys
    * (reference :105-110 / :123-128). The map folds into the plan as
    * a constant; at dimension-table scale this becomes a broadcast
    * join instead (ops.Relational.broadcastJoin).
    */
  def decode(c: Column, mapping: Map[String, String]): Column =
    when(c.isin(mapping.keys.toSeq: _*), element_at(typedlit(mapping), c)).otherwise(c)

  /** Bronze CSV reader, reference :57 (header + schema inference).
    * Engine policy: inference is the reference's behavior; callers
    * that know the schema should pass an explicit StructType via
    * [[readBronzeCsv]]'s `schema` overload to skip the extra
    * inference scan.
    */
  def readBronzeCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", true).option("inferSchema", true).csv(path)

  def readBronzeCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", true).schema(schema).csv(path)

  /** Full silver normalization: drop → cast → year-fix → event_date →
    * decodes (reference :63-128). One narrow projection, no shuffle.
    */
  def normalize(bronze: DataFrame): DataFrame = {
    val dropped = bronze.drop(droppedColumns: _*)
    // try_cast / try_to_timestamp pin the reference's lenient Spark
    // 3.5 non-ANSI semantics (malformed input → NULL, e.g. the
    // literal "NA" distance strings) independent of this session's
    // spark.sql.ansi.enabled.
    val casts =
      stringColumns.map(c => c -> col(c).cast(StringType)) ++
      doubleColumns.map(c => c -> col(c).try_cast(DoubleType)) ++
      Seq("created" -> col("created").cast(StringType), "ended" -> col("ended").cast(StringType))
    dropped
      .withColumns(ListMap(casts: _*))
      .withColumn("created", try_to_timestamp(fixYear(col("created"))))
      .withColumn("ended", try_to_timestamp(fixYear(col("ended"))))
      .withColumn("event_date", to_date(col("created")))
      .withColumn("facilityType", decode(col("facilityType"), facilityTypeMap))
      .withColumn("weekday", decode(col("weekday"), weekdayMap))
  }

  /** Row-level quarantine rules (reference :170-184). NOTE the
    * documented divergences from the aggregate Deequ-style checks:
    * kwhTotal row rule is `<= 0` (strict) vs aggregate non-negative;
    * distance row rule fires on NULL while the aggregate passes NULLs.
    * Both dialects are preserved, each in its own layer.
    */
  val rowRules: Seq[(String, Column)] = Seq(
    "sessionId_null" -> col("sessionId").isNull,
    "userId_null" -> col("userId").isNull,
    "stationId_null" -> col("stationId").isNull,
    "locationId_null" -> col("locationId").isNull,
    "kwhTotal_non_positive" -> (col("kwhTotal").isNull || col("kwhTotal") <= 0),
    "dollars_negative" -> (col("dollars").isNull || col("dollars") < 0),
    "distance_negative_or_zero" -> (col("distance").isNull || col("distance") < 0),
    "duration_invalid" -> (col("chargeTimeHrs").isNull || col("chargeTimeHrs") <= 0),
    "facilityType_invalid" -> !col("facilityType").isin(facilityTypeDomain: _*),
    "timestamp_null" -> (col("created").isNull || col("ended").isNull),
    "end_before_start" ->
      (col("created").isNotNull && col("ended").isNotNull && col("ended") <= col("created")),
  )

  /** Attach `quarantine_reason: array<string>` (reference :187-191):
    * evaluate every rule to its tag-or-null, collect, strip nulls via
    * the native HOF (codegen'd, no UDF). */
  def withQuarantineReasons(df: DataFrame): DataFrame = {
    val tags = rowRules.map { case (reason, cond) =>
      when(cond, lit(reason)).otherwise(lit(null: String))
    }
    df.withColumn("quarantine_reason", filter(array(tags: _*), x => x.isNotNull))
  }

  /** Complementary good/bad bifurcation (reference :203-205). Both
    * frames share the cleaned subtree — callers should persist the
    * input when writing both (the reference recomputes; we don't). */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val tagged = if (df.columns.contains("quarantine_reason")) df else withQuarantineReasons(df)
    val good = tagged.filter(size(col("quarantine_reason")) === 0).drop("quarantine_reason")
    val bad = tagged.filter(size(col("quarantine_reason")) > 0)
    (good, bad)
  }

  /** The aggregate DQ suite the reference runs pre-split (reference
    * :138-153), on our native dq engine. */
  def silverCheck: Check =
    Check(CheckLevel.Error, "silver_rules")
      .isComplete("sessionId")
      .isComplete("userId")
      .isComplete("stationId")
      .isComplete("locationId")
      .isNonNegative("kwhTotal")
      .isNonNegative("dollars")
      .isNonNegative("chargeTimeHrs")
      .isNonNegative("distance")
      .isContainedIn("facilityType", facilityTypeDomain)
      .isUnique("sessionId")
}
