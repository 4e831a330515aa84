package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the EV bronze/silver/gold layers. The bronze
  * StructType mirrors what header+inferSchema produces on the
  * reference dataset (FIXTURES.md §1) — the explicit-schema read path
  * skips the extra inference scan (one fewer full pass over bronze;
  * at 100 TB, inference-on-read is a full extra job).
  */
object EvSchemas {

  val bronze: StructType = StructType(Seq(
    StructField("sessionId", IntegerType),
    StructField("kwhTotal", DoubleType),
    StructField("dollars", DoubleType),
    StructField("created", StringType),   // mangled years → repaired in silver
    StructField("ended", StringType),
    StructField("startTime", IntegerType),
    StructField("endTime", IntegerType),
    StructField("chargeTimeHrs", DoubleType),
    StructField("weekday", StringType),
    StructField("platform", StringType),
    StructField("distance", StringType),  // literal "NA" strings → string-typed
    StructField("userId", IntegerType),
    StructField("stationId", IntegerType),
    StructField("locationId", IntegerType),
    StructField("managerVehicle", IntegerType),
    StructField("facilityType", IntegerType),
    StructField("Mon", IntegerType),
    StructField("Tues", IntegerType),
    StructField("Wed", IntegerType),
    StructField("Thurs", IntegerType),
    StructField("Fri", IntegerType),
    StructField("Sat", IntegerType),
    StructField("Sun", IntegerType),
    StructField("reportedZip", IntegerType),
  ))

  val silver: StructType = StructType(Seq(
    StructField("sessionId", StringType),
    StructField("kwhTotal", DoubleType),
    StructField("dollars", DoubleType),
    StructField("created", TimestampType),
    StructField("ended", TimestampType),
    StructField("chargeTimeHrs", DoubleType),
    StructField("weekday", StringType),
    StructField("platform", StringType),
    StructField("distance", DoubleType),
    StructField("userId", StringType),
    StructField("stationId", StringType),
    StructField("locationId", StringType),
    StructField("managerVehicle", IntegerType),
    StructField("facilityType", StringType),
    StructField("event_date", DateType),
  ))

  /** events table as stored (ns timestamps surface as LongType under
    * spark.sql.legacy.parquet.nanosAsLong). */
  val eventsRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))
}
