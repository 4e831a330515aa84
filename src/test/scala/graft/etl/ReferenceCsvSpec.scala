package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dq.VerificationSuite

/** Fidelity run against the REAL reference dataset (read-only at
  * /root/reference/data-samples): 3,395 sessions with the documented
  * quirks (1,065 "NA" distances, 3,372 rows with 0015- years, 23 with
  * 0014-, 55 zero-kWh rows, unique sessionId). Asserts the cleaning
  * semantics on the data the reference actually processes, not just
  * the fixture. */
class ReferenceCsvSpec extends SparkTestBase {

  val refCsv = "/root/reference/data-samples/station_data_dataverse.csv"

  lazy val tagged = SilverClean.withQuarantineReasons(
    SilverClean.normalize(SilverClean.readBronzeCsv(spark, refCsv)))

  test("row count and year repair cover the whole dataset") {
    assert(tagged.count() === 3395)
    // every created/ended parsed (no timestamp_null fires)
    val tsNull = tagged.filter(array_contains(col("quarantine_reason"), "timestamp_null")).count()
    assert(tsNull === 0)
    // all years repaired into 2014/2015
    val years = tagged.select(year(col("created")).as("y")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(years === Set(2014, 2015))
  }

  test("quarantine profile matches the dataset's documented quirks") {
    import spark.implicits._
    val reasons = tagged.select(explode(col("quarantine_reason")).as("r"))
      .groupBy("r").count().as[(String, Long)].collect().toMap
    // 1,065 literal "NA" distances → cast null → rule fires
    assert(reasons("distance_negative_or_zero") === 1065)
    // 55 zero-kWh sessions
    assert(reasons("kwhTotal_non_positive") === 55)
    // ids are fully populated in this dataset
    assert(!reasons.contains("sessionId_null"))
    assert(!reasons.contains("userId_null"))
  }

  test("aggregate DQ suite reproduces the reference's check outcome") {
    val vr = VerificationSuite.run(tagged, Seq(SilverClean.silverCheck))
    val metrics = vr.checkResults.head.results.map(r => r.constraint -> r.metric).toMap
    assert(metrics("Completeness(sessionId)") === 1.0)
    assert(metrics("Uniqueness(sessionId)") === 1.0) // sessionId unique across 3,395 rows
    assert(metrics("ContainedIn(facilityType)") === 1.0) // codes 1..4 all decode
    // NonNegative(distance) passes: NULLs compliant, no negatives
    assert(metrics("NonNegative(distance)") === 1.0)
    // the suite overall fails on this raw data exactly like the
    // reference observed? No — with NULL-tolerant semantics all ten
    // constraints pass here; the row-level rules are what quarantine
    assert(vr.status === "Success")
  }

  test("gold features derive for every clean row") {
    val (good, bad) = SilverClean.split(tagged)
    val gold = GoldFeatures.derive(good)
    assert(good.count() + bad.count() === 3395)
    assert(gold.filter(col("session_duration_minutes").isNull).count() === 0)
    // avg_cost_per_kwh is NULL only when kwhTotal <= 0 — and those
    // rows were quarantined, so none remain
    assert(gold.filter(col("avg_cost_per_kwh").isNull && col("kwhTotal") > 0).count() === 0)
  }
}
