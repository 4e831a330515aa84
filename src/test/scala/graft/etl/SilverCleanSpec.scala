package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SilverCleanSpec extends SparkTestBase {

  lazy val tagged = SilverClean.withQuarantineReasons(
    SilverClean.normalize(SilverClean.readBronzeCsv(spark, fixture)))

  test("good/bad split matches fixture quirk classes") {
    val (good, bad) = SilverClean.split(tagged)
    assert(good.count() === 37)
    assert(bad.count() === 18)
  }

  test("quarantine reasons fire per rule as designed") {
    val (_, bad) = SilverClean.split(tagged)
    val reasons = bad.select(explode(col("quarantine_reason")).as("r"))
      .groupBy("r").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reasons("distance_negative_or_zero") === 10) // "NA" strings → null
    assert(reasons("kwhTotal_non_positive") === 1)
    assert(reasons("dollars_negative") === 1)
    assert(reasons("duration_invalid") === 1)
    assert(reasons("facilityType_invalid") === 1)
    assert(reasons("timestamp_null") === 2)
    assert(reasons("end_before_start") === 1)
    assert(reasons("userId_null") === 1)
    assert(!reasons.contains("sessionId_null"))
  }

  test("fix_year repairs 00-prefixed years and drops their seconds") {
    val row = tagged.filter(col("sessionId") === "1000")
      .select(date_format(col("created"), "yyyy-MM-dd HH:mm:ss")).head()
    // raw was 0014-01-01 06:10:20 → repaired to 2014-01-01 06:10 (the
    // reference's substring(…,3,14) truncation zero-fills seconds)
    assert(row.getString(0) === "2014-01-01 06:10:00")
    val sane = tagged.filter(col("sessionId") === "2001")
      .select(date_format(col("created"), "yyyy-MM-dd HH:mm:ss")).head()
    assert(sane.getString(0).endsWith(":01")) // modern years keep seconds
  }

  test("decodes map in-domain codes and pass through off-domain values") {
    val ft = tagged.filter(col("sessionId") === "3004").select("facilityType").head()
    assert(ft.getString(0) === "5") // off-domain code passes through
    val wd = tagged.filter(col("sessionId") === "3005").select("weekday").head()
    assert(wd.getString(0) === "Thurs") // off-domain abbrev passes through
    val inDomain = tagged.filter(col("sessionId") === "1001")
      .select("facilityType", "weekday").head()
    assert(inDomain.getString(0) === "Office")
    assert(inDomain.getString(1) === "Tuesday")
  }

  test("split is a partition: good ∪ bad = input, good ∩ bad = ∅") {
    val (good, bad) = SilverClean.split(tagged)
    assert(good.count() + bad.count() === tagged.count())
    assert(good.select("sessionId").intersect(bad.select("sessionId")).count() === 0)
  }
}
