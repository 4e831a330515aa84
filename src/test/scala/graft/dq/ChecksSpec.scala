package graft.dq

import graft.SparkTestBase
import graft.etl.SilverClean

class ChecksSpec extends SparkTestBase {

  lazy val silver = SilverClean.normalize(SilverClean.readBronzeCsv(spark, fixture))

  test("verification suite computes Deequ-shaped metrics in one pass") {
    val vr = VerificationSuite.run(silver, Seq(SilverClean.silverCheck))
    val metrics = vr.checkResults.head.results.map(r => r.constraint -> r.metric).toMap

    assert(metrics("Completeness(sessionId)") === 1.0)
    assert(metrics("Completeness(userId)") === 54.0 / 55.0)
    // isNonNegative passes NULLs (Deequ semantics): only the one
    // negative dollars row fails; "NA" distances count as compliant
    assert(metrics("NonNegative(dollars)") === 54.0 / 55.0)
    assert(metrics("NonNegative(distance)") === 1.0)
    assert(metrics("NonNegative(kwhTotal)") === 1.0) // 0.0 is non-negative
    // one off-domain facilityType ("5")
    assert(metrics("ContainedIn(facilityType)") === 54.0 / 55.0)
    // one duplicated sessionId pair → 53 of 55 rows unique
    assert(metrics("Uniqueness(sessionId)") === 53.0 / 55.0)
    assert(vr.status === "Error")
  }

  test("all-passing check yields Success status") {
    val check = Check(CheckLevel.Error, "ok")
      .isComplete("sessionId")
      .isNonNegative("kwhTotal")
    val vr = VerificationSuite.run(silver, Seq(check))
    assert(vr.status === "Success")
  }

  test("warning-level failures yield Warning status") {
    val check = Check(CheckLevel.Warning, "warn").isComplete("userId")
    val vr = VerificationSuite.run(silver, Seq(check))
    assert(vr.status === "Warning")
  }
}
