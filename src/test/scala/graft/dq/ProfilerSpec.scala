package graft.dq

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Column profiling + constraint suggestion (the Deequ
  * ColumnProfiler / ConstraintSuggestionRunner shape): the profile is
  * one fused aggregation job; suggestions derive from it under the
  * deterministic rules the q140 oracle re-encodes in SQL. */
class ProfilerSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val frame = Seq(
    (1L, Some("a"), Some(10.0), "x"),
    (2L, Some("b"), Some(0.0), "y"),
    (3L, None, Some(-5.0), "x"),
    (4L, Some("a"), None, "y"),
    (5L, Some("c"), Some(2.5), "x"))
    .toDF("id", "cat", "v", "flag")

  test("profile computes completeness, distinct, rows, numeric stats") {
    val p = Profiler.profile(frame, exactDistinct = true)
      .map(x => x.column -> x).toMap
    assert(p.keySet === Set("id", "cat", "v", "flag"))
    assert(p("id").completeness === 1.0)
    assert(p("id").distinctCount === 5L && p("id").rowCount === 5L)
    assert(p("id").minValue === Some(1.0) && p("id").maxValue === Some(5.0))
    assert(p("id").mean === Some(3.0))
    assert(p("cat").completeness === 0.8)
    assert(p("cat").distinctCount === 3L)
    assert(p("cat").minValue === None, "string columns carry no numeric stats")
    assert(p("v").completeness === 0.8)
    assert(p("v").minValue === Some(-5.0) && p("v").maxValue === Some(10.0))
    assert(p("flag").distinctCount === 2L)
    assert(p("id").dtype === "bigint" && p("cat").dtype === "string")
  }

  test("approx profile agrees with exact on small cardinalities") {
    val a = Profiler.profile(frame).map(x => x.column -> x.distinctCount).toMap
    val e = Profiler.profile(frame, exactDistinct = true)
      .map(x => x.column -> x.distinctCount).toMap
    // HLL++ is exact at these cardinalities
    assert(a === e)
  }

  test("suggestions follow the documented rules and hold on their source") {
    val sugg = Profiler.suggestConstraints(frame)
    val byCol = sugg.map(_._1).groupBy(_.column)
      .view.mapValues(_.map(s => s.suggestion).toSet).toMap
    // id: complete, unique, non-negative; no containment (not a string)
    assert(byCol("id") === Set("isComplete", "isUnique", "isNonNegative"))
    // cat: incomplete (no isComplete/isUnique), low-cardinality string
    assert(byCol("cat") === Set("isContainedIn"))
    // v: has a negative value and nulls — nothing suggested
    assert(!byCol.contains("v"))
    // flag: complete, 2-value domain, not unique
    assert(byCol("flag") === Set("isComplete", "isContainedIn"))
    val details = sugg.map(_._1).map(s => (s.column, s.suggestion) -> s.detail).toMap
    assert(details(("cat", "isContainedIn")) === "a,b,c")
    assert(details(("flag", "isContainedIn")) === "x,y")
    // self-consistency: every suggested constraint passes on the frame
    val vr = VerificationSuite.run(frame,
      Seq(Check(CheckLevel.Error, "suggested", sugg.map(_._2))))
    assert(vr.status === "Success")
  }

  test("profile runs persist to the repository and schema drift trips " +
      "the trailing-window anomaly check") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-profrepo").toString + "/metrics"
    // three stable profile runs over the same frame
    (1 to 3).foreach { i =>
      MetricsRepository.appendProfile(spark, path, "frame", s"r$i",
        Profiler.profile(frame, exactDistinct = true))
    }
    assert(MetricsRepository.anomalies(spark, path, "frame", "r3").isEmpty,
      "stable profile history must raise nothing")
    // schema-level drift no boolean check would catch: cat's values
    // all collapse to one — completeness unchanged, but Distinctness
    // falls 3 -> 1
    val collapsed = frame.withColumn("cat",
      when(col("cat").isNotNull, lit("a")))
    MetricsRepository.appendProfile(spark, path, "frame", "r4",
      Profiler.profile(collapsed, exactDistinct = true))
    val hits = MetricsRepository.anomalies(spark, path, "frame", "r4")
    assert(hits.exists(_.constraint == "Distinctness(cat)"),
      s"distinctness collapse must trip the profile anomaly: $hits")
    assert(!hits.exists(_.constraint == "Completeness(cat)"),
      s"completeness did not move and must stay quiet: $hits")
  }

  test("maxDomain bounds containment suggestions") {
    val wide = (0 until 20).map(i => (i.toLong, s"s$i")).toDF("id", "s")
    val sugg = Profiler.suggestConstraints(wide, maxDomain = 8).map(_._1)
    assert(!sugg.exists(s => s.column == "s" && s.suggestion == "isContainedIn"))
    val sugg2 = Profiler.suggestConstraints(wide, maxDomain = 32).map(_._1)
    assert(sugg2.exists(s => s.column == "s" && s.suggestion == "isContainedIn"))
  }
}
