package graft.functions

import org.apache.spark.sql.SparkSession

import graft.SparkTestBase

class GraftExtensionsSpec extends SparkTestBase {

  test("withExtensions injects the native functions into a new session") {
    // force a genuinely new session: getOrCreate would return the
    // suite-shared one (ignoring withExtensions) — and a previous
    // spec's temp-function registration could mask the failure
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("ext-test")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c, " +
          "dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d").head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 11.0) < 1e-12)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
