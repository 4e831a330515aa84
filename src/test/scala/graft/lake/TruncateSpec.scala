package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** TRUNCATE TABLE: O(1) metadata-only commit referencing zero files;
  * time travel, CDC, and the id watermarks survive. */
class TruncateSpec extends SparkTestBase {

  test("truncate is metadata-only; history, CDC and row-id watermark survive") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-trunc").toString + "/t"
    SnapshotTable.append(
      spark.range(0, 6).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"), path)
    SnapshotTable.enableRowTracking(spark, path)
    val files = SnapshotTable.liveFiles(spark, path).toSet
    val v = SnapshotTable.truncate(spark, path)
    assert(SnapshotTable.read(spark, path).count() === 0)
    // no file touched or deleted; the old version still serves them
    assert(SnapshotTable.read(spark, path, Some(v - 1)).count() === 6)
    files.foreach(f => assert(
      new java.io.File(new java.net.URI(
        if (f.startsWith("file:")) f else "file://" + f).getPath).exists(),
      s"truncate deleted $f"))
    // CDC: the truncate commit emits a delete for every row
    val feed = SnapshotTable.changes(spark, path, v - 1, v)
    assert(feed.filter(col("_change_type") === "delete").count() === 6)
    // new rows continue the id sequence — ids are never reused
    SnapshotTable.append(spark.range(0, 3)
      .selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"), path)
    val ids = SnapshotTable.readWithRowIds(spark, path)
      .select("_row_id").as[Long].collect().toSet
    assert(ids.forall(_ >= 6L), s"truncate rewound the id watermark: $ids")
  }

  test("SQL TRUNCATE TABLE: catalog and registry paths") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val wh = java.nio.file.Files.createTempDirectory("graft-trunc-wh").toString
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("truncate-sql")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new graft.functions.GraftExtensions)
        .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
        .config("spark.sql.catalog.graft.warehouse", wh)
        .getOrCreate()
      import s2.implicits._
      s2.sql("CREATE NAMESPACE graft.tr")
      s2.sql("CREATE TABLE graft.tr.t (k BIGINT) USING `graft-snapshot`")
      s2.sql("INSERT INTO graft.tr.t VALUES (1), (2), (3)")
      s2.sql("TRUNCATE TABLE graft.tr.t")
      assert(s2.sql("SELECT count(*) FROM graft.tr.t").head().getLong(0) === 0L)
      assert(s2.sql("SELECT count(*) FROM graft.tr.t VERSION AS OF 2")
        .head().getLong(0) === 3L)
      // registry path
      val p2 = java.nio.file.Files
        .createTempDirectory("graft-trunc-reg").toString + "/t"
      SnapshotTable.append(Seq(1L, 2L).toDF("k"), p2)
      SnapshotCatalog.register("tr_reg", p2)
      try {
        s2.sql("TRUNCATE TABLE tr_reg")
        assert(s2.sql("SELECT count(*) FROM tr_reg").head().getLong(0) === 0L)
      } finally SnapshotCatalog.unregister("tr_reg")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
