package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[SnapshotTable.deepClone]] — independent physical copy: bytes
  * copied (DVs and materialized row ids included), metadata carried,
  * zero sharing with the source afterwards. */
class DeepCloneSpec extends SparkTestBase {

  import SnapshotTable._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-dclone-$tag").toString

  test("clone carries data, DVs, row ids, constraints; then diverges independently") {
    import spark.implicits._
    val base = tmp("main")
    val src = base + "/src"
    val dst = base + "/dst"
    SnapshotTable.append(
      spark.range(0, 40).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"), src)
    SnapshotTable.enableRowTracking(spark, src)
    SnapshotTable.addCheckConstraint(spark, src, "v_nonneg", "v >= 0")
    // a DV delete (k=5) must carry over as a DV, not resurface
    SnapshotTable.deleteWithVectors(spark, src, col("k") === 5L)
    // a keyless update materializes __rid into a rewritten file
    SnapshotTable.update(spark, src, Seq("v" -> (col("v") + 0.5)),
      col("k") >= 30L)
    val srcIds = SnapshotTable.readWithRowIds(spark, src)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap

    deepClone(spark, src, dst)
    val cloneIds = SnapshotTable.readWithRowIds(spark, dst)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    assert(cloneIds === srcIds, "clone changed row ids or row set")
    assert(!cloneIds.contains(5L), "DV'd row resurfaced in the clone")
    // constraint carried: a violating append refuses on the clone
    val e = intercept[Exception](SnapshotTable.append(
      Seq((999L, -1.0)).toDF("k", "v"), dst))
    assert(e.getMessage.contains("v_nonneg") ||
      Option(e.getCause).exists(_.getMessage.contains("v_nonneg")))

    // independence: source DML invisible to the clone and vice versa
    SnapshotTable.delete(spark, src, col("k") < 10L)
    assert(SnapshotTable.read(spark, dst).count() === 39)
    SnapshotTable.append(Seq((100L, 1.0)).toDF("k", "v"), dst)
    assert(SnapshotTable.read(spark, src).count() === 30)
    // reclaiming every superseded source file cannot break the clone
    SnapshotTable.compact(spark, src, numFiles = 1)
    SnapshotTable.vacuum(spark, src, keepVersions = 1)
    assert(SnapshotTable.read(spark, dst).count() === 40)
    // and the clone's ids remain stable through its own rewrite
    SnapshotTable.update(spark, dst, Seq("v" -> lit(0.0)), col("k") === 7L)
    val after = SnapshotTable.readWithRowIds(spark, dst)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    assert(after(7L) === cloneIds(7L))
  }

  test("SQL: CREATE TABLE ... SHALLOW|DEEP CLONE through the extension parser") {
    import org.apache.spark.sql.SparkSession
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val wh = java.nio.file.Files.createTempDirectory("graft-clone-wh").toString
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("clone-sql")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new graft.functions.GraftExtensions)
        .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
        .config("spark.sql.catalog.graft.warehouse", wh)
        .getOrCreate()
      import s2.implicits._
      s2.sql("CREATE NAMESPACE graft.cl")
      s2.sql("CREATE TABLE graft.cl.src (k BIGINT, v DOUBLE) USING `graft-snapshot`")
      s2.range(0, 10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        .createOrReplaceTempView("cl_src")
      s2.sql("INSERT INTO graft.cl.src SELECT * FROM cl_src")      // v2
      s2.sql("DELETE FROM graft.cl.src WHERE k >= 8")              // v3
      // deep clone of the CURRENT state
      assert(s2.sql("CREATE TABLE graft.cl.deep DEEP CLONE graft.cl.src")
        .head().getLong(0) === 1L)
      assert(s2.sql("SELECT count(*) FROM graft.cl.deep").head().getLong(0) === 8L)
      // shallow clone of a PINNED version (pre-delete)
      s2.sql("CREATE TABLE graft.cl.shal SHALLOW CLONE graft.cl.src VERSION AS OF 2")
      assert(s2.sql("SELECT count(*) FROM graft.cl.shal").head().getLong(0) === 10L)
      // tag-pinned deep clone
      s2.sql("ALTER TABLE graft.cl.src CREATE TAG full AS OF VERSION 2")
      s2.sql("CREATE TABLE graft.cl.tagd DEEP CLONE graft.cl.src VERSION AS OF 'full'")
      assert(s2.sql("SELECT count(*) FROM graft.cl.tagd").head().getLong(0) === 10L)
      // a DOTTED tag name (legal via the Scala API) must parse as a
      // clone tag too: a missing one gets the clear graft-side error,
      // not the delegate parser's opaque syntax failure
      SnapshotTable.tag(s2, wh + "/cl/src", "rel.1-0", Some(2))
      s2.sql("CREATE TABLE graft.cl.tagdot DEEP CLONE graft.cl.src " +
        "VERSION AS OF 'rel.1-0'")
      assert(s2.sql("SELECT count(*) FROM graft.cl.tagdot")
        .head().getLong(0) === 10L)
      val eTag = intercept[Exception](s2.sql(
        "CREATE TABLE graft.cl.tagmiss DEEP CLONE graft.cl.src " +
          "VERSION AS OF 'no.such.tag'").collect())
      assert(eTag.getMessage.contains("no tag"))
      // divergence: writes to the deep clone never touch the source
      s2.sql("INSERT INTO graft.cl.deep SELECT 100L, 1.0")
      assert(s2.sql("SELECT count(*) FROM graft.cl.src").head().getLong(0) === 8L)
      // a registry-name target refuses with a clear message
      SnapshotCatalog.register("cl_reg", wh + "/cl/src")
      try {
        val e = intercept[Exception](s2.sql(
          "CREATE TABLE nowhere SHALLOW CLONE cl_reg").collect())
        assert(e.getMessage.contains("no storage mapping"))
      } finally SnapshotCatalog.unregister("cl_reg")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("hidden-partitioned clone keeps the transform spec and prunes") {
    import spark.implicits._
    val base = tmp("hp")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val src = base + "/src"
    val dst = base + "/dst"
    SnapshotTable.appendTransformed(
      Seq((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-02 10:00:00")),
        (3L, t("2024-01-03 10:00:00"))).toDF("k", "ts"),
      src, Seq("days(ts)"))
    deepClone(spark, src, dst)
    assert(SnapshotTable.partitionTransforms(spark, dst) === Seq("days(ts)"))
    val q = SnapshotTable.readWhere(spark, dst,
      col("ts") >= t("2024-01-03 00:00:00"))
    assert(q.select("k").as[Long].collect().toSeq === Seq(3L))
    // a version pin clones the PAST state
    SnapshotTable.append(Seq((9L, t("2024-02-01 00:00:00"))).toDF("k", "ts"), src)
    val dst2 = base + "/dst2"
    deepClone(spark, src, dst2, version = Some(1L))
    assert(SnapshotTable.read(spark, dst2).count() === 3)
    // target-in-use refusal
    val e = intercept[IllegalArgumentException](deepClone(spark, src, dst))
    assert(e.getMessage.contains("already has commits"))
  }
}
