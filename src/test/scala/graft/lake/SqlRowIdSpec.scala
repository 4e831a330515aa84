package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkTestBase

/** `_row_id` as a SQL METADATA column on catalog tables: excluded
  * from `SELECT *`, injected by AddMetadataColumns when referenced,
  * substituted onto readWithRowIds / readWhereWithRowIds (pruning
  * composes), stable across DML, time-travel-consistent. */
class SqlRowIdSpec extends SparkTestBase {

  private var prevDefault: Option[SparkSession] = None
  private var prevActive: Option[SparkSession] = None
  private lazy val warehouse =
    Files.createTempDirectory("graft-sqlrid-wh").toString

  private lazy val s2: SparkSession = {
    prevDefault = SparkSession.getDefaultSession
    prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-sqlrid-test")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    super.afterAll()
  }

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    def files(p: org.apache.spark.sql.execution.SparkPlan): Long =
      p.collect {
        case a: AdaptiveSparkPlanExec => files(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => files(q.plan)
        case s: FileSourceScanExec => s.metrics("numFiles").value
      }.sum
    files(df.queryExecution.executedPlan)
  }

  test("_row_id metadata column: hidden from *, served when referenced, stable across DML") {
    import s2.implicits._
    s2.sql("CREATE NAMESPACE IF NOT EXISTS graft.rid")
    s2.sql("CREATE TABLE graft.rid.t (k BIGINT, v DOUBLE) USING `graft-snapshot` " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    s2.range(0, 8).selectExpr("id AS k", "CAST(id AS DOUBLE) * 10 AS v")
      .createOrReplaceTempView("rid_src")
    s2.sql("INSERT INTO graft.rid.t SELECT * FROM rid_src")
    // SELECT * does NOT leak the metadata column
    assert(s2.sql("SELECT * FROM graft.rid.t").columns.toSeq === Seq("k", "v"))
    // referenced → served, and values match the API read
    val sqlIds = s2.sql("SELECT _row_id, k FROM graft.rid.t")
      .as[(Long, Long)].collect().toMap
    val apiIds = SnapshotTable
      .readWithRowIds(s2, warehouse + "/rid/t")
      .selectExpr("_row_id", "k").as[(Long, Long)].collect().toMap
    assert(sqlIds === apiIds)
    assert(sqlIds.keySet.size === 8)
    val before = s2.sql("SELECT _row_id, k, v FROM graft.rid.t")
      .as[(Long, Long, Double)].collect().map(r => r._2 -> (r._1, r._3)).toMap
    // UPDATE rewrites files; row ids must survive
    s2.sql("UPDATE graft.rid.t SET v = v + 1 WHERE k >= 4")
    val after = s2.sql("SELECT _row_id, k, v FROM graft.rid.t")
      .as[(Long, Long, Double)].collect().map(r => r._2 -> (r._1, r._3)).toMap
    (0L to 7L).foreach { k =>
      assert(after(k)._1 === before(k)._1, s"row id of k=$k changed")
      assert(after(k)._2 === before(k)._2 + (if (k >= 4) 1 else 0))
    }
    // time travel: the pre-update version serves its own (same) ids
    val v1Ids = s2.sql("SELECT _row_id, k FROM graft.rid.t VERSION AS OF 2")
      .as[(Long, Long)].collect().toMap
    assert(v1Ids === sqlIds)
  }

  test("WHERE + _row_id composes through readWhereWithRowIds with file pruning") {
    import s2.implicits._
    val path = warehouse + "/rid/pruned"
    SnapshotTable.create(s2, path,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))), rowTracking = true)
    SnapshotTable.appendClustered(
      s2.range(0, 64).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
      path, "k", numFiles = 8)
    val total = SnapshotTable.liveFiles(s2, path).size
    val q = s2.sql("SELECT _row_id, k FROM graft.rid.pruned WHERE k < 8")
    val rows = q.as[(Long, Long)].collect()
    assert(rows.map(_._2).sorted.toSeq === (0L until 8L))
    val n = scannedFiles(s2.sql(
      "SELECT _row_id, k FROM graft.rid.pruned WHERE k < 8"))
    assert(n >= 1 && n < total, s"expected pruned scan, got $n of $total files")
    // predicates on _row_id itself resolve and filter
    val byRid = s2.sql(
      "SELECT _row_id, k FROM graft.rid.pruned WHERE _row_id < 4")
      .as[(Long, Long)].collect()
    assert(byRid.length === 4 && byRid.forall(_._1 < 4))
  }

  test("DML by _row_id: DELETE and UPDATE address rows through the metadata column") {
    import s2.implicits._
    val path = warehouse + "/rid/dml"
    SnapshotTable.create(s2, path,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))), rowTracking = true)
    SnapshotTable.append(
      s2.range(0, 6).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"), path)
    val ids = s2.sql("SELECT _row_id, k FROM graft.rid.dml")
      .as[(Long, Long)].collect().map(_.swap).toMap
    // SQL DELETE addressed by row id
    s2.sql(s"DELETE FROM graft.rid.dml WHERE _row_id = ${ids(3L)}")
    assert(s2.sql("SELECT k FROM graft.rid.dml ORDER BY k").as[Long]
      .collect().toSeq === Seq(0L, 1L, 2L, 4L, 5L))
    // survivors keep their ids through the rewrite
    val after = s2.sql("SELECT _row_id, k FROM graft.rid.dml")
      .as[(Long, Long)].collect().map(_.swap).toMap
    Seq(0L, 1L, 2L, 4L, 5L).foreach(k => assert(after(k) === ids(k)))
    // SQL UPDATE addressed by a row-id set; SET may read _row_id too
    s2.sql(s"UPDATE graft.rid.dml SET v = CAST(_row_id AS DOUBLE) * -1.0 " +
      s"WHERE _row_id IN (${ids(0L)}, ${ids(5L)})")
    val got = s2.sql("SELECT k, v FROM graft.rid.dml")
      .as[(Long, Double)].collect().toMap
    assert(got(0L) === -1.0 * ids(0L) && got(5L) === -1.0 * ids(5L))
    assert(got(1L) === 1.0 && got(4L) === 4.0)
    // API form, incl. deleteAuto routing
    SnapshotTable.deleteAuto(s2, path,
      org.apache.spark.sql.functions.col("_row_id") === after(1L))
    assert(s2.sql("SELECT k FROM graft.rid.dml ORDER BY k").as[Long]
      .collect().toSeq === Seq(0L, 2L, 4L, 5L))
  }

  test("deleteRowIds: distributed rid-set delete prunes by position-derived ranges") {
    import s2.implicits._
    val path = warehouse + "/rid/bulk"
    SnapshotTable.create(s2, path,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))), rowTracking = true)
    SnapshotTable.appendClustered(
      s2.range(0, 64).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
      path, "k", numFiles = 8)
    val before = SnapshotTable.liveFiles(s2, path).toSet
    // ids 0..7 live in ONE positional file — manifest ranges alone
    // must prune the rewrite to it (no stats involved)
    SnapshotTable.deleteRowIds(s2.range(0, 8).toDF("rid"), path)
    val after = SnapshotTable.liveFiles(s2, path).toSet
    assert((before -- after).size === 1,
      s"range pruning failed: rewrote ${(before -- after).size} files")
    assert(SnapshotTable.read(s2, path).count() === 56)
    // survivors keep their ids; a second wave crossing a MATERIALIZED
    // file (the rewritten one, if any survived) still converges
    val ids = SnapshotTable.readWithRowIds(s2, path)
      .select("_row_id", "k").as[(Long, Long)].collect().toMap
    assert(ids.keySet.size === 56 && !ids.values.toSet.exists(_ < 8L))
    SnapshotTable.deleteRowIds(
      s2.createDataset(ids.keys.filter(_ % 2 == 0L).toSeq).toDF("rid"), path)
    val left = SnapshotTable.readWithRowIds(s2, path)
      .select("_row_id").as[Long].collect().toSet
    assert(left === ids.keySet.filter(_ % 2 == 1L))
    // the table is now fully MATERIALIZED (every live file was
    // rewritten): ids matching nothing must be a metadata-only no-op
    // — the rewrite recorded __rid footer stats, so the range join
    // prunes rewritten files without scanning them
    val v = SnapshotTable.latestVersion(s2, path).get
    assert(SnapshotTable.deleteRowIds(
      s2.range(1000000, 1000010).toDF("rid"), path) === v)
    // ...and a point-id retirement rewrites only the file(s) whose
    // recorded __rid range can contain it
    val total = SnapshotTable.liveFiles(s2, path).size
    val one = left.min
    val b2 = SnapshotTable.liveFiles(s2, path).toSet
    SnapshotTable.deleteRowIds(
      s2.createDataset(Seq(one)).toDF("rid"), path)
    val a2 = SnapshotTable.liveFiles(s2, path).toSet
    assert((b2 -- a2).size < total,
      s"rid-stats pruning failed: rewrote all $total materialized files")
    assert(!SnapshotTable.readWithRowIds(s2, path)
      .select("_row_id").as[Long].collect().contains(one))
    // txn-gated retirement: a replayed wave (same app+epoch) is a
    // no-op even with different ids — the crash-retry shape of a
    // foreachBatch consumer
    val rem = SnapshotTable.readWithRowIds(s2, path)
      .select("_row_id").as[Long].collect().sorted
    val vA = SnapshotTable.deleteRowIds(
      s2.createDataset(Seq(rem.head)).toDF("rid"), path,
      txn = Some(("ret", 1L)))
    assert(SnapshotTable.deleteRowIds(
      s2.createDataset(Seq(rem(1))).toDF("rid"), path,
      txn = Some(("ret", 1L))) === vA)
    val after3 = SnapshotTable.readWithRowIds(s2, path)
      .select("_row_id").as[Long].collect().toSet
    assert(!after3.contains(rem.head) && after3.contains(rem(1)))
    // the next epoch applies
    SnapshotTable.deleteRowIds(
      s2.createDataset(Seq(rem(1))).toDF("rid"), path,
      txn = Some(("ret", 2L)))
    assert(!SnapshotTable.readWithRowIds(s2, path)
      .select("_row_id").as[Long].collect().contains(rem(1)))
  }

  test("untracked tables do not expose _row_id") {
    s2.sql("CREATE TABLE graft.rid.plain (k BIGINT) USING `graft-snapshot`")
    s2.range(0, 3).selectExpr("id AS k").createOrReplaceTempView("rid_plain_src")
    s2.sql("INSERT INTO graft.rid.plain SELECT * FROM rid_plain_src")
    val e = intercept[AnalysisException](
      s2.sql("SELECT _row_id, k FROM graft.rid.plain").collect())
    assert(e.getMessage.contains("_row_id"))
    // ...until tracking is enabled
    s2.sql("ALTER TABLE graft.rid.plain ENABLE ROW TRACKING")
    val ids = s2.sql("SELECT _row_id FROM graft.rid.plain").collect()
    assert(ids.length === 3)
  }
}
