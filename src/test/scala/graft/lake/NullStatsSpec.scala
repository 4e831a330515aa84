package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** NULL-count manifest stats — the third leg of the skipping triple
  * (min/max bounds, blooms, null counts): `IS NULL` prunes files
  * recording zero nulls, `IS NOT NULL` and any comparison conjunct
  * prune all-null files (which record NO min/max, so bounds alone
  * can never drop them). The reference's quarantine rules are
  * null-predicates (reference jobs/ev_sessions_silver_etl_clean.py:
  * 171-183) — this is what makes them metadata-prunable. */
class NullStatsSpec extends SparkTestBase {

  import spark.implicits._

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

  /** 3 files: one all-null in `v`, one null-free, one mixed. */
  private def buildTable(path: String): Unit = {
    val allNull = (1 to 10).map(i => (s"a$i%02d", Option.empty[Double]))
    val noNull  = (1 to 10).map(i => (s"b$i%02d", Option(i.toDouble)))
    val mixed   = (1 to 10).map(i =>
      (s"c$i%02d", if (i % 2 == 0) Option(i.toDouble) else None))
    SnapshotTable.create(spark, path, allNull.toDF("id", "v").schema)
    Seq(allNull, noNull, mixed).foreach(rows =>
      SnapshotTable.append(rows.toDF("id", "v").coalesce(1), path))
  }

  test("manifest records per-file null counts for top-level columns") {
    val path = Files.createTempDirectory("graft-nulls").toString + "/t"
    buildTable(path)
    val v = SnapshotTable.latestVersion(spark, path).get
    val counts = SnapshotTable.readManifest(spark, path, v)
      .filter(_.rows > 0)
      .map(e => e.nulls.find(_._1 == "v").map(_._2)).sortBy(identity)
    assert(counts === Seq(Some(0L), Some(5L), Some(10L)))
  }

  test("files metadata exposes per-file null counts under logical names") {
    val path = Files.createTempDirectory("graft-nulls-meta").toString + "/t"
    buildTable(path)
    SnapshotTable.renameColumn(spark, path, "v", "value")
    val meta = SnapshotTable.filesMetadata(spark, path)
      .select("rows", "null_counts").collect()
      .map(r => r.getLong(0) -> r.getMap[String, Long](1).get("value"))
    assert(meta.flatMap(_._2).sorted.toSeq === Seq(0L, 5L, 10L),
      s"null_counts must surface under the RENAMED logical name: ${meta.toSeq}")
  }

  test("IS NULL scans only files holding nulls; IS NOT NULL drops the all-null file") {
    val path = Files.createTempDirectory("graft-nulls2").toString + "/t"
    buildTable(path)
    val qNull = SnapshotTable.readWhere(spark, path, col("v").isNull)
    assert(qNull.count() === 15)
    assert(scannedFiles(qNull) === 2, "IS NULL must skip the null-free file")
    val qNotNull = SnapshotTable.readWhere(spark, path, col("v").isNotNull)
    assert(qNotNull.count() === 15)
    assert(scannedFiles(qNotNull) === 2, "IS NOT NULL must skip the all-null file")
    val full = SnapshotTable.readWhere(spark, path, lit(true))
    assert(scannedFiles(full) === 3)
  }

  test("comparison and IN conjuncts imply NOT NULL: all-null file skipped without bounds") {
    val path = Files.createTempDirectory("graft-nulls3").toString + "/t"
    buildTable(path)
    // plain append records no min/max (statsCols empty), so any
    // pruning here is the null counts' doing
    val e = SnapshotTable.readManifest(spark, path,
      SnapshotTable.latestVersion(spark, path).get).filter(_.rows > 0)
    assert(e.forall(_.stats.isEmpty), "fixture must carry no bounds")
    val q = SnapshotTable.readWhere(spark, path, col("v") > -1.0)
    assert(q.count() === 15)
    assert(scannedFiles(q) === 2, "comparison must skip the all-null file")
    val qIn = SnapshotTable.readWhere(spark, path, col("v").isin(2.0, 4.0))
    assert(scannedFiles(qIn) === 2)
    // a null-safe equality against NULL is an IS NULL
    val qNs = SnapshotTable.readWhere(spark, path, col("v") <=> lit(null))
    assert(qNs.count() === 15 && scannedFiles(qNs) === 2)
  }

  test("casts and coalesce contribute nothing (conservative)") {
    val path = Files.createTempDirectory("graft-nulls4").toString + "/t"
    buildTable(path)
    // coalesce(v, 0) IS NULL is never true, but the extractor must
    // not claim anything about v — all files stay readable
    val q = SnapshotTable.readWhere(spark, path,
      coalesce(col("v"), lit(0.0)) >= 0.0)
    assert(q.count() === 30)
    assert(scannedFiles(q) === 3)
  }

  test("hive partition values contribute free null counts (NULL partition prunes)") {
    val path = Files.createTempDirectory("graft-nulls5").toString + "/t"
    val rows = Seq(("a", Option("p1")), ("b", Option("p1")),
      ("c", Option.empty[String]), ("d", Option("p2")))
    // one task → exactly one file per partition dir (3 files)
    SnapshotTable.append(rows.toDF("id", "part").coalesce(1), path, Seq("part"))
    val qNull = SnapshotTable.readWhere(spark, path, col("part").isNull)
    assert(qNull.count() === 1)
    assert(scannedFiles(qNull) === 1,
      "IS NULL on the partition column must scan only the default partition")
    val qNotNull = SnapshotTable.readWhere(spark, path, col("part").isNotNull)
    assert(qNotNull.count() === 3)
    assert(scannedFiles(qNotNull) === 2)
  }

  test("merge/deleteKeys never rewrite a file all-null in a key column") {
    val path = Files.createTempDirectory("graft-nulls7").toString + "/t"
    buildTable(path) // key below: id is never null; use v as the key
    val before = SnapshotTable.liveFiles(spark, path).toSet
    // point merge keyed on v: the all-null file cannot match any key
    SnapshotTable.merge(Seq((Option(3.0), "upd")).toDF("v", "id").coalesce(1),
      path, Seq("v"))
    val after = SnapshotTable.liveFiles(spark, path).toSet
    val rewritten = before -- after
    assert(rewritten.nonEmpty, "the matching files must be rewritten")
    // the all-null file carried over by reference
    val v = SnapshotTable.latestVersion(spark, path).get
    val stillLive = SnapshotTable.readManifest(spark, path, v)
      .filter(e => after(e.filePath) && before(e.filePath))
    assert(stillLive.exists(e =>
      e.nulls.find(_._1 == "v").exists(_._2 == e.rows)),
      "all-null-key file must not be rewritten by a keyed merge")
    assert(SnapshotTable.read(spark, path)
      .filter(col("id") === "upd").count() === 1)
  }

  test("delete/update file-finding scans are manifest-pruned (not a full-table scan)") {
    val path = Files.createTempDirectory("graft-nulls8").toString + "/t"
    buildTable(path) // 3 files: all-null, null-free, mixed in v
    @volatile var filesScanned = 0L
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      private def files(p: SparkPlan): Long = p.collect {
        case a: AdaptiveSparkPlanExec => files(a.executedPlan)
        case q: QueryStageExec        => files(q.plan)
        case s: FileSourceScanExec    => s.metrics("numFiles").value
      }.sum
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        filesScanned += files(qe.executedPlan)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    def scannedDuring(body: => Unit): Long = {
      spark.listenerManager.register(listener)
      filesScanned = 0L
      try { body; Thread.sleep(1000) } // listener delivery is async
      finally spark.listenerManager.unregister(listener)
      filesScanned
    }
    // a delete whose predicate requires v NOT NULL: the all-null file
    // is never opened by the FINDING scan (readWhere pruning) — only
    // the 2 candidate files plus their rewrite read (≤ 2 more)
    val n1 = scannedDuring {
      SnapshotTable.delete(spark, path, col("v") === 999.0)
    }
    assert(n1 <= 2, s"delete finding scan not pruned: $n1 files opened")
    // an update inside one file's null profile: all-null file skipped
    val n2 = scannedDuring {
      SnapshotTable.update(spark, path, Seq("v" -> lit(0.5)), col("v") === 2.0)
    }
    // finding scan (2 pruned candidates) + rewrite of the 2 matching
    // files (v=2.0 exists in the null-free AND mixed files); the
    // all-null file is opened by NEITHER — unpruned would be 5
    assert(n2 <= 4, s"update scans not pruned: $n2 files opened")
    assert(SnapshotTable.read(spark, path)
      .filter(col("v") === 0.5).count() === 2)
  }

  test("null counts survive a rewrite (merge) and respect DV deletes conservatively") {
    val path = Files.createTempDirectory("graft-nulls6").toString + "/t"
    buildTable(path)
    // DV-delete every NULL row of the mixed file: the footer null
    // count is unchanged (files immutable), IS NULL still scans the
    // file (conservative — count claims presence in the FOOTER rows)
    SnapshotTable.deleteWithVectors(spark, path,
      col("id").startsWith("c") && col("v").isNull)
    val qNull = SnapshotTable.readWhere(spark, path, col("v").isNull)
    assert(qNull.count() === 10, "only the all-null file's rows remain null")
    assert(scannedFiles(qNull) === 2)
    // a full rewrite re-records counts from the new footers
    SnapshotTable.compact(spark, path, numFiles = 1)
    val v = SnapshotTable.latestVersion(spark, path).get
    val nulls = SnapshotTable.readManifest(spark, path, v)
      .filter(_.rows > 0).flatMap(_.nulls.find(_._1 == "v").map(_._2)).sum
    assert(nulls === 10L)
  }
}
