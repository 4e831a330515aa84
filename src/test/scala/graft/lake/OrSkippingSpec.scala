package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** OR-branch file skipping: the compiled skip predicate honors the
  * predicate's boolean structure, so a disjunction prunes to the
  * UNION of its branches' candidate files — the common
  * `k = a OR k = b` / `k < x OR k > y` shapes that a
  * conjunct-only skipper reads the whole table for. */
class OrSkippingSpec extends SparkTestBase {

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

  /** 4 clustered files: k ranges [1,100], [101,200], [201,300],
    * [301,400]; v null only in the first file's rows. */
  private def buildTable(path: String): Unit = {
    val rows = (1 to 400).map(i =>
      (i.toLong, if (i <= 100) Option.empty[Double] else Option(i * 1.0)))
    SnapshotTable.appendClustered(rows.toDF("k", "v"), path, "k", numFiles = 4)
  }

  test("k = a OR k = b opens exactly the two candidate files") {
    val path = Files.createTempDirectory("graft-or1").toString + "/t"
    buildTable(path)
    val q = SnapshotTable.readWhere(spark, path,
      col("k") === 5L || col("k") === 250L)
    assert(q.count() === 2)
    assert(scannedFiles(q) === 2, "OR of two points must open 2 of 4 files")
    // three branches, one shared file
    val q2 = SnapshotTable.readWhere(spark, path,
      col("k") === 5L || col("k") === 7L || col("k") === 399L)
    assert(q2.count() === 3)
    assert(scannedFiles(q2) === 2)
  }

  test("range disjunction and AND-under-OR prune; unknown branch is conservative") {
    val path = Files.createTempDirectory("graft-or2").toString + "/t"
    buildTable(path)
    val q = SnapshotTable.readWhere(spark, path,
      col("k") < 50L || col("k") > 350L)
    assert(q.count() === 99)
    assert(scannedFiles(q) === 2)
    // (k < 50 AND v > 0) OR k > 350 — the left branch narrows to
    // file 1 by bounds, where the null counts then REFUTE it (file 1
    // is all-null in v, so no row can satisfy v > 0): the whole left
    // branch is unsatisfiable and only the right branch's file opens
    val q2 = SnapshotTable.readWhere(spark, path,
      (col("k") < 50L && col("v") > 0.0) || col("k") > 350L)
    assert(q2.count() === 50)
    assert(scannedFiles(q2) === 1,
      "cross-family AND-under-OR must refute the all-null branch")
    // an opaque branch keeps every file readable
    val q3 = SnapshotTable.readWhere(spark, path,
      col("k") === 5L || abs(col("k")) === 250L)
    assert(q3.count() === 2)
    assert(scannedFiles(q3) === 4, "opaque OR branch must stay conservative")
  }

  test("cross-family OR: bounds on one branch, null counts on the other") {
    val path = Files.createTempDirectory("graft-or3").toString + "/t"
    buildTable(path)
    // v IS NULL holds only in file 1 (null counts), k = 250 only in
    // file 3 (numeric bounds) — the OR opens exactly those two
    val q = SnapshotTable.readWhere(spark, path,
      col("v").isNull || col("k") === 250L)
    assert(q.count() === 101)
    assert(scannedFiles(q) === 2)
  }

  test("NOT over a disjunction stays conservative; conjunct pruning is unchanged") {
    val path = Files.createTempDirectory("graft-or4").toString + "/t"
    buildTable(path)
    val qNot = SnapshotTable.readWhere(spark, path,
      !(col("k") === 5L || col("k") === 250L))
    assert(qNot.count() === 398)
    assert(scannedFiles(qNot) === 4)
    val qAnd = SnapshotTable.readWhere(spark, path,
      col("k") >= 120L && col("k") <= 150L)
    assert(qAnd.count() === 31)
    assert(scannedFiles(qAnd) === 1)
  }
}
