package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** METADATA-ONLY type widening ([[SnapshotTable.widenColumnType]]):
  * lossless upcasts change the recorded schema without touching a
  * file; existing narrow files read through the parquet readers'
  * widening conversions; lossy changes are refused. */
class TypeWideningSpec extends SparkTestBase {

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.execution.FileSourceScanExec
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

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

  test("int->long: zero files rewritten, both eras read wide, time travel keeps INT") {
    val path = Files.createTempDirectory("graft-tw").toString + "/t"
    SnapshotTable.append(Seq((1, "a"), (2, "b")).toDF("k", "s"), path)   // v1 INT
    val files1 = SnapshotTable.liveFiles(spark, path).toSet
    SnapshotTable.widenColumnType(spark, path, "k", LongType)            // v2
    assert(SnapshotTable.liveFiles(spark, path).toSet === files1,
      "widening must not move a byte")
    SnapshotTable.append(Seq((3L, "c")).toDF("k", "s"), path)            // v3 LONG
    val got = SnapshotTable.read(spark, path)
    assert(got.schema("k").dataType === LongType)
    assert(got.select("k").as[Long].collect().sorted === Array(1L, 2L, 3L))
    // each version reads under its own recorded type
    assert(SnapshotTable.read(spark, path, Some(1L)).schema("k").dataType
      === IntegerType)
    assert(SnapshotTable.read(spark, path, Some(1L)).select("k").as[Int]
      .collect().sorted === Array(1, 2))
    // history labels the commit
    assert(SnapshotTable.history(spark, path).filter(col("operation") ===
      "widenColumn").count() === 1L)
  }

  test("float->double and int->double widen losslessly") {
    val path = Files.createTempDirectory("graft-tw-fd").toString + "/t"
    SnapshotTable.append(Seq((1, 1.5f), (2, -2.25f)).toDF("k", "f"), path)
    SnapshotTable.widenColumnType(spark, path, "f", DoubleType)
    SnapshotTable.widenColumnType(spark, path, "k", DoubleType)
    val got = SnapshotTable.read(spark, path)
    assert(got.schema("f").dataType === DoubleType)
    assert(got.select("f").as[Double].collect().sorted === Array(-2.25, 1.5))
    assert(got.select("k").as[Double].collect().sorted === Array(1.0, 2.0))
  }

  test("lossy or non-widening changes are refused; narrow appends stay drift") {
    val path = Files.createTempDirectory("graft-tw-bad").toString + "/t"
    SnapshotTable.append(Seq((1L, 1.0, "x")).toDF("k", "d", "s"), path)
    for ((c, t) <- Seq(("k", IntegerType), ("d", FloatType), ("s", LongType),
        ("k", FloatType), ("d", StringType), ("k", DoubleType)))
      intercept[IllegalArgumentException](
        SnapshotTable.widenColumnType(spark, path, c, t))
    intercept[IllegalArgumentException](
      SnapshotTable.widenColumnType(spark, path, "missing", LongType))
    // after a widen, an un-cast narrow append is still schema drift
    val p2 = Files.createTempDirectory("graft-tw-drift").toString + "/t"
    SnapshotTable.append(Seq((1, "a")).toDF("k", "s"), p2)
    SnapshotTable.widenColumnType(spark, p2, "k", LongType)
    val e = intercept[Exception](
      SnapshotTable.append(Seq((2, "b")).toDF("k", "s"), p2))
    assert(e.getMessage.contains("drift"))
  }

  test("widening a transform-derived column is refused (type-sensitive layout)") {
    val path = Files.createTempDirectory("graft-tw-tr").toString + "/t"
    SnapshotTable.appendTransformed(Seq((1, "a"), (17, "b")).toDF("k", "s"),
      path, Seq("bucket(4, k)"))
    val e = intercept[IllegalArgumentException](
      SnapshotTable.widenColumnType(spark, path, "k", LongType))
    assert(e.getMessage.contains("partition transform"))
  }

  test("file skipping prunes through a widened column; blooms still probe") {
    val path = Files.createTempDirectory("graft-tw-skip").toString + "/t"
    SnapshotTable.appendClustered(
      (1 to 90).map(i => (i, s"r$i")).toDF("k", "s"), path, "k", numFiles = 3)
    SnapshotTable.setBloomColumns(spark, path, Seq("k"))
    // bloom-less era widens fine; stats (doubles) survive untouched
    SnapshotTable.widenColumnType(spark, path, "k", LongType)
    val q = SnapshotTable.readWhere(spark, path, col("k") === lit(5L))
    assert(q.select("s").as[String].collect() === Array("r5"))
    assert(scannedFiles(q) === 1L,
      "min/max skipping must keep pruning under the widened type")
    // a post-widen bloomed LONG file probes with the same cast-to-long
    // hash family the INT era used
    SnapshotTable.append(Seq((1000L, "r1000")).toDF("k", "s").coalesce(1), path)
    val q2 = SnapshotTable.readWhere(spark, path, col("k") === lit(1000L))
    assert(q2.select("s").as[String].collect() === Array("r1000"))
    assert(scannedFiles(q2) === 1L)
  }

  test("DML and maintenance compose across a widen: merge, update, delete, " +
      "compact, CDC all read the INT era through the wide type") {
    val path = Files.createTempDirectory("graft-tw-dml").toString + "/t"
    SnapshotTable.append((1 to 6).map(i => (i, i * 1.0)).toDF("k", "d")
      .coalesce(2), path)                                              // v1 INT
    SnapshotTable.widenColumnType(spark, path, "k", LongType)          // v2
    // merge: source keys are LONG, matching rows live in INT-era files
    SnapshotTable.merge(Seq((2L, 20.0), (7L, 70.0)).toDF("k", "d"),
      path, Seq("k"), Nil)                                             // v3
    assert(SnapshotTable.read(spark, path).orderBy("k").as[(Long, Double)]
      .collect().toSeq === Seq((1L, 1.0), (2L, 20.0), (3L, 3.0),
        (4L, 4.0), (5L, 5.0), (6L, 6.0), (7L, 70.0)))
    SnapshotTable.update(spark, path, Seq("d" -> lit(0.0)), col("k") === 3L) // v4
    SnapshotTable.delete(spark, path, col("k") === 4L)                 // v5
    SnapshotTable.compact(spark, path)                                 // v6
    assert(SnapshotTable.read(spark, path).orderBy("k").as[(Long, Double)]
      .collect().toSeq === Seq((1L, 1.0), (2L, 20.0), (3L, 0.0),
        (5L, 5.0), (6L, 6.0), (7L, 70.0)))
    // CDC across the widen: the merge's changes surface under the
    // WIDE schema (the range's target version type)
    val feed = SnapshotTable.changes(spark, path, 2L, 3L)
    assert(feed.schema("k").dataType === LongType)
    assert(feed.filter(col("_change_type") === "insert")
      .select("k").as[Long].collect().sorted === Array(7L))
  }

  test("widening composes with column mapping and the streaming source") {
    val path = Files.createTempDirectory("graft-tw-cm").toString + "/t"
    SnapshotTable.append(Seq((1, "a")).toDF("k", "s"), path)
    SnapshotTable.renameColumn(spark, path, "k", "id")   // mapping id->k
    SnapshotTable.widenColumnType(spark, path, "id", LongType)
    SnapshotTable.append(Seq((2L, "b")).toDF("id", "s"), path)
    val got = SnapshotTable.read(spark, path)
    assert(got.schema("id").dataType === LongType)
    assert(got.select("id").as[Long].collect().sorted === Array(1L, 2L))
    // stream both eras: the Group reader upcasts the INT32 file and
    // resolves the renamed physical name
    val buf = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = spark.readStream.format("graft-snapshot").load(path)
      .writeStream
      .option("checkpointLocation", s"$path-ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        buf.synchronized { buf ++= df.collect() }
        ()
      }
      .start()
    q.awaitTermination()
    assert(buf.map(_.getLong(0)).sorted === Seq(1L, 2L))
  }

}
