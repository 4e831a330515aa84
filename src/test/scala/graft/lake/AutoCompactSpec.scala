package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Commit-time auto-compaction (Delta autoOptimize posture): a burst
  * of tiny appends converges the live-file count instead of growing
  * it forever; the trigger reads only the manifest, rewrites only
  * over-threshold partitions, composes with branches/time travel,
  * and re-records blooms on the rewritten files. */
class AutoCompactSpec extends SparkTestBase {

  import spark.implicits._

  test("a burst of tiny appends converges the file count; rows and history intact") {
    val path = Files.createTempDirectory("graft-ac1").toString + "/t"
    SnapshotTable.append(Seq((0L, 0.0)).toDF("k", "v").coalesce(1), path)
    SnapshotTable.setAutoCompact(spark, path, minSmallFiles = 5)
    (1 to 12).foreach { i =>
      SnapshotTable.append(Seq((i.toLong, i * 1.0)).toDF("k", "v").coalesce(1), path)
    }
    val files = SnapshotTable.liveFiles(spark, path).size
    assert(files <= 5, s"auto-compaction failed to converge: $files live files")
    val got = SnapshotTable.read(spark, path)
    assert(got.count() === 13)
    assert(got.select(sum("k")).as[Long].head() === 78L)
    // the compactions are ordinary commits: history shows them and
    // every pre-compaction version stays readable
    val ops = SnapshotTable.history(spark, path)
      .select("operation").as[String].collect().toSet
    assert(ops.contains("autocompact"))
    assert(SnapshotTable.read(spark, path, Some(3L)).count() === 2)
  }

  test("partition-scoped: only the over-threshold partition is rewritten") {
    val path = Files.createTempDirectory("graft-ac2").toString + "/t"
    SnapshotTable.append(
      Seq(("b0", "pb", 0L)).toDF("id", "p", "v").coalesce(1), path, Seq("p"))
    SnapshotTable.setAutoCompact(spark, path, minSmallFiles = 4)
    val bFilesBefore = SnapshotTable.liveFiles(spark, path)
      .filter(_.contains("p=pb")).toSet
    (1 to 6).foreach { i =>
      SnapshotTable.append(
        Seq((s"a$i", "pa", i.toLong)).toDF("id", "p", "v").coalesce(1),
        path, Seq("p"))
    }
    val live = SnapshotTable.liveFiles(spark, path)
    assert(live.count(_.contains("p=pa")) <= 4,
      s"partition pa not compacted: ${live.filter(_.contains("p=pa"))}")
    assert(live.filter(_.contains("p=pb")).toSet === bFilesBefore,
      "partition pb (under threshold) must not be rewritten")
    assert(SnapshotTable.read(spark, path).count() === 7)
  }

  test("disabled policy never fires; bloom-enabled tables re-record blooms on compaction") {
    val path = Files.createTempDirectory("graft-ac3").toString + "/t"
    SnapshotTable.append(Seq(("x0", 0L)).toDF("id", "v").coalesce(1), path)
    SnapshotTable.setBloomColumns(spark, path, Seq("id"))
    SnapshotTable.setAutoCompact(spark, path, minSmallFiles = 4)
    (1 to 8).foreach { i =>
      SnapshotTable.append(Seq((s"x$i", i.toLong)).toDF("id", "v").coalesce(1), path)
    }
    val v = SnapshotTable.latestVersion(spark, path).get
    val entries = SnapshotTable.readManifest(spark, path, v).filter(_.rows > 0)
    assert(entries.size <= 4)
    assert(entries.filter(_.rows > 1)
      .forall(_.blooms.exists(_._1 == "id")),
      "compacted files must carry re-recorded blooms")
    // switch off: no further compaction
    SnapshotTable.setAutoCompact(spark, path, minSmallFiles = 0)
    assert(SnapshotTable.autoCompactPolicy(spark, path).isEmpty)
    val before = SnapshotTable.liveFiles(spark, path).size
    (9 to 14).foreach { i =>
      SnapshotTable.append(Seq((s"x$i", i.toLong)).toDF("id", "v").coalesce(1), path)
    }
    assert(SnapshotTable.liveFiles(spark, path).size === before + 6)
  }
}
