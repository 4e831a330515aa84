package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SnapshotIncrementalSpec extends SparkTestBase {

  import spark.implicits._

  private def mk(tag: String, n: Int) =
    (0 until n).map(i => (s"$tag-$i", i * 1.0)).toDF("id", "v")

  test("processNew consumes each commit range exactly once, only new files read") {
    val path = Files.createTempDirectory("graft-inc").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-inc-ckpt").toString
    SnapshotTable.append(mk("a", 5), path)
    SnapshotTable.append(mk("b", 3), path)

    var seen = Seq.empty[(Long, Long, Long)] // (from, to, rows)
    def run(): Option[(Long, Long)] =
      SnapshotIncremental.processNew(spark, path, ckpt) { (df, from, to) =>
        seen :+= ((from, to, df.count()))
      }

    assert(run() === Some((1L, 2L)))
    assert(seen === Seq((1L, 2L, 8L))) // both commits in the first batch
    assert(run() === None)             // nothing new

    SnapshotTable.append(mk("c", 4), path)
    assert(run() === Some((3L, 3L)))
    assert(seen.last === ((3L, 3L, 4L))) // ONLY the new commit's rows
    assert(SnapshotIncremental.lastConsumed(spark, ckpt) === Some(3L))
  }

  test("a failed batch is replayed; the offset never advances past it") {
    val path = Files.createTempDirectory("graft-inc-fail").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-inc-fail-ckpt").toString
    SnapshotTable.append(mk("a", 5), path)
    intercept[RuntimeException] {
      SnapshotIncremental.processNew(spark, path, ckpt) { (_, _, _) =>
        throw new RuntimeException("sink down")
      }
    }
    assert(SnapshotIncremental.lastConsumed(spark, ckpt) === None)
    var rows = 0L
    SnapshotIncremental.processNew(spark, path, ckpt) { (df, _, _) => rows = df.count() }
    assert(rows === 5L) // replayed in full
  }

  test("append-only mode refuses rewrite commits; Cdc mode consumes them") {
    val path = Files.createTempDirectory("graft-inc-cdc").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-inc-cdc-ckpt").toString
    SnapshotTable.append(mk("a", 5), path)
    SnapshotIncremental.processNew(spark, path, ckpt) { (_, _, _) => () }
    SnapshotTable.delete(spark, path, col("v") >= 3.0) // v2: a rewrite
    val e = intercept[IllegalArgumentException] {
      SnapshotIncremental.processNew(spark, path, ckpt) { (_, _, _) => () }
    }
    assert(e.getMessage.contains("not append-only"))
    assert(e.getMessage.contains("op=delete"))
    // offset did not advance on the failure
    assert(SnapshotIncremental.lastConsumed(spark, ckpt) === Some(1L))

    var changes = Seq.empty[(String, String)]
    SnapshotIncremental.processNew(spark, path, ckpt, SnapshotIncremental.Cdc) {
      (df, _, _) =>
        changes = df.select("id", "_change_type").as[(String, String)].collect().toSeq
    }
    assert(changes.toSet === Set(("a-3", "delete"), ("a-4", "delete")))
    assert(SnapshotIncremental.lastConsumed(spark, ckpt) === Some(2L))
  }

  test("vacuum never expires versions a registered consumer still needs") {
    val path = Files.createTempDirectory("graft-inc-vac").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-inc-vac-ckpt").toString
    SnapshotTable.append(mk("a", 3), path)                 // v1
    SnapshotIncremental.processNew(spark, path, ckpt) { (_, _, _) => () } // consumed 1
    SnapshotTable.append(mk("b", 3), path)                 // v2
    SnapshotTable.append(mk("c", 3), path)                 // v3
    // keepVersions=1 would normally expire v1 and v2; the consumer's
    // offset (1) protects v1 upward, so nothing expires
    SnapshotTable.vacuum(spark, path, keepVersions = 1, protectConsumers = Seq(ckpt))
    assert(SnapshotTable.versions(spark, path) === Seq(1L, 2L, 3L))
    // the consumer catches up cleanly over the protected range
    var rows = 0L
    SnapshotIncremental.processNew(spark, path, ckpt) { (df, _, _) => rows = df.count() }
    assert(rows === 6L)
    // once consumed through v3, only versions below the offset expire
    SnapshotTable.vacuum(spark, path, keepVersions = 1, protectConsumers = Seq(ckpt))
    assert(SnapshotTable.versions(spark, path) === Seq(3L))
    // a provisioned-but-never-run consumer protects the whole history
    val freshCkpt = Files.createTempDirectory("graft-inc-vac-fresh").toString
    SnapshotTable.append(mk("d", 3), path)                 // v4
    SnapshotTable.vacuum(spark, path, keepVersions = 1,
      protectConsumers = Seq(freshCkpt))
    assert(SnapshotTable.versions(spark, path) === Seq(3L, 4L))
  }

  test("Cdc feed skips compact versions from the manifest alone — zero file reads, same content") {
    val path = Files.createTempDirectory("graft-inc-skip").toString + "/t"
    SnapshotTable.append(mk("a", 5), path)                 // v1
    SnapshotTable.append(mk("b", 3), path)                 // v2
    SnapshotTable.delete(spark, path, col("v") >= 4.0)     // v3: one real rewrite
    SnapshotTable.compact(spark, path, numFiles = 2)       // v4: row-preserving
    SnapshotTable.append(mk("c", 2), path)                 // v5
    val compactFiles = SnapshotTable.liveFiles(spark, path, Some(4L))
      .filterNot(SnapshotTable.liveFiles(spark, path, Some(3L)).toSet).toSet
    assert(compactFiles.nonEmpty) // the compact DID rewrite files
    val feed = SnapshotIncremental.readBetween(spark, path, 0L, 5L,
      SnapshotIncremental.Cdc)
    // the plan never touches the compact version's rewritten files
    assert(feed.inputFiles.map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath)
      .toSet.intersect(compactFiles
        .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath)).isEmpty)
    // and the feed content is exactly what the diffs say happened
    val got = feed.select("id", "_change_type", "_commit_version")
      .as[(String, String, Long)].collect().toSet
    val expected =
      (0 until 5).map(i => (s"a-$i", "insert", 1L)).toSet ++
      (0 until 3).map(i => (s"b-$i", "insert", 2L)).toSet ++
      Set(("a-4", "delete", 3L)) ++
      (0 until 2).map(i => (s"c-$i", "insert", 5L)).toSet
    assert(got === expected)
  }

  test("readBatched splits a long range into bounded sub-ranges equal to the single read") {
    val path = Files.createTempDirectory("graft-inc-batch").toString + "/t"
    (1 to 5).foreach(i => SnapshotTable.append(mk(s"c$i", i), path))
    val batches = SnapshotIncremental.readBatched(spark, path, 0L, 5L, 2L).toSeq
    assert(batches.map(b => (b._1, b._2)) === Seq((1L, 2L), (3L, 4L), (5L, 5L)))
    assert(batches.map(_._3.count()) === Seq(3L, 7L, 5L)) // 1+2, 3+4, 5
    val single = SnapshotIncremental.readBetween(spark, path, 0L, 5L)
    assert(batches.map(_._3.count()).sum === single.count())
  }

  test("processNew with maxVersionsPerBatch advances the offset per sub-range") {
    val path = Files.createTempDirectory("graft-inc-bp").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-inc-bp-ckpt").toString
    (1 to 4).foreach(i => SnapshotTable.append(mk(s"c$i", 1), path))
    var calls = 0
    intercept[RuntimeException] {
      SnapshotIncremental.processNew(spark, path, ckpt,
        maxVersionsPerBatch = Some(2L)) { (_, _, to) =>
        calls += 1
        if (to >= 4L) throw new RuntimeException("sink down mid-backlog")
      }
    }
    // first sub-range (1,2] committed before the second (3,4] failed
    assert(calls === 2)
    assert(SnapshotIncremental.lastConsumed(spark, ckpt) === Some(2L))
    // resume consumes ONLY the failed sub-range
    var ranges = Seq.empty[(Long, Long)]
    SnapshotIncremental.processNew(spark, path, ckpt,
      maxVersionsPerBatch = Some(2L)) { (_, f, t) => ranges :+= ((f, t)) }
    assert(ranges === Seq((3L, 4L)))
  }

  test("first Cdc batch from version 0 bootstraps the whole table as inserts") {
    val path = Files.createTempDirectory("graft-inc-boot").toString + "/t"
    SnapshotTable.append(mk("a", 5), path)
    SnapshotTable.delete(spark, path, col("v") >= 4.0)
    val feed = SnapshotIncremental.readBetween(spark, path, 0L, 2L,
      SnapshotIncremental.Cdc)
    // net content: 4 inserts at v1 survive... plus the delete pair
    assert(feed.filter(col("_change_type") === "insert").count() === 5)
    assert(feed.filter(col("_change_type") === "delete").count() === 1)
  }

  test("CdcWithRowIds keys a keyless update's images by stable row identity") {
    import org.apache.spark.sql.types._
    val path = Files.createTempDirectory("graft-inc-rid").toString + "/t"
    SnapshotTable.create(spark, path, StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))),
      rowTracking = true)
    // duplicate values: nothing but row identity can pair the images
    SnapshotTable.append(Seq((1L, 5.0), (2L, 5.0)).toDF("k", "v"), path) // v2
    val vU = SnapshotTable.update(spark, path,
      Seq("v" -> lit(9.0)), col("v") === 5.0)                            // v3
    val feed = SnapshotIncremental.readBetween(spark, path, vU - 1, vU,
      SnapshotIncremental.CdcWithRowIds)
    assert(feed.columns.contains(SnapshotTable.RowIdCol))
    val pre = feed.filter(col("_change_type") === "update_preimage")
      .select(SnapshotTable.RowIdCol).as[Long].collect().sorted
    val post = feed.filter(col("_change_type") === "update_postimage")
      .select(SnapshotTable.RowIdCol).as[Long].collect().sorted
    assert(pre.length === 2 && pre === post,
      "images must pair on the same stable ids")
    // plain Cdc keeps the untracked shape
    assert(!SnapshotIncremental.readBetween(spark, path, vU - 1, vU,
      SnapshotIncremental.Cdc).columns.contains(SnapshotTable.RowIdCol))
  }
}
