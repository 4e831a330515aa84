package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Column mapping (Delta name-mapping / Iceberg metadata-rename
  * shape): RENAME COLUMN and DROP COLUMN are metadata-only commits —
  * data files keep their physical parquet names; reads alias
  * physical → logical; every stats family (min/max, string bounds,
  * blooms, null counts) keeps pruning through the rename; time
  * travel serves each version under ITS OWN schema + mapping. */
class ColumnMappingSpec extends SparkTestBase {

  import spark.implicits._

  test("rename is metadata-only: same files, new name reads, old versions keep old name") {
    val path = Files.createTempDirectory("graft-cm1").toString + "/t"
    SnapshotTable.append(
      (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("k", "v").coalesce(1), path) // v1
    val filesBefore = SnapshotTable.liveFiles(spark, path).toSet
    SnapshotTable.renameColumn(spark, path, "v", "value")                       // v2
    assert(SnapshotTable.liveFiles(spark, path).toSet === filesBefore,
      "rename must rewrite zero files")
    val now = SnapshotTable.read(spark, path)
    assert(now.columns.toSeq === Seq("k", "value"))
    assert(now.select(sum("value")).as[Double].head() === 55.0)
    // time travel to v1: the pre-rename logical name
    val old = SnapshotTable.read(spark, path, Some(1L))
    assert(old.columns.toSeq === Seq("k", "v"))
    assert(old.select(sum("v")).as[Double].head() === 55.0)
  }

  test("writes after a rename store the PHYSICAL name; mixed-era reads agree") {
    val path = Files.createTempDirectory("graft-cm2").toString + "/t"
    SnapshotTable.append(
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1), path)                          // v1
    SnapshotTable.renameColumn(spark, path, "v", "value")                       // v2
    SnapshotTable.append(
      Seq((2L, 2.0)).toDF("k", "value").coalesce(1), path)                      // v3
    // the new file's parquet schema carries the physical name "v"
    val newFile = (SnapshotTable.liveFiles(spark, path).toSet --
      SnapshotTable.readManifest(spark, path, 1L).map(_.filePath).toSet).head
    val physCols = spark.read.parquet(newFile).columns.toSeq
    assert(physCols === Seq("k", "v"),
      s"post-rename file must store the physical name, got $physCols")
    val got = SnapshotTable.read(spark, path).orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 1.0), (2L, 2.0)))
  }

  test("merge keyed on a renamed column keeps pruning (stats live under physical names)") {
    val path = Files.createTempDirectory("graft-cm3").toString + "/t"
    // clustered layout → per-file min/max on k
    val rows = (1 to 400).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
    SnapshotTable.appendClustered(rows, path, "k", numFiles = 4)                // v1
    SnapshotTable.renameColumn(spark, path, "k", "id")                          // v2
    val before = SnapshotTable.liveFiles(spark, path).toSet
    SnapshotTable.merge(Seq((5L, -1.0)).toDF("id", "v").coalesce(1),
      path, Seq("id"))                                                          // v3
    val after = SnapshotTable.liveFiles(spark, path).toSet
    assert((before -- after).size === 1,
      s"point merge on the renamed key must rewrite 1 of 4 files, " +
        s"rewrote ${(before -- after).size}")
    val got = SnapshotTable.read(spark, path)
    assert(got.filter(col("id") === 5L).select("v").as[Double].head() === -1.0)
    assert(got.count() === 400)
    // readWhere range skipping on the renamed name still prunes
    val q = SnapshotTable.readWhere(spark, path, col("id") <= 50L)
    assert(q.count() === 50)
  }

  test("drop hides without rewrite; re-adding the name maps to a FRESH physical " +
      "name — dropped bytes never resurface; time travel serves them") {
    val path = Files.createTempDirectory("graft-cm4").toString + "/t"
    SnapshotTable.append(
      Seq((1L, 1.0, "x1"), (2L, 2.0, "x2")).toDF("k", "v", "s").coalesce(1), path)
    val filesBefore = SnapshotTable.liveFiles(spark, path).toSet
    SnapshotTable.dropColumn(spark, path, "s")                                  // v2
    assert(SnapshotTable.liveFiles(spark, path).toSet === filesBefore)
    assert(SnapshotTable.read(spark, path).columns.toSeq === Seq("k", "v"))
    // time travel: v1 still shows the column and its data
    assert(SnapshotTable.read(spark, path, Some(1L))
      .select("s").as[String].collect().sorted.toSeq === Seq("x1", "x2"))
    // RE-ADD the dropped name: the stable-field-id move via the
    // mapping — logical 's' gets physical 's__r2', so old files read
    // NULL (never the dropped bytes)
    SnapshotTable.addColumns(spark, path,
      Seq(org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))                                // v3
    val m3 = SnapshotTable.readManifestFull(spark, path,
      SnapshotTable.latestVersion(spark, path).get)
    assert(m3.colmap.get("s") === Some("s__r2"), s"fresh mapping: ${m3.colmap}")
    assert(SnapshotTable.read(spark, path).filter(col("s").isNotNull).count()
      === 0L, "dropped bytes must not resurface under the re-added column")
    // new writes land under the fresh physical name and read back
    SnapshotTable.append(Seq((3L, 3.0, "fresh")).toDF("k", "v", "s")
      .coalesce(1), path)                                                       // v4
    val got = SnapshotTable.read(spark, path).orderBy("k")
      .select("s").as[String].collect().toSeq
    assert(got === Seq(null, null, "fresh"))
    val newFile = (SnapshotTable.liveFiles(spark, path).toSet -- filesBefore).head
    assert(spark.read.parquet(newFile).columns.contains("s__r2"))
    // drop AGAIN (tombstones s__r2) and re-add via the APPEND path:
    // the write remaps to s__r3 automatically
    SnapshotTable.dropColumn(spark, path, "s")                                  // v5
    SnapshotTable.append(Seq((4L, 4.0, "again")).toDF("k", "v", "s"), path)     // v6
    val m6 = SnapshotTable.readManifestFull(spark, path,
      SnapshotTable.latestVersion(spark, path).get)
    assert(m6.colmap.get("s") === Some("s__r3"))
    assert(SnapshotTable.read(spark, path).orderBy("k").select("s")
      .as[String].collect().toSeq === Seq(null, null, null, "again"))
    // every era stays time-travelable under its own mapping
    assert(SnapshotTable.read(spark, path, Some(4L)).orderBy("k").select("s")
      .as[String].collect().toSeq === Seq(null, null, "fresh"))
    // a DIFFERENT name is fine and reads NULL for old rows
    SnapshotTable.addColumns(spark, path,
      Seq(org.apache.spark.sql.types.StructField("s2",
        org.apache.spark.sql.types.StringType)))
    assert(SnapshotTable.read(spark, path).filter(col("s2").isNull).count() === 4)
  }

  test("re-using a RENAMED column's old name maps fresh too — the renamed " +
      "column keeps its bytes, the new column starts empty") {
    val path = Files.createTempDirectory("graft-cm4b").toString + "/t"
    SnapshotTable.append(Seq((1L, 7.5)).toDF("k", "a").coalesce(1), path)  // v1
    SnapshotTable.renameColumn(spark, path, "a", "b")                      // v2: b->a
    // adding a new column named 'a' must NOT read the renamed column's
    // physical 'a' bytes
    SnapshotTable.append(Seq((2L, 8.5, 9.9)).toDF("k", "b", "a"), path)    // v3
    val m = SnapshotTable.readManifestFull(spark, path,
      SnapshotTable.latestVersion(spark, path).get)
    assert(m.colmap.get("b") === Some("a") && m.colmap.get("a") === Some("a__r2"),
      s"got ${m.colmap}")
    val got = SnapshotTable.read(spark, path).orderBy("k").collect()
    assert(got.map(_.getDouble(1)).toSeq === Seq(7.5, 8.5))  // b serves old bytes
    assert(got(0).isNullAt(2) && got(1).getDouble(2) === 9.9) // a is fresh
  }

  test("rename guards: constraint and transform references refuse; restore undoes a rename") {
    val path = Files.createTempDirectory("graft-cm5").toString + "/t"
    SnapshotTable.append(
      Seq((1L, 5.0)).toDF("k", "v").coalesce(1), path)                          // v1
    SnapshotTable.addCheckConstraint(spark, path, "v_pos", "v > 0")             // v2
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, path, "v", "value")
    }
    assert(e.getMessage.contains("v_pos"))
    SnapshotTable.dropCheckConstraint(spark, path, "v_pos")                     // v3
    SnapshotTable.renameColumn(spark, path, "v", "value")                       // v4
    assert(SnapshotTable.read(spark, path).columns.contains("value"))
    // restore to the pre-rename version brings the old name back
    SnapshotTable.restore(spark, path, 3L)                                      // v5
    assert(SnapshotTable.read(spark, path).columns.toSeq === Seq("k", "v"))
    assert(SnapshotTable.read(spark, path).select("v").as[Double].head() === 5.0)
    // hidden-partitioned table: the transform's source refuses rename
    val p2 = Files.createTempDirectory("graft-cm5b").toString + "/t"
    SnapshotTable.appendTransformed(
      Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .toDF("id", "ts").coalesce(1), p2, Seq("months(ts)"))
    val e3 = intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, p2, "ts", "created")
    }
    assert(e3.getMessage.contains("transform"))
  }

  test("rename chains and rename-back dissolve cleanly; CDC reads logical names per version") {
    val path = Files.createTempDirectory("graft-cm6").toString + "/t"
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v").coalesce(1), path)       // v1
    SnapshotTable.renameColumn(spark, path, "v", "a")                           // v2
    SnapshotTable.renameColumn(spark, path, "a", "b")                           // v3
    SnapshotTable.append(Seq((2L, 2.0)).toDF("k", "b").coalesce(1), path)       // v4
    assert(SnapshotTable.read(spark, path).columns.toSeq === Seq("k", "b"))
    // rename back to the physical name removes the mapping entirely
    SnapshotTable.renameColumn(spark, path, "b", "v")                           // v5
    val m = SnapshotTable.readManifestFull(spark, path,
      SnapshotTable.latestVersion(spark, path).get)
    assert(m.colmap.isEmpty, s"identity mapping must dissolve: ${m.colmap}")
    // the change feed emits each commit under its own logical schema:
    // v4's insert surfaces under the version range's target schema
    val feed = SnapshotTable.changes(spark, path, 3L, 4L)
    assert(feed.columns.contains("b"))
    assert(feed.count() === 1)
  }

  test("exactly-once streaming sink writes PHYSICAL names into a mapped target") {
    val base = Files.createTempDirectory("graft-cm-stream").toString
    val (src, dst, ckpt) = (s"$base/src", s"$base/dst", s"$base/ckpt")
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v").coalesce(1), dst)
    SnapshotTable.renameColumn(spark, dst, "v", "value")
    val before = SnapshotTable.liveFiles(spark, dst).toSet
    // the stream's frame uses the CURRENT logical names
    SnapshotTable.append(Seq((2L, 2.0), (3L, 3.0))
      .toDF("k", "value").coalesce(1), src)
    val q = spark.readStream.format("graft-snapshot").load(src)
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
    val got = SnapshotTable.read(spark, dst).orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    // the streamed file stores the PHYSICAL name, like every batch file
    val newFile = (SnapshotTable.liveFiles(spark, dst).toSet -- before).head
    assert(spark.read.parquet(newFile).columns.toSeq === Seq("k", "v"))
    // quarantine mode composes with mapped targets too (fully
    // compliant epoch → fast path, physical names; the split path is
    // covered in SnapshotStreamSinkSpec)
    val q2 = spark.readStream.format("graft-snapshot").load(src)
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation", s"$base/ckpt2")
      .option("failMode", "quarantine")
      .option("quarantinePath", s"$base/quar")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dst)
    q2.awaitTermination()
    val got2 = SnapshotTable.read(spark, dst).filter(col("k") >= 2L)
    assert(got2.count() === 4L, "quarantine mode must land the epoch on a mapped target")
    assert(SnapshotTable.liveFiles(spark, dst)
      .forall(f => !spark.read.parquet(f).columns.contains("value")))
  }

  test("DV deletes and compact work across a rename") {
    val path = Files.createTempDirectory("graft-cm7").toString + "/t"
    SnapshotTable.append(
      (1 to 20).map(i => (i.toLong, i * 1.0)).toDF("k", "v").coalesce(1), path) // v1
    SnapshotTable.renameColumn(spark, path, "v", "value")                       // v2
    SnapshotTable.deleteWithVectors(spark, path, col("value") > 18.0)           // v3
    assert(SnapshotTable.read(spark, path).count() === 18)
    SnapshotTable.update(spark, path, Seq("value" -> lit(0.0)),
      col("k") === 1L)                                                          // v4
    assert(SnapshotTable.read(spark, path)
      .filter(col("k") === 1L).select("value").as[Double].head() === 0.0)
    SnapshotTable.compact(spark, path, numFiles = 1)                            // v5
    val got = SnapshotTable.read(spark, path)
    assert(got.count() === 18 && got.columns.toSeq === Seq("k", "value"))
    // compacted files are rewritten under the CURRENT mapping — the
    // physical name persists
    val f = SnapshotTable.liveFiles(spark, path).head
    assert(spark.read.parquet(f).columns.toSeq === Seq("k", "v"))
  }
}
