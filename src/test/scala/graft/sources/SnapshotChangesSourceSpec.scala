package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.lake.SnapshotTable

class SnapshotChangesSourceSpec extends SparkTestBase {

  import spark.implicits._

  /** Run an AvailableNow pass of the change-feed stream into a
    * buffer, returning (rows, batchCount). */
  private def drain(path: String, ckpt: String,
      opts: Map[String, String] = Map.empty): (Seq[Row], Int) = {
    val buf = scala.collection.mutable.ArrayBuffer[Row]()
    var batches = 0
    val q = spark.readStream.format("graft-changes").options(opts).load(path)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect()
        buf.synchronized { buf ++= rows; if (rows.nonEmpty) batches += 1 }
        ()
      }
      .start()
    q.awaitTermination()
    (buf.toSeq, batches)
  }

  private def tag(r: Row): (Long, String, Long) =
    (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("_change_type")),
      r.getLong(r.fieldIndex("_commit_version")))

  test("streams each commit's changes exactly once across restarts") {
    val base = Files.createTempDirectory("graft-cdf-stream").toString
    val (path, ckpt) = (s"$base/t", s"$base/ckpt")
    SnapshotTable.append(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), path) // v1
    SnapshotTable.append(Seq((3L, 30.0)).toDF("k", "v"), path)            // v2

    val (got, _) = drain(path, ckpt)
    assert(got.map(tag).sorted ===
      Seq((1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 2L)))
    // restart on the same checkpoint: nothing new
    assert(drain(path, ckpt)._1.isEmpty)
    // a delete lands as a change, not a rescan
    SnapshotTable.delete(spark, path, col("k") === 1L)                    // v3
    val (next, _) = drain(path, ckpt)
    assert(next.map(tag) === Seq((1L, "delete", 3L)))
    assert(next.head.getDouble(next.head.fieldIndex("v")) === 10.0)
  }

  test("merge emits update pre/post images through the stream; compaction emits nothing") {
    val base = Files.createTempDirectory("graft-cdf-merge").toString
    val (path, ckpt) = (s"$base/t", s"$base/ckpt")
    SnapshotTable.append(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), path) // v1
    SnapshotTable.merge(Seq((2L, 99.0)).toDF("k", "v"), path, Seq("k"))   // v2
    SnapshotTable.compact(spark, path)                                    // v3: row-preserving

    val (got, _) = drain(path, ckpt, Map("startingVersion" -> "2"))
    val images = got.map(r => (tag(r), r.getDouble(r.fieldIndex("v")))).sorted
    assert(images === Seq(
      ((2L, "update_postimage", 2L), 99.0),
      ((2L, "update_preimage", 2L), 20.0)))
  }

  test("maxVersionsPerTrigger bounds each microbatch to a version range") {
    val base = Files.createTempDirectory("graft-cdf-rate").toString
    val (path, ckpt) = (s"$base/t", s"$base/ckpt")
    (1 to 4).foreach(i => SnapshotTable.append(Seq((i.toLong, i * 1.0)).toDF("k", "v"), path))
    val (got, batches) = drain(path, ckpt, Map("maxVersionsPerTrigger" -> "1"))
    assert(batches === 4) // one non-empty batch per version
    assert(got.map(tag).sorted === (1 to 4).map(i => (i.toLong, "insert", i.toLong)))
  }

  test("history is served under the CURRENT schema: a pre-rename commit's values arrive under the new name") {
    val base = Files.createTempDirectory("graft-cdf-rename").toString
    val (path, ckpt) = (s"$base/t", s"$base/ckpt")
    SnapshotTable.append(Seq((1L, 10.0)).toDF("k", "v"), path)            // v1: physical 'v'
    SnapshotTable.renameColumn(spark, path, "v", "value")                 // v2: metadata-only
    SnapshotTable.append(Seq((2L, 20.0)).toDF("k", "value"), path)        // v3: still physical 'v'

    // the stream STARTS after the rename: schema has 'value'; the v1
    // commit predates it but its data must arrive — values, not the
    // silent schema-evolution NULLs a logical-name resolver produces
    val (got, _) = drain(path, ckpt)
    val byK = got.map(r => r.getLong(r.fieldIndex("k")) ->
      r.getDouble(r.fieldIndex("value"))).toMap
    assert(byK === Map(1L -> 10.0, 2L -> 20.0))
    assert(got.forall(!_.isNullAt(got.head.fieldIndex("value"))))
  }

  test("a rename DURING the stream fails loudly; restart adopts the new schema and replays values") {
    val base = Files.createTempDirectory("graft-cdf-midrename").toString
    val (path, ckpt) = (s"$base/t", s"$base/ckpt")
    SnapshotTable.append(Seq((1L, 10.0)).toDF("k", "v"), path)            // v1
    // capture the source BEFORE the rename (what a long-running query holds)
    val src = new SnapshotChangesStreamingSource(spark, path,
      new SnapshotChangesSource().createSource(spark.sqlContext, s"$base/meta",
        None, "graft-changes", Map("path" -> path)).schema,
      1L, None, capturedVersion = 1L)
    SnapshotTable.renameColumn(spark, path, "v", "value")                 // v2
    SnapshotTable.append(Seq((2L, 20.0)).toDF("k", "value"), path)        // v3
    val e = intercept[IllegalStateException] {
      src.getBatch(None, SnapshotChangesOffset(3L))
    }
    assert(e.getMessage.contains("RENAMED") && e.getMessage.contains("value"))
    // a restarted query (fresh capture) serves the whole range under 'value'
    val (got, _) = drain(path, ckpt)
    val byK = got.map(r => r.getLong(r.fieldIndex("k")) ->
      r.getDouble(r.fieldIndex("value"))).toMap
    assert(byK === Map(1L -> 10.0, 2L -> 20.0))
  }

  test("a type widening DURING the stream fails loudly; restart serves both eras wide") {
    val base = Files.createTempDirectory("graft-cdf-widen").toString
    val (path, ckpt) = (s"$base/t", s"$base/ckpt")
    SnapshotTable.append(Seq((1L, 10)).toDF("k", "n"), path)              // v1: INT era
    val src = new SnapshotChangesStreamingSource(spark, path,
      new SnapshotChangesSource().createSource(spark.sqlContext, s"$base/meta",
        None, "graft-changes", Map("path" -> path)).schema,
      1L, None, capturedVersion = 1L)
    SnapshotTable.widenColumnType(spark, path, "n",
      org.apache.spark.sql.types.LongType)                                // v2
    SnapshotTable.append(Seq((2L, 20L)).toDF("k", "n"), path)             // v3: LONG era
    val e = intercept[IllegalStateException] {
      src.getBatch(None, SnapshotChangesOffset(3L))
    }
    assert(e.getMessage.contains("changed type"))
    val (got, _) = drain(path, ckpt)
    val byK = got.map(r => r.getLong(r.fieldIndex("k")) ->
      r.getLong(r.fieldIndex("n"))).toMap
    assert(byK === Map(1L -> 10L, 2L -> 20L))
  }

  test("a column dropped before the stream starts vanishes from the feed (no physical-name leak)") {
    val base = Files.createTempDirectory("graft-cdf-drop").toString
    val (path, ckpt) = (s"$base/t", s"$base/ckpt")
    SnapshotTable.append(Seq((1L, 10.0, "x")).toDF("k", "v", "s"), path)  // v1
    SnapshotTable.dropColumn(spark, path, "s")                            // v2
    val (got, _) = drain(path, ckpt)
    assert(got.nonEmpty)
    val names = got.head.schema.fieldNames.toSet
    assert(!names.contains("s") && !names.exists(_.startsWith("s__")))
    assert(names === Set("k", "v", "_change_type", "_commit_version"))
  }

  test("startingTimestamp starts at the first commit at or after it; future timestamps tail empty") {
    val base = Files.createTempDirectory("graft-cdf-ts").toString
    val path = s"$base/t"
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v"), path)
    Thread.sleep(60)
    SnapshotTable.append(Seq((2L, 2.0)).toDF("k", "v"), path)
    Thread.sleep(60)
    SnapshotTable.append(Seq((3L, 3.0)).toDF("k", "v"), path)
    val t2 = SnapshotTable.commitTimeOf(spark, path, 2L)
    val (got, _) = drain(path, s"$base/ckpt1",
      Map("startingTimestamp" -> t2.toString))
    assert(got.map(tag).sorted === Seq((2L, "insert", 2L), (3L, "insert", 3L)))
    // a timestamp past the newest commit: empty now, tails later commits
    val future = (System.currentTimeMillis() + 3600000L).toString
    assert(drain(path, s"$base/ckpt2",
      Map("startingTimestamp" -> future))._1.isEmpty)
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-changes")
        .option("startingVersion", 1).option("startingTimestamp", t2.toString)
        .load(path)
    }
  }

  test("readChangeFeed on the raw source points at graft-changes instead of ignoring it") {
    val base = Files.createTempDirectory("graft-cdf-ptr").toString
    val path = s"$base/t"
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v"), path)
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").load(path)
    }
    assert(e.getMessage.contains("graft-changes"))
  }

  test("startingVersion is inclusive and bounds the feed") {
    val base = Files.createTempDirectory("graft-cdf-sv").toString
    val (path, ckpt) = (s"$base/t", s"$base/ckpt")
    (1 to 3).foreach(i => SnapshotTable.append(Seq((i.toLong, i * 1.0)).toDF("k", "v"), path))
    val (got, _) = drain(path, ckpt, Map("startingVersion" -> "2"))
    assert(got.map(tag).sorted === Seq((2L, "insert", 2L), (3L, "insert", 3L)))
  }

  test("includeRowIds: a KEYLESS update streams as image pairs sharing a " +
      "_row_id; pre-tracking commits serve NULL; untracked tables refuse") {
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-cdf-rid").toString
    val (path, ckpt) = (s"$base/t", s"$base/ckpt")
    // v1 BEFORE tracking: its feed rows must carry NULL ids, honestly
    SnapshotTable.append(Seq((1L, 10.0)).toDF("k", "v"), path)       // v1
    SnapshotTable.enableRowTracking(spark, path)                      // v2
    // duplicate values: only row identity can pair the update images
    SnapshotTable.append(Seq((2L, 5.0), (3L, 5.0)).toDF("k", "v"), path) // v3
    val vU = SnapshotTable.update(spark, path,
      Seq("v" -> lit(99.0)), col("v") === 5.0)                        // v4

    val (got, _) = drain(path, ckpt, Map("includeRowIds" -> "true"))
    def rid(r: Row): Option[Long] = {
      val i = r.fieldIndex(SnapshotTable.RowIdCol)
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    }
    val v1Rows = got.filter(r => r.getLong(r.fieldIndex("_commit_version")) == 1L)
    assert(v1Rows.size === 1 && rid(v1Rows.head).isEmpty,
      "a pre-tracking commit's rows carry NULL _row_id")
    val pre = got.filter(r => r.getString(r.fieldIndex("_change_type")) == "update_preimage")
    val post = got.filter(r => r.getString(r.fieldIndex("_change_type")) == "update_postimage")
    assert(pre.size === 2 && post.size === 2,
      s"keyless update must pair by row id, got ${got.map(tag)}")
    assert(pre.flatMap(rid).toSet === post.flatMap(rid).toSet)
    assert(got.count(r => r.getLong(r.fieldIndex("_commit_version")) == vU &&
      Set("insert", "delete")(r.getString(r.fieldIndex("_change_type")))) === 0)
    // exactly-once: restart drains nothing
    assert(drain(path, ckpt, Map("includeRowIds" -> "true"))._1.isEmpty)
    // fail fast on an untracked table
    val plain = s"$base/plain"
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v"), plain)
    val e = intercept[Exception] {
      spark.readStream.format("graft-changes")
        .option("includeRowIds", "true").load(plain)
    }
    assert(e.getMessage.contains("row tracking"))
  }
}
