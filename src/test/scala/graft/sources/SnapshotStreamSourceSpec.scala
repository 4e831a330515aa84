package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.lake.SnapshotTable

class SnapshotStreamSourceSpec extends SparkTestBase {

  import spark.implicits._

  /** Run an AvailableNow pass of the snapshot stream into a buffer. */
  private def drain(path: String, ckpt: String,
      opts: Map[String, String] = Map.empty): Seq[Row] = {
    val buf = scala.collection.mutable.ArrayBuffer[Row]()
    val q = spark.readStream.format("graft-snapshot").options(opts).load(path)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        buf.synchronized { buf ++= df.collect() }
        ()
      }
      .start()
    q.awaitTermination()
    buf.toSeq
  }

  test("streams each commit exactly once across restarts; offsets are checkpointed versions") {
    val base = Files.createTempDirectory("graft-stream-snap").toString
    val path = s"$base/t"
    val ckpt = s"$base/ckpt"
    SnapshotTable.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v"), path)
    SnapshotTable.append(Seq((3L, "c", 3.0)).toDF("k", "s", "v"), path)

    assert(drain(path, ckpt).map(_.getLong(0)).sorted === Seq(1L, 2L, 3L))
    // restart on the same checkpoint: nothing new to emit
    assert(drain(path, ckpt).isEmpty)
    SnapshotTable.append(Seq((4L, "d", 4.0)).toDF("k", "s", "v"), path)
    assert(drain(path, ckpt).map(_.getLong(0)) === Seq(4L)) // ONLY the new commit
    // a fresh checkpoint bootstraps the whole table again
    assert(drain(path, s"$base/ckpt2").size === 4)
  }

  test("startingVersion is inclusive, matching Delta's option of the same name") {
    val base = Files.createTempDirectory("graft-stream-sv").toString
    val path = s"$base/t"
    SnapshotTable.append(Seq((1L, "v1")).toDF("k", "s"), path)
    SnapshotTable.append(Seq((2L, "v2")).toDF("k", "s"), path)
    SnapshotTable.append(Seq((3L, "v3")).toDF("k", "s"), path)
    // startingVersion=2 → first batch covers commits 2..3 (NOT 3..3)
    val got = drain(path, s"$base/ckpt", Map("startingVersion" -> "2"))
    assert(got.map(_.getLong(0)).sorted === Seq(2L, 3L))
  }

  test("startingTimestamp resolves to the first commit at or after it (Delta's option)") {
    val base = Files.createTempDirectory("graft-stream-ts").toString
    val path = s"$base/t"
    SnapshotTable.append(Seq((1L, "v1")).toDF("k", "s"), path)
    Thread.sleep(60)
    SnapshotTable.append(Seq((2L, "v2")).toDF("k", "s"), path)
    Thread.sleep(60)
    SnapshotTable.append(Seq((3L, "v3")).toDF("k", "s"), path)
    val t2 = SnapshotTable.commitTimeOf(spark, path, 2L)
    val got = drain(path, s"$base/ckpt",
      Map("startingTimestamp" -> t2.toString))
    assert(got.map(_.getLong(0)).sorted === Seq(2L, 3L))
    // both options at once is refused at load()
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-snapshot")
        .option("startingVersion", 1).option("startingTimestamp", t2.toString)
        .load(path)
    }
  }

  test("date/timestamp/boolean/partition columns round-trip identical to the batch read") {
    val base = Files.createTempDirectory("graft-stream-types").toString
    val path = s"$base/t"
    val df = Seq(
      (1L, "x", 1.5, true, java.sql.Timestamp.valueOf("2024-03-01 10:30:00"),
        java.sql.Date.valueOf("2024-03-01")),
      (2L, "y", -2.5, false, java.sql.Timestamp.valueOf("2024-03-02 23:59:59"),
        java.sql.Date.valueOf("2024-03-02")))
      .toDF("id", "name", "v", "ok", "ts", "event_date")
    SnapshotTable.append(df, path, Seq("event_date"))
    // NULL row in a later commit (schema evolution not involved)
    SnapshotTable.append(Seq((3L, null.asInstanceOf[String], 0.0, true,
      null.asInstanceOf[java.sql.Timestamp], java.sql.Date.valueOf("2024-03-03")))
      .toDF("id", "name", "v", "ok", "ts", "event_date"), path, Seq("event_date"))

    val batch = SnapshotTable.read(spark, path)
    val streamed = drain(path, s"$base/ckpt")
    val cols = batch.columns.sorted
    def canon(rows: Seq[Row], schema: org.apache.spark.sql.types.StructType): Set[String] =
      rows.map { r =>
        cols.map(c => String.valueOf(r.get(schema.fieldIndex(c)))).mkString("|")
      }.toSet
    assert(streamed.size === 3)
    // streamed batches carry the same recorded table schema as the
    // batch read, so rows compare field-by-field
    assert(canon(streamed, batch.schema) === canon(batch.collect().toSeq, batch.schema))
  }

  test("maxVersionsPerTrigger bounds each microbatch to a commit-count budget") {
    val base = Files.createTempDirectory("graft-stream-rate").toString
    val path = s"$base/t"
    (1 to 3).foreach(i =>
      SnapshotTable.append(Seq((i.toLong, i * 1.0)).toDF("k", "v"), path))
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-snapshot")
      .option("maxVersionsPerTrigger", 1).load(path)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        batchSizes.synchronized { batchSizes += df.count() }
        ()
      }
      .start()
    q.awaitTermination()
    // three commits, one version per trigger → three one-row batches
    assert(batchSizes.toSeq === Seq(1L, 1L, 1L))
  }

  test("schema evolution: files predating a column stream it as NULL under the latest schema") {
    val base = Files.createTempDirectory("graft-stream-evo").toString
    val path = s"$base/t"
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v"), path)
    SnapshotTable.append(Seq((2L, 2.0, "w2")).toDF("k", "v", "w"), path)
    val rows = drain(path, s"$base/ckpt").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)) === Seq(1L, 2L))
    assert(rows(0).isNullAt(2) && rows(1).getString(2) === "w2")
  }

  test("vectorized bootstrap decode: parity with the Group path across splits, " +
      "partitions, types, and schema evolution") {
    val base = Files.createTempDirectory("graft-stream-vec").toString
    val path = s"$base/t"
    // commit 1: partitioned, wide enough that a tiny maxBytesPerPartition
    // forces several byte-range splits per file
    SnapshotTable.append((1 to 5000).map(i => (i.toLong, s"name-$i", i * 0.5,
      i % 2 == 0, java.sql.Timestamp.valueOf(f"2024-03-01 10:${i % 60}%02d:00"),
      java.sql.Date.valueOf(s"2024-03-0${i % 3 + 1}")))
      .toDF("k", "s", "v", "ok", "ts", "event_date"), path, Seq("event_date"))
    // commit 2 adds a column → commit-1 files must decode it as NULL vectors
    SnapshotTable.append(Seq((9001L, "x", 1.0, false,
      java.sql.Timestamp.valueOf("2024-03-04 00:00:00"),
      java.sql.Date.valueOf("2024-03-01"), "new"))
      .toDF("k", "s", "v", "ok", "ts", "event_date", "w"), path, Seq("event_date"))

    def canon(rows: Seq[Row]): Map[String, Int] =
      rows.map(r => (0 until r.length).map(i => String.valueOf(r.get(i)))
        .mkString("|")).groupBy(identity).view.mapValues(_.size).toMap
    val grouped = drain(path, s"$base/c1", Map("vectorizedReader" -> "never"))
    val vector = drain(path, s"$base/c2", Map(
      "vectorizedReader" -> "always", "maxBytesPerPartition" -> "16384"))
    assert(vector.size === 5001)
    assert(canon(vector) === canon(grouped))
    // auto mode on a commit-sized second batch stays correct too
    SnapshotTable.append(Seq((9002L, "y", 2.0, true,
      java.sql.Timestamp.valueOf("2024-03-05 00:00:00"),
      java.sql.Date.valueOf("2024-03-02"), "w2"))
      .toDF("k", "s", "v", "ok", "ts", "event_date", "w"), path, Seq("event_date"))
    assert(drain(path, s"$base/c2").map(_.getLong(0)) === Seq(9002L))
  }

  test("vacuum honors a streaming checkpoint as a retention floor") {
    val base = Files.createTempDirectory("graft-stream-vac").toString
    val path = s"$base/t"
    val ckpt = s"$base/ckpt"
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v"), path)   // v1
    assert(drain(path, ckpt).size === 1)                        // consumed through 1
    SnapshotTable.append(Seq((2L, 2.0)).toDF("k", "v"), path)   // v2
    SnapshotTable.append(Seq((3L, 3.0)).toDF("k", "v"), path)   // v3
    // keepVersions=1 alone would expire v1/v2; the paused stream's
    // checkpoint floors retention at its last committed offset (1)
    SnapshotTable.vacuum(spark, path, keepVersions = 1, protectConsumers = Seq(ckpt))
    assert(SnapshotTable.versions(spark, path) === Seq(1L, 2L, 3L))
    // the stream resumes cleanly over the protected range
    assert(drain(path, ckpt).map(_.getLong(0)).sorted === Seq(2L, 3L))
    // consumed through 3 → older versions may now expire
    SnapshotTable.vacuum(spark, path, keepVersions = 1, protectConsumers = Seq(ckpt))
    assert(SnapshotTable.versions(spark, path) === Seq(3L))
    SnapshotTable.append(Seq((4L, 4.0)).toDF("k", "v"), path)   // v4
    assert(drain(path, ckpt).map(_.getLong(0)) === Seq(4L))
  }

  test("rewrite commits fail the stream by name unless ignoreChanges accepts re-emission") {
    val base = Files.createTempDirectory("graft-stream-rw").toString
    val path = s"$base/t"
    // one data file, so the delete rewrite touches exactly it and the
    // re-emitted survivor set is the whole remainder
    SnapshotTable.append((1 to 10).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
      .coalesce(1), path)
    assert(drain(path, s"$base/ckpt").size === 10)
    SnapshotTable.delete(spark, path, col("v") >= 9.0) // v2: a rewrite
    val e = intercept[Exception](drain(path, s"$base/ckpt"))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("not append-only")))
    // ignoreChanges: the rewritten file's surviving rows re-emit
    val got = drain(path, s"$base/ckpt", Map("ignoreChanges" -> "true"))
    assert(got.map(_.getLong(0)).sorted === (1L to 8L))
  }

  test("hidden-partitioned tables stream the user schema — no __p_ columns, rows complete") {
    val base = Files.createTempDirectory("graft-stream-hp").toString
    val path = s"$base/t"
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    SnapshotTable.appendTransformed(Seq(
      ("e1", ts("2024-01-01 08:00:00"), 1.0),
      ("e2", ts("2024-01-02 09:00:00"), 2.0),
      ("e3", ts("2024-01-02 10:00:00"), 3.0)).toDF("id", "ts", "v"),
      path, Seq("days(ts)"))
    val got = drain(path, s"$base/ckpt")
    assert(got.head.schema.fieldNames.toSeq === Seq("id", "ts", "v"),
      "hidden partition column leaked into the stream")
    assert(got.map(_.getString(0)).sorted === Seq("e1", "e2", "e3"))
    assert(got.map(_.getTimestamp(1)).contains(ts("2024-01-02 09:00:00")))
    // later commits stream incrementally, still hidden-free
    SnapshotTable.append(Seq(("e4", ts("2024-02-01 00:00:00"), 4.0))
      .toDF("id", "ts", "v"), path)
    val got2 = drain(path, s"$base/ckpt")
    assert(got2.map(_.getString(0)) === Seq("e4"))
    assert(got2.head.schema.fieldNames.toSeq === Seq("id", "ts", "v"))
  }

  test("column-mapped tables stream VALUES for renamed columns — both decode paths") {
    val base = Files.createTempDirectory("graft-stream-cm").toString
    val path = s"$base/t"
    // v1 under the original names, partitioned so the hive-dir lookup
    // is exercised through the mapping too
    SnapshotTable.append(Seq((1L, 10.0, "p1"), (2L, 20.0, "p2"))
      .toDF("k", "v", "part"), path, Seq("part"))
    SnapshotTable.renameColumn(spark, path, "v", "val2")       // metadata-only
    SnapshotTable.renameColumn(spark, path, "part", "region")  // partition col
    // v4: appended AFTER the renames — files still store physical names
    SnapshotTable.append(Seq((3L, 30.0, "p1")).toDF("k", "val2", "region"),
      path, Seq("region"))
    def got(ckpt: String, mode: String): Seq[Row] =
      drain(path, s"$base/$ckpt", Map("vectorizedReader" -> mode))
        .sortBy(_.getLong(0))
    for (rows <- Seq(got("c-group", "never"), got("c-vec", "always"))) {
      assert(rows.map(_.getLong(0)) === Seq(1L, 2L, 3L))
      assert(rows.map(_.getDouble(1)) === Seq(10.0, 20.0, 30.0),
        "renamed column must stream its values, not schema-evolution NULLs")
      assert(rows.map(_.getString(2)) === Seq("p1", "p2", "p1"),
        "renamed PARTITION column must resolve through the physical dir name")
    }
    // a column genuinely added after v1 still NULLs for the old files
    // (the schema-evolution NULL stays distinguishable from a rename)
    SnapshotTable.append(Seq((4L, 40.0, "p2", "w4"))
      .toDF("k", "val2", "region", "w"), path, Seq("region"))
    val evo = drain(path, s"$base/c-evo").sortBy(_.getLong(0))
    assert(evo.filter(_.getLong(0) < 4L).forall(_.isNullAt(3)))
    assert(evo.find(_.getLong(0) == 4L).get.getString(3) === "w4")
    assert(evo.map(_.getDouble(1)) === Seq(10.0, 20.0, 30.0, 40.0))
  }

  test("checkpoint restart across a rename resumes under the new logical name") {
    val base = Files.createTempDirectory("graft-stream-cm2").toString
    val path = s"$base/t"
    val ckpt = s"$base/ckpt"
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v"), path)    // v1
    assert(drain(path, ckpt).map(_.getLong(0)) === Seq(1L))      // consumed v1
    SnapshotTable.renameColumn(spark, path, "v", "v2")           // v2
    SnapshotTable.append(Seq((2L, 2.0)).toDF("k", "v2"), path)   // v3
    // the restarted query re-infers schema (now k, v2) and re-captures
    // the mapping; only v2..v3 replay, with correct values
    val got = drain(path, ckpt)
    assert(got.map(_.getLong(0)) === Seq(2L))
    assert(got.head.schema.fieldNames.toSeq === Seq("k", "v2"))
    assert(got.head.getDouble(1) === 2.0)
    // a SECOND rename with history behind it: captured colmap maps the
    // newest logical name to the ORIGINAL physical name
    SnapshotTable.renameColumn(spark, path, "v2", "v3")          // v4
    SnapshotTable.append(Seq((3L, 3.0)).toDF("k", "v3"), path)   // v5
    val all = drain(path, s"$base/ckpt-fresh").sortBy(_.getLong(0))
    assert(all.map(_.getDouble(1)) === Seq(1.0, 2.0, 3.0))
  }

  // ---- post-capture schema-stability guard (shared SchemaStability) ----
  // A long-running query holds the schema + colmap captured at load();
  // these tests pin that capture BEFORE the DDL by constructing the
  // MicroBatchStream directly (what a live query holds), then assert
  // the batch crossing the DDL fails loudly and a RESTART (fresh
  // load = fresh capture, same checkpoint) replays exactly-once.

  private def staleStream(path: String): SnapshotMicroBatchStream = {
    val v = SnapshotTable.latestVersion(spark, path).get
    val schema = org.apache.spark.sql.types.StructType(
      SnapshotTable.schemaOf(spark, path).get.fields
        .filterNot(_.name.startsWith("__p_")))
    new SnapshotMicroBatchStream(path, schema,
      SnapshotTable.columnMappingAt(spark, path, v), v,
      SnapshotStreamOptions(0L, ignoreChanges = false, None, "auto",
        16L << 20, 128L << 20))
  }

  test("mid-stream DROP + re-ADD fails loudly (no silent null-fill); " +
      "restart on the same checkpoint replays exactly-once under the new capture") {
    val base = Files.createTempDirectory("graft-stream-dropread").toString
    val (path, ckpt) = (s"$base/t", s"$base/ckpt")
    SnapshotTable.append(Seq((1L, 10.0)).toDF("k", "v"), path)       // v1
    assert(drain(path, ckpt).map(_.getLong(0)) === Seq(1L))          // consumed v1
    val live = staleStream(path)                                     // capture @ v1
    SnapshotTable.dropColumn(spark, path, "v")                       // v2
    // re-add via the append path mints a FRESH physical name the
    // stale capture cannot see — without the guard these real values
    // would stream as NULL, silently
    SnapshotTable.append(Seq((2L, 99.0)).toDF("k", "v"), path)       // v3
    val e = intercept[IllegalStateException] {
      live.planInputPartitions(SnapshotVersionOffset(1L), SnapshotVersionOffset(3L))
    }
    assert(e.getMessage.contains("DROPPED") &&
      e.getMessage.contains("restart the query"))
    // restart (fresh capture, SAME checkpoint): only v2..v3 replay,
    // and the re-added column streams its VALUE, not a null-fill
    val got = drain(path, ckpt)
    assert(got.map(_.getLong(0)) === Seq(2L))
    assert(got.head.getDouble(got.head.fieldIndex("v")) === 99.0)
    // a fresh bootstrap serves the old row NULL (dropped bytes never
    // resurface under the re-added name) and the new row its value
    val all = drain(path, s"$base/ckpt2").sortBy(_.getLong(0))
    assert(all.head.isNullAt(all.head.fieldIndex("v")))
    assert(all(1).getDouble(all(1).fieldIndex("v")) === 99.0)
  }

  test("mid-stream RENAME fails loudly instead of serving the stale logical name") {
    val base = Files.createTempDirectory("graft-stream-midrn").toString
    val path = s"$base/t"
    SnapshotTable.append(Seq((1L, 10.0)).toDF("k", "v"), path)       // v1
    val live = staleStream(path)                                     // capture @ v1
    SnapshotTable.renameColumn(spark, path, "v", "value")            // v2
    SnapshotTable.append(Seq((2L, 20.0)).toDF("k", "value"), path)   // v3
    val e = intercept[IllegalStateException] {
      live.planInputPartitions(SnapshotVersionOffset(0L), SnapshotVersionOffset(3L))
    }
    assert(e.getMessage.contains("RENAMED") && e.getMessage.contains("value"))
    // restart: whole history under the new name, values intact
    val got = drain(path, s"$base/ckpt").sortBy(_.getLong(0))
    assert(got.head.schema.fieldNames.toSeq === Seq("k", "value"))
    assert(got.map(_.getDouble(1)) === Seq(10.0, 20.0))
  }

  test("mid-stream type WIDENING fails loudly instead of a decoder ClassCastException") {
    val base = Files.createTempDirectory("graft-stream-midwd").toString
    val path = s"$base/t"
    SnapshotTable.append(Seq((1L, 10)).toDF("k", "n"), path)         // v1: INT era
    val live = staleStream(path)                                     // capture @ v1
    SnapshotTable.widenColumnType(spark, path, "n",
      org.apache.spark.sql.types.LongType)                           // v2
    SnapshotTable.append(Seq((2L, 20L)).toDF("k", "n"), path)        // v3: LONG era
    val e = intercept[IllegalStateException] {
      live.planInputPartitions(SnapshotVersionOffset(0L), SnapshotVersionOffset(3L))
    }
    assert(e.getMessage.contains("changed type") &&
      e.getMessage.contains("int") && e.getMessage.contains("bigint"))
    // restart serves both eras wide
    val got = drain(path, s"$base/ckpt").sortBy(_.getLong(0))
    assert(got.map(_.getLong(1)) === Seq(10L, 20L))
  }

  test("a LIVE continuous query crossing a post-capture rename fails " +
      "through the engine with the restart-to-adopt error") {
    val base = Files.createTempDirectory("graft-stream-live").toString
    val (path, ckpt) = (s"$base/t", s"$base/ckpt")
    SnapshotTable.append(Seq((1L, 10.0)).toDF("k", "v"), path)       // v1
    val buf = scala.collection.mutable.ArrayBuffer[Row]()
    val q = spark.readStream.format("graft-snapshot").load(path)     // capture @ v1
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .foreachBatch { (df: DataFrame, _: Long) =>
        buf.synchronized { buf ++= df.collect() }
        ()
      }
      .start()
    // wait for the capture-era batch, then change the schema under it
    val deadline = System.currentTimeMillis() + 30000
    while (buf.synchronized(buf.isEmpty) && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    assert(buf.synchronized(buf.nonEmpty), "first batch never arrived")
    SnapshotTable.renameColumn(spark, path, "v", "value")            // v2
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(30000)
      q.awaitTermination() // if the 30s poll elapsed without failure
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("RENAMED") &&
      m.contains("restart the query")))
    // the restarted query (fresh load) resumes under the new name
    val got = drain(path, ckpt)
    assert(got.isEmpty || got.forall(
      _.schema.fieldNames.toSeq === Seq("k", "value")))
  }

  test("DV commits: default refuses; ignoreChanges re-emits only the still-live rows") {
    val base = Files.createTempDirectory("graft-stream-dv").toString
    val path = s"$base/t"
    SnapshotTable.append((1 to 10).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
      .coalesce(1), path)
    assert(drain(path, s"$base/ckpt").size === 10)

    // v2: a deletion-vector commit — zero files rewritten
    SnapshotTable.deleteWithVectors(spark, path, col("v") >= 9.0)
    val e = intercept[Exception](drain(path, s"$base/ckpt"))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("not append-only")))

    // ignoreChanges: the DV'd file re-emits its LIVE rows — never the
    // dead ones (a plain ignoreChanges that re-read the file whole
    // would resurrect 9 and 10 in the sink)
    val got = drain(path, s"$base/ckpt", Map("ignoreChanges" -> "true"))
    assert(got.map(_.getLong(0)).sorted === (1L to 8L))

    // a file appended AND DV'd inside one consumed range emits with
    // the dead position already removed
    SnapshotTable.append(Seq((11L, 11.0), (12L, 12.0)).toDF("k", "v")
      .coalesce(1), path)                                    // v3
    SnapshotTable.deleteWithVectors(spark, path, col("k") === 11L) // v4
    val got2 = drain(path, s"$base/ckpt", Map("ignoreChanges" -> "true"))
    assert(got2.map(_.getLong(0)) === Seq(12L),
      "added-then-DV'd file must emit without its dead rows and " +
        "without re-emitting v1's file")
  }

  test("getTable re-derives the schema at the pinned capture version — " +
      "a DDL between inferSchema and getTable cannot serve stale") {
    // The window this pins: Spark resolves a stream in two provider
    // calls (inferSchema, then getTable). A rename committed between
    // them is <= the version getTable captures, so the stability
    // guard never checks it — the stale inferSchema capture would
    // serve the OLD logical name silently. getTable must therefore
    // derive (version, schema, colmap) as one atomic capture.
    val base = Files.createTempDirectory("graft-stream-pin").toString
    val path = s"$base/t"
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v"), path)
    val provider = new SnapshotStreamSource()
    val optMap = new java.util.HashMap[String, String]()
    optMap.put("path", path)
    val opts =
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(optMap)
    val inferred = provider.inferSchema(opts)
    assert(inferred.fieldNames.toSeq === Seq("k", "v"))
    SnapshotTable.renameColumn(spark, path, "v", "w") // lands in the window
    val table = provider.getTable(inferred, Array.empty, optMap)
    assert(table.schema().fieldNames.toSeq === Seq("k", "w"),
      "getTable must pin schema at its own captured version, not " +
        "serve inferSchema's stale capture")
    // end-to-end: a fresh stream over the renamed table serves 'w'
    val got = drain(path, s"$base/ckpt")
    assert(got.nonEmpty && got.head.schema.fieldNames.contains("w"))
  }

  test("change-feed source derives its schema at the pinned capture " +
      "version (atomic with the colmap capture)") {
    val base = Files.createTempDirectory("graft-changes-pin").toString
    val path = s"$base/t"
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v"), path)
    val src = new SnapshotChangesSource()
    val params = Map("path" -> path)
    val (_, s1) = src.sourceSchema(spark.sqlContext, None, "graft-changes", params)
    assert(s1.fieldNames.contains("v"))
    SnapshotTable.renameColumn(spark, path, "v", "w") // lands in the window
    val source = src.createSource(spark.sqlContext,
      s"$base/meta", None, "graft-changes", params)
    assert(source.schema.fieldNames.contains("w"),
      "createSource must pin version first and derive the schema AT it")
  }
}
