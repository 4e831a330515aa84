package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.model.Tables

class EventStreamsSpec extends SparkTestBase {

  /** Stage the events parquet into a dir (file stream sources want a
    * directory they can watch). */
  lazy val eventsDir: String = {
    val d = Files.createTempDirectory("graft-stream-events")
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  test("windowed counts over the stream match the batch computation") {
    val stream = EventStreams.windowedCounts(EventStreams.readEvents(spark, eventsDir))
    val q = stream.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete).start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("win_counts")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val want = Tables.events(spark, sf0001)
      .groupBy(window(col("ts"), "5 minutes").getField("start").as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("session windows over the stream match batch session_window") {
    val stream = EventStreams.sessionCounts(EventStreams.readEvents(spark, eventsDir))
    val q = stream.writeStream.format("memory").queryName("sess_counts")
      .outputMode(OutputMode.Complete).start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("sess_counts")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    val want = Tables.events(spark, sf0001)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("dropDuplicatesWithinWatermark removes re-delivered events") {
    // duplicate every event by staging the same file twice
    val d = Files.createTempDirectory("graft-stream-dup")
    Files.copy(Paths.get(s"$sf0001/events.parquet"), d.resolve("a.parquet"))
    Files.copy(Paths.get(s"$sf0001/events.parquet"), d.resolve("b.parquet"))
    val deduped = EventStreams.dedupedEvents(EventStreams.readEvents(spark, d.toString))
    val q = deduped.writeStream.format("memory").queryName("dedup_events")
      .outputMode(OutputMode.Append).start()
    try { q.processAllAvailable() } finally q.stop()
    val n = spark.table("dedup_events").count()
    val distinct = Tables.events(spark, sf0001).count()
    assert(n === distinct)
  }

  test("readEvents starts on an empty directory and picks up late-arriving files") {
    import spark.implicits._
    // no files yet: the schema sniff can't infer, so readEvents must
    // fall back to the declared raw schema instead of throwing
    val d = Files.createTempDirectory("graft-stream-empty")
    val stream = EventStreams.readEvents(spark, d.toString)
    val q = stream.writeStream.format("memory").queryName("late_events")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable() // drains zero files without error
      assert(spark.table("late_events").count() === 0)
      // a legacy-era file (ns-epoch Long ts) arrives after start
      Seq((1L, 1700000000L * 1000000000L, 7L, "click", 1.5, "{}"),
          (2L, 1700000060L * 1000000000L, 8L, "view", 0.5, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(d.toString)
      q.processAllAvailable()
      val got = spark.table("late_events")
        .select(col("event_id"), col("ts").cast("long").as("sec"))
        .as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 1700000000L, 2L -> 1700000060L))
    } finally q.stop()
  }

  test("stream-stream attribution join matches the batch join") {
    val joined = EventStreams.purchaseAttributionJoin(
      EventStreams.readEvents(spark, eventsDir))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append).start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("ss_join")

    val ev = Tables.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"), col("event_id"), col("value"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("ts").as("signup_ts"))
    val want = p.join(s,
      col("user_id") === col("s_user_id") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr("interval 2 hours"))
      .select("event_id", "user_id", "purchase_ts", "signup_ts", "value")
    assert(got.count() > 0, "join should produce rows on this fixture")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming content dedup drops cross-batch duplicate docs within the watermark") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-stream-docdedup")
    val schema = "doc_id LONG, text STRING, ingest_ts TIMESTAMP"
    def stage(name: String, rows: Seq[(Long, String, String)]): Unit = {
      // file stream sources ignore subdirs: write aside, move the
      // part file into the watched root
      val tmp = Files.createTempDirectory("graft-docdedup-stage")
      rows.toDF("doc_id", "text", "ts")
        .select(col("doc_id"), col("text"), col("ts").cast("timestamp").as("ingest_ts"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, d.resolve(s"$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    // batch 1: two distinct docs
    stage("b1", Seq((1L, "alpha beta gamma", "2024-01-01 10:00:00"),
      (2L, "delta epsilon", "2024-01-01 10:01:00")))
    val in = spark.readStream.schema(schema).parquet(d.toString)
    val q = EventStreams.dedupDocsByContent(in)
      .writeStream.format("memory").queryName("doc_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // batch 2: one exact duplicate (case-insensitive), one new doc
      stage("b2", Seq((3L, "ALPHA beta GAMMA", "2024-01-01 10:05:00"),
        (4L, "zeta eta", "2024-01-01 10:06:00")))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("doc_dedup").select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L, 4L), "duplicate content must be dropped once seen")
  }

  test("mapGroupsWithState accumulates running per-user totals") {
    import spark.implicits._
    val events = EventStreams.readEvents(spark, eventsDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Event]
    val out = mutable.Map[Long, EventStreams.UserTotal]()
    val q = EventStreams.userRunningTotals(events).writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventStreams.UserTotal], _: Long) =>
        batch.collect().foreach(u => out.synchronized { out(u.user_id) = u }): Unit
      }
      .start()
    try { q.processAllAvailable() } finally q.stop()

    val want = Tables.events(spark, sf0001).groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.size === want.size)
    want.foreach { case (uid, (n, t)) =>
      val got = out(uid)
      assert(got.n_events === n)
      assert(math.abs(got.total_value - t) < 1e-6)
    }
  }

  test("checkpointed stream resumes across restarts without reprocessing") {
    val work = Files.createTempDirectory("graft-stream-ckpt")
    val inDir = Files.createDirectory(work.resolve("in")).toString
    val ckpt = work.resolve("ckpt").toString
    val outDir = work.resolve("out").toString

    def runOnce(): Unit = {
      val q = EventStreams.readEvents(spark, inDir)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .start()
      try { q.processAllAvailable() } finally q.stop()
    }

    Files.copy(Paths.get(s"$sf0001/events.parquet"), Paths.get(s"$inDir/a.parquet"))
    runOnce()
    val n1 = spark.read.parquet(outDir).count()
    assert(n1 === Tables.events(spark, sf0001).count())

    // restart with the same checkpoint: the already-seen file must
    // NOT be reprocessed; a new file must be picked up exactly once
    Files.copy(Paths.get(s"$sf0001/events.parquet"), Paths.get(s"$inDir/b.parquet"))
    runOnce()
    val n2 = spark.read.parquet(outDir).count()
    assert(n2 === 2 * n1, s"expected exactly-once resume, got $n2 vs ${2 * n1}")
  }

  test("session windows run on the RocksDB state store with bounded state") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    EventStreams.useRocksDBStateStore(spark)
    try {
      val stream = EventStreams.sessionCounts(EventStreams.readEvents(spark, eventsDir))
      val q = stream.writeStream.format("memory").queryName("rocks_sess")
        .outputMode(OutputMode.Complete).start()
      try {
        q.processAllAvailable()
        // the state operator really is RocksDB-backed (provider metrics
        // only exist there) and holds one row per open session
        val state = q.lastProgress.stateOperators
        assert(state.nonEmpty)
        assert(state.head.numRowsTotal > 0)
        assert(state.head.customMetrics.keySet.asScala.exists(_.startsWith("rocksdb")),
          s"expected rocksdb state metrics, got ${state.head.customMetrics.keySet}")
      } finally q.stop()
      // and the result matches the default-provider computation
      val got = spark.table("rocks_sess")
        .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      val want = Tables.events(spark, sf0001)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)))
        .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("rate-source soak: watermark evicts window state, no unbounded growth") {
    // an endless stream through a 1s-window aggregation with a 2s
    // watermark: without eviction, state rows track total windows
    // ever seen (~1 per second of soak); with eviction they track
    // only the un-finalized horizon. Soak long enough that the two
    // regimes are unambiguous.
    val stream = EventStreams.windowedCounts(
      EventStreams.rateEvents(spark, rowsPerSecond = 500),
      windowLen = "1 second", watermark = "2 seconds")
    val q = stream.writeStream.format("memory").queryName("soak_win")
      .outputMode(OutputMode.Update).start()
    try {
      val start = System.currentTimeMillis()
      val deadline = start + 60000
      var rows = 0L
      // soak for 12s of wall clock (≥12 one-second windows generated),
      // sampling the state-row metric as batches complete
      while (System.currentTimeMillis() < math.min(start + 12000, deadline)) {
        Thread.sleep(1000)
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          rows = p.stateOperators.head.numRowsTotal
      }
      assert(rows > 0, "stream never built state")
      // ≥12s of 1s-windows have flowed; an un-evicting operator would
      // hold ≥12 state rows. The watermark horizon (2s) + in-flight
      // slack bounds a healthy operator far below that.
      assert(rows <= 8, s"state grew to $rows rows — watermark is not evicting")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains all staged input then stops by itself") {
    val work = Files.createTempDirectory("graft-stream-avnow")
    val inDir = Files.createDirectory(work.resolve("in")).toString
    Files.copy(Paths.get(s"$sf0001/events.parquet"), Paths.get(s"$inDir/a.parquet"))
    Files.copy(Paths.get(s"$sf0001/events.parquet"), Paths.get(s"$inDir/b.parquet"))
    val q = EventStreams.drainToParquet(
      EventStreams.readEvents(spark, inDir),
      s"$work/out", s"$work/ckpt", maxFilesPerTrigger = 1)
    // AvailableNow terminates on its own once the staged files drain
    assert(q.awaitTermination(120000), "query did not self-terminate")
    val n = spark.read.parquet(s"$work/out").count()
    assert(n === 2 * Tables.events(spark, sf0001).count())
  }

  test("flatMapGroupsWithState emits completed sessions on event-time timeout") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-stream-fmgws")
    Files.copy(Paths.get(s"$sf0001/events.parquet"), d.resolve("a.parquet"))

    val events = EventStreams.readEvents(spark, d.toString)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Event]
    val out = mutable.ArrayBuffer[EventStreams.SessionSummary]()
    val q = EventStreams.userSessions(events, gapMinutes = 30).writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[EventStreams.SessionSummary], _: Long) =>
        out.synchronized { out ++= b.collect() }: Unit
      }.start()
    try {
      q.processAllAvailable()
      // push the watermark 10 days past file-1: every file-1 session
      // must time out and be emitted in the next batch
      val raw = spark.read.parquet(s"$sf0001/events.parquet")
      // era-aware shift: ns-epoch Long vs native µs TIMESTAMP
      val shifted = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", col("ts") + lit(10L * 86400 * 1000000000L))
        case _ =>
          raw.withColumn("ts", col("ts") + expr("INTERVAL 10 DAYS"))
      }
      // stage as a single FILE: the file stream source does not
      // recurse into the directory a DataFrame write would produce
      val tmpB = Files.createTempDirectory("graft-fmgws-b")
      shifted.coalesce(1).write.mode("overwrite").parquet(tmpB.toString)
      val part = java.nio.file.Files.list(tmpB).iterator.asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, d.resolve("b.parquet"))
      q.processAllAvailable()
    } finally q.stop()

    val cutoff = new java.sql.Timestamp(
      Tables.events(spark, sf0001).agg(max(col("ts"))).head.getTimestamp(0).getTime + 1)
    val emitted = out.filter(_.end.before(cutoff))
      .groupBy(_.user_id)
      .map { case (u, ss) => u -> (ss.size.toLong, ss.map(_.n_events).sum) }
    val want = Tables.events(spark, sf0001)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(emitted.keySet === want.keySet)
    emitted.foreach { case (u, got) =>
      assert(got === want(u), s"user $u sessions/events mismatch")
    }
  }

  test("streaming silver CSV pipeline equals the batch pipeline output") {
    val base = Files.createTempDirectory("graft-stream-silver")
    val csvDir = Files.createDirectory(base.resolve("in"))
    Files.copy(Paths.get(fixture), csvDir.resolve("batch1.csv"))
    val q = EventStreams.streamSilverCsv(spark, csvDir.toString,
      s"$base/silver", s"$base/quarantine")
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$base/silver").count() === 37)
      assert(spark.read.parquet(s"$base/quarantine").count() === 18)
      // second microbatch touching the SAME (event_date, stationId)
      // partitions: batch-scoped dynamic overwrite must add its rows
      // without erasing what the first batch wrote
      Files.copy(Paths.get(fixture), csvDir.resolve("batch2.csv"))
      q.processAllAvailable()
    } finally q.stop()
    val silver = spark.read.parquet(s"$base/silver")
    assert(silver.count() === 74,
      "a later microbatch must not overwrite earlier batches' partitions")
    assert(silver.select("_batch_id").distinct().count() === 2)
    assert(spark.read.parquet(s"$base/quarantine").count() === 36)
  }

  test("streaming merge sink upserts microbatches into a snapshot table") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream-merge")
    val inDir = Files.createDirectory(base.resolve("in")).toString
    val table = s"$base/fact"
    val ckpt1 = s"$base/ckpt1"
    // the parquet file stream source does not recurse into subdirs —
    // each wave's single part file lands FLAT in inDir
    def stage(name: String, rows: Seq[(Long, String, Double)]): Unit = {
      rows.toDF("k", "status", "v").coalesce(1)
        .write.mode("overwrite").parquet(s"$base/stage-$name")
      val part = Files.list(Paths.get(s"$base/stage-$name")).iterator.asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.copy(part, Paths.get(s"$inDir/$name.parquet")): Unit
    }

    // wave 1: three fresh sessions
    stage("w1", Seq((1L, "open", 10.0), (2L, "open", 20.0), (3L, "open", 30.0)))
    def openStream(ckpt: String) = EventStreams.streamMergeSnapshot(
      spark.readStream.schema("k LONG, status STRING, v DOUBLE").parquet(inDir),
      table, Seq("k"), ckpt)
    val q1 = openStream(ckpt1)
    try assert(q1.awaitTermination(120000)) finally q1.stop()
    assert(graft.lake.SnapshotTable.read(spark, table).count() === 3)

    // wave 2: late correction to k=2 plus a new k=4 — the stream
    // must UPDATE in place, not append a duplicate
    stage("w2", Seq((2L, "closed", 25.0), (4L, "open", 40.0)))
    val q2 = openStream(ckpt1)
    try assert(q2.awaitTermination(120000)) finally q2.stop()
    val latest = graft.lake.SnapshotTable.read(spark, table)
    assert(latest.count() === 4)
    assert(latest.filter(col("k") === 2).select("status").as[String].head() === "closed")
    assert(latest.filter(col("k") === 2).select("v").as[Double].head() === 25.0)
    assert(latest.filter(col("k") === 1).select("v").as[Double].head() === 10.0)

    // redelivered epoch (fresh checkpoint over wave 2's files only —
    // the crash-before-commit retry): the merge re-applies the same
    // rows and converges — same count, same values, no duplicates
    val redeliverDir = Files.createDirectory(base.resolve("redeliver")).toString
    Files.copy(Paths.get(s"$inDir/w2.parquet"), Paths.get(s"$redeliverDir/w2.parquet"))
    val q3 = EventStreams.streamMergeSnapshot(
      spark.readStream.schema("k LONG, status STRING, v DOUBLE").parquet(redeliverDir),
      table, Seq("k"), s"$base/ckpt2")
    try assert(q3.awaitTermination(120000)) finally q3.stop()
    val replayed = graft.lake.SnapshotTable.read(spark, table)
    assert(replayed.count() === 4, "replayed epoch must not duplicate rows")
    assert(replayed.filter(col("k") === 2).select("v").as[Double].head() === 25.0)
  }

  test("streaming CLAUSE-merge sink: the txn watermark makes delete clauses exactly-once") {
    import spark.implicits._
    import graft.lake.{MergeDelete, MergeInsert, MergeUpdate}
    val base = Files.createTempDirectory("graft-stream-mc")
    val inDir = Files.createDirectory(base.resolve("in")).toString
    val table = s"$base/fact"
    graft.lake.SnapshotTable.append(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("k", "action", "v"), table)
    def stage(name: String, rows: Seq[(Long, String, Double)]): Unit = {
      rows.toDF("k", "action", "v").coalesce(1)
        .write.mode("overwrite").parquet(s"$base/stage-$name")
      val part = Files.list(Paths.get(s"$base/stage-$name")).iterator.asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.copy(part, Paths.get(s"$inDir/$name.parquet")): Unit
    }
    // one wave: tombstone k=2, bump k=3, insert k=5
    stage("w1", Seq((2L, "close", 0.0), (3L, "bump", 33.0), (5L, "new", 50.0)))
    def open(dir: String, ckpt: String) =
      EventStreams.streamMergeClausesSnapshot(
        spark.readStream.schema("k LONG, action STRING, v DOUBLE").parquet(dir),
        table, Seq("k"),
        matched = Seq(
          MergeDelete(Some(col("s.action") === "close")),
          MergeUpdate(None, Seq("v" -> col("s.v")))),
        notMatched = Seq(MergeInsert(None, Nil)),
        checkpoint = ckpt, appId = Some("mc-sink-test"))
    val q1 = open(inDir, s"$base/ckpt1")
    try assert(q1.awaitTermination(120000)) finally q1.stop()
    def state(): Map[Long, Double] = graft.lake.SnapshotTable.read(spark, table)
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(state() === Map(1L -> 10.0, 3L -> 33.0, 5L -> 50.0))
    // crash-retry shape: the SAME epoch redelivered under a FRESH
    // checkpoint (epoch counter resets to 0 = already-committed 0).
    // Without the watermark the tombstoned k=2 would RESURRECT as an
    // insert — the delete clause is not replay-idempotent.
    val re = Files.createDirectory(base.resolve("redeliver")).toString
    Files.copy(Paths.get(s"$inDir/w1.parquet"), Paths.get(s"$re/w1.parquet"))
    val q2 = open(re, s"$base/ckpt2")
    try assert(q2.awaitTermination(120000)) finally q2.stop()
    assert(state() === Map(1L -> 10.0, 3L -> 33.0, 5L -> 50.0),
      "replayed epoch re-applied a non-idempotent clause")
  }

  test("clause-merge sink: latestBy keeps the newest row per key deterministically") {
    import spark.implicits._
    import graft.lake.{MergeInsert, MergeUpdate}
    val base = Files.createTempDirectory("graft-stream-mcl")
    val inDir = Files.createDirectory(base.resolve("in")).toString
    val table = s"$base/fact"
    graft.lake.SnapshotTable.append(
      Seq((1L, 0L, 10.0)).toDF("k", "ts", "v"), table)
    // one microbatch carrying THREE rows for k=1 and two for k=9:
    // without an ordering column the winner is arbitrary; latestBy
    // picks the max-ts row for each key
    Seq((1L, 5L, 55.0), (1L, 9L, 99.0), (1L, 7L, 77.0),
        (9L, 2L, 2.0), (9L, 3L, 3.0))
      .toDF("k", "ts", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$base/stage")
    val part = Files.list(Paths.get(s"$base/stage")).iterator.asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, Paths.get(s"$inDir/w1.parquet"))
    val q = EventStreams.streamMergeClausesSnapshot(
      spark.readStream.schema("k LONG, ts LONG, v DOUBLE").parquet(inDir),
      table, Seq("k"),
      matched = Seq(MergeUpdate(None, Seq("ts" -> col("s.ts"), "v" -> col("s.v")))),
      notMatched = Seq(MergeInsert(None, Nil)),
      checkpoint = s"$base/ckpt", appId = Some("mc-latest-test"),
      latestBy = Some("ts"))
    try assert(q.awaitTermination(120000)) finally q.stop()
    val got = graft.lake.SnapshotTable.read(spark, table)
      .select("k", "ts", "v").as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 9L, 99.0), (9L, 3L, 3.0)),
      "latestBy must keep exactly the max-ts row per key")
  }
}
