package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EvPipelineSpec extends SparkTestBase {

  test("silver job writes partitioned good/quarantine layers and is idempotent") {
    val base = Files.createTempDirectory("graft-silver").toString
    val cfg = SilverConfig(fixture, s"$base/silver", s"$base/quarantine")

    val r1 = EvPipeline.runSilver(spark, cfg)
    assert(r1.goodCount === 37)
    assert(r1.badCount === 18)
    assert(r1.dqStatus === "Error") // fixture deliberately violates checks

    // layout: event_date=… / stationId=… hive partitions
    val silverDf = spark.read.parquet(s"$base/silver")
    assert(silverDf.columns.contains("event_date"))
    assert(silverDf.columns.contains("stationId"))
    assert(silverDf.count() === 37)

    val badDf = spark.read.parquet(s"$base/quarantine")
    assert(badDf.count() === 18)
    assert(badDf.schema("quarantine_reason").dataType.typeName === "array")

    // idempotency: second run replaces, not appends
    val r2 = EvPipeline.runSilver(spark, cfg)
    assert(r2.goodCount === 37)
    assert(spark.read.parquet(s"$base/silver").count() === 37)
  }

  test("fail_job mode raises on quarantined rows") {
    val base = Files.createTempDirectory("graft-silver-fail").toString
    val cfg = SilverConfig(fixture, s"$base/silver", s"$base/quarantine",
      failMode = "fail_job")
    assertThrows[RuntimeException](EvPipeline.runSilver(spark, cfg))
  }

  test("gold job derives features and overwrites only touched partitions") {
    val base = Files.createTempDirectory("graft-gold").toString
    val scfg = SilverConfig(fixture, s"$base/silver", s"$base/quarantine")
    EvPipeline.runSilver(spark, scfg)

    val db = "ev_gold_test"
    val n = EvPipeline.runGold(spark, GoldConfig(s"$base/silver", db = db))
    assert(n === 37)

    val fact = spark.table(s"$db.fact_ev_session")
    // derived fields present with reference NULL semantics
    val z = fact.filter(col("kwhTotal") <= 0).select("avg_cost_per_kwh")
    assert(z.filter(col("avg_cost_per_kwh").isNotNull).count() === 0)
    assert(fact.filter(col("session_duration_minutes") <= 0).count() === 0)

    // idempotent partition overwrite: re-run leaves count unchanged
    val n2 = EvPipeline.runGold(spark, GoldConfig(s"$base/silver", db = db))
    assert(n2 === 37)

    // single-partition reprocess prunes to one event_date
    val oneDate = fact.select("event_date").head().getDate(0).toString
    val n3 = EvPipeline.runGold(spark,
      GoldConfig(s"$base/silver", db = db, eventDate = Some(oneDate)))
    assert(n3 === 37) // table still whole; only that partition rewritten
  }

  test("quarantine repair-and-remerge rescues fixable rows exactly once") {
    val base = Files.createTempDirectory("graft-remerge").toString
    val cfg = SilverConfig(fixture, s"$base/silver", s"$base/quarantine")
    EvPipeline.runSilver(spark, cfg) // good=37, bad=18

    // repair: resolve unknown ("NA"-sourced NULL) distances to 0.0 —
    // rescues rows whose ONLY failure was the distance rule
    val (rescued, stillBad) = EvPipeline.remergeRepaired(
      spark, s"$base/quarantine", s"$base/silver",
      repair = df => df.withColumn("distance",
        coalesce(col("distance"), lit(0.0))))
    assert(rescued === 10)
    assert(stillBad === 8)
    assert(spark.read.parquet(s"$base/silver").count() === 47)
    assert(spark.read.parquet(s"$base/quarantine").count() === 8)
    // no duplicates: every sessionId appears once across both layers
    val ids = spark.read.parquet(s"$base/silver").select("sessionId")
      .union(spark.read.parquet(s"$base/quarantine").select("sessionId"))
    assert(ids.count() === 55)
    assert(ids.distinct().count() === 54) // fixture has one planted dup id
  }

  test("remerge retry after a partial failure does not duplicate rescued rows") {
    val base = Files.createTempDirectory("graft-remerge-retry").toString
    val cfg = SilverConfig(fixture, s"$base/silver", s"$base/quarantine")
    EvPipeline.runSilver(spark, cfg)

    def remerge() = EvPipeline.remergeRepaired(
      spark, s"$base/quarantine", s"$base/silver",
      repair = df => df.withColumn("distance",
        coalesce(col("distance"), lit(0.0))))

    // keep a copy of the pre-remerge quarantine, run the remerge, then
    // restore the quarantine — simulating a crash AFTER the silver
    // write but BEFORE the quarantine overwrite committed
    val backup = Files.createTempDirectory("graft-remerge-backup").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(s"$base/quarantine"),
      fs, new org.apache.hadoop.fs.Path(s"$backup/quarantine"), false, conf)
    remerge()
    assert(spark.read.parquet(s"$base/silver").count() === 47)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/quarantine"), true)
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(s"$backup/quarantine"),
      fs, new org.apache.hadoop.fs.Path(s"$base/quarantine"), false, conf)

    // the retry re-reads the ORIGINAL quarantine: it must converge to
    // the same silver state, not append the 10 rescued rows again
    val (rescued2, stillBad2) = remerge()
    assert(rescued2 === 10)
    assert(stillBad2 === 8)
    assert(spark.read.parquet(s"$base/silver").count() === 47,
      "retried remerge must be idempotent")
  }

  test("remerge preserves a streaming _batch_id layout instead of mixing schemes") {
    val base = Files.createTempDirectory("graft-remerge-stream").toString
    EvPipeline.runSilver(spark,
      SilverConfig(fixture, s"$base/b_silver", s"$base/b_quarantine"))
    // re-lay both layers exactly as the streaming sink writes them:
    // a leading _batch_id partition above (event_date, stationId)
    Seq("silver", "quarantine").foreach { layer =>
      spark.read.parquet(s"$base/b_$layer").withColumn("_batch_id", lit(0L))
        .write.partitionBy("_batch_id", "event_date", "stationId")
        .parquet(s"$base/$layer")
    }
    val (rescued, stillBad) = EvPipeline.remergeRepaired(
      spark, s"$base/quarantine", s"$base/silver",
      repair = df => df.withColumn("distance",
        coalesce(col("distance"), lit(0.0))))
    assert(rescued === 10)
    assert(stillBad === 8)
    assert(spark.read.parquet(s"$base/silver").count() === 47)
    assert(spark.read.parquet(s"$base/quarantine").count() === 8)
    // the roots must hold ONLY _batch_id= dirs — a second partition
    // scheme beside them would break partition discovery
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("silver", "quarantine").foreach { layer =>
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/$layer"))
        .filter(_.isDirectory).map(_.getPath.getName)
      assert(dirs.nonEmpty && dirs.forall(_.startsWith("_batch_id=")),
        s"$layer root mixes partition schemes: ${dirs.mkString(",")}")
    }
    // a half-streamed pair (streamed quarantine, batch silver) refuses
    val e = intercept[IllegalArgumentException](EvPipeline.remergeRepaired(
      spark, s"$base/quarantine", s"$base/b_silver", repair = df => df))
    assert(e.getMessage.contains("_batch_id"))
  }

  test("snapshot-backed gold versions every load and time-travels") {
    val base = Files.createTempDirectory("graft-gold-snap").toString
    EvPipeline.runSilver(spark,
      SilverConfig(fixture, s"$base/silver", s"$base/quarantine"))
    val table = s"$base/gold_fact"

    val (v1, n1) = EvPipeline.runGoldSnapshot(spark, s"$base/silver", table)
    assert(v1 === 1L)
    assert(n1 === 37L)
    // idempotent re-run: new version, same table contents
    val (v2, n2) = EvPipeline.runGoldSnapshot(spark, s"$base/silver", table)
    assert(v2 === 2L)
    assert(n2 === 37L)
    // time travel still reads the first load
    assert(graft.lake.SnapshotTable.read(spark, table, Some(1L)).count() === 37L)
    // single-date reprocess replaces only that partition
    val oneDate = spark.read.parquet(s"$base/silver")
      .select("event_date").head().getDate(0).toString
    val (v3, n3) = EvPipeline.runGoldSnapshot(spark, s"$base/silver", table, Some(oneDate))
    assert(v3 === 3L)
    assert(n3 === 37L)
  }

  test("incremental gold consumes only new silver commits and replays a crashed batch") {
    val base = Files.createTempDirectory("graft-gold-inc").toString
    EvPipeline.runSilver(spark,
      SilverConfig(fixture, s"$base/silver", s"$base/quarantine"))
    // silver as a SNAPSHOT table, loaded in two append commits
    val silverAll = spark.read.parquet(s"$base/silver")
    // key-range split: the planted duplicate key ('2000' twice) must
    // land whole in one batch
    val first = silverAll.filter(col("sessionId") < "2000")
    val rest = silverAll.filter(col("sessionId") >= "2000")
    val silverTable = s"$base/silver_snap"
    val gold = s"$base/gold_fact"
    val ckpt = s"$base/ckpt"
    graft.lake.SnapshotTable.append(first, silverTable, Seq("event_date"))

    // the fixture plants a duplicated sessionId, so gold cardinality
    // is DISTINCT keys, not silver row counts
    val distinctFirst = first.select("sessionId").distinct().count()
    val distinctAll = silverAll.select("sessionId").distinct().count()
    assert(distinctAll < silverAll.count()) // the dup is really there

    val (r1, gv1, rows1) = EvPipeline.runGoldIncremental(spark, silverTable, gold, ckpt)
    assert(r1 === Some((1L, 1L)) && gv1 === 1L && rows1 === distinctFirst)

    // nothing new → no gold commit
    val (r2, gv2, rows2) = EvPipeline.runGoldIncremental(spark, silverTable, gold, ckpt)
    assert(r2 === None && gv2 === 1L && rows2 === distinctFirst)

    graft.lake.SnapshotTable.append(rest, silverTable, Seq("event_date"))
    val (r3, gv3, rows3) = EvPipeline.runGoldIncremental(spark, silverTable, gold, ckpt)
    assert(r3 === Some((2L, 2L)) && gv3 === 2L && rows3 === distinctAll)
    // gold features match a full-rebuild derivation under the same
    // latest-observation-wins dedup rule
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sessionId").orderBy(col("created").desc, col("ended").desc)
    val expect = GoldFeatures.derive(
      silverAll.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn"))
      .select("sessionId", "session_duration_minutes")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = graft.lake.SnapshotTable.read(spark, gold)
      .select("sessionId", "session_duration_minutes")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === expect)

    // crash-replay: a third silver commit whose first merge attempt
    // dies mid-batch leaves the offset behind; the retry re-merges the
    // same batch and converges (merge is keyed upsert)
    val third = silverAll.orderBy(col("sessionId").desc).limit(5)
      .withColumn("kwhTotal", col("kwhTotal") + 1.0)
    graft.lake.SnapshotTable.append(third, silverTable, Seq("event_date"))
    intercept[RuntimeException] {
      graft.lake.SnapshotIncremental.processNew(spark, silverTable, ckpt) { (_, _, _) =>
        throw new RuntimeException("executor lost")
      }
    }
    val (r4, _, rows4) = EvPipeline.runGoldIncremental(spark, silverTable, gold, ckpt)
    assert(r4 === Some((3L, 3L)) && rows4 === distinctAll) // upserted, not duplicated
  }

  test("typed Dataset[EvSession] view round-trips the silver schema") {
    val base = Files.createTempDirectory("graft-typed").toString
    EvPipeline.runSilver(spark,
      SilverConfig(fixture, s"$base/silver", s"$base/quarantine"))
    val ds = graft.model.EvSession.typed(spark.read.parquet(s"$base/silver"))
    val sessions = ds.collect()
    assert(sessions.length === 37)
    // typed field access: durations positive, costs well-defined
    sessions.foreach { s =>
      assert(s.ended.getTime >= s.created.getTime)
      assert(s.kwhTotal.exists(_ > 0))
    }
  }

  test("event_date filter prunes silver partitions at the scan") {
    val base = Files.createTempDirectory("graft-prune").toString
    EvPipeline.runSilver(spark,
      SilverConfig(fixture, s"$base/silver", s"$base/quarantine"))
    val silver = spark.read.parquet(s"$base/silver")
    val oneDate = silver.select("event_date").head().getDate(0).toString
    val pruned = GoldFeatures.eventDateFilter(silver, Some(oneDate))
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // partition filter present and the scan reads a single partition
    assert(scan.partitionFilters.nonEmpty, "no partition filters pushed")
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.values).distinct.size === 1)
  }
}
