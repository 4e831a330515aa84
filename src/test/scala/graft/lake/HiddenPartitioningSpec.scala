package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Same-JVM gates for the concurrent-evolve race test (cf.
  * DvRaceGates in SnapshotTableSpec). */
object EvolveRaceGates {
  val writing = new java.util.concurrent.CountDownLatch(1)
  val proceed = new java.util.concurrent.CountDownLatch(1)
  private val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
  def enter(): Unit =
    if (fired.compareAndSet(false, true)) {
      writing.countDown()
      proceed.await(60, java.util.concurrent.TimeUnit.SECONDS)
      ()
    }
}

class HiddenPartitioningSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mkEvents() = Seq(
    ("e1", ts("2024-01-01 08:00:00"), 1.0),
    ("e2", ts("2024-01-01 17:30:00"), 2.0),
    ("e3", ts("2024-01-02 09:15:00"), 3.0),
    ("e4", ts("2024-01-03 23:59:59"), 4.0),
    ("e5", ts("2024-01-04 00:00:01"), 5.0),
    ("e6", ts("2024-01-05 12:00:00"), 6.0)
  ).toDF("id", "ts", "v")

  /** Files actually read by the frame's scans (post-execution metric)
    * — partition pruning shows up here. AQE hides materialized stages
    * behind leaf QueryStageExec nodes, so the walk recurses into them
    * explicitly (a plain collect would silently report 0 scans). */
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

  test("days(ts): layout is day-partitioned, reads hide the derived column") {
    val path = Files.createTempDirectory("graft-hp").toString + "/t"
    SnapshotTable.appendTransformed(mkEvents(), path, Seq("days(ts)"))
    assert(SnapshotTable.partitionTransforms(spark, path) === Seq("days(ts)"))

    // physical layout: one dir per day, named by the derived column
    val files = SnapshotTable.liveFiles(spark, path)
    assert(files.forall(_.contains("__p_ts_day=")), files.mkString("\n"))
    assert(files.map(_.split("__p_ts_day=")(1).take(10)).distinct.sorted ===
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05"))

    // the user never sees the derived column
    val out = SnapshotTable.read(spark, path)
    assert(out.columns.toSeq === Seq("id", "ts", "v"))
    assert(out.count() === 6)
  }

  test("readWhere projects ts predicates into partition pruning") {
    val path = Files.createTempDirectory("graft-hp").toString + "/t"
    SnapshotTable.appendTransformed(mkEvents(), path, Seq("days(ts)"))
    val total = SnapshotTable.liveFiles(spark, path).size

    // range predicate on the SOURCE column — never mentions the layout
    val r = SnapshotTable.readWhere(spark, path,
      col("ts") >= lit("2024-01-02 00:00:00") && col("ts") < lit("2024-01-04 00:00:00"))
    assert(r.columns.toSeq === Seq("id", "ts", "v"))
    assert(r.select("id").as[String].collect().sorted.toSeq === Seq("e3", "e4"))
    val n = scannedFiles(SnapshotTable.readWhere(spark, path,
      col("ts") >= lit("2024-01-02 00:00:00") && col("ts") < lit("2024-01-04 00:00:00")))
    // inclusive projection keeps the boundary day (`< 04 00:00:00`
    // cannot exclude the 01-04 dir) — so exactly days 02, 03, 04
    assert(n === 3, s"expected day-dir pruning to 3 of $total files, scanned $n")

    // equality and IN project too; flipped operand order as well
    assert(SnapshotTable.readWhere(spark, path,
      lit("2024-01-05 12:00:00") <= col("ts")).count() === 1)
    // IN with typed literals (a string-literal IN casts the COLUMN
    // side to string — different semantics, correctly not projected)
    val inN = scannedFiles(SnapshotTable.readWhere(spark, path,
      col("ts").isin(ts("2024-01-01 08:00:00"), ts("2024-01-02 09:15:00"))))
    val inExpected = SnapshotTable.liveFiles(spark, path).count(f =>
      f.contains("__p_ts_day=2024-01-01") || f.contains("__p_ts_day=2024-01-02"))
    assert(inN === inExpected,
      s"IN over two days must scan exactly the $inExpected files of those " +
        s"day dirs, scanned $inN")

    // an untranslatable predicate is still correct (no pruning claimed)
    assert(SnapshotTable.readWhere(spark, path, length(col("id")) === 2).count() === 6)
  }

  test("every write path re-derives: append, update across a day boundary, compact") {
    val path = Files.createTempDirectory("graft-hp").toString + "/t"
    SnapshotTable.appendTransformed(mkEvents(), path, Seq("days(ts)"))
    // plain append on the transformed table derives automatically
    SnapshotTable.append(Seq(("e7", ts("2024-01-06 01:00:00"), 7.0))
      .toDF("id", "ts", "v"), path)
    assert(SnapshotTable.liveFiles(spark, path)
      .exists(_.contains("__p_ts_day=2024-01-06")))

    // UPDATE that moves a row to another day must relocate it
    SnapshotTable.update(spark, path,
      Seq("ts" -> lit(ts("2024-02-15 10:00:00"))), col("id") === "e1")
    val moved = SnapshotTable.readWhere(spark, path,
      col("ts") >= lit("2024-02-15 00:00:00") && col("ts") < lit("2024-02-16 00:00:00"))
    assert(moved.select("id").as[String].collect().toSeq === Seq("e1"))
    assert(SnapshotTable.liveFiles(spark, path)
      .exists(_.contains("__p_ts_day=2024-02-15")))
    assert(SnapshotTable.read(spark, path).count() === 7)

    // compact keeps the day layout and the transform header
    SnapshotTable.compact(spark, path, numFiles = 2)
    assert(SnapshotTable.partitionTransforms(spark, path) === Seq("days(ts)"))
    assert(SnapshotTable.liveFiles(spark, path).forall(_.contains("__p_ts_day=")))
    assert(SnapshotTable.read(spark, path).count() === 7)
    val again = SnapshotTable.readWhere(spark, path,
      col("ts") >= lit("2024-02-15 00:00:00") && col("ts") < lit("2024-02-16 00:00:00"))
    assert(again.select("id").as[String].collect().toSeq === Seq("e1"))
  }

  test("bucket(n, id): equality prunes to one bucket dir") {
    val path = Files.createTempDirectory("graft-hp").toString + "/t"
    val df = (0 until 64).map(i => (s"k$i", i.toDouble)).toDF("id", "v")
    SnapshotTable.appendTransformed(df.repartition(4), path, Seq("bucket(8, id)"))
    val total = SnapshotTable.liveFiles(spark, path).size
    assert(SnapshotTable.liveFiles(spark, path).forall(_.contains("__p_id_bucket=")))

    val q = SnapshotTable.readWhere(spark, path, col("id") === "k17")
    assert(q.select("v").as[Double].collect().toSeq === Seq(17.0))
    // exactly the files of k17's bucket dir, nothing else
    val hit = SnapshotTable.readWhere(spark, path, col("id") === "k17")
      .select(input_file_name()).as[String].head()
    val bucketDir = hit.split("/").find(_.startsWith("__p_id_bucket=")).get
    val expected = SnapshotTable.liveFiles(spark, path)
      .count(_.contains(s"/$bucketDir/"))
    val n = scannedFiles(SnapshotTable.readWhere(spark, path, col("id") === "k17"))
    assert(n === expected && n < total,
      s"expected bucket pruning to the $expected files of $bucketDir " +
        s"(of $total total), scanned $n")
  }

  test("months + truncate compose; truncate projects ranges") {
    val path = Files.createTempDirectory("graft-hp").toString + "/t"
    val df = Seq(
      ("DE-BER", ts("2024-01-10 00:00:00"), 1.0),
      ("DE-MUC", ts("2024-02-10 00:00:00"), 2.0),
      ("FR-PAR", ts("2024-02-20 00:00:00"), 3.0),
      ("IT-ROM", ts("2024-03-01 00:00:00"), 4.0)
    ).toDF("code", "ts", "v")
    SnapshotTable.appendTransformed(df, path, Seq("months(ts)", "truncate(2, code)"))
    val files = SnapshotTable.liveFiles(spark, path)
    assert(files.forall(f => f.contains("__p_ts_month=") && f.contains("__p_code_trunc=")))

    // both dimensions project: month range AND country prefix equality
    val r = SnapshotTable.readWhere(spark, path,
      col("ts") >= lit("2024-02-01 00:00:00") && col("code") === "DE-MUC")
    assert(r.select("v").as[Double].collect().toSeq === Seq(2.0))
    val n = scannedFiles(SnapshotTable.readWhere(spark, path,
      col("ts") >= lit("2024-02-01 00:00:00") && col("code") === "DE-MUC"))
    assert(n === 1, s"month>=02 AND code prefix DE should isolate 1 file, scanned $n")

    // OR of two translatable sides still projects
    val or = SnapshotTable.readWhere(spark, path,
      col("code") === "FR-PAR" || col("code") === "IT-ROM")
    assert(or.count() === 2)
  }

  test("transforms are fixed at creation; __p_ prefix is reserved") {
    val path = Files.createTempDirectory("graft-hp").toString + "/t"
    SnapshotTable.appendTransformed(mkEvents(), path, Seq("days(ts)"))
    val ex = intercept[IllegalArgumentException] {
      SnapshotTable.appendTransformed(mkEvents(), path, Seq("months(ts)"))
    }
    assert(ex.getMessage.contains("evolve them"))

    // a plain table cannot later become transformed
    val plain = Files.createTempDirectory("graft-hp").toString + "/t"
    SnapshotTable.append(mkEvents(), plain)
    val ex2 = intercept[IllegalArgumentException] {
      SnapshotTable.appendTransformed(mkEvents(), plain, Seq("days(ts)"))
    }
    assert(ex2.getMessage.contains("first commit"))

    // reserved prefix on plain tables
    val ex3 = intercept[IllegalArgumentException] {
      SnapshotTable.append(mkEvents().withColumn("__p_x", lit(1)),
        Files.createTempDirectory("graft-hp").toString + "/t")
    }
    assert(ex3.getMessage.contains("reserved"))

    // same specs re-stated are accepted (idempotent creation calls)
    SnapshotTable.appendTransformed(mkEvents(), path, Seq("days(ts)"))
    assert(SnapshotTable.read(spark, path).count() === 12)
  }

  test("merge and DV delete work on a hidden-partitioned table") {
    val path = Files.createTempDirectory("graft-hp").toString + "/t"
    SnapshotTable.appendTransformed(mkEvents(), path, Seq("days(ts)"),
      statsCols = Seq("v"))
    // merge: update e3's v, insert e9 on a new day
    val src = Seq(
      ("e3", ts("2024-01-02 09:15:00"), 33.0),
      ("e9", ts("2024-04-01 00:00:00"), 9.0)).toDF("id", "ts", "v")
    SnapshotTable.merge(src, path, Seq("id"))
    val after = SnapshotTable.read(spark, path)
    assert(after.count() === 7)
    assert(after.filter(col("id") === "e3").select("v").as[Double].head() === 33.0)
    assert(SnapshotTable.liveFiles(spark, path)
      .exists(_.contains("__p_ts_day=2024-04-01")))

    SnapshotTable.deleteWithVectors(spark, path, col("id") === "e2")
    assert(SnapshotTable.read(spark, path).count() === 6)
    val day1 = SnapshotTable.readWhere(spark, path,
      col("ts") < lit("2024-01-02 00:00:00"))
    assert(day1.select("id").as[String].collect().toSeq === Seq("e1"),
      "DV delete must remove exactly e2 from day 1")

    // stats-box reads hide the layout too
    val (box, _) = SnapshotTable.readBox(spark, path, Seq(("v", 30.0, 40.0)))
    assert(box.columns.forall(!_.startsWith("__p_")),
      "readBox leaked a hidden partition column")
    assert(box.select("id").as[String].collect().toSeq === Seq("e3"))
  }

  test("partition evolution: days→months, both eras stay correct AND both keep pruning") {
    val path = Files.createTempDirectory("graft-hp").toString + "/t"
    SnapshotTable.appendTransformed(mkEvents(), path, Seq("days(ts)")) // era 1
    // file COUNT depends on write parallelism (whichever suite built
    // the shared SparkContext fixed the core count) — capture the
    // actual era-1 set and assert identity, not a literal count
    val era1Files = SnapshotTable.liveFiles(spark, path).toSet
    SnapshotTable.evolvePartitionTransforms(spark, path, Seq("months(ts)"))
    assert(SnapshotTable.partitionTransforms(spark, path) === Seq("months(ts)"))
    // era 2: lands in month dirs
    SnapshotTable.append(Seq(
      ("f1", ts("2024-03-10 10:00:00"), 10.0),
      ("f2", ts("2024-04-20 10:00:00"), 20.0)).toDF("id", "ts", "v"), path)
    val files = SnapshotTable.liveFiles(spark, path)
    assert(files.exists(_.contains("__p_ts_month=2024-03")))
    assert(files.filter(_.contains("__p_ts_day=")).toSet === era1Files,
      "era-1 files untouched")

    // reads hide BOTH eras' hidden columns
    assert(SnapshotTable.read(spark, path).columns.toSeq === Seq("id", "ts", "v"))
    assert(SnapshotTable.read(spark, path).count() === 8)

    // a predicate spanning the era boundary returns rows of both eras
    val r = SnapshotTable.readWhere(spark, path,
      col("ts") >= lit("2024-01-05 00:00:00") && col("ts") < lit("2024-04-01 00:00:00"))
    assert(r.select("id").as[String].collect().sorted.toSeq === Seq("e6", "f1"))
    // ...and BOTH eras prune: era-1 days 01–04 dirs and the era-2
    // 2024-04 month dir are all excluded
    val n = scannedFiles(SnapshotTable.readWhere(spark, path,
      col("ts") >= lit("2024-01-05 00:00:00") && col("ts") < lit("2024-04-01 00:00:00")))
    val expected = SnapshotTable.liveFiles(spark, path).count(f =>
      f.contains("__p_ts_day=2024-01-05") || f.contains("__p_ts_month=2024-03") ||
        f.contains("__p_ts_month=2024-04"))
    assert(n === expected,
      s"cross-era pruning: expected the $expected files of day-05 + months 03/04, scanned $n")

    // compact migrates EVERYTHING to the current spec (the re-cluster
    // -after-reshape maintenance pass), z-ordered within months
    SnapshotTable.compact(spark, path, numFiles = 4, zorderCols = Seq("ts", "v"))
    val after = SnapshotTable.liveFiles(spark, path)
    assert(after.forall(_.contains("__p_ts_month=")), after.mkString("\n"))
    assert(!after.exists(_.contains("__p_ts_day=")), "era-1 layout must be gone")
    assert(SnapshotTable.read(spark, path).count() === 8)
    assert(SnapshotTable.read(spark, path).columns.toSeq === Seq("id", "ts", "v"))
    val r2 = SnapshotTable.readWhere(spark, path,
      col("ts") >= lit("2024-01-05 00:00:00") && col("ts") < lit("2024-04-01 00:00:00"))
    assert(r2.select("id").as[String].collect().sorted.toSeq === Seq("e6", "f1"))
  }

  test("property: readWhere equals read().filter for random data and predicate shapes") {
    // soundness of the inclusive projection: for ANY predicate the
    // projection may only PRUNE, never change the result — verified
    // over random timestamps (incl. NULLs and day boundaries) and a
    // grid of predicate shapes across days+bucket transforms and an
    // evolved months era
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default, Seed(seed))

    val genTs: Gen[java.sql.Timestamp] = for {
      day <- Gen.choose(0, 9)
      sec <- Gen.choose(0, 86399)
    } yield java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 3, 1, 0, 0).plusDays(day).plusSeconds(sec))
    val genRow: Gen[(String, java.sql.Timestamp, Double)] = for {
      id <- Gen.choose(0, 9999).map(i => s"d$i")
      ts <- Gen.frequency(9 -> genTs.map(Option(_)), 1 -> Gen.const(None))
      v <- Gen.choose(0, 100).map(_.toDouble)
    } yield (id, ts.orNull, v)

    val rows = sample(Gen.listOfN(120, genRow), 0xC0FFEE)
    val df = rows.toDF("id", "ts", "v")
    val path = Files.createTempDirectory("graft-hp-prop").toString + "/t"
    SnapshotTable.appendTransformed(df, path, Seq("days(ts)", "bucket(4, id)"))
    // evolve mid-history so retired-spec projection is exercised too
    SnapshotTable.evolvePartitionTransforms(spark, path, Seq("months(ts)"))
    SnapshotTable.append(sample(Gen.listOfN(60, genRow), 0xBEEF).toDF("id", "ts", "v"), path)
    // a clustered era records v-stats, so the v predicates below also
    // exercise manifest-stats file skipping under the same soundness
    // contract (skipping may only prune, never change the result)
    SnapshotTable.appendClustered(
      sample(Gen.listOfN(40, genRow), 0xFACE).toDF("id", "ts", "v"), path, "v",
      numFiles = 3)

    val plain = SnapshotTable.read(spark, path)
    val cut = java.sql.Timestamp.valueOf("2024-03-04 11:30:00")
    val cut2 = java.sql.Timestamp.valueOf("2024-03-07 00:00:00")
    val preds: Seq[org.apache.spark.sql.Column] = Seq(
      col("ts") >= lit(cut),
      col("ts") < lit(cut),
      col("ts") >= lit(cut) && col("ts") < lit(cut2),
      col("ts") === lit(cut2),
      lit(cut) <= col("ts"),
      col("ts").isin(rows.collect { case (_, t, _) if t != null => t }.take(3): _*),
      col("id") === "d7",
      col("id").isin("d1", "d2", "d3"),
      col("id") === "d7" || col("ts") >= lit(cut2),
      col("ts").isNull,
      col("ts").isNotNull && col("ts") < lit(cut),
      col("v") > 50.0,                // untranslatable; stats-skippable
      col("v") <= 0.0,                // stats-skippable, likely empty
      (col("ts") >= lit(cut)) === lit(false),            // negated shape, untranslatable
      col("id") === "d7" && col("v") > 10.0 && col("ts") < lit(cut2))
    preds.zipWithIndex.foreach { case (p, i) =>
      val got = SnapshotTable.readWhere(spark, path, p)
      val want = plain.filter(p)
      val diff = got.exceptAll(want).count() + want.exceptAll(got).count()
      assert(diff === 0L, s"predicate #$i diverged (projection changed results)")
    }
  }

  test("a commit racing a concurrent evolve keeps the evolution; its layout joins the retired eras") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val path = Files.createTempDirectory("graft-hp-race").toString + "/t"
    SnapshotTable.appendTransformed(mkEvents(), path, Seq("days(ts)"))
    // the append reads the spec (days), then blocks inside its write
    // job; the evolve lands in that window — publishing the append's
    // stale header snapshot would silently revert it
    val gate = udf((d: Double) => { EvolveRaceGates.enter(); d })
    val df2 = Seq(("r1", ts("2024-05-01 10:00:00"), 50.0),
      ("r2", ts("2024-05-02 10:00:00"), 51.0)).toDF("id", "ts", "v")
      .withColumn("v", gate(col("v")))
    val app = Future { SnapshotTable.append(df2, path) }
    assert(EvolveRaceGates.writing.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "append never started writing")
    SnapshotTable.evolvePartitionTransforms(spark, path, Seq("months(ts)"))
    EvolveRaceGates.proceed.countDown()
    Await.result(app, 120.seconds)

    // the evolution SURVIVED the racing commit
    assert(SnapshotTable.partitionTransforms(spark, path) === Seq("months(ts)"))
    // the raced commit's files are day-layout (it derived pre-evolve)
    assert(SnapshotTable.liveFiles(spark, path)
      .exists(_.contains("__p_ts_day=2024-05-01")))
    // and that layout still PRUNES as a retired era
    val r = SnapshotTable.readWhere(spark, path,
      col("ts") >= lit("2024-05-02 00:00:00"))
    assert(r.select("id").as[String].collect().toSeq === Seq("r2"))
    val n = scannedFiles(SnapshotTable.readWhere(spark, path,
      col("ts") >= lit("2024-05-02 00:00:00")))
    val expected = SnapshotTable.liveFiles(spark, path)
      .count(_.contains("__p_ts_day=2024-05-02"))
    assert(n === expected, s"retired-era pruning after the race: scanned $n, want $expected")
    assert(SnapshotTable.read(spark, path).count() === 8)
    assert(SnapshotTable.read(spark, path).columns.toSeq === Seq("id", "ts", "v"))
  }

  test("CDC feed and incremental reads expose the user schema — no __p_ columns") {
    val path = Files.createTempDirectory("graft-hp-cdc").toString + "/t"
    SnapshotTable.appendTransformed(mkEvents(), path, Seq("days(ts)"))
    SnapshotTable.append(Seq(("e7", ts("2024-01-07 00:00:00"), 7.0))
      .toDF("id", "ts", "v"), path)
    val feed = SnapshotTable.changes(spark, path, 0L, 2L)
    assert(feed.columns.toSeq === Seq("id", "ts", "v", "_change_type", "_commit_version"),
      "change feed leaked a hidden partition column")
    assert(feed.count() === 7)
    val inc = SnapshotIncremental.readBetween(spark, path, 1L, 2L)
    assert(inc.columns.toSeq === Seq("id", "ts", "v"),
      "incremental read leaked a hidden partition column")
    assert(inc.select("id").as[String].collect().toSeq === Seq("e7"))
    // an empty range keeps the same shape
    assert(SnapshotIncremental.readBetween(spark, path, 2L, 2L).columns.toSeq
      === Seq("id", "ts", "v"))
  }

  test("partition evolution: a plain table evolves into a transformed one") {
    val path = Files.createTempDirectory("graft-hp").toString + "/t"
    SnapshotTable.append(mkEvents(), path) // unpartitioned
    SnapshotTable.evolvePartitionTransforms(spark, path, Seq("days(ts)"))
    // readWhere BEFORE any new write: no hidden column exists yet —
    // must not fail, must return correct rows (no pruning claimed)
    assert(SnapshotTable.readWhere(spark, path,
      col("ts") >= lit("2024-01-05 00:00:00")).count() === 1)
    SnapshotTable.append(Seq(("e7", ts("2024-01-06 01:00:00"), 7.0))
      .toDF("id", "ts", "v"), path)
    assert(SnapshotTable.liveFiles(spark, path)
      .exists(_.contains("__p_ts_day=2024-01-06")))
    assert(SnapshotTable.readWhere(spark, path,
      col("ts") >= lit("2024-01-05 00:00:00")).count() === 2)
    assert(SnapshotTable.read(spark, path).columns.toSeq === Seq("id", "ts", "v"))

    // validation: re-stating the current spec is rejected; unknown
    // source columns are rejected
    assert(intercept[IllegalArgumentException] {
      SnapshotTable.evolvePartitionTransforms(spark, path, Seq("days(ts)"))
    }.getMessage.contains("already uses"))
    assert(intercept[IllegalArgumentException] {
      SnapshotTable.evolvePartitionTransforms(spark, path, Seq("days(nope)"))
    }.getMessage.contains("not in the table schema"))
  }
}
