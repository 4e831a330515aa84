package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Commit-time AUTO-CLUSTERING ([[SnapshotTable.setAutoCluster]]):
  * the liquid-clustering companion of auto-compaction. The trigger is
  * CLUSTER-AWARE — it counts files not marked under the current spec
  * per key region — never the small-file count, because a
  * whole-partition merged file spans its full key range and marking
  * it clustered would weaken skipping. Auto-compaction's outputs
  * therefore stay UNMARKED and this policy is what re-clusters them. */
class AutoClusterSpec extends SparkTestBase {

  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-aclu-$tag").toString + "/t"

  private def live(path: String): Set[String] =
    SnapshotTable.liveFiles(spark, path).toSet

  private def mk(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, (i * 7 % 100).toLong, s"r$i"))
      .toDF("a", "b", "s")

  /** Entries of the head manifest paired with their cluster mark. */
  private def marks(path: String): Map[String, Option[String]] = {
    val v = SnapshotTable.latestVersion(spark, path).get
    SnapshotTable.readManifestFull(spark, path, v)
      .entries.map(e => e.filePath -> e.clusterTag).toMap
  }

  test("appends below the stale threshold do not fire; crossing it " +
      "clusters exactly the unmarked files, no manual OPTIMIZE") {
    val path = fresh("fire")
    SnapshotTable.append(mk(0, 1000).repartition(2), path)
    SnapshotTable.compact(spark, path, numFiles = 2,
      zorderCols = Seq("a", "b"))
    SnapshotTable.setAutoCluster(spark, path, minStaleFiles = 3)
    assert(SnapshotTable.autoClusterPolicy(spark, path) === Some(3))
    val settled = live(path)
    // two 1-file appends: 2 unmarked < 3 — no pass fires
    SnapshotTable.append(mk(1000, 1100).coalesce(1), path)
    SnapshotTable.append(mk(1100, 1200).coalesce(1), path)
    val twoWaves = live(path)
    assert((twoWaves -- settled).size === 2, "policy fired below threshold")
    // third append crosses the threshold: the SAME commit call fires
    // the incremental pass — settled files byte-identical, all three
    // wave files re-clustered and marked
    SnapshotTable.append(mk(1200, 1300).coalesce(1), path)
    val after = live(path)
    assert(settled.subsetOf(after), "auto pass rewrote settled files")
    assert((twoWaves -- settled).intersect(after).isEmpty,
      "auto pass left unmarked wave files in place")
    val mk2 = marks(path)
    assert((after -- settled).forall(f => mk2(f).isDefined),
      "auto pass outputs must carry the cluster mark")
    assert(SnapshotTable.read(spark, path).count() === 1300)
    // history records the policy commit distinctly
    val ops = SnapshotTable.history(spark, path).select("operation")
      .collect().map(_.getString(0)).toSeq
    assert(ops.contains("autocluster"))
  }

  test("auto-compaction's merged file stays UNMARKED (it spans the " +
      "key range); the cluster policy then restores skipping over it") {
    val path = fresh("honest")
    SnapshotTable.append(mk(0, 2000).repartition(2), path)
    SnapshotTable.compact(spark, path, numFiles = 2,
      zorderCols = Seq("a", "b"))
    val settled = live(path)
    // compaction alone: three tiny full-range appends trigger the
    // small-file merge, whose single output covers keys 0..1999-ish
    // threshold BELOW the settled files' ~1000 rows (the z-shape
    // splits 2000 rows into ~1008/992 — a 1000-row cutoff would rope
    // a settled file into the merge) and above the 100-row waves
    SnapshotTable.setAutoCompact(spark, path, minSmallFiles = 3,
      smallFileRows = 500L)
    // each wave spans the whole key space (every 20th key) — the
    // merged file's range therefore spans it too
    def wave(seed: Int) =
      (0 until 100).map(i => ((i * 20 + seed).toLong, i.toLong, s"w$i"))
        .toDF("a", "b", "s")
    SnapshotTable.append(wave(1).coalesce(1), path)
    SnapshotTable.append(wave(2).coalesce(1), path)
    SnapshotTable.append(wave(3).coalesce(1), path)
    val afterCompact = live(path)
    val merged = afterCompact -- settled
    assert(merged.size === 1,
      s"auto-compaction should have merged the three waves: $merged")
    val mkC = marks(path)
    assert(mkC(merged.head).isEmpty,
      "a whole-range merged file must NEVER carry a cluster mark — " +
        "marking it would weaken skipping")
    // now the cluster-aware policy: the merged file is one unmarked
    // file, so threshold 1 fires on the next commit and re-clusters
    // it (plus the new wave) against the recorded spec
    SnapshotTable.setAutoCluster(spark, path, minStaleFiles = 1)
    SnapshotTable.append(wave(4).coalesce(1), path)
    val after = live(path)
    assert(settled.subsetOf(after))
    assert(merged.intersect(after).isEmpty,
      "the cluster policy must re-cluster the merged unmarked file")
    val mkA = marks(path)
    assert((after -- settled).forall(f => mkA(f).isDefined))
    assert(SnapshotTable.read(spark, path).count() === 2400)
  }

  test("policy without a recorded spec no-ops; disabling removes the header") {
    val path = fresh("nospec")
    SnapshotTable.append(mk(0, 100).coalesce(1), path)
    SnapshotTable.setAutoCluster(spark, path, minStaleFiles = 1)
    val v = SnapshotTable.latestVersion(spark, path).get
    SnapshotTable.append(mk(100, 200).coalesce(1), path)
    // one data commit, no policy commit (no spec to cluster against)
    assert(SnapshotTable.latestVersion(spark, path).get === v + 1)
    SnapshotTable.setAutoCluster(spark, path, 0)
    assert(SnapshotTable.autoClusterPolicy(spark, path) === None)
    SnapshotTable.clusterBy(spark, path, Seq("a"))
    SnapshotTable.append(mk(200, 300).coalesce(1), path)
    val ops = SnapshotTable.history(spark, path).select("operation")
      .collect().map(_.getString(0)).toSeq
    assert(!ops.contains("autocluster"), "disabled policy must not fire")
  }

  test("the cluster policy fires from the streaming epoch commit path too") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val path = fresh("stream")
    SnapshotTable.append(mk(0, 1000).repartition(2), path)
    SnapshotTable.compact(spark, path, numFiles = 2,
      zorderCols = Seq("a", "b"))
    SnapshotTable.setAutoCluster(spark, path, minStaleFiles = 1)
    val settled = live(path)
    // one streaming epoch lands one unmarked file; threshold 1 fires
    // the pass from the epoch commit itself — without this hook an
    // AUTOCLUSTER table fed only by the streaming sink would
    // accumulate unmarked files unboundedly
    val stage = Files.createTempDirectory("graft-aclu-stage").toString
    mk(1000, 1100).coalesce(1).write.parquet(s"$stage/s")
    import scala.jdk.CollectionConverters._
    val part = Files.list(java.nio.file.Paths.get(s"$stage/s"))
      .iterator.asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get.toString
    SnapshotTable.commitStreamEpoch(spark, path,
      Seq((s"$stage/s", part, 100L)),
      new StructType().add("a", LongType).add("b", LongType)
        .add("s", StringType),
      "aclu-app", 0L)
    val ops = SnapshotTable.history(spark, path).select("operation")
      .collect().map(_.getString(0)).toSeq
    assert(ops.contains("autocluster"),
      s"cluster policy never fired from the stream epoch path: $ops")
    assert(settled.subsetOf(live(path)))
    assert(SnapshotTable.read(spark, path).count() === 1100)
    assert(SnapshotTable.unclusteredFileCount(spark, path) === 0)
  }

  test("enablement on a backlogged table: the first wave is capped; " +
      "later commits drain the remainder") {
    val path = fresh("backlog")
    SnapshotTable.append(mk(0, 1000).repartition(2), path)
    SnapshotTable.compact(spark, path, numFiles = 2,
      zorderCols = Seq("a", "b"))
    val settled = live(path)
    // 12 unmarked single-file appends land BEFORE the policy exists —
    // the enablement-on-a-backlog shape where an uncapped pass would
    // make the next tiny append pay the full rewrite inline
    (0 until 12).foreach { i =>
      SnapshotTable.append(
        mk(1000 + i * 50, 1050 + i * 50).coalesce(1), path)
    }
    SnapshotTable.setAutoCluster(spark, path, minStaleFiles = 1)
    assert(SnapshotTable.unclusteredFileCount(spark, path) === 12)
    spark.conf.set("spark.graft.policy.maxFilesPerWave", "4")
    try {
      SnapshotTable.append(mk(9000, 9001).coalesce(1), path)
      // 13 unmarked at decision time, wave capped at 4 → exactly 9 left
      val left = SnapshotTable.unclusteredFileCount(spark, path)
      assert(left === 9,
        s"first wave must rewrite at most 4 of the 13 unmarked files ($left left)")
      assert(settled.subsetOf(live(path)), "capped wave rewrote settled files")
      // convergence is free: the policy re-fires on every non-policy
      // commit, each adding 1 unmarked and clustering ≤4 (net −3)
      var drains = 0
      while (SnapshotTable.unclusteredFileCount(spark, path) > 0 && drains < 10) {
        SnapshotTable.append(
          mk(9100 + drains, 9101 + drains).coalesce(1), path)
        drains += 1
      }
      assert(SnapshotTable.unclusteredFileCount(spark, path) === 0,
        "later commits must drain the backlog to zero")
      assert(drains <= 4, s"drain took $drains commits")
      assert(SnapshotTable.read(spark, path).count() ===
        1000L + 12 * 50 + 1 + drains)
    } finally spark.conf.unset("spark.graft.policy.maxFilesPerWave")
  }

  test("an over-cap region drains as key-contiguous z-range buckets " +
      "(hot-partition shape)") {
    val path = fresh("hotpart")
    SnapshotTable.append(mk(0, 1000).repartition(2), path)
    SnapshotTable.compact(spark, path, numFiles = 2,
      zorderCols = Seq("a", "b"))
    // backlog with DISJOINT a-ranges and per-file a-stats:
    // appendClustered marks under spec (a) — a different tag than the
    // recorded (a, b), so the files read as unmarked but carry the
    // min stat the z-range slicing orders by
    (0 until 9).foreach { i =>
      SnapshotTable.appendClustered(
        mk(2000 + i * 100, 2000 + (i + 1) * 100), path, "a", numFiles = 1)
    }
    SnapshotTable.setAutoCluster(spark, path, minStaleFiles = 1)
    spark.conf.set("spark.graft.policy.maxFilesPerWave", "3")
    try {
      val v = SnapshotTable.latestVersion(spark, path).get
      val m = SnapshotTable.readManifestFull(spark, path, v)
      val tag = SnapshotTable.clusterTagOf(m.clusterCols)
      val legacy = SnapshotTable.legacyClusterTagOf(m.clusterCols)
      val unmarkedBefore =
        m.entries.filterNot(SnapshotTable.settledUnder(_, tag, legacy))
      assert(unmarkedBefore.size === 9)
      SnapshotTable.append(mk(9000, 9001).coalesce(1), path)
      val v2 = SnapshotTable.latestVersion(spark, path).get
      val m2 = SnapshotTable.readManifestFull(spark, path, v2)
      val survivors = m2.entries.map(_.filePath).toSet
      val rewritten = unmarkedBefore.filterNot(e => survivors(e.filePath))
      assert(rewritten.size === 3, s"wave must be capped at 3 files")
      // the slice is the three LOWEST a-ranges — one z-range bucket,
      // not a smear across the whole backlog's key range
      val mins = rewritten.flatMap(_.stats.find(_._1 == "a").map(_._2)).sorted
      assert(mins === Seq(2000.0, 2100.0, 2200.0),
        s"wave not key-contiguous: took mins $mins")
      assert(SnapshotTable.read(spark, path).count() === 1000L + 900 + 1)
    } finally spark.conf.unset("spark.graft.policy.maxFilesPerWave")
  }

  test("legacy 8-hex marks of the SAME spec count as settled — " +
      "upgrading the library costs no re-cluster") {
    val path = fresh("legacy")
    SnapshotTable.append(mk(0, 1000).repartition(2), path)
    SnapshotTable.compact(spark, path, numFiles = 2,
      zorderCols = Seq("a", "b"))
    val v = SnapshotTable.latestVersion(spark, path).get
    val m = SnapshotTable.readManifestFull(spark, path, v)
    val spec = m.clusterCols
    val tag = SnapshotTable.clusterTagOf(spec)
    val legacy = SnapshotTable.legacyClusterTagOf(spec)
    assert(legacy.length === 8 && tag.length === 16)
    // the LITERAL values the 8-hex-era library wrote to disk
    // (Murmur32 over the NUL-joined list — computed against the
    // historic clusterTagOf at commit 0f9f310, NOT recomputed through
    // the function under test, so a separator regression in
    // legacyClusterTagOf cannot forge marks that pass its own check)
    assert(spec === Seq("a", "b"))
    assert(legacy === "d3cbe237",
      "legacyClusterTagOf no longer matches the historic on-disk format")
    assert(SnapshotTable.legacyClusterTagOf(Seq("b")) === "2658f166")
    // the NUL join keeps multi-column specs unambiguous
    assert(SnapshotTable.legacyClusterTagOf(Seq("ab")) !== legacy)
    // forge the pre-r18 on-disk state: same files, marks in the old
    // 8-hex Murmur32 format
    val forged = m.copy(entries = m.entries.map(e =>
      if (e.clusterTag.contains(tag)) e.copy(clusterTag = Some(legacy)) else e))
    assert(SnapshotTable.publishManifest(spark, path, v + 1, forged))
    assert(SnapshotTable.unclusteredFileCount(spark, path) === 0,
      "legacy marks of the same spec must read as settled")
    val before = live(path)
    assert(SnapshotTable.optimizeIncremental(spark, path) === v + 1,
      "incremental pass must no-op over legacy-settled files")
    assert(live(path) === before, "legacy-settled files were rewritten")
    // a legacy mark of a DIFFERENT spec still reads as stale
    val wrong = m.copy(entries = m.entries.map(e =>
      if (e.clusterTag.contains(tag))
        e.copy(clusterTag = Some(SnapshotTable.legacyClusterTagOf(Seq("b"))))
      else e))
    assert(SnapshotTable.publishManifest(spark, path, v + 2, wrong))
    assert(SnapshotTable.unclusteredFileCount(spark, path) === m.entries.size,
      "a different spec's legacy tag must not count as settled")
  }

  test("continuous appends keep box reads bounded with no manual OPTIMIZE") {
    val path = fresh("bounded")
    SnapshotTable.append(mk(0, 4000).repartition(2), path)
    SnapshotTable.compact(spark, path, numFiles = 4,
      zorderCols = Seq("a", "b"))
    SnapshotTable.setAutoCluster(spark, path, minStaleFiles = 3)
    // 9 single-file appends: the policy fires about every third
    // commit, so unmarked files never exceed the threshold window
    (0 until 9).foreach { i =>
      SnapshotTable.append(
        mk(4000 + i * 100, 4000 + (i + 1) * 100).coalesce(1), path)
    }
    val v = SnapshotTable.latestVersion(spark, path).get
    val m = SnapshotTable.readManifestFull(spark, path, v)
    val spec = m.clusterCols
    val tag = SnapshotTable.clusterTagOf(spec)
    val unmarked = m.entries.filterNot(_.clusterTag.contains(tag))
    assert(unmarked.size < 3,
      s"policy let ${unmarked.size} unmarked files accumulate")
    // the skipping proof: a narrow box over the clustered key opens a
    // bounded subset of the live files
    val (df, opened) = SnapshotTable.readBox(spark, path,
      Seq(("a", 0.0, 400.0)))
    val total = live(path).size
    assert(opened < total,
      s"box read opened all $opened of $total files — skipping lost " +
        "under continuous ingest")
    assert(df.count() === mk(0, 4900).filter(col("a") <= 400).count())
  }
}
