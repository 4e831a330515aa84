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
