package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** INCREMENTAL CLUSTERING (the liquid-clustering maintenance shape):
  * a full OPTIMIZE ... ZORDER records the spec (`#clusterCols=`) and
  * marks its outputs (`cl=<spec-hash>` entry token); OPTIMIZE
  * INCREMENTAL then rewrites ONLY files not marked under the current
  * spec — settled files stay byte-identical, re-running is a no-op,
  * rewrites drop their mark (a rewrite loses physical order) and are
  * picked up by the next incremental pass, and a spec change
  * invalidates every old mark without touching an entry. */
class IncrementalClusterSpec extends SparkTestBase {

  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-incl-$tag").toString + "/t"

  private def live(path: String): Set[String] =
    SnapshotTable.liveFiles(spark, path).toSet

  private def mk(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, (i * 7 % 100).toLong, s"r$i"))
      .toDF("a", "b", "s")

  test("incremental pass clusters only new files; settled files byte-identical") {
    val path = fresh("main")
    SnapshotTable.append(mk(0, 1000).repartition(4), path)
    // full clustered rewrite: records the spec, marks the outputs
    SnapshotTable.compact(spark, path, numFiles = 2,
      zorderCols = Seq("a", "b"))
    val settled = live(path)
    // new unclustered waves
    SnapshotTable.append(mk(1000, 1200).repartition(3), path)
    val withWave = live(path)
    assert(settled.subsetOf(withWave) && (withWave -- settled).size === 3)
    val v = SnapshotTable.optimizeIncremental(spark, path)
    val after = live(path)
    // settled files untouched (paths byte-identical), wave files gone
    assert(settled.subsetOf(after), "incremental pass rewrote settled files")
    assert((withWave -- settled).intersect(after).isEmpty,
      "incremental pass left unclustered files unmarked/unmoved")
    assert(SnapshotTable.read(spark, path).count() === 1200)
    // re-running with nothing stale is a no-op: same version, same files
    assert(SnapshotTable.optimizeIncremental(spark, path) === v)
    assert(live(path) === after)
  }

  test("a DML rewrite drops the mark; the next incremental re-clusters it only") {
    val path = fresh("dml")
    SnapshotTable.append(mk(0, 1000).repartition(4), path)
    SnapshotTable.compact(spark, path, numFiles = 3,
      zorderCols = Seq("a", "b"))
    val settled = live(path)
    // rewrite ONE file's rows: the rewritten output is unmarked
    SnapshotTable.delete(spark, path, col("a") === 5L)
    val afterDelete = live(path)
    val untouched = settled.intersect(afterDelete)
    assert(untouched.size === settled.size - 1, "delete touched too many files")
    SnapshotTable.optimizeIncremental(spark, path)
    val after = live(path)
    assert(untouched.subsetOf(after),
      "incremental pass rewrote files the delete never touched")
    assert((afterDelete -- untouched).intersect(after).isEmpty,
      "the rewritten (unmarked) file was not re-clustered")
    assert(SnapshotTable.read(spark, path).count() === 999)
  }

  test("spec change invalidates every old mark; writer features advertise clustering") {
    val path = fresh("spec")
    SnapshotTable.append(mk(0, 500).repartition(2), path)
    SnapshotTable.compact(spark, path, numFiles = 2, zorderCols = Seq("a", "b"))
    val v = SnapshotTable.latestVersion(spark, path).get
    val manifest = new String(Files.readAllBytes(
      Paths.get(s"$path/_graft_log/v$v")), "UTF-8")
    assert(manifest.contains("#clusterCols=a,b"))
    assert(manifest.contains("\tcl="), "clustered entries must carry the mark")
    assert(manifest.linesIterator.find(_.startsWith("#writerFeatures="))
      .exists(_.contains("clustering")))
    val settled = live(path)
    // new spec: every file is stale under it — full re-cluster
    SnapshotTable.optimizeIncremental(spark, path, zorderCols = Seq("b", "a"))
    val after = live(path)
    assert(settled.intersect(after).isEmpty,
      "spec change must invalidate old clustering marks")
    assert(SnapshotTable.read(spark, path).count() === 500)
    // and the new spec is now the recorded one: immediate re-run no-ops
    val v2 = SnapshotTable.latestVersion(spark, path).get
    assert(SnapshotTable.optimizeIncremental(spark, path) === v2)
  }

  test("CLUSTER BY records the spec as one metadata commit; incremental applies it") {
    val path = fresh("ddl")
    SnapshotTable.append(mk(0, 400).repartition(3), path)
    val before = live(path)
    // DDL moves NO data — pure metadata commit
    SnapshotTable.clusterBy(spark, path, Seq("a", "b"))
    assert(live(path) === before)
    // unknown column refused
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.clusterBy(spark, path, Seq("nope"))
    }
    assert(e.getMessage.contains("not in the schema"))
    // the next incremental pass clusters everything against the spec
    SnapshotTable.optimizeIncremental(spark, path)
    assert(live(path).intersect(before).isEmpty)
    assert(SnapshotTable.read(spark, path).count() === 400)
    // changing the spec via DDL invalidates the marks lazily: the
    // change itself is metadata-only, the NEXT pass re-clusters
    val settled = live(path)
    SnapshotTable.clusterBy(spark, path, Seq("b"))
    assert(live(path) === settled)
    SnapshotTable.optimizeIncremental(spark, path)
    assert(live(path).intersect(settled).isEmpty,
      "spec change via CLUSTER BY must invalidate old marks")
  }

  test("row ids stay stable across incremental clustering") {
    val path = fresh("rid")
    SnapshotTable.append(mk(0, 500).repartition(2), path)
    SnapshotTable.enableRowTracking(spark, path)
    def idsByKey(): Map[Long, Long] =
      SnapshotTable.readWithRowIds(spark, path)
        .select(col("a"), col(SnapshotTable.RowIdCol))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = idsByKey()
    SnapshotTable.compact(spark, path, numFiles = 2, zorderCols = Seq("a", "b"))
    SnapshotTable.append(mk(500, 600).repartition(2), path)
    val withWave = idsByKey()
    assert(withWave.filter(_._1 < 500) === before,
      "full clustered rewrite moved ids")
    SnapshotTable.optimizeIncremental(spark, path)
    val after = idsByKey()
    assert(after === withWave,
      "incremental clustering must preserve every stable row id")
    assert(after.values.toSet.size === 600, "ids must stay unique")
  }

  test("single-column spec clusters by range; refusal without a recorded spec") {
    val path = fresh("one")
    SnapshotTable.append(mk(0, 300).repartition(3), path)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.optimizeIncremental(spark, path)
    }
    assert(e.getMessage.contains("no clustering columns recorded"))
    SnapshotTable.optimizeIncremental(spark, path, zorderCols = Seq("a"))
    SnapshotTable.append(mk(300, 400).repartition(2), path)
    val before = live(path)
    SnapshotTable.optimizeIncremental(spark, path)
    assert(SnapshotTable.read(spark, path).count() === 400)
    // the range-clustered output carries usable skipping stats
    val (_, opened) = SnapshotTable.readRange(spark, path, "a", 0.0, 10.0)
    assert(opened < live(path).size || live(path).size == 1,
      s"range read opened every file ($opened of ${live(path).size})")
    assert(before.intersect(live(path)).nonEmpty || before.size <= 3)
  }

  test("WHERE scopes the incremental pass to the predicate's " +
      "partitions (per-partition maintenance waves)") {
    val path = fresh("wave")
    def mkp(lo: Int, hi: Int) =
      (lo until hi).map(i =>
        (i.toLong, (i * 7 % 100).toLong, if (i % 2 == 0) "p0" else "p1"))
        .toDF("a", "b", "p")
    SnapshotTable.append(mkp(0, 1000).repartition(3), path, Seq("p"))
    SnapshotTable.compact(spark, path, numFiles = 2,
      zorderCols = Seq("a", "b"))
    val settled = live(path)
    // a new wave lands unclustered in BOTH partitions
    SnapshotTable.append(mkp(1000, 1400).repartition(3), path, Seq("p"))
    val wave = live(path) -- settled
    val waveP0 = wave.filter(_.contains("p=p0"))
    val waveP1 = wave.filter(_.contains("p=p1"))
    assert(waveP0.nonEmpty && waveP1.nonEmpty, "fixture: wave in both partitions")
    // the p0 wave: only p0's unmarked files move; p1's stay put,
    // byte-identical AND unmarked, for their own wave
    SnapshotTable.optimizeIncremental(spark, path,
      where = Some(col("p") === "p0"))
    val afterP0 = live(path)
    assert(settled.subsetOf(afterP0), "scoped wave rewrote settled files")
    assert(waveP1.subsetOf(afterP0),
      "scoped wave rewrote files outside its partition scope")
    assert(waveP0.intersect(afterP0).isEmpty,
      "scoped wave left its own partition's unmarked files in place")
    assert(SnapshotTable.read(spark, path).count() === 1400)
    // the p1 wave picks up the rest
    SnapshotTable.optimizeIncremental(spark, path,
      where = Some(col("p") === "p1"))
    val afterP1 = live(path)
    assert(waveP1.intersect(afterP1).isEmpty,
      "second wave left its partition's unmarked files in place")
    // everything is settled now: an UNSCOPED pass is a version no-op
    val v = SnapshotTable.latestVersion(spark, path).get
    assert(SnapshotTable.optimizeIncremental(spark, path) === v)
    assert(live(path) === afterP1)
    // and a scoped pass with nothing stale in scope no-ops too
    assert(SnapshotTable.optimizeIncremental(spark, path,
      where = Some(col("p") === "p0")) === v)
    // a scoped pass with an explicit spec that DIFFERS from the
    // recorded one is refused: it would mark its outputs under a tag
    // no future pass computes — a paid rewrite whose marks never
    // count, re-rewritten by every later pass
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.optimizeIncremental(spark, path,
        zorderCols = Seq("b"), where = Some(col("p") === "p0"))
    }
    assert(e.getMessage.contains("RECORDED spec"))
    // restating the recorded spec is fine (equal → same tag)
    assert(SnapshotTable.optimizeIncremental(spark, path,
      zorderCols = Seq("a", "b"), where = Some(col("p") === "p0")) === v)
  }
}
