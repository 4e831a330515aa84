package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The incremental manifest log: delta commits between periodic full
  * checkpoints. Asserts the PHYSICAL encoding (what lands on disk)
  * as well as the logical reads every other lake spec covers —
  * commit cost must stop scaling with total live-file count, and a
  * cold read must replay a bounded checkpoint+tail chain. */
class SnapshotLogSpec extends SparkTestBase {

  private def vFile(path: String, v: Long): String =
    s"$path/_graft_log/v$v"

  private def content(path: String, v: Long): String =
    new String(Files.readAllBytes(Paths.get(vFile(path, v))), "UTF-8")

  private def isDelta(path: String, v: Long): Boolean =
    content(path, v).split("\n").exists(_.startsWith("#delta="))

  test("commits publish deltas between checkpoints; every version reads back identically") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-log").toString + "/t"
    // 25 single-file commits: crosses the interval-20 checkpoint
    (1 to 25).foreach { i =>
      SnapshotTable.append(
        Seq((i.toLong, s"row$i")).toDF("id", "s").coalesce(1), path)
    }
    assert(!isDelta(path, 1), "v1 creates the log — must be a checkpoint")
    (2 to 19).foreach(v => assert(isDelta(path, v), s"v$v should be a delta"))
    assert(!isDelta(path, 20), "v20 is the periodic checkpoint")
    (21 to 25).foreach(v => assert(isDelta(path, v), s"v$v should be a delta"))

    // a delta's size tracks the commit, not the table: v25's file is
    // not bigger than v2's beyond noise, while the v20 checkpoint
    // carries all 20 entries
    val s2 = Files.size(Paths.get(vFile(path, 2)))
    val s25 = Files.size(Paths.get(vFile(path, 25)))
    val s20 = Files.size(Paths.get(vFile(path, 20)))
    assert(s25 < s2 * 2, s"delta grew with table size: v2=$s2 v25=$s25")
    assert(s20 > s25 * 3, s"checkpoint should dwarf a delta: v20=$s20 v25=$s25")

    // time travel to every version, cold cache: correct rows at each
    SnapshotTable.clearManifestCache()
    Seq(1, 7, 19, 20, 25).foreach { v =>
      assert(SnapshotTable.read(spark, path, Some(v.toLong)).count() === v.toLong)
    }
    // a cold read of the head replays checkpoint + tail only
    SnapshotTable.clearManifestCache()
    val before = SnapshotTable.manifestFileReads.get()
    SnapshotTable.read(spark, path, Some(25L)).count()
    val opened = SnapshotTable.manifestFileReads.get() - before
    assert(opened <= 6, s"cold head read opened $opened version files (want ≤ 1 checkpoint + 5 deltas)")
    // …and a warm re-read opens none
    val before2 = SnapshotTable.manifestFileReads.get()
    SnapshotTable.read(spark, path, Some(25L)).count()
    assert(SnapshotTable.manifestFileReads.get() === before2)
  }

  test("delete/merge/metadata commits ride deltas: removals match and replay") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-log-dml").toString + "/t"
    // range-partition by k so the delete touches a strict SUBSET of
    // files — a delta that rewrites every entry is correctly published
    // as a checkpoint instead (the full list is smaller then)
    SnapshotTable.append(
      spark.range(100).select(col("id"), (col("id") % 10).as("k"))
        .repartitionByRange(8, col("k")), path)
    SnapshotTable.delete(spark, path, col("k") === 3)                 // v2: DV or rewrite
    SnapshotTable.merge(                                              // v3: upsert
      Seq((5L, 99L), (200L, 1L)).toDF("id", "k"), path, Seq("id"))
    SnapshotTable.addCheckConstraint(spark, path, "k_dom", "k >= 0")       // v4: metadata-only
    // the DV delete touches one file's entry and the metadata commit
    // none — both ride deltas; the merge has no id stats to prune by,
    // rewrites every file, and correctly lands as a (smaller)
    // checkpoint instead
    assert(isDelta(path, 2) && isDelta(path, 4))
    SnapshotTable.clearManifestCache()
    val got = SnapshotTable.read(spark, path)
    assert(got.filter(col("k") === 3).count() === 0)
    assert(got.filter(col("id") === 5L).select("k").as[Long].head() === 99L)
    assert(got.count() === 91)                                        // 100 − 10 + 1
    assert(SnapshotTable.checkConstraints(spark, path).contains("k_dom"))
  }

  test("vacuum materializes a surviving delta as a checkpoint before expiring its base") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-log-vac").toString + "/t"
    (1 to 6).foreach { i =>
      SnapshotTable.append(Seq((i.toLong, i.toString)).toDF("id", "s").coalesce(1), path)
    }
    assert(isDelta(path, 4))
    SnapshotTable.vacuum(spark, path, keepVersions = 3)               // expires v1..v3
    assert(SnapshotTable.versions(spark, path) === Seq(4L, 5L, 6L))
    assert(!isDelta(path, 4), "v4 lost its base — must have been materialized")
    assert(isDelta(path, 5) && isDelta(path, 6), "later deltas keep their intact chain")
    SnapshotTable.clearManifestCache()
    assert(SnapshotTable.read(spark, path, Some(4L)).count() === 4)
    assert(SnapshotTable.read(spark, path).count() === 6)
  }

  test("vacuum checkpoint swap: .ckpt sidecar readable mid-crash, repaired by next vacuum") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-log-ckpt").toString + "/t"
    (1 to 6).foreach { i =>
      SnapshotTable.append(Seq((i.toLong, i.toString)).toDF("id", "s").coalesce(1), path)
    }
    // exercise the non-atomic-rename materialization branch (the
    // object-store protocol) on the local FS
    sys.props("graft.snapshot.testForceNonAtomic") = "true"
    try {
      SnapshotTable.vacuum(spark, path, keepVersions = 3)             // expires v1..v3
      assert(!isDelta(path, 4), "v4 must be materialized via the sidecar protocol")
      assert(!Files.exists(Paths.get(vFile(path, 4) + ".ckpt")),
        "completed swap leaves no sidecar")
      // simulate the crash window: v4 deleted, staged sidecar present
      Files.move(Paths.get(vFile(path, 4)), Paths.get(vFile(path, 4) + ".ckpt"))
      SnapshotTable.clearManifestCache()
      assert(SnapshotTable.versions(spark, path) === Seq(4L, 5L, 6L),
        "mid-swap, the sidecar IS version 4")
      assert(SnapshotTable.read(spark, path, Some(4L)).count() === 4)
      // the v5 delta replays onto the sidecar base
      assert(SnapshotTable.read(spark, path).count() === 6)
      // the next vacuum completes the swap before anything else
      SnapshotTable.vacuum(spark, path, keepVersions = 3)
      assert(Files.exists(Paths.get(vFile(path, 4))))
      assert(!Files.exists(Paths.get(vFile(path, 4) + ".ckpt")))
      // a leftover sidecar beside an INTACT version file is dropped
      Files.copy(Paths.get(vFile(path, 5)), Paths.get(vFile(path, 5) + ".ckpt"))
      SnapshotTable.vacuum(spark, path, keepVersions = 3)
      assert(!Files.exists(Paths.get(vFile(path, 5) + ".ckpt")))
      SnapshotTable.clearManifestCache()
      assert(SnapshotTable.read(spark, path).count() === 6)
    } finally { sys.props.remove("graft.snapshot.testForceNonAtomic"); () }
  }

  test("branch fork manifests are checkpoints; branch commits are deltas in the branch log") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-log-br").toString + "/t"
    (1 to 3).foreach { i =>
      SnapshotTable.append(Seq((i.toLong, i.toString)).toDF("id", "s").coalesce(1), path)
    }
    SnapshotTable.createBranch(spark, path, "dev")
    val bh = s"$path@@dev"
    SnapshotTable.append(Seq((10L, "b")).toDF("id", "s").coalesce(1), bh)
    val bLog = s"$path/_graft_log/branch-dev"
    // the fork manifest (v3 in the branch log) has no v2 in ITS log —
    // checkpoint; the branch's own commit (v4) deltas on it
    assert(!new String(Files.readAllBytes(Paths.get(s"$bLog/v3")), "UTF-8")
      .split("\n").exists(_.startsWith("#delta=")))
    assert(new String(Files.readAllBytes(Paths.get(s"$bLog/v4")), "UTF-8")
      .split("\n").exists(_.startsWith("#delta=")))
    SnapshotTable.clearManifestCache()
    assert(SnapshotTable.read(spark, bh).count() === 4)
    assert(SnapshotTable.read(spark, path).count() === 3)
  }
}
