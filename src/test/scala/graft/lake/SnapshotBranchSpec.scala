package graft.lake

import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Writable branches (Iceberg branch refs): fork, isolated divergence,
  * fast-forward / cherry-pick merge-back, and retention safety across
  * refs sharing one data dir. */
class SnapshotBranchSpec extends SparkTestBase {

  import spark.implicits._

  private def mkRows(tag: String, dates: Seq[String]) =
    dates.zipWithIndex.flatMap { case (d, i) =>
      (0 until 5).map(j => (s"$tag-$i-$j", d, 10.0 * j))
    }.toDF("id", "event_date", "v")

  test("branch writes are invisible on main and vice versa") {
    val path = Files.createTempDirectory("graft-br").toString + "/t"
    SnapshotTable.append(mkRows("a", Seq("2024-01-01")), path, Seq("event_date")) // v1
    val fork = SnapshotTable.createBranch(spark, path, "dev")
    assert(fork === 1L)
    assert(SnapshotTable.branches(spark, path) === Seq("dev"))
    val bh = SnapshotTable.branchHandle(path, "dev")

    SnapshotTable.append(mkRows("b", Seq("2024-01-02")), bh, Seq("event_date")) // branch v2
    SnapshotTable.delete(spark, bh, col("v") >= 40.0)                           // branch v3
    SnapshotTable.append(mkRows("c", Seq("2024-01-03")), path, Seq("event_date")) // main v2

    // main: a + c rows, untouched by the branch delete
    assert(SnapshotTable.read(spark, path).count() === 10)
    assert(SnapshotTable.read(spark, path).filter(col("v") >= 40.0).count() === 2)
    // branch: a + b rows minus the deleted ones; main's c append invisible
    val br = SnapshotTable.read(spark, bh)
    assert(br.count() === 8)
    assert(br.filter(col("id").startsWith("c-")).count() === 0)
    assert(SnapshotTable.versions(spark, bh) === Seq(1L, 2L, 3L))
  }

  test("createBranch from a tag; dropBranch removes the ref") {
    val path = Files.createTempDirectory("graft-br-tag").toString + "/t"
    SnapshotTable.append(mkRows("a", Seq("2024-01-01")), path, Seq("event_date")) // v1
    SnapshotTable.tag(spark, path, "golden")
    SnapshotTable.append(mkRows("b", Seq("2024-01-02")), path, Seq("event_date")) // v2
    val fork = SnapshotTable.createBranch(spark, path, "audit", tagName = Some("golden"))
    assert(fork === 1L)
    val bh = SnapshotTable.branchHandle(path, "audit")
    assert(SnapshotTable.read(spark, bh).count() === 5) // tag state, not head
    SnapshotTable.dropBranch(spark, path, "audit")
    assert(SnapshotTable.branches(spark, path) === Nil)
    intercept[IllegalArgumentException] {
      SnapshotTable.dropBranch(spark, path, "audit")
    }
  }

  test("fastForward replays branch history onto an unmoved main, ops preserved") {
    val path = Files.createTempDirectory("graft-br-ff").toString + "/t"
    SnapshotTable.append(mkRows("a", Seq("2024-01-01")), path, Seq("event_date")) // v1
    SnapshotTable.createBranch(spark, path, "dev")
    val bh = SnapshotTable.branchHandle(path, "dev")
    SnapshotTable.append(mkRows("b", Seq("2024-01-02")), bh, Seq("event_date")) // v2
    SnapshotTable.delete(spark, bh, col("v") >= 40.0)                           // v3

    val head = SnapshotTable.fastForward(spark, path, "dev")
    assert(head === 3L)
    assert(SnapshotTable.read(spark, path).count() === 8)
    // commit-by-commit history with original ops, not one squash
    assert(SnapshotTable.opOf(spark, path, 2L) === Some("append"))
    assert(SnapshotTable.opOf(spark, path, 3L) === Some("delete"))
    // zero rewrite: main head references the branch's exact file set
    assert(SnapshotTable.liveFiles(spark, path).toSet ===
      SnapshotTable.liveFiles(spark, bh).toSet)
    // the intermediate branch state is time-travelable on main too
    assert(SnapshotTable.read(spark, path, Some(2L)).count() === 10)
  }

  test("fastForward preserves merge opKeys: CDF update images classify identically on main") {
    val path = Files.createTempDirectory("graft-br-ffk").toString + "/t"
    SnapshotTable.append(mkRows("a", Seq("2024-01-01")).coalesce(1), path)      // v1
    SnapshotTable.createBranch(spark, path, "dev")
    val bh = SnapshotTable.branchHandle(path, "dev")
    val upd = Seq(("a-0-0", "2024-01-01", 99.0)).toDF("id", "event_date", "v")
    SnapshotTable.merge(upd.coalesce(1), bh, Seq("id"))                         // branch v2
    val branchTags = SnapshotTable.changes(spark, bh, 1L, 2L)
      .select("_change_type").as[String].collect().sorted.toSeq
    assert(branchTags.contains("update_preimage") &&
      branchTags.contains("update_postimage"))
    SnapshotTable.fastForward(spark, path, "dev")
    // the SAME logical commit must classify the same on main — the
    // replay carries the merge's #opKeys header
    val mainTags = SnapshotTable.changes(spark, path, 1L, 2L)
      .select("_change_type").as[String].collect().sorted.toSeq
    assert(mainTags === branchTags,
      s"fastForward dropped opKeys: main=$mainTags branch=$branchTags")
  }

  test("fastForward refuses a diverged main; cherryPick applies the append") {
    val path = Files.createTempDirectory("graft-br-cp").toString + "/t"
    SnapshotTable.append(mkRows("a", Seq("2024-01-01")), path, Seq("event_date")) // v1
    SnapshotTable.createBranch(spark, path, "dev")
    val bh = SnapshotTable.branchHandle(path, "dev")
    SnapshotTable.append(mkRows("b", Seq("2024-01-02")), bh, Seq("event_date")) // branch v2
    SnapshotTable.append(mkRows("m", Seq("2024-02-01")), path, Seq("event_date")) // main v2

    val ex = intercept[IllegalArgumentException] {
      SnapshotTable.fastForward(spark, path, "dev")
    }
    assert(ex.getMessage.contains("cherryPick"))

    val v = SnapshotTable.cherryPick(spark, path, "dev", 2L)
    assert(v === 3L)
    val main = SnapshotTable.read(spark, path)
    assert(main.count() === 15) // a + m + picked b
    assert(main.filter(col("id").startsWith("b-")).count() === 5)
    assert(SnapshotTable.opOf(spark, path, 3L) === Some("cherrypick-append"))
    // double-pick guard
    val dup = intercept[IllegalArgumentException] {
      SnapshotTable.cherryPick(spark, path, "dev", 2L)
    }
    assert(dup.getMessage.contains("already picked"))
  }

  test("cherryPick conflicts when main rewrote the same files") {
    val path = Files.createTempDirectory("graft-br-cf").toString + "/t"
    // single data file, so both deletes below PROVABLY touch it —
    // a multi-file fixture can route the two predicates to disjoint
    // files, where no conflict exists and the pick rightly succeeds
    SnapshotTable.append(mkRows("a", Seq("2024-01-01")).coalesce(1),
      path, Seq("event_date"))                                                  // v1
    val v1Files = SnapshotTable.liveFiles(spark, path).toSet
    assert(v1Files.size === 1, "fixture must be a single file for a true conflict")
    SnapshotTable.createBranch(spark, path, "dev")
    val bh = SnapshotTable.branchHandle(path, "dev")
    SnapshotTable.delete(spark, bh, col("v") >= 40.0)   // branch rewrites THE file
    SnapshotTable.delete(spark, path, col("v") <= 0.0)  // main rewrites it too
    // non-vacuous premise: both refs replaced the same v1 file state
    assert(!SnapshotTable.liveFiles(spark, path).toSet.exists(v1Files),
      "main delete must have rewritten the v1 file")
    assert(!SnapshotTable.liveFiles(spark, bh).toSet.exists(v1Files),
      "branch delete must have rewritten the v1 file")

    val ex = intercept[IllegalArgumentException] {
      SnapshotTable.cherryPick(spark, path, "dev", 2L)
    }
    assert(ex.getMessage.contains("conflict"))
    // picking the fork base itself is meaningless and refused
    intercept[IllegalArgumentException] {
      SnapshotTable.cherryPick(spark, path, "dev", 1L)
    }
  }

  test("vacuum on main never deletes files a branch still references") {
    val path = Files.createTempDirectory("graft-br-vac").toString + "/t"
    SnapshotTable.append(mkRows("a", Seq("2024-01-01")), path, Seq("event_date")) // v1
    SnapshotTable.createBranch(spark, path, "dev")
    val bh = SnapshotTable.branchHandle(path, "dev")
    // main replaces everything: v1's files are dead on main...
    SnapshotTable.overwritePartitions(
      mkRows("x", Seq("2024-01-01")), path, Seq("event_date"))                  // v2
    SnapshotTable.vacuum(spark, path, keepVersions = 1)
    // ...but still live on the branch, so the branch read survives
    assert(SnapshotTable.read(spark, bh).count() === 5)
    assert(SnapshotTable.read(spark, bh).filter(col("id").startsWith("a-")).count() === 5)

    // after the branch is dropped the same vacuum reclaims them
    SnapshotTable.dropBranch(spark, path, "dev")
    SnapshotTable.append(mkRows("y", Seq("2024-01-02")), path, Seq("event_date")) // v3
    SnapshotTable.vacuum(spark, path, keepVersions = 1)
    def norm(p: String) = new org.apache.hadoop.fs.Path(p).toUri.getPath
    val liveNow = SnapshotTable.liveFiles(spark, path).map(norm).toSet
    val f = SnapshotTable.fs(spark, path)
    val onDisk = f.globStatus(new org.apache.hadoop.fs.Path(s"$path/data/*/*/*.parquet"))
      .map(st => norm(st.getPath.toString)).toSet
    assert((onDisk -- liveNow).isEmpty, "dropped-branch-only files must be reclaimed")
  }

  test("concurrent main and branch writers never cross-talk or lose commits") {
    // branches share the data dir and the commit-lock namespace with
    // main, but their logs are separate CAS domains: N writers on
    // each ref, all racing, must all land — on their OWN ref
    val path = Files.createTempDirectory("graft-br-race").toString + "/t"
    SnapshotTable.append(mkRows("a", Seq("2024-01-01")), path, Seq("event_date")) // v1
    SnapshotTable.createBranch(spark, path, "dev")
    val bh = SnapshotTable.branchHandle(path, "dev")
    val n = 3
    val writers = (1 to n).flatMap { i =>
      Seq(
        Future { SnapshotTable.append(
          mkRows(s"m$i", Seq(s"2024-02-0$i")), path, Seq("event_date")) },
        Future { SnapshotTable.append(
          mkRows(s"b$i", Seq(s"2024-03-0$i")), bh, Seq("event_date")) })
    }
    writers.foreach(Await.result(_, 120.seconds))
    // every commit landed: v1 + n appends per ref, versions contiguous
    assert(SnapshotTable.versions(spark, path) === (1L to (n + 1L)))
    assert(SnapshotTable.versions(spark, bh) === (1L to (n + 1L)))
    val main = SnapshotTable.read(spark, path)
    val branch = SnapshotTable.read(spark, bh)
    assert(main.count() === 5L * (n + 1))
    assert(branch.count() === 5L * (n + 1))
    // isolation: no b- rows on main, no m- rows on the branch
    assert(main.filter(col("id").startsWith("b")).count() === 0)
    assert(branch.filter(col("id").startsWith("m")).count() === 0)
  }

  test("racing createBranch: exactly one of two same-name forks wins") {
    val path = Files.createTempDirectory("graft-br-race2").toString + "/t"
    SnapshotTable.append(mkRows("a", Seq("2024-01-01")), path, Seq("event_date"))
    val attempts = (1 to 2).map(_ => Future {
      scala.util.Try(SnapshotTable.createBranch(spark, path, "dev"))
    })
    val results = attempts.map(Await.result(_, 60.seconds))
    assert(results.count(_.isSuccess) === 1,
      s"expected exactly one winner, got: $results")
    assert(SnapshotTable.branches(spark, path) === Seq("dev"))
    assert(SnapshotTable.versions(spark,
      SnapshotTable.branchHandle(path, "dev")) === Seq(1L))
  }

  test("a write through a dropped or unknown branch handle does not re-create it") {
    val path = Files.createTempDirectory("graft-br-stale").toString + "/t"
    SnapshotTable.append(mkRows("a", Seq("2024-01-01")), path, Seq("event_date"))
    SnapshotTable.createBranch(spark, path, "dev")
    val bh = SnapshotTable.branchHandle(path, "dev")
    SnapshotTable.dropBranch(spark, path, "dev")
    // stale handle: the append must fail loudly, not resurrect the
    // branch as a fresh one-commit history
    val ex = intercept[IllegalArgumentException] {
      SnapshotTable.append(mkRows("b", Seq("2024-01-02")), bh, Seq("event_date"))
    }
    assert(ex.getMessage.contains("createBranch first"))
    assert(SnapshotTable.branches(spark, path) === Nil)
    // unknown branch name: same refusal
    intercept[IllegalArgumentException] {
      SnapshotTable.append(mkRows("c", Seq("2024-01-03")),
        SnapshotTable.branchHandle(path, "nope"), Seq("event_date"))
    }
    // main is untouched
    assert(SnapshotTable.read(spark, path).count() === 5)
  }

  test("tags and branches share one ref namespace") {
    val path = Files.createTempDirectory("graft-br-ns").toString + "/t"
    SnapshotTable.append(mkRows("a", Seq("2024-01-01")), path, Seq("event_date"))
    SnapshotTable.createBranch(spark, path, "dev")
    SnapshotTable.tag(spark, path, "golden")
    // a tag may not shadow a branch: VERSION AS OF 'dev' would
    // silently read the pinned tag instead of the branch head
    val e1 = intercept[IllegalArgumentException] {
      SnapshotTable.tag(spark, path, "dev")
    }
    assert(e1.getMessage.contains("namespace"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotTable.createBranch(spark, path, "golden")
    }
    assert(e2.getMessage.contains("namespace"))
    // both refs still resolve to their own kind
    assert(SnapshotTable.resolveRef(spark, path, "dev") ===
      Some((SnapshotTable.branchHandle(path, "dev"), None)))
    assert(SnapshotTable.resolveRef(spark, path, "golden") === Some((path, Some(1L))))
  }

  test("branch-ref versioned loadTable is structurally write-blocked") {
    // VERSION AS OF '<branch>' pins no version (it reads the branch
    // head), so the pinnedVersion guard alone would let a write
    // through — the readOnly flag must block it
    val t = GraftTable("ns.t", "/nonexistent", pinnedVersion = None, readOnly = true)
    val ex = intercept[IllegalArgumentException] {
      t.newWriteBuilder(null)
    }
    assert(ex.getMessage.contains("branch-ref"))
  }

  test("streaming source follows a branch through its handle, blind to main") {
    val path = Files.createTempDirectory("graft-br-stream").toString + "/t"
    SnapshotTable.append(mkRows("a", Seq("2024-01-01")), path, Seq("event_date")) // v1
    SnapshotTable.createBranch(spark, path, "dev")
    val bh = SnapshotTable.branchHandle(path, "dev")
    SnapshotTable.append(mkRows("b", Seq("2024-01-02")), bh, Seq("event_date"))   // branch v2
    SnapshotTable.append(mkRows("m", Seq("2024-02-01")), path, Seq("event_date")) // main v2

    val q = spark.readStream.format("graft-snapshot").load(bh)
      .writeStream.format("memory").queryName("br_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("br_stream")
    // bootstrap = the branch's history: fork base + branch append;
    // main's divergent append never reaches the branch stream
    assert(got.count() === 10)
    assert(got.filter(col("id").startsWith("m")).count() === 0)
    assert(got.filter(col("id").startsWith("b")).count() === 5)
  }

  test("vacuum through a branch handle only touches branch manifests, pins main") {
    val path = Files.createTempDirectory("graft-br-vac2").toString + "/t"
    SnapshotTable.append(mkRows("a", Seq("2024-01-01")), path, Seq("event_date")) // v1
    SnapshotTable.createBranch(spark, path, "dev")
    val bh = SnapshotTable.branchHandle(path, "dev")
    SnapshotTable.overwritePartitions(
      mkRows("b", Seq("2024-01-01")), bh, Seq("event_date")) // branch v2: a's files dead on branch
    SnapshotTable.vacuum(spark, bh, keepVersions = 1)
    // branch history trimmed to its head...
    assert(SnapshotTable.versions(spark, bh) === Seq(2L))
    // ...but main (which still lives on a's files) is untouched
    assert(SnapshotTable.read(spark, path).count() === 5)
    assert(SnapshotTable.read(spark, path).filter(col("id").startsWith("a-")).count() === 5)
  }
}
