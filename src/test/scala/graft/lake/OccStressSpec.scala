package graft.lake

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Optimistic-concurrency STRESS: the CAS commit loop
  * (SnapshotTable.commit), the write-skew guards on the rewrite
  * paths, and the lease-break lock under real thread contention —
  * the multi-writer semantics a 1000-executor deployment's drivers
  * rely on, adversarially exercised rather than assumed. */
class OccStressSpec extends SparkTestBase {

  import spark.implicits._

  test("8 threads x 3 disjoint-partition appends: versions dense, no lost update") {
    val path = Files.createTempDirectory("graft-occ-app").toString + "/t"
    val errs = new ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { tid =>
      new Thread(() =>
        try (1 to 3).foreach { j =>
          SnapshotTable.append(
            Seq((s"t$tid-$j", tid.toLong)).toDF("id", "p").coalesce(1),
            path, Seq("p"))
        } catch { case t: Throwable => errs.add(t); () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"contended appends failed: ${errs.peek()}")
    // linearized log: exactly one commit per attempt, no gaps, no
    // overwrites (a lost CAS would leave a gap or a missing row)
    assert(SnapshotTable.versions(spark, path) === (1L to 24L))
    val got = SnapshotTable.read(spark, path)
    assert(got.count() === 24)
    assert(got.select("id").as[String].collect().toSet ===
      (for (t <- 1 to 8; j <- 1 to 3) yield s"t$t-$j").toSet)
    // every version's manifest parses and carries the schema forward
    (1L to 24L).foreach { v =>
      assert(SnapshotTable.read(spark, path, Some(v)).count() === v)
    }
  }

  test("conflicting merge pair: loser aborts with the write-skew guard, rerun lands both") {
    val path = Files.createTempDirectory("graft-occ-mrg").toString + "/t"
    // one file so both merges PROVABLY rewrite the same file state
    SnapshotTable.append(
      (1 to 20).map(i => (i.toLong, 0.0)).toDF("k", "v").coalesce(1), path)
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val errs = new ConcurrentLinkedQueue[Throwable]()
    def mergeWave(keys: Seq[Long], value: Double): Thread = new Thread(() => {
      val src = keys.map((_, value)).toDF("k", "v").coalesce(1)
      gate.await()
      try SnapshotTable.merge(src, path, Seq("k"))
      catch {
        case t: Throwable if Option(t.getMessage)
            .exists(_.contains("concurrent commit advanced")) =>
          // the documented contract: the loser reruns against the
          // winner's base
          try SnapshotTable.merge(src, path, Seq("k"))
          catch { case u: Throwable => errs.add(u); () }
        case t: Throwable => errs.add(t); ()
      }
    })
    val a = mergeWave(Seq(1L, 2L), 10.0)
    val b = mergeWave(Seq(2L, 3L), 20.0)
    a.start(); b.start(); a.join(); b.join()
    assert(errs.isEmpty, s"merge contention broke: ${errs.peek()}")
    val byK = SnapshotTable.read(spark, path)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byK.size === 20, "merge contention lost or duplicated rows")
    // k=1 took wave A, k=3 wave B; k=2 took WHICHEVER ran last —
    // never a torn mix, never the base value
    assert(byK(1L) === 10.0 && byK(3L) === 20.0)
    assert(byK(2L) === 10.0 || byK(2L) === 20.0)
    assert((4L to 20L).forall(k => byK(k) === 0.0))
  }

  test("conflicting CLAUSE merges: same write-skew guard, rerun converges") {
    val path = Files.createTempDirectory("graft-occ-mc").toString + "/t"
    SnapshotTable.append(
      (1 to 20).map(i => (i.toLong, 0.0)).toDF("k", "v").coalesce(1), path)
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val errs = new ConcurrentLinkedQueue[Throwable]()
    def wave(keys: Seq[Long], value: Double): Thread = new Thread(() => {
      val src = keys.map((_, value)).toDF("k", "nv").coalesce(1)
      def go(): Unit = SnapshotTable.mergeClauses(src, path, Seq("k"),
        matched = Seq(MergeUpdate(Some(col("s.nv") > col("t.v")),
          Seq("v" -> col("s.nv")))))
      gate.await()
      try go()
      catch {
        case t: Throwable if Option(t.getMessage)
            .exists(_.contains("concurrent commit advanced")) =>
          try go() catch { case u: Throwable => errs.add(u); () }
        case t: Throwable => errs.add(t); ()
      }
    })
    val a = wave(Seq(1L, 2L), 10.0)
    val b = wave(Seq(2L, 3L), 20.0)
    a.start(); b.start(); a.join(); b.join()
    assert(errs.isEmpty, s"clause-merge contention broke: ${errs.peek()}")
    val byK = SnapshotTable.read(spark, path)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byK.size === 20, "clause-merge contention lost or duplicated rows")
    // both conditions fire against v=0, and k=2's SECOND wave also
    // fires against the first wave's value only if larger — so k=2
    // must end at the MAX of whichever orders the CAS linearized
    assert(byK(1L) === 10.0 && byK(3L) === 20.0 && byK(2L) === 20.0)
    assert((4L to 20L).forall(k => byK(k) === 0.0))
  }

  test("append racing a delete: the delete's rerun contract holds, no resurrection") {
    val path = Files.createTempDirectory("graft-occ-del").toString + "/t"
    SnapshotTable.append(
      (1 to 10).map(i => (i.toLong, "base")).toDF("k", "s").coalesce(1), path)
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val errs = new ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() => {
      gate.await()
      try SnapshotTable.append(Seq((100L, "late")).toDF("k", "s").coalesce(1), path)
      catch { case t: Throwable => errs.add(t); () }
    })
    val deleter = new Thread(() => {
      gate.await()
      try SnapshotTable.delete(spark, path, col("k") <= 5L)
      catch {
        case t: Throwable if Option(t.getMessage)
            .exists(_.contains("concurrent commit advanced")) =>
          try SnapshotTable.delete(spark, path, col("k") <= 5L)
          catch { case u: Throwable => errs.add(u); () }
        case t: Throwable => errs.add(t); ()
      }
    })
    appender.start(); deleter.start(); appender.join(); deleter.join()
    assert(errs.isEmpty, s"append/delete race broke: ${errs.peek()}")
    val ks = SnapshotTable.read(spark, path).select("k").as[Long].collect().toSet
    assert(ks === ((6L to 10L).toSet + 100L),
      s"race lost a commit or resurrected deleted rows: $ks")
  }

  test("lease-break fuzz: short-lease lock + planted dead holder, 6 contending writers") {
    val path = Files.createTempDirectory("graft-occ-lock").toString + "/t"
    // non-atomic publish (object-store simulation) forces every
    // commit through the lock; a mutual-exclusion failure would lose
    // a version (both "winning" the same CAS) and fail the density
    // assert below
    sys.props("graft.snapshot.testForceNonAtomic") = "true"
    SnapshotTable.setLockProvider(Some(
      new FileCommitLockProvider(leaseMs = 400L, acquireTimeoutMs = 60000L)))
    try {
      // plant a crashed holder's stale lock: the first acquirer must
      // token-break it, racing the other five
      val lockFile = java.nio.file.Paths.get(s"$path/_graft_log/.commit.lock")
      java.nio.file.Files.createDirectories(lockFile.getParent)
      java.nio.file.Files.write(lockFile, "dead-holder".getBytes("UTF-8"))
      java.nio.file.Files.setLastModifiedTime(lockFile,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 10000L))
      val errs = new ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 6).map { tid =>
        new Thread(() =>
          try (1 to 2).foreach { j =>
            SnapshotTable.append(
              Seq((s"t$tid-$j", tid.toLong)).toDF("id", "p").coalesce(1), path)
          } catch { case t: Throwable => errs.add(t); () })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(errs.isEmpty, s"lock fuzz failed: ${errs.peek()}")
      assert(SnapshotTable.versions(spark, path) === (1L to 12L))
      assert(SnapshotTable.read(spark, path).count() === 12)
      assert(!java.nio.file.Files.exists(lockFile), "lock not released")
    } finally {
      sys.props.remove("graft.snapshot.testForceNonAtomic")
      SnapshotTable.setLockProvider(None)
    }
  }

  test("constraint added mid-stream is enforced by every later contended commit") {
    val path = Files.createTempDirectory("graft-occ-cs").toString + "/t"
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v").coalesce(1), path)
    val errs = new ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() =>
      try (2 to 9).foreach { i =>
        SnapshotTable.append(Seq((i.toLong, i * 1.0)).toDF("k", "v").coalesce(1), path)
      } catch { case t: Throwable => errs.add(t); () })
    val constrainer = new Thread(() =>
      try SnapshotTable.addCheckConstraint(spark, path, "v_pos", "v > 0")
      catch { case t: Throwable => errs.add(t); () })
    appender.start(); constrainer.start(); appender.join(); constrainer.join()
    assert(errs.isEmpty, s"constraint race broke: ${errs.peek()}")
    // the constraint survived every later carry-over recompute…
    assert(SnapshotTable.checkConstraints(spark, path).contains("v_pos"))
    assert(SnapshotTable.read(spark, path).count() === 9)
    // …and is enforced on the next write
    intercept[Exception] {
      SnapshotTable.append(Seq((99L, -1.0)).toDF("k", "v").coalesce(1), path)
    }
  }

  test("8 contending appends on a ROW-TRACKING table: bases disjoint, ids " +
      "dense, watermark = total rows (CAS retries recompute, never collide)") {
    import org.apache.spark.sql.types._
    val path = Files.createTempDirectory("graft-occ-rid").toString + "/t"
    SnapshotTable.create(spark, path, StructType(Seq(
      StructField("id", StringType), StructField("p", LongType))),
      rowTracking = true)
    val errs = new ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { tid =>
      new Thread(() =>
        try (1 to 3).foreach { j =>
          SnapshotTable.append(
            (1 to 5).map(r => (s"t$tid-$j-$r", tid.toLong)).toDF("id", "p")
              .coalesce(1), path)
        } catch { case t: Throwable => errs.add(t); () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"contended tracked appends failed: ${errs.peek()}")
    val ids = SnapshotTable.readWithRowIds(spark, path)
      .select(SnapshotTable.RowIdCol).as[Long].collect().toSeq.sorted
    // 8 x 3 x 5 rows: every id unique AND dense — a CAS loser that
    // failed to recompute its base would duplicate or gap the range
    assert(ids === (0L until 120L),
      s"expected dense 0..119, got ${ids.take(5)}..${ids.takeRight(5)}")
    assert(SnapshotTable.nextRowId(spark, path) === 120L)
  }

  test("concurrent IDENTITY appends: values unique, watermark = sum of rows") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.util.IdentityColumn
    val path = Files.createTempDirectory("graft-occ-ident").toString + "/t"
    SnapshotTable.create(spark, path, StructType(Seq(
      StructField("sid", LongType, nullable = true, new MetadataBuilder()
        .putLong(IdentityColumn.IDENTITY_INFO_START, 1L)
        .putLong(IdentityColumn.IDENTITY_INFO_STEP, 1L)
        .putBoolean(IdentityColumn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT, false)
        .build()),
      StructField("k", StringType))))
    val errs = new ConcurrentLinkedQueue[Throwable]()
    // the identity CAS guard makes a loser FAIL with a rerun message
    // (its values were baked from a stale watermark; silently
    // renumbering is impossible) — the caller's contract is to rerun,
    // which recomputes the whole write from the fresh watermark
    def rerunning(body: => Unit): Unit = {
      var tries = 0
      var done = false
      while (!done) {
        try { body; done = true }
        catch {
          case t: Throwable if tries < 50 &&
              Option(t.getMessage).exists(_.contains("rerun")) =>
            tries += 1
        }
      }
    }
    val threads = (1 to 6).map { tid =>
      new Thread(() =>
        try (1 to 2).foreach { j =>
          rerunning(SnapshotTable.append(
            (1 to 4).map(r => s"t$tid-$j-$r").toDF("k").coalesce(1), path))
        } catch { case t: Throwable => errs.add(t); () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"contended identity appends failed: ${errs.peek()}")
    // 6 x 2 x 4 = 48 rows, unique and within the advanced watermark
    val sids = SnapshotTable.read(spark, path)
      .select("sid").as[Long].collect().toSeq.sorted
    assert(sids.size === 48 && sids.distinct.size === 48,
      s"identity values must be unique under contention, got dupes")
    assert(sids === (1L to 48L),
      "per-commit-dense assignment over a linearized log is globally dense")
  }
}
