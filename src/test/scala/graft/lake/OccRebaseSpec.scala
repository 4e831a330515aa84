package graft.lake

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** One single-use scan gate per test (the DvRaceGates pattern): the
  * first task to evaluate the gated UDF parks until the test injects
  * a concurrent commit, making the interleavings DETERMINISTIC — the
  * concurrent commit provably lands between the DML's planning read
  * and its publish. */
private[lake] class ScanGate {
  val scanning = new CountDownLatch(1)
  val proceed = new CountDownLatch(1)
  private val fired = new AtomicBoolean(false)
  def enter(): Unit =
    if (fired.compareAndSet(false, true)) {
      scanning.countDown()
      proceed.await(60, TimeUnit.SECONDS)
      ()
    }
}
private[lake] object RebaseGates {
  val upd = new ScanGate
  val mrg = new ScanGate
  val dv = new ScanGate
  val upd2 = new ScanGate
  val conflict = new ScanGate
}

/** File-disjoint OCC AUTO-REBASE (Delta ConflictChecker at
  * WriteSerializable): a rewriting DML whose CAS loses to a commit
  * that touched only OTHER files rebases internally and commits —
  * zero user-visible reruns — while a concurrent change to a file the
  * DML rewrites still aborts loudly under the rerun contract. */
class OccRebaseSpec extends SparkTestBase {

  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-rebase-$tag").toString + "/t"

  test("append landing mid-update rebases: both commit, zero reruns") {
    val path = fresh("upd")
    SnapshotTable.append(
      Seq((1L, 1L, 0.0), (2L, 2L, 0.0)).toDF("k", "p", "v"), path, Seq("p"))
    val gate = udf((p: Long) => { RebaseGates.upd.enter(); p == 1L })
    val upd = Future {
      SnapshotTable.update(spark, path, Seq("v" -> lit(9.0)), gate(col("p")))
    }
    assert(RebaseGates.upd.scanning.await(60, TimeUnit.SECONDS),
      "update never started scanning")
    // concurrent blind append: new file only — disjoint by construction
    SnapshotTable.append(Seq((99L, 99L, 0.5)).toDF("k", "p", "v"), path, Seq("p"))
    RebaseGates.upd.proceed.countDown()
    // no exception: the update auto-rebased over the append
    Await.result(upd, 120.seconds)
    val got = SnapshotTable.read(spark, path).select("k", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 9.0, 2L -> 0.0, 99L -> 0.5),
      "rebase lost the append or the update")
    assert(SnapshotTable.versions(spark, path) === (1L to 3L))
  }

  test("append landing mid-merge rebases (the append-during-merge case)") {
    val path = fresh("mrg")
    SnapshotTable.append(
      Seq((1L, 0.0), (2L, 0.0)).toDF("k", "v").coalesce(1), path)
    val gate = udf((k: Long) => { RebaseGates.mrg.enter(); k })
    val src = Seq((1L, 10.0)).toDF("k", "v").withColumn("k", gate(col("k")))
    val mrg = Future { SnapshotTable.merge(src, path, Seq("k")) }
    assert(RebaseGates.mrg.scanning.await(60, TimeUnit.SECONDS),
      "merge never started scanning its source")
    SnapshotTable.append(Seq((50L, 5.0)).toDF("k", "v").coalesce(1), path)
    RebaseGates.mrg.proceed.countDown()
    Await.result(mrg, 120.seconds)
    val got = SnapshotTable.read(spark, path)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 10.0, 2L -> 0.0, 50L -> 5.0),
      "rebase lost the append or the merge")
  }

  test("append landing mid-deleteWithVectors rebases") {
    val path = fresh("dv")
    SnapshotTable.append(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1), path)
    val gate = udf((k: Long) => { RebaseGates.dv.enter(); k == 1L })
    val del = Future {
      SnapshotTable.deleteWithVectors(spark, path, gate(col("k")))
    }
    assert(RebaseGates.dv.scanning.await(60, TimeUnit.SECONDS),
      "dv delete never started scanning")
    SnapshotTable.append(Seq((50L, "late")).toDF("k", "s").coalesce(1), path)
    RebaseGates.dv.proceed.countDown()
    Await.result(del, 120.seconds)
    val ks = SnapshotTable.read(spark, path).select("k").as[Long].collect().toSet
    assert(ks === Set(2L, 50L), "dv rebase lost the append or resurrected the row")
  }

  test("updates on DISJOINT partitions both commit, zero reruns") {
    val path = fresh("disj")
    SnapshotTable.append(
      Seq((1L, 1L, 0.0), (2L, 2L, 0.0)).toDF("k", "p", "v"), path, Seq("p"))
    val gate = udf((p: Long) => { RebaseGates.upd2.enter(); p == 1L })
    val a = Future {
      SnapshotTable.update(spark, path, Seq("v" -> lit(9.0)), gate(col("p")))
    }
    assert(RebaseGates.upd2.scanning.await(60, TimeUnit.SECONDS))
    // p=2's file is not in A's rewrite set → A rebases over this commit
    SnapshotTable.update(spark, path, Seq("v" -> lit(7.0)), col("p") === 2L)
    RebaseGates.upd2.proceed.countDown()
    Await.result(a, 120.seconds)
    val got = SnapshotTable.read(spark, path).select("k", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 9.0, 2L -> 7.0), "a disjoint update was lost")
  }

  test("SAME-file rewrites still conflict deterministically") {
    val path = fresh("conf")
    SnapshotTable.append(
      Seq((1L, 0.0), (2L, 0.0)).toDF("k", "v").coalesce(1), path)
    val gate = udf((k: Long) => { RebaseGates.conflict.enter(); k == 1L })
    val a = Future {
      SnapshotTable.update(spark, path, Seq("v" -> lit(9.0)), gate(col("k")))
    }
    assert(RebaseGates.conflict.scanning.await(60, TimeUnit.SECONDS))
    // same single file — B rewrites the file A is also rewriting
    SnapshotTable.update(spark, path, Seq("v" -> lit(7.0)), col("k") === 2L)
    RebaseGates.conflict.proceed.countDown()
    val ex = intercept[IllegalArgumentException] { Await.result(a, 120.seconds) }
    assert(ex.getMessage.contains("concurrent commit advanced") &&
      ex.getMessage.contains("also rewrites"), ex.getMessage)
    // the winner's effect is intact; the loser published nothing
    val got = SnapshotTable.read(spark, path)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 0.0, 2L -> 7.0))
  }

  test("mixed writers on disjoint partitions: appends + updates all commit, no catches") {
    // 3 appenders (fresh partitions) + 2 updaters (their own settled
    // partitions) race with NO conflict handling in the callers: under
    // the rebase contract every one of these commits first try or
    // after internal rebase — any user-visible conflict fails the test
    val path = fresh("mixed")
    SnapshotTable.append(
      Seq((1L, 1L, 0.0), (2L, 2L, 0.0)).toDF("k", "p", "v"), path, Seq("p"))
    val gate = new java.util.concurrent.CyclicBarrier(5)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appenders = (1 to 3).map { i =>
      new Thread(() => {
        gate.await()
        try (0 until 2).foreach { j =>
          SnapshotTable.append(
            Seq((100L * i + j, 100L * i + j, 1.0)).toDF("k", "p", "v"),
            path, Seq("p"))
        } catch { case t: Throwable => errs.add(t); () }
      })
    }
    val updaters = Seq(1L, 2L).map { part =>
      new Thread(() => {
        gate.await()
        try {
          SnapshotTable.update(spark, path, Seq("v" -> lit(part * 10.0)),
            col("p") === part)
          ()
        } catch { case t: Throwable => errs.add(t); () }
      })
    }
    (appenders ++ updaters).foreach(_.start())
    (appenders ++ updaters).foreach(_.join())
    assert(errs.isEmpty, s"disjoint mixed writers conflicted: ${errs.peek()}")
    val got = SnapshotTable.read(spark, path).select("k", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 10.0 && got(2L) === 20.0, "an update was lost")
    assert(got.size === 8, s"an append was lost: ${got.keySet.toSeq.sorted}")
  }

  test("compaction racing appends never loses an appended row") {
    val path = fresh("cmp")
    (1 to 4).foreach { i =>
      SnapshotTable.append(Seq((i.toLong, s"r$i")).toDF("k", "s").coalesce(1), path)
    }
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() => {
      gate.await()
      try (5 to 8).foreach { i =>
        SnapshotTable.append(Seq((i.toLong, s"r$i")).toDF("k", "s").coalesce(1), path)
      } catch { case t: Throwable => errs.add(t); () }
    })
    val compactor = new Thread(() => {
      gate.await()
      try { SnapshotTable.compact(spark, path, numFiles = 2); () }
      catch {
        // a concurrent rewrite of a file the compaction claims is a
        // legitimate conflict; appends alone never are
        case t: Throwable if Option(t.getMessage)
            .exists(_.contains("concurrent commit advanced")) =>
          errs.add(t); ()
        case t: Throwable => errs.add(t); ()
      }
    })
    appender.start(); compactor.start(); appender.join(); compactor.join()
    assert(errs.isEmpty, s"compaction/append race broke: ${errs.peek()}")
    val ks = SnapshotTable.read(spark, path).select("k").as[Long].collect().toSet
    assert(ks === (1L to 8L).toSet, "compaction rebase lost an appended row")
  }
}
