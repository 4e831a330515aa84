package graft.lake

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Randomized TRIPLE interleaving of the newest manifest-header
  * features — auto-compaction policy, column mapping (renames), and
  * branches (fork / branch writes / branch renames / fast-forward) —
  * against an in-memory model. Header features compose
  * multiplicatively, and this sequence fuzz is what catches the
  * fastForward-class bugs where a publish site drops or stales a
  * header field: after every op the MAIN state must match the model,
  * the BRANCH state its own model, and at the end every surviving
  * main version must still time-travel to its recorded state.
  *
  * A second fuzz interleaves renames with STREAM drains (each drain a
  * checkpoint-resumed query, i.e. a restart across the rename): every
  * appended row must be streamed exactly once with its VALUE intact —
  * the silent-NULL regression shape of the round-11 streaming-source
  * hole can never come back quietly. */
class HeaderFeatureModelSpec extends SparkTestBase {

  import org.apache.spark.sql.functions._

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // ---- triple fuzz: autoCompact x colmap x branches ----------------

  private sealed trait Kind
  private case object Append extends Kind
  private case object Merge extends Kind
  private case object Rename extends Kind
  private case object AutoToggle extends Kind
  private case object BranchCreate extends Kind
  private case object BranchAppend extends Kind
  private case object BranchRename extends Kind
  private case object FastForward extends Kind

  private case class Op(kind: Kind, part: String, target: Int, n: Int)

  private val genOp: Gen[Op] = for {
    kind <- Gen.frequency(
      4 -> Gen.const(Append: Kind), 2 -> Gen.const(Merge: Kind),
      2 -> Gen.const(Rename: Kind), 2 -> Gen.const(AutoToggle: Kind),
      2 -> Gen.const(BranchCreate: Kind), 3 -> Gen.const(BranchAppend: Kind),
      1 -> Gen.const(BranchRename: Kind), 2 -> Gen.const(FastForward: Kind))
    part <- Gen.oneOf("p1", "p2")
    target <- Gen.choose(0, 7)
    n <- Gen.choose(1, 4)
  } yield Op(kind, part, target, n)

  test("random autoCompact x rename x branch sequences match the model (3 seeds)") {
    (21L to 23L).foreach(runTriple(_, nOps = 12))
  }

  private def runTriple(seed: Long, nOps: Int): Unit = {
    val path = Files.createTempDirectory(s"graft-hdr-model-$seed").toString + "/t"
    val ops = sample(Gen.listOfN(nOps, genOp), seed).zipWithIndex

    var model = Map[String, (String, Double)]()
    var vName = "v"
    var nextBranch = 0
    // one live branch slot: (name, model, vName, mainAdvancedSinceFork)
    var branch: Option[(String, Map[String, (String, Double)], String, Boolean)] = None
    var history = List.empty[(Long, Map[String, (String, Double)], String)]

    def state(handle: String, valueCol: String) =
      SnapshotTable.read(spark, handle)
        .select("id", "k", valueCol).collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2))).toMap

    def mainAdvanced(): Unit =
      branch = branch.map { case (n, m, vn, _) => (n, m, vn, true) }

    def rows(i: Int, op: Op, ids: Seq[String]) = ids.zipWithIndex
      .map { case (id, j) => (id, op.part, i * 100.0 + j) }

    ops.foreach { case (op, i) =>
      op.kind match {
        case Append =>
          val ids = (0 until op.n).map(j => s"op$i-$j")
          SnapshotTable.append(rows(i, op, ids).toDF("id", "k", vName),
            path, Seq("k"))
          model ++= rows(i, op, ids).map { case (id, k, v) => id -> (k, v) }
          mainAdvanced()
        case Merge =>
          // degrade to an append before the table exists
          val target = op.target % math.max(i, 1)
          val ids = (0 until op.n).map(j => s"op$target-$j")
          val df = rows(i, op, ids).toDF("id", "k", vName)
          if (model.isEmpty) SnapshotTable.append(df, path, Seq("k"))
          else SnapshotTable.merge(df, path, Seq("id"), Seq("k"))
          model ++= rows(i, op, ids).map { case (id, k, v) => id -> (k, v) }
          mainAdvanced()
        case Rename =>
          if (model.nonEmpty) {
            val to = if (vName == "v") "w" else "v"
            SnapshotTable.renameColumn(spark, path, vName, to)
            vName = to
            mainAdvanced()
          }
        case AutoToggle =>
          if (model.nonEmpty) {
            // toggle the policy; tiny threshold so bursts COMPACT and
            // the rewrite must preserve state under any mapping
            val on = op.n % 2 == 0
            SnapshotTable.setAutoCompact(spark, path,
              if (on) 2 else 0, 1000L)
            mainAdvanced()
          }
        case BranchCreate =>
          if (model.nonEmpty && branch.isEmpty) {
            val name = s"dev$nextBranch"
            nextBranch += 1
            SnapshotTable.createBranch(spark, path, name)
            branch = Some((name, model, vName, false))
          }
        case BranchAppend =>
          branch.foreach { case (name, bm, bvn, adv) =>
            val ids = (0 until op.n).map(j => s"b$i-$j")
            SnapshotTable.append(rows(i, op, ids).toDF("id", "k", bvn),
              SnapshotTable.branchHandle(path, name), Seq("k"))
            branch = Some((name,
              bm ++ rows(i, op, ids).map { case (id, k, v) => id -> (k, v) },
              bvn, adv))
          }
        case BranchRename =>
          branch.foreach { case (name, bm, bvn, adv) =>
            if (bm.nonEmpty) {
              val to = if (bvn == "v") "w" else "v"
              SnapshotTable.renameColumn(spark,
                SnapshotTable.branchHandle(path, name), bvn, to)
              branch = Some((name, bm, to, adv))
            }
          }
        case FastForward =>
          branch.foreach { case (name, bm, bvn, adv) =>
            if (adv) {
              // main moved since the fork: ff must REFUSE, not mangle
              val e = intercept[IllegalArgumentException](
                SnapshotTable.fastForward(spark, path, name))
              assert(e.getMessage.contains("cherryPick"),
                s"seed=$seed op $i: wrong ff refusal: ${e.getMessage}")
            } else {
              SnapshotTable.fastForward(spark, path, name)
              model = bm
              vName = bvn
            }
            SnapshotTable.dropBranch(spark, path, name)
            branch = None
          }
      }
      if (model.nonEmpty) {
        val ver = SnapshotTable.latestVersion(spark, path).get
        assert(state(path, vName) === model,
          s"seed=$seed after op $i ($op): MAIN diverged from model")
        history = (ver, model, vName) :: history.filterNot(_._1 >= ver)
      }
      branch.foreach { case (name, bm, bvn, _) =>
        if (bm.nonEmpty)
          assert(state(SnapshotTable.branchHandle(path, name), bvn) === bm,
            s"seed=$seed after op $i ($op): BRANCH diverged from model")
      }
    }

    // every surviving main version still time-travels to its state
    SnapshotTable.clearManifestCache()
    history.foreach { case (v, m, n) =>
      val got = SnapshotTable.read(spark, path, Some(v))
        .select("id", "k", n).collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2))).toMap
      assert(got === m, s"seed=$seed version $v diverged on replay")
    }
  }

  // ---- rename x stream interleaving fuzz ---------------------------

  test("random rename x stream-drain sequences deliver every appended row's " +
      "VALUE exactly once across checkpoint restarts (3 seeds)") {
    (31L to 33L).foreach { seed =>
      val base = Files.createTempDirectory(s"graft-rs-model-$seed").toString
      val (path, ckpt) = (s"$base/t", s"$base/ckpt")
      val plan = sample(Gen.listOfN(14, Gen.frequency(
        5 -> Gen.const("append"), 3 -> Gen.const("rename"),
        4 -> Gen.const("drain"))), seed)
      var vName = "v"
      var appended = Map[Long, Double]()
      var streamed = Map[Long, Double]()
      var nextId = 0L
      plan.zipWithIndex.foreach { case (kind, i) =>
        kind match {
          case "append" =>
            val rows = (0 until (i % 3) + 1).map(j => (nextId + j, i * 10.0 + j))
            SnapshotTable.append(rows.toDF("id", vName).coalesce(1), path)
            appended ++= rows
            nextId += rows.size
          case "rename" =>
            if (appended.nonEmpty) {
              val to = if (vName == "v") "w" else "v"
              SnapshotTable.renameColumn(spark, path, vName, to)
              vName = to
            }
          case "drain" =>
            if (appended.nonEmpty) {
              val buf = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
              val q = spark.readStream.format("graft-snapshot").load(path)
                .writeStream
                .option("checkpointLocation", ckpt)
                .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
                .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
                  buf.synchronized {
                    buf ++= df.collect().map(r => (r.getLong(0), r.getDouble(1)))
                  }
                  ()
                }
                .start()
              q.awaitTermination()
              buf.foreach { case (id, v) =>
                assert(!streamed.contains(id),
                  s"seed=$seed drain $i re-emitted id $id")
                streamed += id -> v
              }
            }
        }
      }
      // final drain picks up the tail
      if (appended.nonEmpty) {
        val buf = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
        val q = spark.readStream.format("graft-snapshot").load(path)
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            buf.synchronized {
              buf ++= df.collect().map(r => (r.getLong(0), r.getDouble(1)))
            }
            ()
          }
          .start()
        q.awaitTermination()
        buf.foreach { case (id, v) =>
          assert(!streamed.contains(id), s"seed=$seed final drain re-emitted $id")
          streamed += id -> v
        }
      }
      assert(streamed === appended,
        s"seed=$seed: streamed rows diverged (values NULLed or rows lost)")
    }
  }

  // ---- DML x change-feed-stream replica fuzz -----------------------

  /** A downstream REPLICA maintained purely by applying the streaming
    * change feed must converge to the table after every drain — the
    * end-to-end contract `graft-changes` exists for. Random
    * append/merge/delete/rename sequences; each drain is a
    * checkpoint-resumed AvailableNow query (renames land BETWEEN
    * drains, so each restart adopts the new schema and must serve
    * the pre-rename history's VALUES under it). The replica applies
    * the per-id final state of each drained batch (latest commit
    * wins; presence outranks absence at equal version — the same
    * reduction Ivf.applyChangeBatch ships). */
  test("random DML x change-feed-drain sequences converge a feed-applied replica (3 seeds)") {
    (41L to 43L).foreach { seed =>
      val base = Files.createTempDirectory(s"graft-cdfm-$seed").toString
      val (path, ckpt) = (s"$base/t", s"$base/cdf-ckpt")
      val plan = sample(Gen.listOfN(16, Gen.frequency(
        5 -> Gen.const("append"), 3 -> Gen.const("merge"),
        2 -> Gen.const("delete"), 2 -> Gen.const("rename"),
        4 -> Gen.const("drain"))), seed)
      var vName = "v"
      var table = Map[Long, Double]() // the truth the table should hold
      var replica = Map[Long, Double]() // maintained ONLY from the feed
      var nextId = 0L

      def drain(i: Int): Unit = {
        val rows = scala.collection.mutable.ArrayBuffer[(Long, Double, String, Long)]()
        val q = spark.readStream.format("graft-changes").load(path)
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            rows.synchronized {
              rows ++= df.collect().map(r => (
                r.getLong(r.fieldIndex("id")),
                r.getDouble(r.fieldIndex(vName)),
                r.getString(r.fieldIndex("_change_type")),
                r.getLong(r.fieldIndex("_commit_version"))))
            }
            ()
          }
          .start()
        q.awaitTermination()
        // per-id final state: latest commit wins, presence beats
        // absence at equal version
        rows.groupBy(_._1).foreach { case (id, es) =>
          val (_, value, ct, _) = es.maxBy { case (_, _, ct, cv) =>
            (cv, if (ct == "insert" || ct == "update_postimage") 1 else 0)
          }
          if (ct == "insert" || ct == "update_postimage") replica += id -> value
          else replica -= id
        }
        assert(replica === table,
          s"seed=$seed drain $i: feed-applied replica diverged from table")
      }

      plan.zipWithIndex.foreach { case (kind, i) =>
        kind match {
          case "append" =>
            val rows = (0 until (i % 3) + 1).map(j => (nextId + j, i * 10.0 + j))
            SnapshotTable.append(rows.toDF("id", vName).coalesce(1), path)
            table ++= rows
            nextId += rows.size
          case "merge" if table.nonEmpty =>
            val targets = table.keys.toSeq.sorted.take((i % 2) + 1)
              .map(id => (id, i * 100.0))
            SnapshotTable.merge(targets.toDF("id", vName).coalesce(1),
              path, Seq("id"))
            table ++= targets
          case "delete" if table.nonEmpty =>
            val victim = table.keys.max
            SnapshotTable.delete(spark, path, col("id") === victim)
            table -= victim
          case "rename" if table.nonEmpty =>
            val to = if (vName == "v") "w" else "v"
            SnapshotTable.renameColumn(spark, path, vName, to)
            vName = to
          case "drain" if table.nonEmpty => drain(i)
          case _ => () // op needs an existing table; skip
        }
      }
      if (table.nonEmpty) drain(99)
      assert(replica === table, s"seed=$seed: final replica diverged")
    }
  }
}
