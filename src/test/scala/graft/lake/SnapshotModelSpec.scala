package graft.lake

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Model-based property test for the snapshot layer: a random
  * sequence of append / overwritePartitions / merge / restore ops is applied
  * both to a real SnapshotTable and to a trivial in-memory model
  * (id → (partition, value)); after every op, the latest table state
  * must equal the model, and at the end every historical version must
  * still replay to its recorded model state (time-travel soundness).
  * Merge ops deliberately re-target ids from earlier ops, so the same
  * source row exercises the update path when the id survived and the
  * insert path when an overwrite already dropped it — including
  * cross-partition moves (an update that changes the row's partition
  * value).
  */
class SnapshotModelSpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private sealed trait Kind
  private case object Append extends Kind
  private case object Overwrite extends Kind
  private case object Merge extends Kind
  private case object Restore extends Kind
  private case object Rename extends Kind

  // an op: kind, partition key, source-op index (merge re-targets
  // that op's ids; restore targets that EXISTING version index),
  // row count
  private case class Op(kind: Kind, part: String, target: Int, n: Int)

  private val genOp: Gen[Op] = for {
    kind <- Gen.frequency(3 -> Gen.const(Append: Kind),
      2 -> Gen.const(Overwrite: Kind), 3 -> Gen.const(Merge: Kind),
      1 -> Gen.const(Restore: Kind), 2 -> Gen.const(Rename: Kind))
    part <- Gen.oneOf("p1", "p2", "p3")
    target <- Gen.choose(0, 7)
    n <- Gen.choose(1, 6)
  } yield Op(kind, part, target, n)

  test("random append/overwrite/merge/restore sequences match the in-memory model (3 seeds)") {
    (1L to 3L).foreach(runSequence(_, nOps = 8, vacuumMid = false))
  }

  test("same property at checkpointInterval=3 with a mid-sequence vacuum: " +
      "delta/checkpoint boundaries and base materialization under random ops") {
    // a dense interval makes every sequence cross several
    // checkpoint↔delta boundaries; the mid-run vacuum expires bases
    // under surviving deltas, exercising the materialization path,
    // and the cache is cleared before the final replay so every
    // historical version reconstructs cold from disk
    val prev = sys.props.get("graft.snapshot.checkpointInterval")
    sys.props("graft.snapshot.checkpointInterval") = "3"
    try (11L to 13L).foreach(runSequence(_, nOps = 14, vacuumMid = true))
    finally prev match {
      case Some(v) => sys.props("graft.snapshot.checkpointInterval") = v
      case None => sys.props.remove("graft.snapshot.checkpointInterval"): Unit
    }
  }

  private def runSequence(seed: Long, nOps: Int, vacuumMid: Boolean): Unit = {
    {
      val path = Files.createTempDirectory(s"graft-snap-model-$seed").toString + "/t"
      val ops = sample(Gen.listOfN(nOps, genOp), seed).zipWithIndex

      // model: id -> (partition, value); history: version ->
      // (model, value column's LOGICAL name — renameColumn toggles
      // it, restore jumps it back with the schema)
      var model = Map[String, (String, Double)]()
      var vName = "v"
      var history = List.empty[(Long, Map[String, (String, Double)], String)]

      def tableState() = SnapshotTable.read(spark, path)
        .select("id", "k", vName).collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2))).toMap

      ops.foreach { case (op, i) =>
        val v = op.kind match {
          case Append =>
            val ids = (0 until op.n).map(j => s"op$i-$j")
            val df = ids.zipWithIndex
              .map { case (id, j) => (id, op.part, i * 100.0 + j) }
              .toDF("id", "k", vName)
            val ver = SnapshotTable.append(df, path, Seq("k"))
            model ++= ids.zipWithIndex.map { case (id, j) =>
              id -> (op.part, i * 100.0 + j)
            }
            ver
          case Overwrite =>
            val ids = (0 until op.n).map(j => s"op$i-$j")
            val df = ids.zipWithIndex
              .map { case (id, j) => (id, op.part, i * 100.0 + j) }
              .toDF("id", "k", vName)
            val ver = SnapshotTable.overwritePartitions(df, path, Seq("k"))
            model = model.filterNot(_._2._1 == op.part) ++
              ids.zipWithIndex.map { case (id, j) => id -> (op.part, i * 100.0 + j) }
            ver
          case Merge =>
            // re-target an EARLIER op's ids (clamped — minting a
            // FUTURE append's ids would make that append a legitimate
            // duplicate): updates where they still exist (possibly
            // moving partitions), inserts where not
            val target = op.target % math.max(i, 1)
            val ids = (0 until op.n).map(j => s"op$target-$j")
            val df = ids.zipWithIndex
              .map { case (id, j) => (id, op.part, i * 100.0 + j) }
              .toDF("id", "k", vName)
            val ver = SnapshotTable.merge(df, path, Seq("id"), Seq("k"))
            model ++= ids.zipWithIndex.map { case (id, j) =>
              id -> (op.part, i * 100.0 + j)
            }
            ver
          case Restore =>
            // jump the table back to a random EXISTING version; the
            // model jumps to that version's recorded state AND value
            // column name. A first-op restore has no version to
            // target — degrade to an append.
            if (history.isEmpty) {
              val df = Seq((s"op$i-0", op.part, i * 100.0)).toDF("id", "k", vName)
              val ver = SnapshotTable.append(df, path, Seq("k"))
              model += (s"op$i-0" -> (op.part, i * 100.0))
              ver
            } else {
              val (tv, tm, tn) = history(op.target % history.size)
              val ver = SnapshotTable.restore(spark, path, tv)
              model = tm
              vName = tn
              ver
            }
          case Rename =>
            // metadata-only rename of the value column, toggling
            // between 'v' and 'w' — mixed-era physical files under a
            // changing logical name, interleaved with every other op
            // (and degraded to an append before the table exists)
            if (history.isEmpty) {
              val df = Seq((s"op$i-0", op.part, i * 100.0)).toDF("id", "k", vName)
              val ver = SnapshotTable.append(df, path, Seq("k"))
              model += (s"op$i-0" -> (op.part, i * 100.0))
              ver
            } else {
              val to = if (vName == "v") "w" else "v"
              val ver = SnapshotTable.renameColumn(spark, path, vName, to)
              vName = to
              ver
            }
        }
        history ::= (v, model, vName)
        assert(tableState() === model,
          s"seed=$seed after op $i ($op): table diverged from model")

        // mid-sequence retention: expire old versions (possibly the
        // replay base of a surviving delta), then keep going — later
        // restores may only target surviving versions, and the model
        // history drops the expired ones like a consumer would
        if (vacuumMid && i == nOps / 2) {
          SnapshotTable.vacuum(spark, path, keepVersions = 3)
          val live = SnapshotTable.versions(spark, path).toSet
          history = history.filter(h => live(h._1))
        }
      }

      // time travel: every SURVIVING version still replays its model,
      // reconstructed cold (no cached manifests)
      SnapshotTable.clearManifestCache()
      history.foreach { case (v, m, n) =>
        val got = SnapshotTable.read(spark, path, Some(v))
          .select("id", "k", n).collect()
          .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2))).toMap
        assert(got === m, s"seed=$seed version $v diverged")
      }
    }
  }
}
