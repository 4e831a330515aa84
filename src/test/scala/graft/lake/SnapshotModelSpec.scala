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

  // an op: kind, partition key, source-op index (merge re-targets
  // that op's ids; restore targets that EXISTING version index),
  // row count
  private case class Op(kind: Kind, part: String, target: Int, n: Int)

  private val genOp: Gen[Op] = for {
    kind <- Gen.frequency(3 -> Gen.const(Append: Kind),
      2 -> Gen.const(Overwrite: Kind), 3 -> Gen.const(Merge: Kind),
      1 -> Gen.const(Restore: Kind))
    part <- Gen.oneOf("p1", "p2", "p3")
    target <- Gen.choose(0, 7)
    n <- Gen.choose(1, 6)
  } yield Op(kind, part, target, n)

  test("random append/overwrite/merge/restore sequences match the in-memory model (3 seeds)") {
    (1L to 3L).foreach { seed =>
      val path = Files.createTempDirectory(s"graft-snap-model-$seed").toString + "/t"
      val ops = sample(Gen.listOfN(8, genOp), seed).zipWithIndex

      // model: id -> (partition, value); history: version -> model
      var model = Map[String, (String, Double)]()
      var history = List.empty[(Long, Map[String, (String, Double)])]

      def tableState() = SnapshotTable.read(spark, path)
        .select("id", "k", "v").collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2))).toMap

      ops.foreach { case (op, i) =>
        val v = op.kind match {
          case Append =>
            val ids = (0 until op.n).map(j => s"op$i-$j")
            val df = ids.zipWithIndex
              .map { case (id, j) => (id, op.part, i * 100.0 + j) }
              .toDF("id", "k", "v")
            val ver = SnapshotTable.append(df, path, Seq("k"))
            model ++= ids.zipWithIndex.map { case (id, j) =>
              id -> (op.part, i * 100.0 + j)
            }
            ver
          case Overwrite =>
            val ids = (0 until op.n).map(j => s"op$i-$j")
            val df = ids.zipWithIndex
              .map { case (id, j) => (id, op.part, i * 100.0 + j) }
              .toDF("id", "k", "v")
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
              .toDF("id", "k", "v")
            val ver = SnapshotTable.merge(df, path, Seq("id"), Seq("k"))
            model ++= ids.zipWithIndex.map { case (id, j) =>
              id -> (op.part, i * 100.0 + j)
            }
            ver
          case Restore =>
            // jump the table back to a random EXISTING version; the
            // model jumps to that version's recorded state. A first-op
            // restore has no version to target — degrade to an append.
            if (history.isEmpty) {
              val df = Seq((s"op$i-0", op.part, i * 100.0)).toDF("id", "k", "v")
              val ver = SnapshotTable.append(df, path, Seq("k"))
              model += (s"op$i-0" -> (op.part, i * 100.0))
              ver
            } else {
              val (tv, tm) = history(op.target % history.size)
              val ver = SnapshotTable.restore(spark, path, tv)
              model = tm
              ver
            }
        }
        history ::= (v, model)
        assert(tableState() === model,
          s"seed=$seed after op $i ($op): table diverged from model")
      }

      // time travel: every recorded version still replays its model
      history.foreach { case (v, m) =>
        val got = SnapshotTable.read(spark, path, Some(v))
          .select("id", "k", "v").collect()
          .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2))).toMap
        assert(got === m, s"seed=$seed version $v diverged")
      }
    }
  }
}
