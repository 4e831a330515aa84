package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Model-based property test for the snapshot layer: a random
  * sequence of append / overwritePartitions ops is applied both to a
  * real SnapshotTable and to a trivial in-memory model (a Map from
  * partition to rows); after every op, the latest table state must
  * equal the model, and at the end every historical version must
  * still replay to its recorded model state (time-travel soundness).
  */
class SnapshotModelSpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // an op: append or overwrite, a partition key, a batch tag, a size
  private case class Op(overwrite: Boolean, part: String, tag: String, n: Int)

  private val genOp: Gen[Op] = for {
    overwrite <- Gen.oneOf(true, false)
    part <- Gen.oneOf("p1", "p2", "p3")
    n <- Gen.choose(1, 6)
  } yield Op(overwrite, part, "", n)

  private def rowsOf(op: Op, i: Int) =
    (0 until op.n).map(j => (s"op$i-$j", op.part, j.toDouble)).toDF("id", "k", "v")

  test("random append/overwrite sequences match the in-memory model (3 seeds)") {
    (1L to 3L).foreach { seed =>
      val path = Files.createTempDirectory(s"graft-snap-model-$seed").toString + "/t"
      val ops = sample(Gen.listOfN(8, genOp), seed).zipWithIndex

      // model: partition -> set of row ids; history: version -> model
      var model = Map[String, Set[String]]().withDefaultValue(Set.empty)
      var history = List.empty[(Long, Map[String, Set[String]])]

      ops.foreach { case (op, i) =>
        val df = rowsOf(op, i)
        val ids = (0 until op.n).map(j => s"op$i-$j").toSet
        val v =
          if (op.overwrite) {
            val ver = SnapshotTable.overwritePartitions(df, path, Seq("k"))
            model = model.updated(op.part, ids)
            ver
          } else {
            val ver = SnapshotTable.append(df, path, Seq("k"))
            model = model.updated(op.part, model(op.part) ++ ids)
            ver
          }
        history ::= (v, model)

        val got = SnapshotTable.read(spark, path)
          .select("id", "k").collect()
          .groupBy(_.getString(1)).map { case (k, rs) => k -> rs.map(_.getString(0)).toSet }
        assert(got === model.filter(_._2.nonEmpty),
          s"seed=$seed after op $i ($op): table diverged from model")
      }

      // time travel: every recorded version still replays its model
      history.foreach { case (v, m) =>
        val got = SnapshotTable.read(spark, path, Some(v))
          .select("id", "k").collect()
          .groupBy(_.getString(1)).map { case (k, rs) => k -> rs.map(_.getString(0)).toSet }
        assert(got === m.filter(_._2.nonEmpty), s"seed=$seed version $v diverged")
      }
    }
  }
}
