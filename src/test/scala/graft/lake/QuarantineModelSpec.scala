package graft.lake

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Model-based property over the quarantine fail-mode append: for a
  * RANDOM batch (nulls, negatives, fractionals, out-of-range values)
  * against a RANDOM constraint subset, `appendQuarantine` must
  * partition the batch exactly —
  *
  *  - kept ∪ quarantined is the batch, row for row, no loss and no
  *    duplication;
  *  - every kept row satisfies every constraint under SQL tri-valued
  *    logic (a NULL evaluation passes);
  *  - every quarantined row violates at least one constraint, and its
  *    `_violated` diagnosis is EXACTLY the name-sorted set of
  *    constraints it violates —
  *
  * with the model evaluated independently in plain Scala.
  */
class QuarantineModelSpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // constraint pool: SQL text + the Scala model of "this row VIOLATES"
  // (tri-valued: a NULL value never violates a value predicate)
  private val pool: Seq[(String, String, (String, Option[Double]) => Boolean)] = Seq(
    ("v_nonneg", "v >= 0", (_, v) => v.exists(_ < 0)),
    ("v_cap", "v <= 100", (_, v) => v.exists(_ > 100)),
    ("v_whole", "v = floor(v)", (_, v) => v.exists(x => x != math.floor(x))),
    ("id_short", "length(id) <= 6", (id, _) => id.length > 6))

  private val genRow: Gen[(String, Option[Double])] = for {
    idLen <- Gen.choose(1, 9)
    id <- Gen.listOfN(idLen, Gen.alphaLowerChar).map(_.mkString)
    v <- Gen.frequency(
      2 -> Gen.const(None: Option[Double]),
      3 -> Gen.choose(-50.0, 50.0).map(x => Some(math.floor(x))),
      3 -> Gen.choose(-300.0, 300.0).map(Some(_)),
      1 -> Gen.const(Some(0.0)))
  } yield (id, v)

  test("appendQuarantine partitions any batch exactly, with exact diagnoses " +
      "(6 seeds x random constraint subsets)") {
    (1L to 6L).foreach { seed =>
      val base = Files.createTempDirectory(s"graft-qmodel-$seed").toString
      val (path, qpath) = (s"$base/t", s"$base/q")

      val cs = sample(Gen.someOf(pool), seed).toSeq.sortBy(_._1)
      val rows = sample(Gen.listOfN(40, genRow), seed + 100)
        .zipWithIndex.map { case ((id, v), i) => (s"$id-$i", v) } // unique ids

      // schema-only v1, then the constraint set under test
      SnapshotTable.append(
        Seq.empty[(String, Option[Double])].toDF("id", "v"), path)
      cs.foreach { case (n, e, _) =>
        SnapshotTable.addCheckConstraint(spark, path, n, e)
      }

      val batch = rows.toDF("id", "v")
      val (_, nQ) = SnapshotTable.appendQuarantine(batch, path, qpath)

      // the Scala model: id -> sorted violated constraint names
      val model: Map[String, Seq[String]] = rows.map { case (id, v) =>
        id -> cs.collect { case (n, _, bad) if bad(id, v) => n }.sorted
      }.toMap
      val expectKept = model.filter(_._2.isEmpty).keySet
      val expectQuar = model.filter(_._2.nonEmpty)

      val kept = SnapshotTable.read(spark, path).select("id")
        .collect().map(_.getString(0)).toSet
      assert(kept === expectKept,
        s"seed=$seed cs=${cs.map(_._1)}: kept set diverged from model")

      val quar: Map[String, Seq[String]] =
        if (expectQuar.isEmpty) Map.empty
        else SnapshotTable.read(spark, qpath)
          .select(col("id"), col("_violated"))
          .collect()
          .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      assert(quar === expectQuar,
        s"seed=$seed cs=${cs.map(_._1)}: diagnoses diverged from model")
      assert(nQ === expectQuar.size.toLong)

      // no loss, no duplication
      assert(kept.size + quar.size === rows.size)
      assert((kept ++ quar.keySet) === model.keySet)
    }
  }
}
