package graft.lake

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Model-based GC-safety property over the branch protocol (the
  * retention cousin of [[SnapshotModelSpec]]): a random sequence of
  * appendMain / appendBranch / createBranch / fastForward /
  * cherryPick / dropBranch / vacuum must NEVER leave a live ref
  * referencing a deleted file. After every op, every manifest version
  * still present in every live ref's log is walked and each recorded
  * data file (and DV file) must exist on disk — the exact invariant
  * vacuum's cross-ref pinning claims. Ops that legitimately refuse
  * (fastForward on diverged refs, cherry-pick conflicts, dropping a
  * nonexistent branch) are skipped: the property is about file GC,
  * not operation applicability. */
class BranchGcModelSpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private sealed trait Kind
  private case object AppendMain extends Kind
  private case object AppendBranch extends Kind
  private case object CreateBranch extends Kind
  private case object FastForward extends Kind
  private case object CherryPick extends Kind
  private case object DropBranch extends Kind
  private case object Vacuum extends Kind
  private case object VacuumBranch extends Kind

  private case class Op(kind: Kind, branch: String, keep: Int)

  private val genOp: Gen[Op] = for {
    kind <- Gen.frequency(
      4 -> Gen.const(AppendMain: Kind), 4 -> Gen.const(AppendBranch: Kind),
      2 -> Gen.const(CreateBranch: Kind), 2 -> Gen.const(FastForward: Kind),
      2 -> Gen.const(CherryPick: Kind), 1 -> Gen.const(DropBranch: Kind),
      3 -> Gen.const(Vacuum: Kind), 2 -> Gen.const(VacuumBranch: Kind))
    branch <- Gen.oneOf("b1", "b2")
    keep <- Gen.choose(1, 2)
  } yield Op(kind, branch, keep)

  test("no create/write/ff/cherry-pick/drop/vacuum sequence deletes a file " +
      "any live ref still references (4 seeds x 14 ops)") {
    (1L to 4L).foreach { seed =>
      val path = Files.createTempDirectory(s"graft-branch-gc-$seed").toString + "/t"
      SnapshotTable.append(Seq((0L, "seed")).toDF("k", "s"), path)
      val ops = sample(Gen.listOfN(14, genOp), seed).zipWithIndex

      def refs(): Seq[String] =
        path +: SnapshotTable.branches(spark, path)
          .map(SnapshotTable.branchHandle(path, _))

      /** The GC invariant: every version every live ref still lists
        * must have all its recorded files (and DVs) on disk. */
      def assertNoDanglingFiles(ctx: String): Unit = {
        val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
        refs().foreach { h =>
          SnapshotTable.versions(spark, h).foreach { v =>
            SnapshotTable.readManifest(spark, h, v).foreach { e =>
              assert(f.exists(new Path(e.filePath)),
                s"seed=$seed $ctx: ref $h v$v references deleted file ${e.filePath}")
              e.dv.foreach { case (dvPath, _) =>
                assert(f.exists(new Path(dvPath)),
                  s"seed=$seed $ctx: ref $h v$v references deleted DV $dvPath")
              }
            }
          }
        }
      }

      ops.foreach { case (op, i) =>
        val bh = SnapshotTable.branchHandle(path, op.branch)
        def branchExists = SnapshotTable.branches(spark, path).contains(op.branch)
        scala.util.Try(op.kind match {
          case AppendMain =>
            SnapshotTable.append(Seq((i.toLong, s"m$i")).toDF("k", "s"), path): Unit
          case AppendBranch =>
            if (branchExists)
              SnapshotTable.append(Seq((100L + i, s"b$i")).toDF("k", "s"), bh): Unit
          case CreateBranch =>
            if (!branchExists)
              SnapshotTable.createBranch(spark, path, op.branch): Unit
          case FastForward =>
            if (branchExists)
              SnapshotTable.fastForward(spark, path, op.branch): Unit
          case CherryPick =>
            if (branchExists)
              SnapshotTable.cherryPick(spark, path, op.branch,
                SnapshotTable.latestVersion(spark, bh).get): Unit
          case DropBranch =>
            if (branchExists)
              SnapshotTable.dropBranch(spark, path, op.branch): Unit
          case Vacuum =>
            SnapshotTable.vacuum(spark, path, keepVersions = op.keep)
          case VacuumBranch =>
            if (branchExists)
              SnapshotTable.vacuum(spark, bh, keepVersions = op.keep)
        }): Unit
        assertNoDanglingFiles(s"after op $i (${op.kind} ${op.branch})")
      }

      // and every surviving ref still READS end-to-end (manifest +
      // parquet + DV application all resolve)
      refs().foreach { h =>
        assert(SnapshotTable.read(spark, h).count() >= 0L)
      }
    }
  }
}
