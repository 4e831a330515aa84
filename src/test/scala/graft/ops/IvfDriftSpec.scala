package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.lake.SnapshotTable

/** Centroid-drift maintenance: a drifted corpus (a new vector
  * cluster the trained centroids have never seen) trips the
  * distortion trigger and retrains; a non-drifted append stream
  * never rebuilds. */
class IvfDriftSpec extends SparkTestBase {

  import spark.implicits._

  private val dim = 8

  /** `n` vectors around `centers`, deterministic jitter. */
  private def cloud(idFrom: Long, n: Int,
      centers: Seq[Array[Double]]): DataFrame =
    (0 until n).map { i =>
      val c = centers(i % centers.size)
      val v = Array.tabulate(dim)(d =>
        (c(d) + ((i * 31 + d * 7) % 10) / 100.0).toFloat)
      (idFrom + i, v)
    }.toDF("vec_id", "embedding")

  private val baseCenters = Seq(
    Array.fill(dim)(0.0), Array.fill(dim)(5.0), Array.fill(dim)(-5.0))

  test("drifted corpus triggers a rebuild and distortion recovers; stable stream never rebuilds") {
    val base = Files.createTempDirectory("graft-ivf-drift").toString
    val (corpus, modelPath) = (s"$base/corpus", s"$base/model")
    SnapshotTable.append(cloud(0L, 600, baseCenters).coalesce(2), corpus)
    val m0 = Ivf.train(SnapshotTable.read(spark, corpus), k = 3)
    Ivf.save(spark, m0, modelPath)

    // first call records the baseline, never rebuilds
    assert(!Ivf.maintainModel(spark, corpus, modelPath))

    // NON-drifted appends (same distribution): never rebuilds
    SnapshotTable.append(cloud(1000L, 300, baseCenters).coalesce(1), corpus)
    assert(!Ivf.maintainModel(spark, corpus, modelPath),
      "same-distribution growth must not trigger a rebuild")

    // drift: a NEW cluster far from every trained centroid, big
    // enough to dominate the hash-strided sample's tail
    val farCenter = Seq(Array.fill(dim)(40.0))
    SnapshotTable.append(cloud(5000L, 900, farCenter).coalesce(2), corpus)
    val emb = SnapshotTable.read(spark, corpus)
    val before = Ivf.distortion(emb, Ivf.load(spark, modelPath))
    assert(Ivf.maintainModel(spark, corpus, modelPath),
      "a drifted corpus must trigger a rebuild")
    val after = Ivf.distortion(emb, Ivf.load(spark, modelPath))
    assert(after < before / 2,
      f"rebuild did not recover distortion: before=$before%.2f after=$after%.2f")
    // the retrained model has a centroid near the new cluster —
    // searches probing it now reach the new region
    val m2 = Ivf.load(spark, modelPath)
    val probe = Array.fill(dim)(40.0f)
    assert(m2.nearestDist2(probe) < 5.0 * dim,
      s"no centroid near the drifted cluster: d2=${m2.nearestDist2(probe)}")
    // and the system re-stabilizes: the next call is quiet again
    assert(!Ivf.maintainModel(spark, corpus, modelPath))
  }
}
