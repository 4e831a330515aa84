package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Deletion vectors on layouts whose paths percent-encode — the same
  * driver-vs-scan file-identity hazard the tracked-read fast path
  * closed ([[MetadataFilePathSpec]]), now for the DV machinery: the
  * write side maps matched scan rows (keyed by the scan's encoded
  * `_metadata.file_path` suffix) back to manifest entries (keyed by
  * the manifest string's form), and the read side anti-joins the
  * driver-keyed dead set against the scan key. If the two forms
  * diverge (hive-escaped ':' in a partition value puts a literal '%'
  * on disk, which Spark's file index re-encodes at layout-dependent
  * depth), a DV delete silently no-ops on write or resurfaces deleted
  * rows on read — both checked here end to end. */
class DvSpecialCharSpec extends SparkTestBase {

  import spark.implicits._

  test("deleteWithVectors on a ':'-partitioned table: rows die and stay dead") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dvsc").toString
    val path = s"$dir/t"
    val df = (1 to 20).map(i => (i.toLong, s"a:${i % 2}", i * 1.0))
      .toDF("k", "cat", "v")
    SnapshotTable.append(df, path, partitionCols = Seq("cat"))
    val v = SnapshotTable.deleteWithVectors(spark, path, col("k") <= 5)
    assert(v == 2L, "DV delete must publish a commit")
    val left = SnapshotTable.read(spark, path).select("k").as[Long]
      .collect().sorted
    assert(left.toSeq == (6L to 20L),
      s"DV-deleted rows must be gone (and stay gone on read): ${left.toSeq}")
    // a second DV delete merges with the existing vectors
    SnapshotTable.deleteWithVectors(spark, path, col("k") === 7)
    assert(SnapshotTable.read(spark, path).select("k").as[Long]
      .collect().sorted.toSeq == (6L to 20L).filterNot(_ == 7L))
    // time travel still serves the pre-delete rows
    assert(SnapshotTable.read(spark, path, Some(1L)).count() == 20L)
  }

  test("deleteWithVectors under a space-bearing table root") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dvsc sp").toString
    val path = s"$dir/t x"
    SnapshotTable.append((1 to 10).map(i => (i.toLong, i * 1.0)).toDF("k", "v"),
      path)
    SnapshotTable.deleteWithVectors(spark, path, col("k") > 8)
    assert(SnapshotTable.read(spark, path).select("k").as[Long]
      .collect().sorted.toSeq == (1L to 8L))
  }
}
