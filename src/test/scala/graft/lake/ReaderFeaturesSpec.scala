package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Reader-features protocol gate (the Delta table-features model,
  * reader side): version files advertise the features required to
  * read the table correctly, and a manifest listing an unimplemented
  * feature is refused LOUDLY instead of being half-read into silent
  * wrong answers (the forward-compat mirror of the round-11
  * silent-NULL class). */
class ReaderFeaturesSpec extends SparkTestBase {

  import spark.implicits._

  private def vFile(path: String, v: Long): java.nio.file.Path =
    Paths.get(s"$path/_graft_log/v$v")

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-feat-$tag").toString + "/t"

  test("version files advertise exactly the reader features the state uses") {
    val path = fresh("advertise")
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v"), path)
    assert(!new String(Files.readAllBytes(vFile(path, 1L)), "UTF-8")
      .contains("#readerFeatures="), "a plain table needs no features")
    SnapshotTable.renameColumn(spark, path, "v", "w")
    val v2 = new String(Files.readAllBytes(vFile(path, 2L)), "UTF-8")
    assert(v2.contains("#readerFeatures=") && v2.contains("column-mapping"))
    // a DV-carrying state advertises deletion-vectors
    val path2 = fresh("dv")
    SnapshotTable.append(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
      .coalesce(1), path2)
    SnapshotTable.deleteWithVectors(spark, path2, col("k") === 1L)
    val latest = SnapshotTable.latestVersion(spark, path2).get
    assert(new String(Files.readAllBytes(vFile(path2, latest)), "UTF-8")
      .contains("deletion-vectors"))
  }

  test("a manifest requiring an unknown reader feature is refused loudly") {
    val path = fresh("unknown")
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v"), path)
    // forge a v2 written by a "future" library version
    val v1 = new String(Files.readAllBytes(vFile(path, 1L)), "UTF-8")
    Files.write(vFile(path, 2L),
      (s"#readerFeatures=frobnication\n" + v1).getBytes("UTF-8"))
    SnapshotTable.clearManifestCache()
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, path).count()
    }
    assert(e.getMessage.contains("frobnication") &&
      e.getMessage.contains("upgrade"))
    // time travel to the pre-feature version still works
    assert(SnapshotTable.read(spark, path, Some(1L)).count() === 1L)
  }
}
