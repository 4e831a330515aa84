package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Writer-features protocol gate (the Delta table-features model,
  * WRITER side — the mirror of [[ReaderFeaturesSpec]]): version files
  * advertise the features a writer must implement to commit without
  * corrupting invariants (advancing rid bases on a row-tracked table,
  * enforcing CHECKs, honoring txn replay dedup, writing physical
  * names under column mapping), and every commit path refuses a table
  * advertising an unknown writer feature BEFORE file finding or data
  * writes — while reads stay allowed, the asymmetry that defines the
  * writer half. */
class WriterFeaturesSpec extends SparkTestBase {

  import spark.implicits._

  private def vFile(path: String, v: Long): java.nio.file.Path =
    Paths.get(s"$path/_graft_log/v$v")

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-wfeat-$tag").toString + "/t"

  private def dataFiles(path: String): Set[String] = {
    val d = Paths.get(s"$path/data")
    if (!Files.exists(d)) Set.empty
    else {
      val s = Files.walk(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isRegularFile(_))
          .map(_.toString).toSet
      } finally s.close()
    }
  }

  /** A committed table whose v-latest advertises an unknown writer
    * feature (forged as if written by a future library), plus the
    * pre-forge data-file set. */
  private def forged(tag: String): (String, Set[String]) = {
    val path = fresh(tag)
    SnapshotTable.append(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), path)
    val v1 = new String(Files.readAllBytes(vFile(path, 1L)), "UTF-8")
    Files.write(vFile(path, 2L),
      (s"#writerFeatures=frobnication\n" + v1).getBytes("UTF-8"))
    SnapshotTable.clearManifestCache()
    (path, dataFiles(path))
  }

  test("version files advertise exactly the writer features the state uses") {
    val path = fresh("advertise")
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v"), path)
    assert(!new String(Files.readAllBytes(vFile(path, 1L)), "UTF-8")
      .contains("#writerFeatures="), "a plain table needs no writer features")
    // CHECK constraints are writer-only: ignoring one on write corrupts
    // the guarantee every reader then trusts — but reading needs nothing
    SnapshotTable.addCheckConstraint(spark, path, "v_nonneg", "v >= 0")
    val v2 = new String(Files.readAllBytes(vFile(path, 2L)), "UTF-8")
    assert(v2.contains("#writerFeatures=") && v2.contains("check-constraints"))
    assert(!v2.contains("#readerFeatures="),
      "a CHECK constraint is not a reader feature")
    // reader features are a subset of writer features: a rename mints
    // column-mapping on BOTH headers
    SnapshotTable.renameColumn(spark, path, "k", "kk")
    val v3 = new String(Files.readAllBytes(vFile(path, 3L)), "UTF-8")
    assert(v3.contains("#readerFeatures=column-mapping"))
    val wf = v3.linesIterator.find(_.startsWith("#writerFeatures="))
      .get.stripPrefix("#writerFeatures=").split(",").toSet
    assert(wf === Set("column-mapping", "check-constraints"))
    // row tracking joins both sides
    SnapshotTable.enableRowTracking(spark, path)
    val v4 = new String(Files.readAllBytes(
      vFile(path, SnapshotTable.latestVersion(spark, path).get)), "UTF-8")
    assert(v4.contains("#readerFeatures=") && v4.contains("row-tracking"))
    assert(v4.linesIterator.find(_.startsWith("#writerFeatures="))
      .get.contains("row-tracking"))
  }

  test("unknown writer feature: reads allowed, every commit path refused " +
      "before any data write") {
    val (path, before) = forged("refuse")
    // the asymmetry vs the reader gate: reading is still fine
    assert(SnapshotTable.read(spark, path).count() === 2L)
    def refused(body: => Any): String = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains("frobnication") &&
        e.getMessage.contains("writer feature") &&
        e.getMessage.contains("upgrade"), e.getMessage)
      e.getMessage
    }
    refused(SnapshotTable.append(Seq((3L, 3.0)).toDF("k", "v"), path))
    refused(SnapshotTable.delete(spark, path, col("k") === 1L))
    refused(SnapshotTable.update(spark, path, Seq("v" -> lit(9.0)),
      col("k") === 1L))
    refused(SnapshotTable.merge(Seq((1L, 5.0)).toDF("k", "v"), path, Seq("k")))
    refused(SnapshotTable.deleteWithVectors(spark, path, col("k") === 1L))
    refused(SnapshotTable.truncate(spark, path))
    refused(SnapshotTable.compact(spark, path))
    // forks of the forged state are refused too — re-deriving the
    // target's headers would silently launder the feature away
    refused(SnapshotTable.createBranch(spark, path, "b1"))
    // vacuum is deliberately NOT refused (forward-carry): retention
    // changes no logical state and the materialization round-trips
    // the raw header verbatim — see the dedicated test below
    refused(SnapshotTable.shallowClone(spark, path, fresh("clone-dst")))
    refused(SnapshotTable.deepClone(spark, path, fresh("dclone-dst")))
    // refusal happened BEFORE file finding / data writes: nothing new
    // under data/, and the version head did not move
    assert(dataFiles(path) === before)
    assert(SnapshotTable.latestVersion(spark, path).get === 2L)
  }

  test("a streaming epoch commit is writer-gated too") {
    import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
    val (path, before) = forged("stream")
    val stage = Files.createTempDirectory("graft-wfeat-stage").toString
    Seq((9L, 9.0)).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/s")
    import scala.jdk.CollectionConverters._
    val part = Files.list(Paths.get(s"$stage/s")).iterator.asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get.toString
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.commitStreamEpoch(spark, path,
        Seq((s"$stage/s", part, 1L)),
        new StructType().add("k", LongType).add("v", DoubleType),
        "wfeat-app", 0L)
    }
    assert(e.getMessage.contains("frobnication"))
    assert(dataFiles(path) === before)
  }

  test("publish backstop refuses even a path with no entry-point gate") {
    val (path, _) = forged("backstop")
    // drive publishManifest directly (the one funnel no commit path can
    // bypass), simulating a future commit path that forgot to gate at
    // entry: the backstop still refuses v3 over the forged v2
    val m = SnapshotTable.readManifestFull(spark, path, 1L)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.publishManifest(spark, path, 3L, m)
    }
    assert(e.getMessage.contains("frobnication"))
    assert(SnapshotTable.latestVersion(spark, path).get === 2L)
  }

  test("DESCRIBE DETAIL surfaces both feature sets") {
    val path = fresh("describe")
    SnapshotTable.append(Seq((1L, 1.0)).toDF("k", "v"), path)
    SnapshotTable.renameColumn(spark, path, "v", "w")
    SnapshotTable.addCheckConstraint(spark, path, "w_nonneg", "w >= 0")
    val row = SnapshotTable.describeDetail(spark, path)
      .select("readerFeatures", "writerFeatures").head()
    assert(row.getSeq[String](0) === Seq("column-mapping"))
    assert(row.getSeq[String](1).toSet ===
      Set("column-mapping", "check-constraints"))
    // a forged future feature rides along in DESCRIBE DETAIL so the
    // operator can see exactly what commits are gated on (forged as a
    // CHECKPOINT from v1's full content — a delta must name its base)
    val latest = SnapshotTable.latestVersion(spark, path).get
    val v1 = new String(Files.readAllBytes(vFile(path, 1L)), "UTF-8")
    Files.write(vFile(path, latest + 1),
      ("#writerFeatures=frobnication\n" + v1).getBytes("UTF-8"))
    SnapshotTable.clearManifestCache()
    val wf2 = SnapshotTable.describeDetail(spark, path)
      .select("writerFeatures").head().getSeq[String](0)
    assert(wf2.contains("frobnication"))
  }

  test("vacuum forward-carries a future writer-features header " +
      "(retention runs on a future-library table, commits stay refused)") {
    val path = fresh("fwdcarry")
    SnapshotTable.append(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), path) // v1 ckpt
    SnapshotTable.compact(spark, path, numFiles = 1)                     // v2: v1's files dead once v1 expires
    SnapshotTable.append(Seq((3L, 3.0)).toDF("k", "v"), path)            // v3 delta vs v2
    // forge v3 as if a future library wrote it: an unknown writer
    // feature plus a header line this library does not model
    val v3 = new String(Files.readAllBytes(vFile(path, 3L)), "UTF-8")
    assert(v3.contains("#delta="),
      "fixture: v3 must be a delta so vacuum exercises materialization")
    Files.write(vFile(path, 3L),
      ("#writerFeatures=frobnication\n#frobnicationState=opaque payload 42\n"
        + v3).getBytes("UTF-8"))
    SnapshotTable.clearManifestCache()
    val beforeData = dataFiles(path)
    // retention RUNS — no refusal. keepVersions=1 expires v1+v2, so
    // kept v3 (a delta whose base is going away) must be
    // re-materialized as a checkpoint WITHOUT laundering the header.
    SnapshotTable.vacuum(spark, path)
    assert(!Files.exists(vFile(path, 1L)) && !Files.exists(vFile(path, 2L)))
    val after = new String(Files.readAllBytes(vFile(path, 3L)), "UTF-8")
    assert(!after.contains("#delta="),
      "v3 must have been materialized as a self-sufficient checkpoint")
    assert(after.linesIterator.contains("#writerFeatures=frobnication"),
      "the raw writer-features header must survive byte-identical")
    assert(after.linesIterator.contains("#frobnicationState=opaque payload 42"),
      "unmodeled headers must ride the rewrite verbatim")
    // retention did real work: v1's pre-compaction files are gone
    assert(dataFiles(path).size < beforeData.size)
    // reads still served; data commits still refused
    assert(SnapshotTable.read(spark, path).count() === 3L)
    val e = intercept[IllegalArgumentException](
      SnapshotTable.append(Seq((4L, 4.0)).toDF("k", "v"), path))
    assert(e.getMessage.contains("frobnication"))
    // a second vacuum over the already-compacted log is a clean no-op
    SnapshotTable.vacuum(spark, path)
    assert(SnapshotTable.read(spark, path).count() === 3L)
  }

  test("relocate preserves a future writer-features header through " +
      "its full-log rewrite") {
    val dir = Files.createTempDirectory("graft-wfeat-reloc").toString
    val src = s"$dir/a"; val dst = s"$dir/b"
    SnapshotTable.append(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), src)
    SnapshotTable.append(Seq((3L, 3.0)).toDF("k", "v"), src)
    val v2 = new String(Files.readAllBytes(vFile(src, 2L)), "UTF-8")
    Files.write(vFile(src, 2L),
      ("#writerFeatures=frobnication\n#frobnicationState=xyz\n" + v2)
        .getBytes("UTF-8"))
    SnapshotTable.clearManifestCache()
    Files.move(Paths.get(src), Paths.get(dst))
    SnapshotTable.relocate(spark, dst, src)
    val after = new String(Files.readAllBytes(vFile(dst, 2L)), "UTF-8")
    assert(after.linesIterator.contains("#writerFeatures=frobnication"))
    assert(after.linesIterator.contains("#frobnicationState=xyz"))
    assert(SnapshotTable.read(spark, dst).count() === 3L)
    val e = intercept[IllegalArgumentException](
      SnapshotTable.append(Seq((4L, 4.0)).toDF("k", "v"), dst))
    assert(e.getMessage.contains("frobnication"))
  }
}
