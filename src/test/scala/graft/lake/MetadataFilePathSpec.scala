package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[SnapshotTable.metadataFilePath]] must reproduce the EXACT
  * `_metadata.file_path` string for any manifest file path — it is
  * the join key of the tracked-read fast path, and a silent mismatch
  * would null every non-materialized row id (caught at runtime by the
  * raise_error net, but pinned here at the source). The probe uses
  * the ENGINE'S scan shape — `option("basePath", dir).parquet(files)`
  * over explicit file lists — because the metadata string's encoding
  * depends on how the file index was built: directory discovery
  * double-encodes special characters, the explicit-list shape (the
  * only one graft's readers use) single-encodes, matching the
  * listing-path form metadataFilePath derives. */
class MetadataFilePathSpec extends SparkTestBase {

  private def walk(f: java.io.File): Seq[String] =
    if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
    else if (f.getName.endsWith(".parquet")) Seq(f.getAbsolutePath) else Nil

  test("derived form equals _metadata.file_path under the engine's scan shape " +
      "for encoding-free layouts; hive-escaped values pin the fallback's reason") {
    val dir = java.nio.file.Files.createTempDirectory("graftmfp").toString
    spark.range(6).select(col("id"), (col("id") % 2).as("p"))
      .write.partitionBy("p").parquet(s"$dir/t1")
    // coalesce(1): a zero-row part file yields no _metadata rows, so
    // the probe's distinct() would under-count vs the disk walk
    spark.range(3).coalesce(1).write.parquet(s"$dir/flat")
    Seq(s"$dir/t1", s"$dir/flat").foreach { table =>
      val files = walk(new java.io.File(table))
      val metas = spark.read.option("basePath", table).parquet(files: _*)
        .select(col("_metadata.file_path")).distinct().collect()
        .map(_.getString(0)).sorted.toSeq
      val derived = files
        .map(f => SnapshotTable.metadataFilePath(spark, f)).sorted
      assert(metas == derived, s"\nmeta   =$metas\nderived=$derived")
      // idempotent on an already-qualified string (manifest entries
      // may carry the scheme already)
      assert(SnapshotTable.metadataFilePath(spark, metas.head) == metas.head)
      assert(derived.forall(!_.contains('%'))) // the fast-path guard's shape
    }
    // the reason for the '%'-fallback: on layouts where any segment
    // percent-encodes, Spark's file index has been OBSERVED to
    // re-encode the listing path an extra time (meta
    // 't%25201/p%2520x=a%25253A0' vs the single-encoded derived
    // form) — and the depth varies with session listing-cache state,
    // so exact string equality is not a stable contract there. The
    // guard must trip on any such layout (the probe-and-fixpoint
    // fallback owns it; the tracked-table test below proves its ids);
    // whether this particular run happens to agree is NOT asserted.
    spark.range(4).select(col("id"),
        concat(lit("a:"), (col("id") % 2).cast("string")).as("p x"))
      .write.partitionBy("p x").parquet(s"$dir/t 1")
    val escFiles = walk(new java.io.File(s"$dir/t 1"))
    val escDerived = escFiles
      .map(f => SnapshotTable.metadataFilePath(spark, f)).sorted
    assert(escDerived.forall(_.contains('%'))) // guard trips
  }

  test("RidBaseLookup: codegen and interpreted eval agree; miss returns null") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.unsafe.types.UTF8String
    val paths = Seq("file:/t/data/c-1/part-0.parquet",
      "file:/t/data/c-1/part-1.parquet",
      "file:/t/π odd/part-2.parquet")
    val pairs = paths.zipWithIndex
      .map { case (p, i) => (RidBaseLookup.hash(p), i * 1000L) }.sortBy(_._1)
    val expr = (c: org.apache.spark.sql.Column) => ColumnBridge.column(
      RidBaseLookup(ColumnBridge.expression(c),
        pairs.map(_._1).toArray, pairs.map(_._2).toArray))
    import spark.implicits._
    val df = (paths :+ "file:/t/data/c-9/unknown.parquet").toDF("p")
    val got = df.select(col("p"), expr(col("p")).as("b")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    paths.zipWithIndex.foreach { case (p, i) =>
      assert(got(p) == Some(i * 1000L), s"codegen lookup wrong for $p")
    }
    assert(got("file:/t/data/c-9/unknown.parquet").isEmpty)
    // interpreted eval path (no codegen) must agree
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    def ev(s: String): Any = RidBaseLookup(
      Literal(UTF8String.fromString(s), StringType),
      pairs.map(_._1).toArray, pairs.map(_._2).toArray).eval(null)
    paths.zipWithIndex.foreach { case (p, i) =>
      assert(ev(p) == i * 1000L)
    }
    assert(ev("nope") == null)
  }

  test("tracked table under a special-char root: ids dense and stable through a rewrite") {
    // End-to-end: if the derived join key ever diverged from the scan
    // string, the readGroupsWithRid raise_error net would fire here.
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-mfp e2e").toString
    val path = s"$dir/t x"
    SnapshotTable.create(spark, path, StructType(Seq(
      StructField("k", LongType), StructField("cat", StringType),
      StructField("v", DoubleType))), rowTracking = true)
    val df = spark.range(200).select(col("id").as("k"),
      concat(lit("c "), (col("id") % 3).cast("string")).as("cat"),
      (col("id") % 7).cast("double").as("v"))
    SnapshotTable.append(df, path, partitionCols = Seq("cat"))
    val before = SnapshotTable.readWithRowIds(spark, path)
      .select(col("k"), col(SnapshotTable.RowIdCol).as("rid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before.size == 200 && before.values.toSet.size == 200)
    SnapshotTable.update(spark, path, Seq("v" -> (col("v") + 100.0)),
      col("k") % 10 === 3)
    val after = SnapshotTable.readWithRowIds(spark, path)
      .select(col("k"), col(SnapshotTable.RowIdCol).as("rid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before, "row ids must survive the rewrite unchanged")
  }
}
