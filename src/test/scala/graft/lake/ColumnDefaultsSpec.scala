package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

class ColumnDefaultsSpec extends SparkTestBase {

  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-coldef-$tag").toString + "/t"

  test("initial default: files lacking the column read the default; values and genuine NULLs survive") {
    val path = fresh("basic")
    SnapshotTable.append(Seq(1L, 2L).toDF("k"), path)                    // v1: no 'c'
    SnapshotTable.addColumns(spark, path,
      Seq(StructField("c", IntegerType)), Map("c" -> "42"))              // v2: metadata-only
    assert(SnapshotTable.read(spark, path).select("c").as[Int]
      .collect().toSeq === Seq(42, 42))
    // post-add era: real values, including a genuine NULL
    SnapshotTable.append(Seq((3L, Some(7)), (4L, None)).toDF("k", "c"), path)
    val got = SnapshotTable.read(spark, path).orderBy("k").select("k", "c")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSeq
    assert(got === Seq(1L -> Some(42), 2L -> Some(42),
      3L -> Some(7), 4L -> None))
    // time travel: the pre-add era never shows the column
    assert(!SnapshotTable.read(spark, path, Some(1L)).columns.contains("c"))
  }

  test("an append that OMITS the defaulted column inherits the default (file-absence semantics)") {
    val path = fresh("omit")
    SnapshotTable.append(Seq((1L, "a")).toDF("k", "s"), path)
    SnapshotTable.addColumns(spark, path,
      Seq(StructField("c", DoubleType)), Map("c" -> "1.5"))
    SnapshotTable.append(Seq((2L, "b")).toDF("k", "s"), path) // no 'c' written
    assert(SnapshotTable.read(spark, path).orderBy("k").select("c").as[Double]
      .collect().toSeq === Seq(1.5, 1.5))
  }

  test("DML rewrite and compaction MATERIALIZE the default into rewritten files") {
    val path = fresh("dml")
    SnapshotTable.append(Seq(1L, 2L, 3L).toDF("k").coalesce(1), path)
    SnapshotTable.addColumns(spark, path,
      Seq(StructField("c", LongType)), Map("c" -> "9"))
    // merge updates k=2 → the touched file rewrites; carried-over
    // rows must keep the default as a REAL value in the new file
    SnapshotTable.merge(Seq((2L, 10L)).toDF("k", "c").coalesce(1),
      path, Seq("k"))
    val out = SnapshotTable.read(spark, path).orderBy("k").select("k", "c")
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 9L), (2L, 10L), (3L, 9L)))
    // the rewritten file physically contains c (not an absence-fill):
    // read it raw without the schema metadata
    val files = SnapshotTable.liveFiles(spark, path)
    val raw = spark.read.parquet(files: _*)
    assert(raw.columns.contains("c"))
    assert(raw.filter(col("k") === 1L).select("c").as[Long].head() === 9L)
    SnapshotTable.compact(spark, path, numFiles = 1)
    assert(SnapshotTable.read(spark, path).orderBy("k").select("c").as[Long]
      .collect().toSeq === Seq(9L, 10L, 9L))
  }

  test("defaults compose with re-add-after-drop: the fresh physical column serves the NEW default") {
    val path = fresh("readd")
    SnapshotTable.append(Seq((1L, 5.0)).toDF("k", "v").coalesce(1), path)
    SnapshotTable.dropColumn(spark, path, "v")
    SnapshotTable.addColumns(spark, path,
      Seq(StructField("v", DoubleType)), Map("v" -> "-1.0"))
    // the old file HAS a physical 'v' (tombstoned) but lacks the
    // minted fresh physical — it must read the default, never 5.0
    assert(SnapshotTable.read(spark, path).select("v").as[Double]
      .collect().toSeq === Seq(-1.0))
  }

  test("invalid defaults are refused: non-constant, uncastable") {
    val path = fresh("bad")
    SnapshotTable.append(Seq(1L).toDF("k"), path)
    intercept[IllegalArgumentException] {
      SnapshotTable.addColumns(spark, path,
        Seq(StructField("c", IntegerType)), Map("c" -> "k + 1"))
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.addColumns(spark, path,
        Seq(StructField("c", IntegerType)), Map("c" -> "'not a number'"))
    }
    intercept[IllegalArgumentException] { // default for a column not being added
      SnapshotTable.addColumns(spark, path,
        Seq(StructField("c", IntegerType)), Map("d" -> "1"))
    }
  }

  test("BOTH streaming decode paths serve initial defaults for files lacking the column") {
    import org.apache.spark.sql.streaming.Trigger
    for (mode <- Seq("never", "always")) { // Group API vs vectorized
      val base = Files.createTempDirectory(s"graft-coldef-stream-$mode").toString
      val (path, ckpt) = (s"$base/t", s"$base/ckpt")
      SnapshotTable.append(Seq(1L, 2L).toDF("k"), path)
      SnapshotTable.addColumns(spark, path,
        Seq(StructField("c", IntegerType)), Map("c" -> "42"))
      SnapshotTable.append(Seq((3L, 7)).toDF("k", "c"), path)
      val buf = scala.collection.mutable.ArrayBuffer[(Long, Option[Int])]()
      val q = spark.readStream.format("graft-snapshot")
        .option("vectorizedReader", mode).load(path)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized {
            buf ++= df.collect().map(r => (r.getLong(r.fieldIndex("k")),
              if (r.isNullAt(r.fieldIndex("c"))) None
              else Some(r.getInt(r.fieldIndex("c")))))
          }
          ()
        }
        .start()
      q.awaitTermination()
      assert(buf.sortBy(_._1).toSeq ===
        Seq(1L -> Some(42), 2L -> Some(42), 3L -> Some(7)),
        s"vectorizedReader=$mode must serve the initial default")
    }
  }

  test("the streaming change feed serves defaults when the whole range predates the column") {
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft-coldef-cdf").toString
    val (path, ckpt) = (s"$base/t", s"$base/ckpt")
    SnapshotTable.append(Seq(1L).toDF("k"), path)                 // v1: pre-add era
    SnapshotTable.addColumns(spark, path,
      Seq(StructField("c", IntegerType)), Map("c" -> "42"))       // v2
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Option[Int])]()
    val q = spark.readStream.format("graft-changes").load(path)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        buf.synchronized {
          buf ++= df.collect().map(r => (r.getLong(r.fieldIndex("k")),
            if (r.isNullAt(r.fieldIndex("c"))) None
            else Some(r.getInt(r.fieldIndex("c")))))
        }
        ()
      }
      .start()
    q.awaitTermination()
    assert(buf.toSeq === Seq(1L -> Some(42)))
  }

  test("filters over default-era files stay correct (no stats to prune by — conservative scan)") {
    val path = fresh("filter")
    SnapshotTable.append(Seq(1L, 2L).toDF("k"), path)
    SnapshotTable.addColumns(spark, path,
      Seq(StructField("c", IntegerType)), Map("c" -> "42"))
    SnapshotTable.append(Seq((3L, 1)).toDF("k", "c"), path)
    assert(SnapshotTable.readWhere(spark, path, col("c") === 42)
      .select("k").as[Long].collect().toSeq.sorted === Seq(1L, 2L))
    assert(SnapshotTable.readWhere(spark, path, col("c") === 1)
      .select("k").as[Long].collect().toSeq === Seq(3L))
  }
}
