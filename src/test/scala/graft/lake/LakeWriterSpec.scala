package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.Tables

class LakeWriterSpec extends SparkTestBase {

  test("compaction bounds file counts without changing data") {
    val base = Files.createTempDirectory("graft-compact").toString
    val orders = Tables.orders(spark, sf0001)
      .withColumn("o_year", year(col("o_orderdate")))
    // fragment: many small files per partition
    orders.repartition(16).write.mode("overwrite")
      .partitionBy("o_year").parquet(base)
    def filesPerDir: Map[String, Int] =
      new java.io.File(base).listFiles().filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
      }.toMap
    assert(filesPerDir.values.max > 1, "setup should fragment")
    val before = spark.read.parquet(base).count()

    LakeWriter.compact(spark, base, Seq("o_year"), filesPerPartition = 1)
    assert(filesPerDir.values.max === 1, s"still fragmented: $filesPerDir")
    assert(spark.read.parquet(base).count() === before)
  }

  test("schema evolution: mergeSchema surfaces late-added columns") {
    val base = Files.createTempDirectory("graft-evolve").toString
    val v1 = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
    v1.write.mode("overwrite").parquet(base)
    // a later writer adds a column
    val v2 = Tables.orders(spark, sf0001)
      .select(col("o_orderkey") + 1000000L, col("o_totalprice"), col("o_orderstatus"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    v2.write.mode("append").parquet(base)

    val merged = spark.read.option("mergeSchema", true).parquet(base)
    assert(merged.columns.toSet === Set("o_orderkey", "o_totalprice", "o_orderstatus"))
    assert(merged.count() === v1.count() * 2)
    // old files read the new column as NULL
    assert(merged.filter(col("o_orderstatus").isNull).count() === v1.count())
  }

  test("partitionStats reports files/bytes and compactPartitions rewrites only fat partitions") {
    val base = Files.createTempDirectory("graft-stats").toString
    val li = Tables.lineitem(spark, sf0001)
    // 4 files per l_returnflag partition
    li.repartition(4).write.mode("overwrite").partitionBy("l_returnflag").parquet(base)
    // fatten ONE partition with 8 extra files
    li.filter(col("l_returnflag") === "R").drop("l_returnflag").repartition(8)
      .write.mode("append").parquet(s"$base/l_returnflag=R")
    val before = LakeWriter.partitionStats(spark, base)
    val fat = before.find(_.partition == "l_returnflag=R").get
    assert(fat.files === 12)
    assert(before.filter(_.partition != "l_returnflag=R").forall(_.files === 4))
    assert(before.forall(_.bytes > 0))

    val total = spark.read.parquet(base).count()
    val thinFiles = LakeWriter.partitionStats(spark, base)
      .filter(_.partition != "l_returnflag=R")
    val rewritten = LakeWriter.compactPartitions(spark, base, maxFiles = 6)
    assert(rewritten === Seq("l_returnflag=R"))
    val after = LakeWriter.partitionStats(spark, base)
    assert(after.find(_.partition == "l_returnflag=R").get.files === 1)
    // untouched partitions keep their exact stats
    assert(after.filter(_.partition != "l_returnflag=R") === thinFiles)
    assert(spark.read.parquet(base).count() === total)
  }

  test("pinned schema survives late writer drift; drift report names the columns") {
    val base = Files.createTempDirectory("graft-pin").toString + "/t"
    val v1 = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    LakeWriter.writePartitioned(v1, base, Seq("o_orderstatus"))
    LakeWriter.pinSchema(spark, base)

    // a late writer appends a file with an extra column and a missing one
    Tables.orders(spark, sf0001).limit(10)
      .select(col("o_orderkey") + 9000000L, col("o_orderpriority"),
        lit("X").as("o_orderstatus"))
      .toDF("o_orderkey", "o_surprise", "o_orderstatus")
      .write.mode("append").partitionBy("o_orderstatus").parquet(base)

    val pinned = LakeWriter.readPinned(spark, base)
    assert(pinned.columns.toSeq.sorted ===
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
    assert(pinned.count() === v1.count() + 10)
    // the late file's rows read the missing pinned column as NULL
    assert(pinned.filter(col("o_totalprice").isNull).count() === 10)
    val (added, removed) = LakeWriter.schemaDrift(spark, base)
    assert(added === Seq("o_surprise") && removed === Nil)
    // unpinned path fails loudly
    assertThrows[IllegalArgumentException](
      LakeWriter.readPinned(spark, Files.createTempDirectory("graft-nopin").toString))
  }

  test("metrics history records snapshots and trends drive compaction") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-hist").toString
    val metrics = s"$base/_metrics_table"
    val data = s"$base/t"
    val li = Tables.lineitem(spark, sf0001)
    li.repartition(2).write.mode("overwrite").partitionBy("l_returnflag").parquet(data)
    LakeWriter.recordStats(spark, data, metrics, observedAtMs = 1000L)
    // partition R accretes small files between snapshots
    li.filter(col("l_returnflag") === "R").drop("l_returnflag").repartition(6)
      .write.mode("append").parquet(s"$data/l_returnflag=R")
    LakeWriter.recordStats(spark, data, metrics, observedAtMs = 2000L)

    val hist = LakeWriter.statsHistory(spark, metrics)
    assert(hist.select("observed_at").distinct().count() === 2)
    assert(hist.filter(col("observed_at") === 1000L).count() ===
      hist.filter(col("observed_at") === 2000L).count())

    // absolute threshold: only R is past maxFiles
    val byMax = LakeWriter.compactionCandidates(spark, metrics, maxFiles = 4)
      .as[(String, Long, Long, Long)].collect()
    assert(byMax.toSeq === Seq(("l_returnflag=R", 2L, 8L, 6L)))
    // growth trend: R grew by 6, others by 0
    val byGrowth = LakeWriter
      .compactionCandidates(spark, metrics, maxFiles = 100, minGrowth = 3L)
      .as[(String, Long, Long, Long)].collect()
    assert(byGrowth.map(_._1).toSeq === Seq("l_returnflag=R"))

    // the candidate feeds the existing compactor; the next snapshot
    // shows the file count back under control
    val rewritten = LakeWriter.compactPartitions(spark, data, maxFiles = 4)
    assert(rewritten === byMax.map(_._1).toSeq)
    LakeWriter.recordStats(spark, data, metrics, observedAtMs = 3000L)
    val nowR = LakeWriter.statsHistory(spark, metrics)
      .filter(col("observed_at") === 3000L && col("partition") === "l_returnflag=R")
      .select("files").as[Long].collect()
    assert(nowR.toSeq === Seq(1L))

    // retention side: over the last 2 snapshots (t2, t3) only R
    // changed — every other partition reports cold
    val cold = LakeWriter.coldPartitions(spark, metrics, unchangedSnapshots = 2)
      .select("partition").as[String].collect().toSet
    val all = LakeWriter.partitionStats(spark, data).map(_.partition).toSet
    assert(cold === all - "l_returnflag=R")
    // over all 3 snapshots R changed twice, so still excluded
    val cold3 = LakeWriter.coldPartitions(spark, metrics, unchangedSnapshots = 3)
      .select("partition").as[String].collect().toSet
    assert(cold3 === all - "l_returnflag=R")
    assertThrows[IllegalArgumentException](
      LakeWriter.coldPartitions(spark, metrics, unchangedSnapshots = 9))
  }

  test("writeObserved computes load metrics during the write pass") {
    val base = Files.createTempDirectory("graft-observe").toString + "/t"
    val li = Tables.lineitem(spark, sf0001)
    val m = LakeWriter.writeObserved(li, base, Seq("l_returnflag"),
      Seq(count(lit(1)).as("rows"),
        sum(col("l_quantity")).as("qty"),
        count(when(col("l_discount") > 0.05, 1)).as("discounted")))
    assert(m("rows") === li.count())
    assert(math.abs(m("qty").asInstanceOf[Double] -
      li.agg(sum("l_quantity")).head.getDouble(0)) < 1e-6)
    assert(m("discounted") === li.filter(col("l_discount") > 0.05).count())
    assert(spark.read.parquet(base).count() === li.count())
  }

  test("compaction refuses to touch snapshot-table paths") {
    val base = Files.createTempDirectory("graft-guard").toString + "/t"
    graft.lake.SnapshotTable.append(
      Tables.orders(spark, sf0001).limit(10), base)
    assertThrows[IllegalArgumentException](
      LakeWriter.compactPartitions(spark, base, maxFiles = 1))
    assertThrows[IllegalArgumentException](
      LakeWriter.compact(spark, base, Nil))
  }

  test("splitByPredicate partitions rows exactly, nulls to the right") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, null), (null, "c"))
      .toDF("v", "s")
    val (yes, no) = LakeWriter.splitByPredicate(df, col("v") > 1)
    assert(yes.count() === 1)
    assert(no.count() === 2) // v=1 fails, v=null is not-true
  }
}
