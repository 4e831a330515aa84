package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured-choice harness for the bloom-build commit cost (the
  * "fuse withBlooms into the stats pass" question): times the same
  * append with blooms OFF vs ON, interleaved A/B/A/B over several
  * rounds so host drift cancels, and prints per-leg medians. The
  * bloom leg's delta over the plain leg IS the whole second-scan
  * cost (write + footer pass are common), which is the ceiling any
  * fusion could save. See the conclusion at
  * SnapshotTable.withBlooms. */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bloom-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nFiles = 8

    def freshDir(): String =
      java.nio.file.Files.createTempDirectory("graft-bloombench").toString + "/t"

    val df = spark.range(rows)
      .select(col("id"), md5(col("id").cast("string")).as("sid"),
        (col("id") % 1000).cast("double").as("v"))
      .repartition(nFiles)
      .persist()
    df.count() // materialize once; both legs read the same cached input

    def appendPlain(): Double = {
      val path = freshDir()
      val t0 = System.nanoTime()
      graft.lake.SnapshotTable.append(df, path)
      (System.nanoTime() - t0) / 1e9
    }
    def appendBloomed(): Double = {
      val path = freshDir()
      graft.lake.SnapshotTable.create(spark, path, df.schema)
      graft.lake.SnapshotTable.setBloomColumns(spark, path, Seq("sid"))
      val t0 = System.nanoTime()
      graft.lake.SnapshotTable.append(df, path)
      (System.nanoTime() - t0) / 1e9
    }

    // split the bloom leg's delta into scan-vs-aggregation: time the
    // same second read with (a) a trivial count over the hashes and
    // (b) the real per-file bloom aggregation — if (b) ≈ (a), the
    // aggregation machinery is free and the re-read is the whole
    // cost (the fusion ceiling)
    def splitProbe(): (Double, Double, Double) = {
      val path = freshDir()
      graft.lake.SnapshotTable.create(spark, path, df.schema)
      graft.lake.SnapshotTable.setBloomColumns(spark, path, Seq("sid"))
      graft.lake.SnapshotTable.append(df, path)
      val files = graft.lake.SnapshotTable.liveFiles(spark, path)
      val raw = spark.read.parquet(files: _*)
      val t0 = System.nanoTime()
      raw.select(xxhash64(col("sid")).as("h")).agg(count(col("h"))).collect()
      val scanOnly = (System.nanoTime() - t0) / 1e9
      // formulation A (SHIPS in SnapshotTable.withBlooms):
      // typed-Aggregator udaf over groupBy(file)
      val agg = udaf(new graft.functions.BloomBitsAggregator(rows / nFiles, 1L << 19))
      val t1 = System.nanoTime()
      raw.select(input_file_name().as("_f"), xxhash64(col("sid")).as("h"))
        .groupBy("_f").agg(agg(col("h"))).collect()
      val aggFull = (System.nanoTime() - t1) / 1e9
      // formulation B (measured TIE — 0.254s vs 0.255s — kept as the
      // regression leg): mapPartitions into live BloomFilters
      val bits = 1L << 19
      val items = rows / nFiles
      val t2 = System.nanoTime()
      raw.select(input_file_name().as("_f"), xxhash64(col("sid")).as("h"))
        .rdd.mapPartitions { it =>
          val acc = scala.collection.mutable.HashMap
            .empty[String, org.apache.spark.util.sketch.BloomFilter]
          it.foreach { r =>
            val bf = acc.getOrElseUpdate(r.getString(0),
              org.apache.spark.util.sketch.BloomFilter.create(items, bits))
            if (!r.isNullAt(1)) bf.putLong(r.getLong(1))
          }
          acc.iterator.map { case (f, bf) =>
            val o = new java.io.ByteArrayOutputStream(); bf.writeTo(o)
            f -> o.toByteArray
          }
        }
        .reduceByKey { (a, b) =>
          val bx = org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(a))
          bx.mergeInPlace(org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(b)))
          val o = new java.io.ByteArrayOutputStream(); bx.writeTo(o)
          o.toByteArray
        }.collect()
      val mapParts = (System.nanoTime() - t2) / 1e9
      (scanOnly, aggFull, mapParts)
    }

    appendPlain(); appendBloomed() // warmup
    val rounds = 5
    val (plain, bloomed) = (1 to rounds).map { _ =>
      (appendPlain(), appendBloomed())
    }.unzip
    val splits = (1 to rounds).map(_ => splitProbe())
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def r3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
    println(s"""{"metric":"bloom_commit_ab","rows":$rows,"files":$nFiles,""" +
      s""""plain_med":${r3(med(plain))},"bloomed_med":${r3(med(bloomed))},""" +
      s""""overhead_med":${r3(med(bloomed) - med(plain))},""" +
      s""""scan_only_med":${r3(med(splits.map(_._1)))},""" +
      s""""bloom_udaf_med":${r3(med(splits.map(_._2)))},""" +
      s""""bloom_mapparts_med":${r3(med(splits.map(_._3)))},""" +
      s""""plain":[${plain.map(r3).mkString(",")}],""" +
      s""""bloomed":[${bloomed.map(r3).mkString(",")}]}""")
    spark.stop()
  }
}
