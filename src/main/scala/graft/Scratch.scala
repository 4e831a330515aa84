package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only microbenchmark scratchpad for the optimization round —
  * not part of the driver surface. Run:
  *   sbt "runMain graft.Scratch"
  */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label%-50s ${(System.nanoTime() - t0) / 1e9}%.3fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft-scratch").toString
    val df = (1 to 37).map(i => (s"s$i", i * 1.5)).toDF("sessionId", "kwhTotal")
      .coalesce(1)

    // warmup session machinery
    time("warmup count")(df.count())

    time("plain parquet write (snappy default)")(
      df.write.mode("overwrite").parquet(s"$base/p1"))
    time("plain parquet write zstd")(
      df.write.mode("overwrite").option("compression", "zstd").parquet(s"$base/p2"))
    time("plain parquet write zstd again")(
      df.write.mode("overwrite").option("compression", "zstd").parquet(s"$base/p3"))
    time("append v1 (create)")(
      graft.lake.SnapshotTable.append(df, s"$base/t1"))
    time("append v2")(
      graft.lake.SnapshotTable.append(df, s"$base/t1"))
    time("append v3")(
      graft.lake.SnapshotTable.append(df, s"$base/t1"))
    (1 to 10).foreach { i =>
      time(s"merge small #$i")(
        graft.lake.SnapshotTable.merge(
          Seq((s"s$i", 99.0)).toDF("sessionId", "kwhTotal").coalesce(1),
          s"$base/t1", Seq("sessionId")))
    }
    time("read + count")(
      graft.lake.SnapshotTable.read(spark, s"$base/t1").count())
    spark.stop()
  }
}
