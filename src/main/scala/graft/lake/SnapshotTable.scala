package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal snapshot/commit-log table over parquet — the gap left by
  * emulating the reference's Iceberg sink with dynamic partition
  * overwrite (SURVEY.md §7.4): versioned reads and time travel.
  *
  * Layout:
  *   path/data/c<version>/...          immutable per-commit parquet
  *   path/_graft_log/v<version>/       manifest: the COMPLETE live
  *                                     file set at that version
  *
  * Each manifest is a full snapshot (no log replay), written to a
  * temp dir and atomically renamed — a reader always sees either the
  * previous or the new version, never a partial commit. Data files
  * are immutable; overwritePartitions drops entries of the touched
  * partitions from the new manifest without deleting files, so every
  * earlier version remains readable (time travel). Single-writer by
  * assumption (documented; multi-writer needs a coordinating lock,
  * out of scope for this round).
  */
object SnapshotTable {

  private case class Entry(commitDir: String, filePath: String)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(path: String) = s"$path/_graft_log"

  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val dir = new Path(logDir(path))
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.drop(1).toLong).sorted.toSeq
  }

  def latestVersion(spark: SparkSession, path: String): Option[Long] =
    versions(spark, path).lastOption

  private def readManifest(spark: SparkSession, path: String, version: Long): Seq[Entry] = {
    import spark.implicits._
    spark.read.json(s"${logDir(path)}/v$version")
      .select("commitDir", "filePath").as[(String, String)]
      .collect().map(t => Entry(t._1, t._2)).toSeq
  }

  private def writeManifest(spark: SparkSession, path: String, version: Long,
      entries: Seq[Entry]): Unit = {
    import spark.implicits._
    val tmp = s"${logDir(path)}/.tmp-v$version"
    entries.map(e => (e.commitDir, e.filePath))
      .toDF("commitDir", "filePath")
      .repartition(1).write.mode("overwrite").json(tmp)
    val f = fs(spark, path)
    val dst = new Path(s"${logDir(path)}/v$version")
    if (!f.rename(new Path(tmp), dst))
      throw new IllegalStateException(s"commit v$version failed (concurrent writer?)")
  }

  private def listParquet(f: FileSystem, dir: Path): Seq[String] = {
    val it = f.listFiles(dir, true)
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet"))
        buf += s.getPath.toString
    }
    buf.toSeq
  }

  private def commit(df: DataFrame, path: String, partitionCols: Seq[String],
      carryOver: Seq[Entry] => Seq[Entry]): Long = {
    val spark = df.sparkSession
    val version = latestVersion(spark, path).getOrElse(0L) + 1
    // unique suffix: a crashed attempt (data written, manifest rename
    // failed) must never block the retry — its orphan dir is simply
    // never referenced by any manifest
    val commitDir = s"$path/data/c$version-${java.util.UUID.randomUUID.toString.take(8)}"
    val w = df.write.mode("errorifexists").option("compression", "zstd")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(commitDir)
    val added = listParquet(fs(spark, path), new Path(commitDir))
      .map(Entry(commitDir, _))
    val previous = latestVersion(spark, path).filter(_ < version)
      .map(readManifest(spark, path, _)).getOrElse(Nil)
    writeManifest(spark, path, version, carryOver(previous) ++ added)
    version
  }

  /** Append commit: previous live files all carry over. */
  def append(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Long =
    commit(df, path, partitionCols, identity)

  /** Replace the partitions present in `df` (Iceberg
    * overwritePartitions semantics), leaving other partitions and all
    * previous versions intact. */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Long = {
    require(partitionCols.nonEmpty, "overwritePartitions needs partition columns")
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    // touched partition dir fragments, e.g. "event_date=2014-11-18/stationId=500".
    // Values must be escaped exactly as Spark's file writer escapes
    // them in directory names (URL-style for spaces/colons/%/...), and
    // NULL becomes the hive default partition name — otherwise the
    // fragment never matches the on-disk path and stale files survive
    // into the new manifest.
    val touched: Set[String] = df.select(partitionCols.map(col): _*).distinct()
      .collect().map { r =>
        partitionCols.zipWithIndex.map { case (c, i) =>
          val v = r.get(i)
          val escaped =
            if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
            else ExternalCatalogUtils.escapePathName(v.toString)
          s"${ExternalCatalogUtils.escapePathName(c)}=$escaped"
        }.mkString("/")
      }.toSet
    commit(df, path, partitionCols,
      prev => prev.filterNot(e => touched.exists(t => e.filePath.contains(s"/$t/"))))
  }

  /** Expire history: keep only the latest `keepVersions` manifests
    * and delete data files no kept manifest references. Time travel
    * to expired versions is gone afterwards (by design — this is the
    * storage-reclamation half of the snapshot contract). */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, "must keep at least one version")
    val f = fs(spark, path)
    val all = versions(spark, path)
    val (expired, kept) = all.splitAt(math.max(0, all.size - keepVersions))
    if (expired.isEmpty) return
    val live: Set[String] =
      kept.flatMap(readManifest(spark, path, _)).map(_.filePath).toSet
    val dead = expired.flatMap(readManifest(spark, path, _))
      .map(_.filePath).toSet -- live
    dead.foreach(p => f.delete(new Path(p), false))
    expired.foreach(v => f.delete(new Path(s"${logDir(path)}/v$v"), true))
  }

  /** Read the table at `version` (default: latest). Per-commit
    * basePath reads keep hive partition columns visible. */
  def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, path))
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $path"))
    val entries = readManifest(spark, path, v)
    require(entries.nonEmpty, s"empty manifest v$v")
    entries.groupBy(_.commitDir).map { case (dir, es) =>
      spark.read.option("basePath", dir).parquet(es.map(_.filePath): _*)
    }.reduce(_ unionByName _)
  }
}
