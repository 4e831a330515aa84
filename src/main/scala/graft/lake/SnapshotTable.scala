package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal snapshot/commit-log table over parquet — the gap left by
  * emulating the reference's Iceberg sink with dynamic partition
  * overwrite (SURVEY.md §7.4): versioned reads and time travel.
  *
  * Layout:
  *   path/data/c-<uuid>/...            immutable per-commit parquet
  *   path/_graft_log/v<version>        manifest file: the COMPLETE
  *                                     live file set at that version
  *
  * Each manifest is a full snapshot (no log replay), written to a
  * temp dir and atomically renamed — a reader always sees either the
  * previous or the new version, never a partial commit. Data files
  * are immutable; overwritePartitions drops entries of the touched
  * partitions from the new manifest without deleting files, so every
  * earlier version remains readable (time travel). Concurrent writers
  * are safe via optimistic concurrency: the manifest rename is a CAS
  * on the version number, and a loser re-reads the winner's manifest
  * and retries (see commit()) — no lock service required.
  */
object SnapshotTable {

  private case class Entry(commitDir: String, filePath: String)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(path: String) = s"$path/_graft_log"

  private val versionName = "^v(\\d+)$".r

  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val dir = new Path(logDir(path))
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case versionName(n) => n.toLong }.sorted.toSeq
  }

  def latestVersion(spark: SparkSession, path: String): Option[Long] =
    versions(spark, path).lastOption

  /** Manifests are single small metadata files read/written on the
    * driver (the table-format norm — Delta/Iceberg logs are driver
    * IO too): one `commitDir\tfilePath` line per live file. */
  private def readManifest(spark: SparkSession, path: String, version: Long): Seq[Entry] = {
    val in = fs(spark, path).open(new Path(s"${logDir(path)}/v$version"))
    val content = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    content.split("\n").iterator.filter(_.nonEmpty).map { line =>
      val Array(c, p) = line.split("\t", 2)
      Entry(c, p)
    }.toSeq
  }

  /** Atomically publish manifest `version`; returns false if another
    * writer won that version. The publish is a create-if-absent CAS:
    * on the local FS a hard link (atomic, fails if the target exists),
    * elsewhere a rename (HDFS rename onto an existing FILE fails).
    * Content is fully written to the tmp file first, so a reader can
    * never observe a partial manifest. */
  private def publishManifest(spark: SparkSession, path: String, version: Long,
      entries: Seq[Entry]): Boolean = {
    val f = fs(spark, path)
    f.mkdirs(new Path(logDir(path)))
    val tmp = new Path(s"${logDir(path)}/.tmp-${java.util.UUID.randomUUID.toString.take(12)}")
    val out = f.create(tmp, true)
    try out.write(entries.map(e => s"${e.commitDir}\t${e.filePath}").mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(s"${logDir(path)}/v$version")
    val won =
      if (f.getScheme == "file")
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      else !f.exists(dst) && f.rename(tmp, dst)
    if (won && f.getScheme == "file") f.delete(tmp, false)
    else if (!won) f.delete(tmp, false)
    won
  }

  final class ConcurrentCommitException(path: String, attempts: Int)
    extends RuntimeException(s"gave up after $attempts contended commit attempts at $path")

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

  /** Optimistic-concurrency commit: the data files are written ONCE
    * to a unique dir, then the manifest is advanced with a
    * rename-as-CAS loop — a writer that loses the race re-reads the
    * winner's manifest, re-applies its own carryOver, and retries with
    * the next version number. No lock service needed; contention costs
    * one manifest rewrite per retry, never a data rewrite. A crashed
    * attempt (data written, manifest never committed) leaves an orphan
    * dir that no manifest references.
    */
  private def commit(df: DataFrame, path: String, partitionCols: Seq[String],
      carryOver: Seq[Entry] => Seq[Entry], maxAttempts: Int = 20): Long = {
    val spark = df.sparkSession
    val commitDir = s"$path/data/c-${java.util.UUID.randomUUID.toString.take(12)}"
    val w = df.write.mode("errorifexists").option("compression", "zstd")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(commitDir)
    val added = listParquet(fs(spark, path), new Path(commitDir))
      .map(Entry(commitDir, _))
    var attempt = 0
    while (attempt < maxAttempts) {
      // linearized log: the commit targets latest+1 and bases its
      // carryOver on exactly the latest manifest; if another writer
      // publishes first, the CAS fails and we re-read their manifest
      val version = latestVersion(spark, path).getOrElse(0L) + 1
      val previous = if (version == 1L) Nil else readManifest(spark, path, version - 1)
      if (publishManifest(spark, path, version, carryOver(previous) ++ added))
        return version
      attempt += 1
      Thread.sleep(scala.util.Random.nextInt(50).toLong + 10)
    }
    throw new ConcurrentCommitException(path, maxAttempts)
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
    * basePath reads keep hive partition columns visible. Schema
    * evolution across commits is handled like parquet mergeSchema:
    * columns a commit lacks surface as NULL (unionByName with
    * allowMissingColumns), so an old snapshot stays readable after a
    * later commit adds fields. */
  def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, path))
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $path"))
    val entries = readManifest(spark, path, v)
    require(entries.nonEmpty, s"empty manifest v$v")
    entries.groupBy(_.commitDir).map { case (dir, es) =>
      spark.read.option("basePath", dir).option("mergeSchema", true)
        .parquet(es.map(_.filePath): _*)
    }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }
}
