package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Lakehouse sink semantics (SURVEY.md §2.1 S3–S6): partitioned zstd
  * parquet with dynamic partition overwrite — re-running a layer
  * replaces only the partitions it touches (the reference's Iceberg
  * `overwritePartitions` / silver `partitionOverwriteMode=dynamic`,
  * jobs/ev_sessions_silver_etl_clean.py:41,215-225 and
  * jobs/ev_sessions_gold_etl.py:66,156).
  *
  * Scale posture: dynamic-partition writes sort rows by partition
  * columns within each task (Spark does this automatically) so each
  * task opens one file per partition at a time; for heavily skewed
  * partition keys, pass `repartitionCols` to shuffle-distribute the
  * hot partitions across tasks before the write.
  */
object LakeWriter {

  def ensureDynamicOverwrite(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

  /** Partitioned parquet sink (reference :215-219). */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      compression: String = "zstd",
      repartitionCols: Seq[String] = Nil): Unit = {
    ensureDynamicOverwrite(df.sparkSession)
    val out = if (repartitionCols.nonEmpty)
      df.repartition(repartitionCols.map(df.col): _*)
    else df
    out.write
      .mode("overwrite")
      .option("compression", compression)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Complementary predicate split — the generalized good/bad
    * bifurcation (SURVEY.md §2.2 P5). The two frames partition the
    * input exactly: pred-true rows left, everything else (incl. rows
    * where pred is NULL) right. */
  def splitByPredicate(df: DataFrame, pred: Column): (DataFrame, DataFrame) =
    (df.filter(pred), df.filter(!pred.eqNullSafe(true)))

  /** Idempotent partition-overwrite load into a managed catalog table
    * (the `writeTo(t).overwritePartitions()` equivalent, reference
    * gold :156). Only partitions present in `df` are replaced. */
  def overwritePartitions(df: DataFrame, table: String): Unit = {
    ensureDynamicOverwrite(df.sparkSession)
    df.write.mode("overwrite").insertInto(table)
  }

  /** Partition discovery refresh (the reference's commented
    * MSCK REPAIR TABLE, silver :262). */
  def repairTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE $table")

  /** Small-file compaction: rewrite a parquet layout with a bounded
    * file count per partition. Streaming microbatches and dynamic
    * partition overwrites accumulate small files; periodic compaction
    * keeps scan task counts (and S3 listing) sane at scale. The
    * rewrite goes through a temp location then replaces the original
    * so a crash never leaves the layout half-compacted. */
  def compact(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String],
      filesPerPartition: Int = 1,
      compression: String = "zstd"): Unit = {
    import org.apache.spark.sql.functions.{lit, monotonically_increasing_id, pmod}
    requireNotSnapshotTable(spark, path)
    val df = spark.read.parquet(path)
    val tmp = path.stripSuffix("/") + "_compacting"
    // hashing on the partition columns sends each partition value to
    // exactly one task → one file per dir; for >1 files per dir an
    // explicit salt spreads a partition's rows over ≤ N tasks
    val out =
      if (partitionCols.isEmpty) df.repartition(filesPerPartition)
      else if (filesPerPartition <= 1) df.repartition(partitionCols.map(df.col): _*)
      else df.repartition(partitionCols.map(df.col) :+
        pmod(monotonically_increasing_id(), lit(filesPerPartition.toLong)): _*)
    val writer = out.write.mode("overwrite").option("compression", compression)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer).parquet(tmp)
    // atomic-ish swap via rename
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst): Unit
  }

  /** Partitioned write with free inline metrics: the caller's
    * aggregate expressions are computed DURING the write pass via
    * `observe` (CollectMetrics) — no second scan of the input, which
    * at lake scale is the difference between "metrics for every load"
    * and "metrics sometimes". Returns the observed row. */
  def writeObserved(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      metrics: Seq[Column],
      compression: String = "zstd"): Map[String, Any] = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs, metrics.head, metrics.tail: _*)
    writePartitioned(observed, path, partitionCols, compression)
    obs.get
  }

  /** Per-partition file statistics of a hive-layout parquet dir.
    * Driver-side listing — the same cost class as Spark's own
    * partition discovery over the path; at lake scale this is the
    * input to compaction policy, retention, and small-file alerts. */
  final case class PartitionStat(partition: String, files: Long, bytes: Long)

  def partitionStats(spark: SparkSession, path: String): Seq[PartitionStat] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = root.toUri.getPath.stripSuffix("/")
    val it = f.listFiles(root, true)
    val acc = scala.collection.mutable.Map[String, (Long, Long)]()
    while (it.hasNext) {
      val s = it.next()
      val rel = s.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      // skip metadata/hidden trees (_graft_log, _SUCCESS, .tmp…)
      if (s.isFile && !rel.split("/").exists(seg => seg.startsWith("_") || seg.startsWith("."))) {
        val part = rel.split("/").dropRight(1).mkString("/")
        val (n, b) = acc.getOrElse(part, (0L, 0L))
        acc(part) = (n + 1, b + s.getLen)
      }
    }
    acc.toSeq.map { case (p, (n, b)) => PartitionStat(p, n, b) }.sortBy(_.partition)
  }

  /** Append one timestamped [[partitionStats]] snapshot of `path` to
    * a metrics table at `metricsPath` — the history that turns
    * point-in-time file counts into trends (small-file growth,
    * ingest-volume drift, retention pressure). `observedAtMs` is
    * caller-supplied so replays/backfills are deterministic and
    * testable. The metrics table is itself a plain parquet append —
    * snapshots are tiny (one row per partition), so a day of hourly
    * snapshots of a 10k-partition lake is ~240k rows. */
  def recordStats(
      spark: SparkSession,
      path: String,
      metricsPath: String,
      observedAtMs: Long): Unit = {
    import spark.implicits._
    val snap = partitionStats(spark, path)
      .map(p => (observedAtMs, p.partition, p.files, p.bytes))
      .toDF("observed_at", "partition", "files", "bytes")
    snap.coalesce(1).write.mode("append").parquet(metricsPath)
  }

  def statsHistory(spark: SparkSession, metricsPath: String): DataFrame =
    spark.read.parquet(metricsPath)

  /** Trend-driven compaction candidates from the metrics history:
    * partitions whose file count in the LATEST snapshot exceeds
    * `maxFiles`, or grew by at least `minGrowth` files since the
    * EARLIEST snapshot in the history (catching partitions that will
    * blow past the threshold before the next maintenance window).
    * Returns (partition, files_then, files_now, growth) — feed the
    * partition column into [[compactPartitions]]. */
  def compactionCandidates(
      spark: SparkSession,
      metricsPath: String,
      maxFiles: Int,
      minGrowth: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions._
    val hist = statsHistory(spark, metricsPath)
    val bounds = hist.agg(
      min(col("observed_at")).as("first_at"),
      max(col("observed_at")).as("last_at")).collect()(0)
    val (firstAt, lastAt) = (bounds.getLong(0), bounds.getLong(1))
    val now = hist.filter(col("observed_at") === lastAt)
      .select(col("partition"), col("files").as("files_now"))
    val then_ = hist.filter(col("observed_at") === firstAt)
      .select(col("partition"), col("files").as("files_then"))
    now.join(then_, Seq("partition"), "left")
      .select(col("partition"),
        coalesce(col("files_then"), lit(0L)).as("files_then"),
        col("files_now"),
        (col("files_now") - coalesce(col("files_then"), lit(0L))).as("growth"))
      .filter(col("files_now") > maxFiles || col("growth") >= minGrowth)
      .orderBy("partition")
  }

  /** Cold-partition report from the metrics history: partitions whose
    * (files, bytes) have not changed across the most recent
    * `unchangedSnapshots` snapshots — the retention/archival side of
    * [[compactionCandidates]] (move to cold storage, final
    * compaction, tighter vacuum). A partition must appear in ALL of
    * the inspected snapshots to count as cold — one absent from an
    * older snapshot is newly created, i.e. hot by definition. */
  def coldPartitions(
      spark: SparkSession,
      metricsPath: String,
      unchangedSnapshots: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    require(unchangedSnapshots >= 2, "need at least 2 snapshots to call anything cold")
    val hist = statsHistory(spark, metricsPath)
    val times = hist.select("observed_at").distinct()
      .orderBy(col("observed_at").desc).limit(unchangedSnapshots)
      .collect().map(_.getLong(0))
    require(times.length >= unchangedSnapshots,
      s"history has only ${times.length} snapshots, need $unchangedSnapshots")
    hist.filter(col("observed_at").isin(times.toSeq: _*))
      .groupBy(col("partition"))
      .agg(
        countDistinct(struct(col("files"), col("bytes"))).as("variants"),
        count(lit(1)).as("snaps"),
        max(col("files")).as("files"),
        max(col("bytes")).as("bytes"))
      .filter(col("variants") === 1 && col("snaps") === unchangedSnapshots)
      .select(col("partition"), col("files"), col("bytes"))
      .orderBy("partition")
  }

  /** Stats-driven small-file compaction: rewrite ONLY partitions
    * whose file count exceeds `maxFiles`, leaving every other
    * partition's files untouched (contrast [[compact]], which
    * rewrites the whole layout). Each fat partition is rewritten to
    * `filesPerPartition` files via a hidden staging dir, then swapped
    * in with two renames. NOT safe under concurrent readers or
    * writers on the path: between the renames the partition is
    * briefly absent, and a crash in that window leaves the original
    * content only in a hidden `.trash-*` dir that readers skip — the
    * partition vanishes from query results until the trash dir
    * (logged below) is renamed back by hand. Run it only in an
    * exclusive maintenance window (the same contract as Hive/HDFS
    * dir-swap compaction). Returns the partitions rewritten. */
  def compactPartitions(
      spark: SparkSession,
      path: String,
      maxFiles: Int,
      filesPerPartition: Int = 1,
      compression: String = "zstd"): Seq[String] = {
    import org.apache.hadoop.fs.Path
    requireNotSnapshotTable(spark, path)
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fat = partitionStats(spark, path).filter(p => p.partition.nonEmpty && p.files > maxFiles)
    fat.map { p =>
      val dir = new Path(s"$path/${p.partition}")
      val uuid = java.util.UUID.randomUUID.toString.take(8)
      val tmp = new Path(s"$path/.compact-$uuid")
      val trash = new Path(s"$path/.trash-$uuid")
      spark.read.parquet(dir.toString)
        .repartition(filesPerPartition)
        .write.mode("overwrite").option("compression", compression)
        .parquet(tmp.toString)
      if (!f.rename(dir, trash)) {
        f.delete(tmp, true)
        throw new IllegalStateException(s"compaction swap failed for $dir")
      }
      if (!f.rename(tmp, dir)) {
        f.rename(trash, dir) // roll back
        f.delete(tmp, true)
        throw new IllegalStateException(
          s"compaction swap failed for $dir (original restored from $trash)")
      }
      f.delete(trash, true)
      p.partition
    }
  }

  /** Pin the current inferred schema of a hive-layout parquet dir as
    * the path's read contract (`_graft_schema.json` at the root,
    * Spark StructType JSON). Snapshot tables already pin schema in
    * their manifest header; this closes the same gap for plain
    * partitioned dirs, where every reader otherwise re-infers —
    * paying a footer-sampling pass AND silently absorbing whatever a
    * late writer appended. */
  def pinSchema(spark: SparkSession, path: String): Unit = {
    val schema = spark.read.parquet(path).schema
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(new org.apache.hadoop.fs.Path(s"$path/_graft_schema.json"), true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  private def pinnedSchema(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_graft_schema.json")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(p), s"$path has no pinned schema (run pinSchema first)")
    val in = f.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    org.apache.spark.sql.types.DataType.fromJson(json)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
  }

  /** Read with the pinned schema: no inference pass (no footer
    * sampling at plan time), stable column set and types no matter
    * what later writers appended — columns a late file added are
    * ignored, columns it dropped read as NULL (parquet
    * read-by-name). The type-pinned contract readers get from the
    * snapshot table format, on a plain dir. */
  def readPinned(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(pinnedSchema(spark, path)).parquet(path)

  /** Drift report: columns the CURRENT layout has that the pinned
    * contract lacks (added) and pinned columns no longer present
    * (removed). Cheap gate for ingest jobs: refuse or re-pin when
    * nonempty. */
  def schemaDrift(spark: SparkSession, path: String): (Seq[String], Seq[String]) = {
    val pinned = pinnedSchema(spark, path).fieldNames.toSet
    val now = spark.read.option("mergeSchema", true).parquet(path).schema.fieldNames.toSet
    ((now -- pinned).toSeq.sorted, (pinned -- now).toSeq.sorted)
  }

  /** Path-rewriting maintenance must not touch snapshot tables —
    * moving/deleting their data files would orphan manifest entries;
    * those tables compact by committing a rewritten version instead. */
  private def requireNotSnapshotTable(spark: SparkSession, path: String): Unit = {
    val log = new org.apache.hadoop.fs.Path(s"$path/_graft_log")
    val f = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!f.exists(log),
      s"$path is a SnapshotTable (has _graft_log); path-level compaction would orphan its manifests")
  }

  /** Bucketed managed table: rows are hash-distributed into
    * `numBuckets` files per partition on `bucketCols` and sorted
    * within each bucket. Joins/aggregations between tables bucketed
    * on the same key skip the shuffle entirely (Exchange-free
    * sort-merge) — the co-located-join layout for repeated large
    * joins at scale. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }
}
