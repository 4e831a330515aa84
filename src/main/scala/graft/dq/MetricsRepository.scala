package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Run-over-run metric history + drift detection — the anomaly-check
  * half of the Deequ shape: every VerificationSuite run can append
  * its metrics (keyed by a caller tag, e.g. the processing date), and
  * later runs assert each metric stayed within a relative tolerance
  * of the previous run. Catches the silent failures a single-run
  * check can't (e.g. row count halves but every constraint still
  * passes).
  *
  * Storage is plain append-mode parquet — same durability story as
  * the lake layers, readable by any engine.
  */
object MetricsRepository {

  /** Append one run's constraint metrics. */
  def append(spark: SparkSession, path: String, runTag: String,
      result: VerificationResult): Unit = {
    import spark.implicits._
    val rows = for {
      cr <- result.checkResults
      c <- cr.results
    } yield (runTag, cr.description, c.constraint, c.metric, c.success)
    rows.toDF("run_tag", "check", "constraint", "metric", "success")
      .repartition(1)
      .write.mode("append").parquet(path)
  }

  def history(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** SNAPSHOT-TABLE repository — the durable form of [[append]]: each
    * VerificationSuite run lands one commit of
    * (dataset, run_tag, check, constraint, metric, success, run_seq)
    * rows, so
    * the metric history gets the full table contract for free — time
    * travel ("what did quality look like last Tuesday"), CDC (stream
    * the metric feed), retention, and the commit-time policies for
    * the one-small-file-per-run ingest shape this produces. Keyed by
    * (dataset, run_tag): one repository table serves every dataset of
    * a pipeline, the Deequ MetricsRepository posture. */
  def appendRun(spark: SparkSession, tablePath: String, dataset: String,
      runTag: String, result: VerificationResult): Long = {
    import spark.implicits._
    val seq = nextRunSeq(spark, tablePath)
    val rows = for {
      cr <- result.checkResults
      c <- cr.results
    } yield (dataset, runTag, cr.description, c.constraint, c.metric,
      c.success, seq)
    val creating = seq == 0L
    val v = graft.lake.SnapshotTable.append(
      rows.toDF("dataset", "run_tag", "check", "constraint", "metric",
        "success", "run_seq")
        .coalesce(1), tablePath)
    // the repository's ingest shape is one tiny file per run, forever
    // — exactly what commit-time auto-compaction exists for. Arm it
    // once at table creation so the repository maintains itself
    // (merges are row-preserving: history counts, anomaly windows,
    // and time travel are unaffected).
    if (creating)
      graft.lake.SnapshotTable.setAutoCompact(spark, tablePath,
        minSmallFiles = 8, smallFileRows = 100000L)
    v
  }

  /** Persist a column PROFILE run into the same snapshot repository
    * (check = "__profile"), one row per (column, statistic) — so the
    * trailing-window [[anomalies]] check covers schema-level
    * statistics too, not just constraint metrics: a column whose
    * distinct count collapses or whose mean walks off passes every
    * boolean check and still trips here. Numeric-only statistics are
    * simply absent for non-numeric columns (no NaN padding — an
    * absent constraint never joins the anomaly window). */
  def appendProfile(spark: SparkSession, tablePath: String, dataset: String,
      runTag: String, profiles: Seq[Profiler.ColumnProfile]): Long = {
    import spark.implicits._
    val seq = nextRunSeq(spark, tablePath)
    val rows = profiles.flatMap { p =>
      Seq(
        (dataset, runTag, "__profile", s"Completeness(${p.column})",
          p.completeness, true),
        (dataset, runTag, "__profile", s"Distinctness(${p.column})",
          p.distinctCount.toDouble, true),
        (dataset, runTag, "__profile", s"Size(${p.column})",
          p.rowCount.toDouble, true)) ++
        p.minValue.map(v => (dataset, runTag, "__profile",
          s"Minimum(${p.column})", v, true)) ++
        p.maxValue.map(v => (dataset, runTag, "__profile",
          s"Maximum(${p.column})", v, true)) ++
        p.mean.map(v => (dataset, runTag, "__profile",
          s"Mean(${p.column})", v, true))
    }.map { case (d, t, ch, c, m, s) => (d, t, ch, c, m, s, seq) }
    val creating = seq == 0L
    val v = graft.lake.SnapshotTable.append(
      rows.toDF("dataset", "run_tag", "check", "constraint", "metric",
        "success", "run_seq")
        .coalesce(1), tablePath)
    if (creating)
      graft.lake.SnapshotTable.setAutoCompact(spark, tablePath,
        minSmallFiles = 8, smallFileRows = 100000L)
    v
  }

  /** Monotone per-append sequence a run's rows are stamped with: the
    * table version this append will land at (or later, under
    * contention — only monotonicity matters). [[anomalies]] orders
    * runs by it instead of by run_tag STRING comparison, which
    * mis-orders the common unpadded conventions ("r10" < "r2",
    * "2026-8-9" > "2026-10-01") exactly when a dataset's history gets
    * long enough for the window to matter. */
  private def nextRunSeq(spark: SparkSession, tablePath: String): Long =
    graft.lake.SnapshotTable.latestVersion(spark, tablePath)
      .map(_ + 1L).getOrElse(0L)

  /** One dataset's full metric history from the snapshot repository. */
  def runHistory(spark: SparkSession, tablePath: String,
      dataset: String): DataFrame =
    graft.lake.SnapshotTable.read(spark, tablePath)
      .filter(col("dataset") === dataset)

  final case class Anomaly(constraint: String, current: Double,
      windowMean: Double, windowStddev: Double)

  /** TRAILING-WINDOW anomaly check (Deequ's OnlineNormalStrategy
    * shape, over the snapshot repository): compare `currentTag`'s
    * metric per constraint against the last `window` runs' mean, and
    * flag when |current − mean| exceeds maxSigma·stddev plus a
    * RELATIVE floor (`minRelDelta·|mean|`) — the sigma term adapts to
    * each metric's own noise, the relative floor keeps a perfectly
    * flat history (stddev 0: row counts on steady ingest, completeness
    * pinned at 1.0) from flagging fp dust, and being relative lets one
    * threshold serve metrics at any magnitude (Size ≈ 10^6 next to
    * Completeness ≈ 1.0). Everything collected is bounded by the
    * constraint count and the window — driver-trivial at any data
    * scale; the heavy lifting stayed in the runs that produced the
    * metrics. */
  def anomalies(spark: SparkSession, tablePath: String, dataset: String,
      currentTag: String, window: Int = 5, maxSigma: Double = 3.0,
      minRelDelta: Double = 0.1): Seq[Anomaly] = {
    require(window >= 1, "window must be >= 1")
    val h = runHistory(spark, tablePath, dataset)
    // The trailing window is the `window` runs APPENDED most recently
    // before the current run — ordered by the run_seq the append
    // stamped, never by run_tag string comparison (which mis-orders
    // "r10" before "r2" and breaks every unpadded tag convention once
    // a dataset passes 10 runs). Repositories written before run_seq
    // existed fall back to tag ordering, correct exactly when tags
    // are zero-padded/sortable (the old documented requirement).
    val tags: Seq[String] =
      if (h.columns.contains("run_seq")) {
        val seqs = h.groupBy("run_tag").agg(max("run_seq").as("seq"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        seqs.collectFirst { case (t, s) if t == currentTag => s } match {
          case None => Nil // current run not persisted yet — no window
          case Some(curSeq) => seqs.toSeq
            .filter { case (t, s) => s < curSeq && t != currentTag }
            .sortBy(-_._2).take(window).map(_._1)
        }
      } else
        h.filter(col("run_tag") < currentTag)
          .select("run_tag").distinct()
          .orderBy(col("run_tag").desc).limit(window)
          .collect().map(_.getString(0)).toSeq
    if (tags.isEmpty) return Nil
    val win = h.filter(col("run_tag").isin(tags: _*))
      .groupBy("constraint")
      .agg(avg("metric").as("w_mean"), stddev_pop("metric").as("w_std"))
    h.filter(col("run_tag") === currentTag)
      .select(col("constraint"), col("metric"))
      .join(win, "constraint")
      .collect().toSeq
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .collect { case (c, cur, m, s)
          if math.abs(cur - m) >
            maxSigma * s + minRelDelta * math.max(math.abs(m), 1e-12) =>
        Anomaly(c, cur, m, s)
      }
  }

  final case class Drift(constraint: String, previous: Double, current: Double,
      relativeChange: Double)

  /** Compare a run against the latest earlier run (by tag ordering);
    * returns constraints whose metric moved more than `tolerance`
    * relatively. Empty history → no drift. */
  def driftFrom(spark: SparkSession, path: String, currentTag: String,
      tolerance: Double): Seq[Drift] = {
    import spark.implicits._
    val h = history(spark, path)
    val prevTag = h.filter(col("run_tag") < currentTag)
      .agg(max("run_tag")).head().getString(0)
    if (prevTag == null) return Nil
    val prev = h.filter(col("run_tag") === prevTag)
      .select(col("constraint"), col("metric").as("previous"))
    val cur = h.filter(col("run_tag") === currentTag)
      .select(col("constraint"), col("metric").as("current"))
    prev.join(cur, "constraint")
      .withColumn("rel",
        abs(col("current") - col("previous")) /
          greatest(abs(col("previous")), lit(1e-12)))
      .filter(col("rel") > tolerance)
      .select(col("constraint"), col("previous"), col("current"), col("rel"))
      .as[(String, Double, Double, Double)]
      .collect()
      .map(t => Drift(t._1, t._2, t._3, t._4))
      .toSeq
  }
}
