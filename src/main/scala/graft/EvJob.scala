package graft

import org.apache.spark.sql.SparkSession

import graft.etl.{EvPipeline, GoldConfig, SilverConfig}

/** Runnable EV pipeline entry point — the spark-submit-shaped
  * equivalent of the reference's two Glue jobs (a user of the
  * reference invokes this instead of jobs/ev_sessions_*.py):
  *
  *   sbt "runMain graft.EvJob silver <inputCsv> <silverPath> <quarantinePath> [failMode]"
  *   sbt "runMain graft.EvJob gold <silverPath> [db] [table] [eventDate]"
  *   sbt "runMain graft.EvJob gold-snapshot <silverPath> <tablePath> [eventDate]"
  *                                    # versioned fact table with time travel
  *   sbt "runMain graft.EvJob all <inputCsv> <outBase>"
  *
  * Lake maintenance (the operational tooling around the layers):
  *
  *   sbt "runMain graft.EvJob stats <path>"            # files/bytes per partition
  *   sbt "runMain graft.EvJob compact <path> [maxFiles]"  # rewrite fat partitions
  *   sbt "runMain graft.EvJob remerge <quarantinePath> <silverPath>"
  *                                    # re-validate quarantine, rescue fixed rows
  *   sbt "runMain graft.EvJob snap-compact <tablePath> [numFiles] [clusterCol]"
  *                                    # snapshot-table compaction (new version,
  *                                    # readers undisturbed; vacuum reclaims)
  *   sbt "runMain graft.EvJob vacuum <tablePath> [keepVersions]"
  *   sbt "runMain graft.EvJob history <tablePath>"     # DESCRIBE HISTORY
  *   sbt "runMain graft.EvJob changes <tablePath> <fromV> <toV>"
  *                                    # change-data feed between versions
  *   sbt "runMain graft.EvJob snap-append <parquetDir> <tablePath> [partCols]"
  *                                    # load a parquet dir as a snapshot commit
  *   sbt "runMain graft.EvJob gold-incremental <silverTable> <goldTable> <ckptDir>"
  *                                    # consume NEW silver commits only,
  *                                    # merge derived features into gold
  *   sbt "runMain graft.EvJob dq-incremental <silverTable> <workDir> [tolerance]"
  *                                    # verify ONLY new commits, append to the
  *                                    # metric history, report drift
  */
object EvJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EvJob silver|gold|all ...")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(s"graft-ev-${args(0)}")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.files.ignoreEmptyFiles", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      args(0) match {
        case "silver" =>
          val r = EvPipeline.runSilver(spark, SilverConfig(
            inputCsv = args(1), silverPath = args(2), quarantinePath = args(3),
            failMode = if (args.length > 4) args(4) else "quarantine"))
          println(s"[silver] good=${r.goodCount} quarantined=${r.badCount} dq=${r.dqStatus}")
        case "gold" =>
          val n = EvPipeline.runGold(spark, GoldConfig(
            silverPath = args(1),
            db = if (args.length > 2) args(2) else "ev_sessions_gold",
            table = if (args.length > 3) args(3) else "fact_ev_session",
            eventDate = if (args.length > 4) Some(args(4)) else None))
          println(s"[gold] fact rows=$n")
        case "all" =>
          val base = args(2)
          val r = EvPipeline.runSilver(spark, SilverConfig(
            args(1), s"$base/silver", s"$base/quarantine"))
          println(s"[silver] good=${r.goodCount} quarantined=${r.badCount} dq=${r.dqStatus}")
          val n = EvPipeline.runGold(spark, GoldConfig(s"$base/silver"))
          println(s"[gold] fact rows=$n")
        case "gold-snapshot" =>
          val (v, n) = EvPipeline.runGoldSnapshot(spark, args(1), args(2),
            if (args.length > 3) Some(args(3)) else None)
          println(s"[gold-snapshot] version=$v fact rows=$n")
        case "stats" =>
          graft.lake.LakeWriter.partitionStats(spark, args(1)).foreach { p =>
            println(f"[stats] ${p.partition}%-50s files=${p.files}%-4d bytes=${p.bytes}")
          }
        case "compact" =>
          val maxFiles = if (args.length > 2) args(2).toInt else 8
          val done = graft.lake.LakeWriter.compactPartitions(spark, args(1), maxFiles)
          println(s"[compact] rewrote ${done.size} partitions: ${done.mkString(", ")}")
        case "remerge" =>
          // default repair: resolve "NA"-sourced NULL distances to 0.0
          // (the reference dataset's dominant quarantine cause)
          val (rescued, stillBad) = EvPipeline.remergeRepaired(
            spark, args(1), args(2),
            repair = df => df.withColumn("distance",
              org.apache.spark.sql.functions.coalesce(
                org.apache.spark.sql.functions.col("distance"),
                org.apache.spark.sql.functions.lit(0.0))))
          println(s"[remerge] rescued=$rescued stillBad=$stillBad")
        case "snap-compact" =>
          val numFiles = if (args.length > 2) args(2).toInt else 8
          val cluster = if (args.length > 3) Some(args(3)) else None
          val v = graft.lake.SnapshotTable.compact(spark, args(1), numFiles, cluster)
          println(s"[snap-compact] committed version=$v files<=$numFiles cluster=$cluster")
        case "vacuum" =>
          val keep = if (args.length > 2) args(2).toInt else 1
          graft.lake.SnapshotTable.vacuum(spark, args(1), keep)
          println(s"[vacuum] kept last $keep versions of ${args(1)}")
        case "snap-append" =>
          require(args.length >= 3,
            "usage: EvJob snap-append <parquetDir> <tablePath> [partCol1,partCol2,...]")
          val parts = if (args.length > 3) args(3).split(",").toSeq.filter(_.nonEmpty) else Nil
          val v = graft.lake.SnapshotTable.append(
            spark.read.parquet(args(1)), args(2), parts)
          println(s"[snap-append] committed version=$v partitions=${parts.mkString(",")}")
        case "gold-incremental" =>
          require(args.length >= 4,
            "usage: EvJob gold-incremental <silverTable> <goldTable> <checkpointDir>")
          val (range, v, n) = EvPipeline.runGoldIncremental(
            spark, args(1), args(2), args(3))
          range match {
            case Some((from, to)) =>
              println(s"[gold-incremental] consumed v$from..v$to gold version=$v rows=$n")
            case None =>
              println(s"[gold-incremental] nothing new; gold version=$v rows=$n")
          }
        case "dq-incremental" =>
          require(args.length >= 3,
            "usage: EvJob dq-incremental <silverTable> <workDir> [tolerance]")
          val tol = if (args.length > 3) args(3).toDouble else 0.5
          val reports = graft.dq.IncrementalDq.run(spark, args(1),
            s"${args(2)}/ckpt", s"${args(2)}/metrics",
            Seq(graft.etl.SilverClean.silverCheck.hasSize(_ > 0)), tol)
          if (reports.isEmpty) println("[dq-incremental] nothing new")
          reports.foreach { r =>
            println(s"[dq-incremental] v${r.fromVersion}..v${r.toVersion} " +
              s"status=${r.status} drifts=${r.drifts.size}")
            r.drifts.foreach(d => println(
              f"[dq-drift] ${d.constraint} ${d.previous}%.4f -> ${d.current}%.4f " +
                f"(rel=${d.relativeChange}%.2f)"))
          }
        case "delete-dv" =>
          require(args.length >= 3,
            "usage: EvJob delete-dv <tablePath> <sqlPredicate> [maxDvRows]")
          val cap = if (args.length > 3) args(3).toLong else 1000000L
          val v = graft.lake.SnapshotTable.deleteWithVectors(
            spark, args(1), org.apache.spark.sql.functions.expr(args(2)), cap)
          println(s"[delete-dv] committed version=$v predicate=${args(2)}")
        case "constraint" =>
          require(args.length >= 3,
            "usage: EvJob constraint <tablePath> add <name> <sqlExpr> | drop <name> | list")
          args(2) match {
            case "add" =>
              val v = graft.lake.SnapshotTable.addCheckConstraint(
                spark, args(1), args(3), args(4))
              println(s"[constraint] added '${args(3)}' version=$v")
            case "drop" =>
              val v = graft.lake.SnapshotTable.dropCheckConstraint(spark, args(1), args(3))
              println(s"[constraint] dropped '${args(3)}' version=$v")
            case "list" =>
              graft.lake.SnapshotTable.checkConstraints(spark, args(1)).toSeq.sorted
                .foreach { case (n, e) => println(s"[constraint] $n CHECK ($e)") }
            case other => throw new IllegalArgumentException(s"unknown constraint op: $other")
          }
        case "tag" =>
          require(args.length >= 3,
            "usage: EvJob tag <tablePath> <name> [version] | tag <tablePath> --drop <name>")
          if (args(2) == "--drop") {
            graft.lake.SnapshotTable.dropTag(spark, args(1), args(3))
            println(s"[tag] dropped '${args(3)}'")
          } else {
            val v = graft.lake.SnapshotTable.tag(spark, args(1), args(2),
              if (args.length > 3) Some(args(3).toLong) else None)
            println(s"[tag] '${args(2)}' -> version $v")
          }
        case "clone" =>
          require(args.length >= 3,
            "usage: EvJob clone <sourcePath> <targetPath> [version|tag]")
          val ref = if (args.length > 3) Some(args(3)) else None
          val (v, t) = ref match {
            case Some(r) if scala.util.Try(r.toLong).isSuccess => (Some(r.toLong), None)
            case Some(r) => (None, Some(r))
            case None => (None, None)
          }
          graft.lake.SnapshotTable.shallowClone(spark, args(1), args(2), v, t)
          println(s"[clone] ${args(2)} <- ${args(1)}${ref.fold("")(" @ " + _)} (zero-copy)")
        case "restore" =>
          require(args.length >= 3, "usage: EvJob restore <tablePath> <toVersion>")
          val v = graft.lake.SnapshotTable.restore(spark, args(1), args(2).toLong)
          println(s"[restore] table restored to v${args(2)} as new version $v")
        case "snap-evolve" =>
          require(args.length >= 3,
            "usage: EvJob snap-evolve <tablePath> <spec1[;spec2...]>  " +
              "(e.g. 'days(ts)' or 'bucket(16,id);truncate(2,code)' — " +
              "';'-separated because bucket/truncate specs contain commas)")
          val specs = args(2).split(";").toSeq.map(_.trim).filter(_.nonEmpty)
          val v = graft.lake.SnapshotTable.evolvePartitionTransforms(
            spark, args(1), specs)
          println(s"[snap-evolve] committed version=$v transforms=${specs.mkString(",")}")
        case "transforms" =>
          val ts = graft.lake.SnapshotTable.partitionTransforms(spark, args(1))
          println(s"[transforms] ${if (ts.isEmpty) "(none)" else ts.mkString(", ")}")
        case "history" =>
          graft.lake.SnapshotTable.history(spark, args(1)).collect().foreach { r =>
            println(f"[history] v=${r.getLong(0)}%-4d op=${Option(r.getString(1)).getOrElse("?")}%-22s " +
              f"at=${r.getTimestamp(2)} files=${r.getInt(3)}%-4d rows=${if (r.isNullAt(4)) "?" else r.getLong(4).toString}")
          }
        case "changes" =>
          require(args.length >= 4,
            "usage: EvJob changes <tablePath> <fromVersion> <toVersion>")
          val feed = graft.lake.SnapshotTable.changes(
            spark, args(1), args(2).toLong, args(3).toLong)
          feed.orderBy("_commit_version", "_change_type").show(100, truncate = false)
        case other => throw new IllegalArgumentException(s"unknown job: $other")
      }
    } finally spark.stop()
  }
}
