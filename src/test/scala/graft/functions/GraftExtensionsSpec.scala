package graft.functions

import org.apache.spark.sql.SparkSession

import graft.SparkTestBase

class GraftExtensionsSpec extends SparkTestBase {

  test("withExtensions injects the native functions into a new session") {
    // force a genuinely new session: getOrCreate would return the
    // suite-shared one (ignoring withExtensions) — and a previous
    // spec's temp-function registration could mask the failure
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("ext-test")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c, " +
          "dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d").head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 11.0) < 1e-12)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("registered snapshot tables resolve in SQL with VERSION/TIMESTAMP AS OF") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("ext-tt-test")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val path = java.nio.file.Files.createTempDirectory("graft-sql-tt").toString + "/t"
      graft.lake.SnapshotTable.append(Seq((1L, "a")).toDF("k", "s"), path)
      val betweenCommits = System.currentTimeMillis() + 500
      Thread.sleep(1200) // manifest mtime resolution
      graft.lake.SnapshotTable.append(Seq((2L, "b")).toDF("k", "s"), path)
      graft.lake.SnapshotCatalog.register("snap_tt", path)
      try {
        assert(s2.sql("SELECT * FROM snap_tt").count() === 2)
        assert(s2.sql("SELECT k FROM snap_tt VERSION AS OF 1").as[Long].collect()
          === Array(1L))
        val ts = java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochMilli(betweenCommits),
          java.time.ZoneOffset.UTC).toString.replace('T', ' ')
        assert(s2.sql(s"SELECT * FROM snap_tt TIMESTAMP AS OF '$ts'").count() === 1)
        // a non-numeric VERSION AS OF resolves through tags
        graft.lake.SnapshotTable.tag(s2, path, "golden", Some(1L))
        assert(s2.sql("SELECT k FROM snap_tt VERSION AS OF 'golden'").as[Long]
          .collect() === Array(1L))
        val eTag = intercept[Exception](
          s2.sql("SELECT * FROM snap_tt VERSION AS OF 'nope'").collect())
        assert(eTag.getMessage.contains("no tag"))
        // ...and through branches: a branch ref reads the branch HEAD
        graft.lake.SnapshotTable.createBranch(s2, path, "dev")
        val bh = graft.lake.SnapshotTable.branchHandle(path, "dev")
        graft.lake.SnapshotTable.append(Seq((3L, "c")).toDF("k", "s"), bh)
        assert(s2.sql("SELECT k FROM snap_tt VERSION AS OF 'dev'")
          .as[Long].collect().sorted === Array(1L, 2L, 3L))
        assert(s2.sql("SELECT count(*) FROM snap_tt").head().getLong(0) === 2L)
        // a timestamp before the first commit has no version to serve
        val e = intercept[Exception](
          s2.sql("SELECT * FROM snap_tt TIMESTAMP AS OF '1999-01-01'").collect())
        assert(e.getMessage.contains("no version"))
        // unregistered names still go through normal (failing) resolution
        intercept[Exception](s2.sql("SELECT * FROM snap_tt_missing").collect())
      } finally graft.lake.SnapshotCatalog.unregister("snap_tt")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("SQL metadata tables: <name>.history / .files / .partitions resolve via the rule") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("ext-meta-test")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val path = java.nio.file.Files.createTempDirectory("graft-sql-meta").toString + "/t"
      graft.lake.SnapshotTable.append(
        Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"))
          .toDF("k", "s", "p").coalesce(1), path, Seq("p"))
      graft.lake.SnapshotTable.append(
        Seq((4L, "d", "d2")).toDF("k", "s", "p"), path, Seq("p"))
      graft.lake.SnapshotCatalog.register("snap_meta", path)
      try {
        val hist = s2.sql("SELECT version, operation, n_files, n_rows " +
          "FROM snap_meta.history").collect()
        assert(hist.map(_.getLong(0)).toSeq === Seq(2L, 1L), "newest first")
        assert(hist.forall(_.getString(1) == "append"))
        assert(hist.head.getLong(3) === 4L)

        val files = s2.sql("SELECT file_path, partition, rows, size_bytes, dv_rows " +
          "FROM snap_meta.files").collect()
        assert(files.length === graft.lake.SnapshotTable.liveFiles(s2, path).size)
        assert(files.forall(r => r.getString(1).startsWith("p=")))
        assert(files.forall(_.getLong(3) > 0L))
        assert(files.forall(_.getLong(4) === 0L))
        // metadata tables compose with normal SQL (filters, aggs)
        assert(s2.sql("SELECT sum(rows) FROM snap_meta.files WHERE partition = 'p=d2'")
          .head().getLong(0) === 2L)

        val parts = s2.sql("SELECT partition, n_files, n_rows " +
          "FROM snap_meta.partitions ORDER BY partition").collect()
        assert(parts.map(_.getString(0)).toSeq === Seq("p=d1", "p=d2"))
        assert(parts.map(_.getLong(2)).toSeq === Seq(2L, 2L))
        // skip-family rollups: every file records null counts (sum
        // exact per column), no blooms opted in yet
        val roll = s2.sql("SELECT null_counts['s'], cardinality(bloom_file_counts) " +
          "FROM snap_meta.partitions ORDER BY partition").collect()
        assert(roll.map(_.getLong(0)).toSeq === Seq(0L, 0L))
        assert(roll.forall(_.getInt(1) === 0))
        // opt a bloom in: only the NEXT commit's files carry it, so
        // the rollup exposes partial coverage per partition
        graft.lake.SnapshotTable.setBloomColumns(s2, path, Seq("k"))
        graft.lake.SnapshotTable.append(
          Seq((5L, "e", "d2")).toDF("k", "s", "p"), path, Seq("p"))
        val bc = s2.sql("SELECT partition, n_files, bloom_file_counts['k'] " +
          "FROM snap_meta.partitions ORDER BY partition").collect()
        assert(bc.map(r => (r.getString(0), r.getInt(1))).toSeq
          === Seq(("p=d1", 1), ("p=d2", 3)))
        assert(bc(0).isNullAt(2), "no bloomed file in d1 → no entry")
        assert(bc(1).getInt(2) === 1, "1 of d2's 3 files carries the bloom")
      } finally graft.lake.SnapshotCatalog.unregister("snap_meta")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("SQL WHERE on a hidden-partitioned table prunes day dirs via the injected rule") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("ext-hp-test")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
        import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        df.collect()
        def files(p: SparkPlan): Long = p.collect {
          case a: AdaptiveSparkPlanExec => files(a.executedPlan)
          case q: QueryStageExec        => files(q.plan)
          case sc: FileSourceScanExec   => sc.metrics("numFiles").value
        }.sum
        files(df.queryExecution.executedPlan)
      }
      val path = java.nio.file.Files.createTempDirectory("graft-sql-hp").toString + "/t"
      graft.lake.SnapshotTable.appendTransformed(Seq(
        ("e1", ts("2024-01-01 08:00:00"), 1.0),
        ("e2", ts("2024-01-02 09:00:00"), 2.0),
        ("e3", ts("2024-01-03 10:00:00"), 3.0),
        ("e4", ts("2024-01-04 11:00:00"), 4.0),
        ("e5", ts("2024-01-05 12:00:00"), 5.0)
      ).toDF("id", "ts", "v").coalesce(1), path, Seq("days(ts)"))
      graft.lake.SnapshotCatalog.register("snap_hp", path)
      try {
        val total = graft.lake.SnapshotTable.liveFiles(s2, path).size
        assert(total === 5)
        // SQL never names the layout; the day dirs prune anyway
        val q = s2.sql(
          "SELECT id, v FROM snap_hp WHERE ts >= TIMESTAMP '2024-01-04 00:00:00'")
        assert(q.columns.toSeq === Seq("id", "v"))
        assert(q.select("id").as[String].collect().sorted.toSeq === Seq("e4", "e5"))
        assert(scannedFiles(s2.sql(
          "SELECT id, v FROM snap_hp WHERE ts >= TIMESTAMP '2024-01-04 00:00:00'")) === 2,
          "SQL filter must prune to the two matching day files")

        // alias-qualified references resolve and prune too
        assert(s2.sql("SELECT x.id FROM snap_hp AS x " +
          "WHERE x.ts >= TIMESTAMP '2024-01-05 00:00:00'")
          .as[String].collect().toSeq === Seq("e5"))

        // aggregates above the filter keep the pruned path
        assert(s2.sql("SELECT count(*) FROM snap_hp " +
          "WHERE ts < TIMESTAMP '2024-01-02 00:00:00'").head().getLong(0) === 1L)

        // subquery predicates bypass the readWhere path but stay correct
        assert(s2.sql("SELECT id FROM snap_hp " +
          "WHERE v IN (SELECT max(v) FROM snap_hp)")
          .as[String].collect().toSeq === Seq("e5"))
      } finally graft.lake.SnapshotCatalog.unregister("snap_hp")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("SQL MERGE INTO and DELETE FROM route to the snapshot table") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("ext-dml-test")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val path = java.nio.file.Files.createTempDirectory("graft-sql-dml").toString + "/t"
      graft.lake.SnapshotTable.append(
        Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v"), path)
      graft.lake.SnapshotCatalog.register("snap_dml", path)
      try {
        Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "s", "v")
          .createOrReplaceTempView("dml_src")
        val v1 = s2.sql(
          """MERGE INTO snap_dml t USING dml_src s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head().getLong(0)
        assert(v1 === 2L)
        assert(s2.sql("SELECT k, s, v FROM snap_dml ORDER BY k")
          .as[(Long, String, Double)].collect().toSeq
          === Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
        // DELETE with an unqualified and a table-qualified predicate
        // (v > 35 removes the merged k=2 row at v=99 and k=4 at v=40)
        val v2 = s2.sql("DELETE FROM snap_dml WHERE v > 35.0").head().getLong(0)
        assert(v2 === 3L)
        val v3 = s2.sql("DELETE FROM snap_dml WHERE snap_dml.k = 1").head().getLong(0)
        assert(v3 === 4L)
        assert(s2.sql("SELECT k FROM snap_dml ORDER BY k").as[Long].collect().toSeq
          === Seq(3L))
        // versioned reads still serve every pre-DML state
        assert(s2.sql("SELECT count(*) FROM snap_dml VERSION AS OF 1").head().getLong(0) === 3L)
        assert(s2.sql("SELECT count(*) FROM snap_dml VERSION AS OF 2").head().getLong(0) === 4L)
        // a no-match DELETE commits nothing and reports the current version
        assert(s2.sql("DELETE FROM snap_dml WHERE k = 999").head().getLong(0) === 4L)
        // non-star shapes route to the clause engine (see
        // MergeClausesSpec); this delete-merge matches nothing, so the
        // content is unchanged (stat-less files are conservatively
        // rewritten, so a version IS committed — same posture as merge)
        val v4 = s2.sql(
          """MERGE INTO snap_dml t USING dml_src s ON t.k = s.k
            |WHEN MATCHED THEN DELETE""".stripMargin).head().getLong(0)
        assert(v4 === 5L)
        assert(s2.sql("SELECT k FROM snap_dml").as[Long].collect().toSeq === Seq(3L))
      } finally graft.lake.SnapshotCatalog.unregister("snap_dml")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("SQL UPDATE routes to the snapshot table with pre-update-row semantics") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("ext-upd-test")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val path = java.nio.file.Files.createTempDirectory("graft-sql-upd").toString + "/t"
      graft.lake.SnapshotTable.append(
        Seq((1L, 10.0, 100.0), (2L, 20.0, 200.0), (3L, 30.0, 300.0))
          .toDF("k", "a", "b"), path)
      graft.lake.SnapshotCatalog.register("snap_upd", path)
      try {
        // both SET expressions see the PRE-update row: a=b, b=a swaps
        val v1 = s2.sql(
          "UPDATE snap_upd SET a = b, b = a WHERE snap_upd.k <= 2").head().getLong(0)
        assert(v1 === 2L)
        assert(s2.sql("SELECT k, a, b FROM snap_upd ORDER BY k")
          .as[(Long, Double, Double)].collect().toSeq
          === Seq((1L, 100.0, 10.0), (2L, 200.0, 20.0), (3L, 30.0, 300.0)))
        // no-match UPDATE commits nothing, reports the current version
        assert(s2.sql("UPDATE snap_upd SET a = 0.0 WHERE k = 999").head().getLong(0) === 2L)
        // time travel still serves the pre-update state
        assert(s2.sql("SELECT a FROM snap_upd VERSION AS OF 1 WHERE k = 1")
          .head().getDouble(0) === 10.0)
        // unknown SET column fails loudly
        val e = intercept[Exception](
          s2.sql("UPDATE snap_upd SET nope = 1 WHERE k = 1").collect())
        assert(e.getMessage.contains("not in the table"))
      } finally graft.lake.SnapshotCatalog.unregister("snap_upd")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("SQL ALTER TABLE ADD/DROP CONSTRAINT routes to the snapshot table") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("ext-constraint-test")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val path = java.nio.file.Files.createTempDirectory("graft-sql-cons").toString + "/t"
      graft.lake.SnapshotTable.append(
        Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), path)
      graft.lake.SnapshotCatalog.register("snap_cons", path)
      try {
        val v2 = s2.sql(
          "ALTER TABLE snap_cons ADD CONSTRAINT v_pos CHECK (v > 0)").head().getLong(0)
        assert(v2 === 2L)
        assert(graft.lake.SnapshotTable.checkConstraints(s2, path)
          === Map("v_pos" -> "v > 0"))
        // the constraint is live: a violating append fails
        val ex = intercept[Exception] {
          graft.lake.SnapshotTable.append(Seq((3L, -1.0)).toDF("k", "v"), path)
        }
        assert(ex.getMessage.contains("v_pos")
          || Option(ex.getCause).exists(_.getMessage.contains("v_pos")))
        // existing-data validation blocks a bad ADD through SQL too
        val exAdd = intercept[Exception](s2.sql(
          "ALTER TABLE snap_cons ADD CONSTRAINT v_big CHECK (v > 15)").collect())
        assert(exAdd.getMessage.contains("v_big"))
        // IF EXISTS on a missing name is a no-op; DROP removes
        assert(s2.sql("ALTER TABLE snap_cons DROP CONSTRAINT IF EXISTS nope")
          .head().getLong(0) === 2L)
        s2.sql("ALTER TABLE snap_cons DROP CONSTRAINT v_pos").collect()
        assert(graft.lake.SnapshotTable.checkConstraints(s2, path).isEmpty)
        graft.lake.SnapshotTable.append(Seq((3L, -1.0)).toDF("k", "v"), path)
        assert(graft.lake.SnapshotTable.read(s2, path).count() === 3)
      } finally graft.lake.SnapshotCatalog.unregister("snap_cons")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("the full native function surface resolves in SQL and matches the Column API") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("ext-fns-test")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT dot_product_i8(X'020304', X'050607') AS di8, " +
          "rolling_hash('abc') AS rh, " +
          "rolling_hash('abc', 131, 1000000007) AS rh3, " +
          "top_bigram_count(array('a','b','a','b')) AS tbc, " +
          "term_counts(array('x','y','x')) AS tc, " +
          "bigram_counts(array('x','y','x')) AS bc, " +
          "hashed_ngram_buckets(array('x','y'), 64) AS hb").head()
      // 2*5 + 3*6 + 4*7 = 56
      assert(r.getAs[Long]("di8") === 56L)
      assert(r.getAs[Long]("rh") === r.getAs[Long]("rh3"))
      // 'a b' occurs twice — the top adjacent bigram count
      assert(r.getAs[Long]("tbc") === 2L)
      val tc = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("tc"))
        .map(x => (x.getString(0), x.getLong(1)))
      assert(tc === Seq(("x", 2L), ("y", 1L)))
      val bc = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("bc"))
        .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
      assert(bc === Seq(("x", "y", 1L), ("y", "x", 1L)))
      assert(r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("hb")).nonEmpty)
      // SHOW FUNCTIONS sees the injected registrations
      val shown = s2.sql("SHOW FUNCTIONS LIKE '*bigram*'")
        .collect().map(_.getString(0)).toSet
      assert(shown.exists(_.endsWith("bigram_counts")))
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("table_changes TVF: the SQL spelling of the change feed") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("ext-tvf-test")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val path = java.nio.file.Files.createTempDirectory("graft-tvf").toString + "/t"
      // distinct commit mtimes so the timestamp-bound case below is
      // deterministic at millisecond clock granularity
      graft.lake.SnapshotTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), path)
      Thread.sleep(60)
      graft.lake.SnapshotTable.append(Seq((3L, "c")).toDF("k", "s"), path)
      Thread.sleep(60)
      graft.lake.SnapshotTable.delete(s2, path,
        org.apache.spark.sql.functions.col("k") === 1L)
      graft.lake.SnapshotCatalog.register("snap_tvf", path)
      try {
        val viaSql = s2.sql(
          "SELECT k, _change_type, _commit_version FROM table_changes('snap_tvf', 1, 3) ORDER BY _commit_version, k")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        val viaApi = graft.lake.SnapshotTable.changes(s2, path, 1L, 3L)
          .select("k", "_change_type", "_commit_version")
          .orderBy("_commit_version", "k")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        assert(viaSql === viaApi)
        assert(viaSql.nonEmpty && viaSql.exists(_._2 == "delete"))
        // two-arg form runs to the latest version
        assert(s2.sql("SELECT count(*) FROM table_changes('snap_tvf', 1)")
          .head().getLong(0) === viaSql.size.toLong)
        // the TVF composes like any relation
        assert(s2.sql(
          "SELECT count(*) FROM table_changes('snap_tvf', 0, 3) c " +
            "WHERE c._change_type = 'insert'").head().getLong(0) === 3L)
        // unknown table fails with the registration hint
        val err = intercept[Exception](
          s2.sql("SELECT * FROM table_changes('nope', 0)").collect())
        assert(err.getMessage.contains("nope"))
        // TIMESTAMP bounds (Delta's form): start at-or-after v2's
        // commit time, end at-or-before v3's → exactly (v1, v3]
        val t2 = graft.lake.SnapshotTable.commitTimeOf(s2, path, 2L)
        val t3 = graft.lake.SnapshotTable.commitTimeOf(s2, path, 3L)
        def iso(ms: Long) = java.time.Instant.ofEpochMilli(ms).toString
        val tsForm = s2.sql(
          s"SELECT k, _change_type, _commit_version FROM table_changes(" +
            s"'snap_tvf', '${iso(t2 - 1)}', '${iso(t3)}') " +
            "ORDER BY _commit_version, k")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        assert(tsForm === viaSql, "timestamp bounds must match version bounds")
      } finally graft.lake.SnapshotCatalog.unregister("snap_tvf")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
