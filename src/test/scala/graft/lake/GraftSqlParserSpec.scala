package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Branch/tag ref DDL through SQL (the injected extension parser):
  * every statement form parses, resolves its table (registered name
  * and catalog ident), runs the ref operation, and returns the
  * version; everything else still delegates to Spark's parser. */
class GraftSqlParserSpec extends SparkTestBase {

  import spark.implicits._

  private var prevDefault: Option[SparkSession] = None
  private var prevActive: Option[SparkSession] = None
  private lazy val warehouse =
    Files.createTempDirectory("graft-psql-wh").toString

  private lazy val s2: SparkSession = {
    prevDefault = SparkSession.getDefaultSession
    prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-sqlparser-test")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.catalog.graftp", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graftp.warehouse", warehouse)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    super.afterAll()
  }

  private def mk(tag: String) =
    (0 until 5).map(j => (s"$tag-$j", "2024-01-01", 10.0 * j))
      .toDF("id", "event_date", "v")

  test("branch and tag DDL round-trip on a registered table") {
    val path = Files.createTempDirectory("graft-psql").toString + "/t"
    SnapshotTable.append(mk("a"), path, Seq("event_date"))          // v1
    SnapshotCatalog.register("psql_t", path)

    assert(s2.sql("ALTER TABLE psql_t CREATE BRANCH dev")
      .head().getLong(0) === 1L)
    assert(SnapshotTable.branches(s2, path) === Seq("dev"))
    assert(s2.sql("SHOW BRANCHES IN psql_t").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("dev", 1L)))

    // diverge the branch through its registered handle, read it back
    // through the ref SQL
    SnapshotCatalog.register("psql_t_dev", SnapshotTable.branchHandle(path, "dev"))
    s2.sql("DELETE FROM psql_t_dev WHERE v >= 40.0")                // branch v2
    assert(s2.sql("SELECT count(*) FROM psql_t VERSION AS OF 'dev'")
      .head().getLong(0) === 4L)
    assert(s2.sql("SELECT count(*) FROM psql_t").head().getLong(0) === 5L)

    // fast-forward main onto the branch head, all SQL
    assert(s2.sql("ALTER TABLE psql_t FAST FORWARD BRANCH dev")
      .head().getLong(0) === 2L)
    assert(s2.sql("SELECT count(*) FROM psql_t").head().getLong(0) === 4L)

    // tag DDL: create, AS OF VERSION, OR REPLACE, drop
    assert(s2.sql("ALTER TABLE psql_t CREATE TAG merged")
      .head().getLong(0) === 2L)
    assert(SnapshotTable.tagVersion(s2, path, "merged") === Some(2L))
    assert(s2.sql("SHOW TAGS psql_t").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("merged", 2L)))
    assert(s2.sql("ALTER TABLE psql_t CREATE OR REPLACE TAG merged AS OF VERSION 1")
      .head().getLong(0) === 1L)
    assert(s2.sql("SELECT count(*) FROM psql_t VERSION AS OF 'merged'")
      .head().getLong(0) === 5L)
    s2.sql("ALTER TABLE psql_t DROP TAG merged")
    assert(SnapshotTable.tagVersion(s2, path, "merged") === None)

    s2.sql("ALTER TABLE psql_t DROP BRANCH dev")
    assert(SnapshotTable.branches(s2, path) === Nil)
  }

  test("cherry pick via SQL after both refs diverge") {
    val path = Files.createTempDirectory("graft-psql-cp").toString + "/t"
    SnapshotTable.append(mk("a"), path, Seq("event_date"))          // v1
    SnapshotCatalog.register("psql_cp", path)
    s2.sql("ALTER TABLE psql_cp CREATE BRANCH fix")
    val bh = SnapshotTable.branchHandle(path, "fix")
    SnapshotTable.append(mk("b"), bh, Seq("event_date"))            // branch v2
    SnapshotTable.append(mk("m"), path, Seq("event_date"))          // main v2
    val ex = intercept[Exception] {
      s2.sql("ALTER TABLE psql_cp FAST FORWARD BRANCH fix").collect()
    }
    assert(ex.getMessage.contains("cherryPick"))
    assert(s2.sql("ALTER TABLE psql_cp CHERRY PICK BRANCH fix VERSION 2")
      .head().getLong(0) === 3L)
    assert(s2.sql("SELECT count(*) FROM psql_cp").head().getLong(0) === 15L)
  }

  test("VACUUM and OPTIMIZE statements run against a registered table") {
    val path = Files.createTempDirectory("graft-psql-mnt").toString + "/t"
    // two numeric columns — the z-curve needs ≥2 numeric dims
    def mk2(tag: String) =
      (0 until 5).map(j => (s"$tag-$j", "2024-01-01", 10.0 * j, j.toDouble))
        .toDF("id", "event_date", "v", "w")
    SnapshotTable.append(mk2("a"), path, Seq("event_date"))         // v1
    SnapshotTable.append(mk2("b"), path, Seq("event_date"))         // v2
    SnapshotCatalog.register("psql_mnt", path)

    // OPTIMIZE compacts the live state into one new version
    assert(s2.sql("OPTIMIZE psql_mnt FILES 1").head().getLong(0) === 3L)
    assert(SnapshotTable.liveFiles(s2, path).size === 1)
    assert(SnapshotTable.read(s2, path).count() === 10)
    assert(s2.sql("OPTIMIZE psql_mnt ZORDER BY (v, w)").head().getLong(0) === 4L)

    // OPTIMIZE INCREMENTAL clusters ONLY files not yet marked under
    // the spec the ZORDER run recorded; the settled files stay put
    val settled = SnapshotTable.liveFiles(s2, path).toSet
    SnapshotTable.append(mk2("c"), path, Seq("event_date"))          // v5
    assert(s2.sql("OPTIMIZE psql_mnt INCREMENTAL").head().getLong(0) === 6L)
    assert(settled.subsetOf(SnapshotTable.liveFiles(s2, path).toSet),
      "INCREMENTAL rewrote settled files")
    assert(SnapshotTable.read(s2, path).count() === 15)

    // CLUSTER BY changes the spec as a metadata commit (no file
    // moves); the next INCREMENTAL re-clusters against it
    val preDdl = SnapshotTable.liveFiles(s2, path).toSet
    assert(s2.sql("ALTER TABLE psql_mnt CLUSTER BY (w, v)")
      .head().getLong(0) === 7L)
    assert(SnapshotTable.liveFiles(s2, path).toSet === preDdl)
    assert(s2.sql("OPTIMIZE psql_mnt INCREMENTAL").head().getLong(0) === 8L)
    assert(SnapshotTable.liveFiles(s2, path).toSet.intersect(preDdl).isEmpty,
      "a spec change must invalidate every old clustering mark")
    assert(SnapshotTable.read(s2, path).count() === 15)

    // VACUUM trims history to the kept window
    assert(s2.sql("VACUUM psql_mnt KEEP 1 VERSIONS").head().getLong(0) === 8L)
    assert(SnapshotTable.versions(s2, path) === Seq(8L))
    assert(SnapshotTable.read(s2, path).count() === 15)
  }

  test("OPTIMIZE ... WHERE rewrites only the files the predicate touches") {
    val path = Files.createTempDirectory("graft-psql-ow").toString + "/t"
    def wave(tag: String, p: Long) =
      (0 until 4).map(j => (s"$tag-$j", p, 1.0 * j, 2.0 * j))
        .toDF("id", "p", "v", "w")
    // two partitions, two files each
    SnapshotTable.append(wave("a", 1L).coalesce(1), path, Seq("p"))
    SnapshotTable.append(wave("b", 1L).coalesce(1), path, Seq("p"))
    SnapshotTable.append(wave("c", 2L).coalesce(1), path, Seq("p"))
    SnapshotTable.append(wave("d", 2L).coalesce(1), path, Seq("p"))
    SnapshotCatalog.register("psql_ow", path)
    val live0 = SnapshotTable.liveFiles(s2, path).toSet
    val p2Files = live0.filter(_.contains("p=2"))
    assert(p2Files.size === 2)
    s2.sql("OPTIMIZE psql_ow WHERE p = 1")
    val after = SnapshotTable.liveFiles(s2, path).toSet
    assert(after.filter(_.contains("p=2")) === p2Files,
      "scoped OPTIMIZE must not touch the other partition")
    assert(after.intersect(live0 -- p2Files).isEmpty,
      "the scoped partition's files must be rewritten")
    assert(SnapshotTable.read(s2, path).count() === 16)
    // scoped ZORDER: same scoping, clustered output
    s2.sql("OPTIMIZE psql_ow WHERE p = 2 ZORDER BY (v, w)")
    assert(SnapshotTable.liveFiles(s2, path).toSet
      .filter(_.contains("p=2")).intersect(p2Files).isEmpty,
      "scoped ZORDER must rewrite its partition")
    assert(SnapshotTable.read(s2, path).count() === 16)
    // WHERE × INCREMENTAL: the scoped maintenance wave. A SCOPED
    // zorder never records the table-wide spec, so record it via the
    // DDL — the scoped run's marks count because the specs match.
    // p=2 is then settled (just z-ordered), p=1 is not: a p=1 wave
    // moves only p=1's unmarked files, a p=2 wave is a version no-op
    s2.sql("ALTER TABLE psql_ow CLUSTER BY (v, w)")
    val preWave = SnapshotTable.liveFiles(s2, path).toSet
    val p2Settled = preWave.filter(_.contains("p=2"))
    val vHead = SnapshotTable.latestVersion(s2, path).get
    assert(s2.sql("OPTIMIZE psql_ow WHERE p = 2 INCREMENTAL")
      .head().getLong(0) === vHead, "nothing stale in scope must no-op")
    s2.sql("OPTIMIZE psql_ow WHERE p = 1 INCREMENTAL")
    val afterWave = SnapshotTable.liveFiles(s2, path).toSet
    assert(afterWave.filter(_.contains("p=2")) === p2Settled,
      "scoped INCREMENTAL must not touch the settled partition")
    assert(afterWave.intersect(preWave -- p2Settled).isEmpty,
      "scoped INCREMENTAL must re-cluster its partition's unmarked files")
    assert(SnapshotTable.read(s2, path).count() === 16)
  }

  test("VACUUM ... DRY RUN lists exactly what the real vacuum then reclaims, deleting nothing") {
    val path = Files.createTempDirectory("graft-psql-dry").toString + "/t"
    def mk(tag: String) = (0 until 3).map(j => (s"$tag-$j", 1.0 * j)).toDF("id", "v")
    SnapshotTable.append(mk("a").coalesce(1), path)                  // v1
    SnapshotTable.overwrite(mk("b").coalesce(1), path)               // v2: v1's file dead
    SnapshotTable.append(mk("c").coalesce(1), path)                  // v3
    SnapshotCatalog.register("psql_dry", path)

    val plan = s2.sql("VACUUM psql_dry KEEP 1 VERSIONS DRY RUN").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(plan.collect { case ("version", v) => v }.toSeq === Seq("v1", "v2"))
    val plannedDead = plan.collect { case ("data_file", p) => p }.toSet
    assert(plannedDead.size === 1, s"only v1's overwritten file is dead: $plan")
    // nothing was deleted
    val f = SnapshotTable.fs(s2, path)
    assert(plannedDead.forall(p => f.exists(new org.apache.hadoop.fs.Path(p))))
    assert(SnapshotTable.versions(s2, path) === Seq(1L, 2L, 3L))
    // the real vacuum then does exactly the plan
    assert(s2.sql("VACUUM psql_dry KEEP 1 VERSIONS").head().getLong(0) === 3L)
    assert(plannedDead.forall(p => !f.exists(new org.apache.hadoop.fs.Path(p))))
    assert(SnapshotTable.versions(s2, path) === Seq(3L))
    // a dry run over a clean table plans nothing
    assert(s2.sql("VACUUM psql_dry DRY RUN").collect().isEmpty)
  }

  test("RESTORE TABLE ... TO VERSION/TAG/TIMESTAMP AS OF via SQL") {
    val path = Files.createTempDirectory("graft-psql-rst").toString + "/t"
    def mk(tag: String) =
      (0 until 3).map(j => (s"$tag-$j", 1.0 * j)).toDF("id", "v")
    SnapshotTable.append(mk("a"), path)                              // v1
    SnapshotTable.append(mk("b"), path)                              // v2
    SnapshotTable.tag(s2, path, "good", Some(1L))
    SnapshotTable.append(mk("c"), path)                              // v3
    SnapshotCatalog.register("psql_rst", path)

    // numeric version: restore is a NEW commit, history intact
    assert(s2.sql("RESTORE TABLE psql_rst TO VERSION AS OF 2").head().getLong(0) === 4L)
    assert(SnapshotTable.read(s2, path).count() === 6L)
    assert(SnapshotTable.read(s2, path, Some(3L)).count() === 9L)
    // tag target
    assert(s2.sql("RESTORE psql_rst TO VERSION AS OF 'good'").head().getLong(0) === 5L)
    assert(SnapshotTable.read(s2, path).count() === 3L)
    // timestamp target: commit time of v3 → the v3 state
    val t3 = SnapshotTable.commitTimeOf(s2, path, 3L)
    assert(s2.sql(s"RESTORE psql_rst TO TIMESTAMP AS OF '$t3'").head().getLong(0) === 6L)
    assert(SnapshotTable.read(s2, path).count() === 9L)
    // a branch is not a restore target
    SnapshotTable.createBranch(s2, path, "wip", None, None)
    val e = intercept[Exception] {
      s2.sql("RESTORE psql_rst TO VERSION AS OF 'wip'").collect()
    }
    assert(e.getMessage.contains("BRANCH"))
  }

  test("catalog idents resolve; branch from a tag; non-ref SQL delegates") {
    s2.sql("CREATE NAMESPACE IF NOT EXISTS graftp.ns")
    s2.sql("CREATE TABLE graftp.ns.bt (id STRING, v DOUBLE) USING `graft-snapshot`")
    s2.sql("INSERT INTO graftp.ns.bt SELECT 'x', 1.0")              // v2
    s2.sql("ALTER TABLE graftp.ns.bt CREATE TAG base")
    assert(s2.sql("ALTER TABLE graftp.ns.bt CREATE BRANCH sandbox AS OF TAG base")
      .head().getLong(0) === 2L)
    // ref reads through the catalog's versioned loadTable
    assert(s2.sql("SELECT count(*) FROM graftp.ns.bt VERSION AS OF 'sandbox'")
      .head().getLong(0) === 1L)
    // ordinary statements still parse through the delegate
    assert(s2.sql("SELECT 1 + 1").head().getInt(0) === 2)
    s2.sql("ALTER TABLE graftp.ns.bt ADD COLUMNS (note STRING)")
    assert(s2.table("graftp.ns.bt").columns.contains("note"))
  }

  test("constraint DDL: add validates existing rows, enforces writes, show/drop") {
    val path = Files.createTempDirectory("graft-psql-ck").toString + "/t"
    SnapshotTable.append(mk("a"), path, Seq("event_date"))          // v1
    SnapshotCatalog.register("psql_ck", path)

    assert(s2.sql(
      "ALTER TABLE psql_ck ADD CONSTRAINT v_nonneg CHECK (v >= 0)")
      .head().getLong(0) === 2L)
    // an ADD whose expression existing rows violate fails up front
    val ex = intercept[Exception] {
      s2.sql("ALTER TABLE psql_ck ADD CONSTRAINT v_huge CHECK (v > 100)")
    }
    assert(ex.getMessage.contains("v_huge"))
    assert(s2.sql("SHOW CONSTRAINTS IN psql_ck").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("v_nonneg", "v >= 0")))

    // the recorded constraint gates every write path (reject mode)
    val bad = Seq(("bad-0", "2024-01-01", -2.0)).toDF("id", "event_date", "v")
    val exW = intercept[Exception] { SnapshotTable.append(bad, path, Seq("event_date")) }
    assert(exW.getMessage.contains("v_nonneg")
      || Option(exW.getCause).exists(_.getMessage.contains("v_nonneg")))
    assert(SnapshotTable.latestVersion(s2, path) === Some(2L))

    assert(s2.sql("ALTER TABLE psql_ck DROP CONSTRAINT v_nonneg")
      .head().getLong(0) === 3L)
    assert(s2.sql("SHOW CONSTRAINTS IN psql_ck").count() === 0L)
    SnapshotTable.append(bad, path, Seq("event_date"))              // now fine
    assert(SnapshotTable.read(s2, path).count() === 6)
  }

  test("REPLACE PARTITION SPEC and SHOW PARTITION SPEC via SQL") {
    val path = Files.createTempDirectory("graft-psql-spec").toString + "/t"
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(("a", ts("2024-03-01 10:00:00"), 1.0),
      ("b", ts("2024-04-02 11:00:00"), 2.0)).toDF("id", "ts", "v")
    SnapshotTable.appendTransformed(df, path, Seq("days(ts)"))
    SnapshotCatalog.register("psql_spec", path)
    try {
      assert(s2.sql("SHOW PARTITION SPEC psql_spec").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((0L, "days(ts)")))
      // nested parens + comma inside bucket(...) must survive the split
      val v = s2.sql("ALTER TABLE psql_spec REPLACE PARTITION SPEC " +
        "(months(ts), bucket(4, id))").head().getLong(0)
      assert(v === SnapshotTable.latestVersion(s2, path).get)
      assert(SnapshotTable.partitionTransforms(s2, path)
        === Seq("months(ts)", "bucket(4, id)"))
      assert(s2.sql("SHOW PARTITION SPEC IN psql_spec").count() === 2L)
      // new writes land in the evolved layout; old era still reads
      SnapshotTable.append(
        Seq(("c", ts("2024-05-03 09:00:00"), 3.0)).toDF("id", "ts", "v"), path)
      assert(SnapshotTable.liveFiles(s2, path)
        .exists(_.contains("__p_ts_month=2024-05")))
      assert(SnapshotTable.read(s2, path).count() === 3)
      assert(s2.sql(
        "SELECT count(*) FROM psql_spec WHERE ts >= TIMESTAMP '2024-04-01 00:00:00'")
        .head().getLong(0) === 2L)
      // a plain table refuses (evolve requires an existing spec era? no —
      // evolve works on plain tables too; an EMPTY spec refuses)
      val e = intercept[Exception](
        s2.sql("ALTER TABLE psql_spec REPLACE PARTITION SPEC (nope(ts))").collect())
      assert(e.getMessage.toLowerCase.contains("transform") ||
        e.getMessage.toLowerCase.contains("nope"))
    } finally SnapshotCatalog.unregister("psql_spec")
  }

  test("DESCRIBE DETAIL: one manifest-backed row — layout, sizes, properties, features") {
    val path = Files.createTempDirectory("graft-psql-dd").toString + "/t"
    // two partition values, one file each (coalesce) → numFiles = 2
    SnapshotTable.append(
      Seq(("a", "2024-01-01", 1.0), ("b", "2024-01-02", 2.0))
        .toDF("id", "event_date", "v").coalesce(1), path, Seq("event_date")) // v1
    SnapshotTable.renameColumn(s2, path, "v", "val")                         // v2
    SnapshotTable.addCheckConstraint(s2, path, "val_pos", "val > 0")         // v3
    SnapshotTable.setAutoCompact(s2, path, 4, 1 << 20)                       // v4
    SnapshotCatalog.register("psql_dd", path)
    try {
      for (stmt <- Seq("DESCRIBE DETAIL psql_dd", "DESC DETAIL psql_dd")) {
        val r = s2.sql(stmt).head()
        assert(r.getString(r.fieldIndex("format")) === "graft-snapshot")
        assert(r.getString(r.fieldIndex("location")) === path)
        assert(r.getLong(r.fieldIndex("version")) === 4L)
        assert(r.getSeq[String](r.fieldIndex("partitionColumns")) === Seq("event_date"))
        assert(r.getLong(r.fieldIndex("numFiles")) === 2L)
        assert(r.getLong(r.fieldIndex("sizeInBytes")) > 0L)
        assert(r.getLong(r.fieldIndex("numRows")) === 2L)
        val props = r.getMap[String, String](r.fieldIndex("properties"))
        assert(props.get("checkConstraints") === Some("val_pos"))
        assert(props.get("autoCompact.minFiles") === Some("4"))
        assert(r.getSeq[String](r.fieldIndex("readerFeatures"))
          === Seq("column-mapping"))
        assert(!r.isNullAt(r.fieldIndex("createdAt")) &&
          !r.isNullAt(r.fieldIndex("lastModified")))
      }
      // hidden-partitioned table reports the SPEC, not the __p_ column
      val hp = Files.createTempDirectory("graft-psql-dd2").toString + "/t"
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      SnapshotTable.appendTransformed(
        Seq(("x", ts("2024-03-01 10:00:00"), 1.0)).toDF("id", "ts", "v"),
        hp, Seq("days(ts)"))
      val hr = SnapshotTable.describeDetail(s2, hp).head()
      assert(hr.getSeq[String](hr.fieldIndex("partitionColumns")) === Seq("days(ts)"))
      assert(hr.getSeq[String](hr.fieldIndex("readerFeatures"))
        === Seq("partition-transforms"))
    } finally SnapshotCatalog.unregister("psql_dd")
  }

  test("DESCRIBE HISTORY: one row per version, newest first, ops and counts") {
    val path = Files.createTempDirectory("graft-psql-dh").toString + "/t"
    SnapshotTable.append(mk("a").coalesce(1), path)                        // v1: 5 rows
    SnapshotTable.delete(s2, path, col("v") >= 40.0)                       // v2: -1 row
    SnapshotCatalog.register("psql_dh", path)
    try {
      val rows = s2.sql("DESC HISTORY psql_dh").collect()
      assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toSeq
        === Seq((2L, "delete", 4L), (1L, "append", 5L)))
      assert(rows.forall(!_.isNullAt(2))) // published_at present
    } finally SnapshotCatalog.unregister("psql_dh")
  }

  test("ALTER TABLE ... ENABLE ROW TRACKING + table_changes(..., include_row_ids)") {
    val path = Files.createTempDirectory("graft-psql-rid").toString + "/t"
    SnapshotTable.append(mk("a").coalesce(1), path)                    // v1
    SnapshotCatalog.register("psql_rid", path)
    try {
      val v = s2.sql("ALTER TABLE psql_rid ENABLE ROW TRACKING")
        .collect().head.getLong(0)                                     // v2
      assert(SnapshotTable.rowTrackingEnabled(s2, path))
      // idempotent: re-enabling returns the same version
      assert(s2.sql("ALTER TABLE psql_rid ENABLE ROW TRACKING")
        .collect().head.getLong(0) === v)
      val vU = SnapshotTable.update(s2, path,
        Seq("v" -> (col("v") + 1000.0)), lit(true))                    // v3
      // SQL spelling of the row-id feed: keyless update arrives as
      // image pairs keyed by _row_id
      val feed = s2.sql(
        s"SELECT * FROM table_changes('psql_rid', ${vU - 1}, $vU, true)")
      assert(feed.columns.contains(SnapshotTable.RowIdCol))
      val byType = feed.collect().groupBy(_.getString(feed.schema.fieldIndex("_change_type")))
      assert(byType("update_preimage").length === 5 &&
        byType("update_postimage").length === 5)
      assert(!byType.contains("insert") && !byType.contains("delete"))
      // 3-arg form keeps the untracked shape (no _row_id column)
      assert(!s2.sql(s"SELECT * FROM table_changes('psql_rid', ${vU - 1}, $vU)")
        .columns.contains(SnapshotTable.RowIdCol))
    } finally SnapshotCatalog.unregister("psql_rid")
  }

  test("SET/UNSET AUTOCOMPACT and AUTOCLUSTER are metadata commits " +
      "and the policies fire from SQL-configured state") {
    val path = Files.createTempDirectory("graft-psql-pol").toString + "/t"
    def mk(tag: String, lo: Int) =
      (0 until 50).map(j => (s"$tag-$j", (lo + j).toLong, 1.0 * j))
        .toDF("id", "k", "v")
    SnapshotTable.append(mk("a", 0).coalesce(1), path)               // v1
    SnapshotCatalog.register("psql_pol", path)
    try {
      assert(s2.sql("ALTER TABLE psql_pol SET AUTOCOMPACT 3 ROWS 500")
        .head().getLong(0) === 2L)
      assert(SnapshotTable.autoCompactPolicy(s2, path) === Some((3, 500L)))
      assert(s2.sql("ALTER TABLE psql_pol SET AUTOCLUSTER 2")
        .head().getLong(0) === 3L)
      assert(SnapshotTable.autoClusterPolicy(s2, path) === Some(2))
      // DESCRIBE DETAIL surfaces both policies
      val props = s2.sql("DESCRIBE DETAIL psql_pol")
        .select("properties").head().getMap[String, String](0)
      assert(props.get("autoCompact.minFiles") === Some("3"))
      assert(props.get("autoCluster.minStaleFiles") === Some("2"))
      // the SQL-configured cluster policy fires: record a spec, then
      // two 1-file appends cross the AUTOCLUSTER 2 threshold
      s2.sql("ALTER TABLE psql_pol CLUSTER BY (k)")
      SnapshotTable.append(mk("b", 100).coalesce(1), path)
      SnapshotTable.append(mk("c", 200).coalesce(1), path)
      val ops = SnapshotTable.history(s2, path).select("operation")
        .collect().map(_.getString(0)).toSeq
      assert(ops.contains("autocluster"), s"policy never fired: $ops")
      assert(SnapshotTable.read(s2, path).count() === 150)
      // UNSET disables both
      s2.sql("ALTER TABLE psql_pol UNSET AUTOCOMPACT")
      s2.sql("ALTER TABLE psql_pol UNSET AUTOCLUSTER")
      assert(SnapshotTable.autoCompactPolicy(s2, path) === None)
      assert(SnapshotTable.autoClusterPolicy(s2, path) === None)
    } finally SnapshotCatalog.unregister("psql_pol")
  }

  test("OPTIMIZE WHERE ... INCREMENTAL disambiguates a trailing " +
      "column literally named 'incremental'") {
    val p = s2.sessionState.sqlParser
    // the keyword route: prefix parses as an expression
    p.parsePlan("OPTIMIZE t WHERE k = 1 INCREMENTAL") match {
      case c: SnapshotMaintenanceCommand =>
        assert(c.op === "optimize_incremental" &&
          c.whereSql === Some("k = 1"))
      case other => fail(s"unexpected plan: $other")
    }
    // the column route: "active AND" is not an expression, so the
    // full predicate (ending in a column named incremental) routes to
    // the plain scoped OPTIMIZE
    p.parsePlan("OPTIMIZE t WHERE active AND incremental") match {
      case c: SnapshotMaintenanceCommand =>
        assert(c.op === "optimize" &&
          c.whereSql === Some("active AND incremental"))
      case other => fail(s"unexpected plan: $other")
    }
    // the escape hatch: parenthesize to force the incremental route
    p.parsePlan("OPTIMIZE t WHERE (active AND incremental) INCREMENTAL") match {
      case c: SnapshotMaintenanceCommand =>
        assert(c.op === "optimize_incremental" &&
          c.whereSql === Some("(active AND incremental)"))
      case other => fail(s"unexpected plan: $other")
    }
  }

  test("injected lang_id SQL function is the native expression, " +
      "edge cases included") {
    val rows = s2.sql(
      """SELECT lang_id('le la de') AS f, lang_id('the el le der') AS tie,
        |  lang_id('') AS empty, lang_id(CAST(NULL AS STRING)) AS nul,
        |  lang_id('der die und') AS d""".stripMargin).head()
    assert(rows.getString(0) === "fr")  // la+de+le: fr 3 beats es 2
    assert(rows.getString(1) === "en")  // four-way tie -> en
    assert(rows.getString(2) === "en")  // zero counts -> en
    assert(rows.getString(3) === "de")  // composed-form NULL quirk
    assert(rows.getString(4) === "de")
  }
}
