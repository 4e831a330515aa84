package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** End-to-end DSv2 catalog surface: `CREATE TABLE graft.ns.t`,
  * INSERT/CTAS through the V1 write fallback, reads substituted onto
  * the native snapshot plan, SQL row-level DML, time travel, schema
  * evolution, metadata tables — no `register()` anywhere. */
class GraftCatalogSpec extends SparkTestBase {

  private var prevDefault: Option[SparkSession] = None
  private var prevActive: Option[SparkSession] = None
  private lazy val warehouse =
    Files.createTempDirectory("graft-cat-wh").toString

  /** Session with the catalog + extensions configured (the shared
    * suite session has neither; getOrCreate on a cleared default
    * builds a genuinely new one over the same SparkContext). */
  private lazy val s2: SparkSession = {
    prevDefault = SparkSession.getDefaultSession
    prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-catalog-test")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    super.afterAll()
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    def files(p: org.apache.spark.sql.execution.SparkPlan): Long =
      p.collect {
        case a: AdaptiveSparkPlanExec => files(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => files(q.plan)
        case s: FileSourceScanExec => s.metrics("numFiles").value
      }.sum
    files(df.queryExecution.executedPlan)
  }

  test("namespace + table DDL: create, list, describe, drop") {
    s2.sql("CREATE NAMESPACE graft.ddl")
    assert(s2.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).contains("ddl"))
    s2.sql("CREATE TABLE graft.ddl.t1 (id BIGINT, name STRING) USING `graft-snapshot`")
    assert(s2.sql("SHOW TABLES IN graft.ddl").collect()
      .map(_.getString(1)).toSeq === Seq("t1"))
    val desc = s2.sql("DESCRIBE TABLE graft.ddl.t1").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc("id") === "bigint" && desc("name") === "string")
    // a freshly created table reads as zero rows with the right shape
    assert(s2.sql("SELECT * FROM graft.ddl.t1").columns.toSeq === Seq("id", "name"))
    assert(s2.sql("SELECT * FROM graft.ddl.t1").count() === 0)
    s2.sql("DROP TABLE graft.ddl.t1")
    assert(s2.sql("SHOW TABLES IN graft.ddl").count() === 0)
    intercept[Exception](s2.sql("SELECT * FROM graft.ddl.t1").collect())
  }

  test("INSERT INTO / INSERT OVERWRITE / SELECT round-trip with time travel") {
    s2.sql("CREATE NAMESPACE graft.ins")
    s2.sql("CREATE TABLE graft.ins.t (id BIGINT, v DOUBLE) USING `graft-snapshot`")
    s2.sql("INSERT INTO graft.ins.t VALUES (1, 1.5), (2, 2.5)")
    s2.sql("INSERT INTO graft.ins.t VALUES (3, 3.5)")
    assert(s2.sql("SELECT sum(id) FROM graft.ins.t").head().getLong(0) === 6L)
    // versions: 1=create, 2=first insert, 3=second
    assert(s2.sql("SELECT count(*) FROM graft.ins.t VERSION AS OF 2")
      .head().getLong(0) === 2L)
    s2.sql("INSERT OVERWRITE graft.ins.t VALUES (9, 9.0)")
    assert(s2.sql("SELECT id FROM graft.ins.t").collect().map(_.getLong(0)).toSeq
      === Seq(9L))
    // overwrite is a commit like any other: the pre-overwrite state survives
    assert(s2.sql("SELECT count(*) FROM graft.ins.t VERSION AS OF 3")
      .head().getLong(0) === 3L)
  }

  test("CTAS creates and loads in one statement") {
    s2.sql("CREATE NAMESPACE graft.ctas")
    s2.sql("CREATE TABLE graft.ctas.squares USING `graft-snapshot` AS " +
      "SELECT id, id * id AS sq FROM range(5)")
    assert(s2.sql("SELECT sum(sq) FROM graft.ctas.squares").head().getLong(0) === 30L)
    assert(SnapshotTable.opOf(s2, s"$warehouse/ctas/squares", 1L) === Some("create"))
  }

  test("PARTITIONED BY hidden transforms: layout, pruning, invisible columns") {
    s2.sql("CREATE NAMESPACE graft.hp")
    s2.sql("CREATE TABLE graft.hp.ev (id STRING, ts TIMESTAMP, v DOUBLE) " +
      "USING `graft-snapshot` PARTITIONED BY (days(ts), bucket(4, id))")
    import s2.implicits._
    Seq(("e1", ts("2024-01-01 08:00:00"), 1.0),
      ("e2", ts("2024-01-02 09:00:00"), 2.0),
      ("e3", ts("2024-01-03 10:00:00"), 3.0))
      .toDF("id", "ts", "v").createOrReplaceTempView("ev_src")
    s2.sql("INSERT INTO graft.hp.ev SELECT * FROM ev_src")
    assert(SnapshotTable.partitionTransforms(s2, s"$warehouse/hp/ev")
      === Seq("days(ts)", "bucket(4, id)"))
    // hidden columns stay hidden in SQL
    assert(s2.sql("SELECT * FROM graft.hp.ev").columns.toSeq === Seq("id", "ts", "v"))
    // WHERE on the source column prunes day directories at listing time
    val pruned = s2.sql(
      "SELECT id FROM graft.hp.ev WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'")
    assert(pruned.collect().map(_.getString(0)).toSeq === Seq("e3"))
    val all = scannedFiles(s2.sql("SELECT id FROM graft.hp.ev"))
    val few = scannedFiles(s2.sql(
      "SELECT id FROM graft.hp.ev WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'"))
    assert(few < all, s"expected partition pruning: $few vs $all files")
  }

  test("SQL MERGE / UPDATE / DELETE against a catalog table") {
    s2.sql("CREATE NAMESPACE graft.dml")
    s2.sql("CREATE TABLE graft.dml.t (k BIGINT, s STRING) USING `graft-snapshot`")
    s2.sql("INSERT INTO graft.dml.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    import s2.implicits._
    Seq((2L, "B"), (4L, "d")).toDF("k", "s").createOrReplaceTempView("updates")
    s2.sql("MERGE INTO graft.dml.t t USING updates s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(s2.sql("SELECT s FROM graft.dml.t ORDER BY k").collect()
      .map(_.getString(0)).toSeq === Seq("a", "B", "c", "d"))
    s2.sql("UPDATE graft.dml.t SET s = concat(s, '!') WHERE k >= 3")
    assert(s2.sql("SELECT s FROM graft.dml.t ORDER BY k").collect()
      .map(_.getString(0)).toSeq === Seq("a", "B", "c!", "d!"))
    s2.sql("DELETE FROM graft.dml.t WHERE k = 2")
    assert(s2.sql("SELECT k FROM graft.dml.t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L))
    // WITH SCHEMA EVOLUTION on the catalog path: the analyzer may
    // pre-expand SET * (fromStar) — star intent must survive so the
    // new source column both evolves the schema and gets assigned
    Seq((3L, "C", 30), (9L, "i", 90)).toDF("k", "s", "score")
      .createOrReplaceTempView("evo_updates")
    s2.sql("MERGE WITH SCHEMA EVOLUTION INTO graft.dml.t t " +
      "USING evo_updates s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val got = s2.sql("SELECT k, s, score FROM graft.dml.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).toSeq
    assert(got === Seq((1L, "a", -1), (3L, "C", 30), (4L, "d!", -1),
      (9L, "i", 90)))
  }

  test("ALTER TABLE ADD COLUMNS: old rows read NULL, inserts carry the column") {
    s2.sql("CREATE NAMESPACE graft.alt")
    s2.sql("CREATE TABLE graft.alt.t (id BIGINT) USING `graft-snapshot`")
    s2.sql("INSERT INTO graft.alt.t VALUES (1)")
    s2.sql("ALTER TABLE graft.alt.t ADD COLUMNS (note STRING)")
    s2.sql("INSERT INTO graft.alt.t VALUES (2, 'fresh')")
    val rows = s2.sql("SELECT id, note FROM graft.alt.t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSeq === Seq((1L, null), (2L, "fresh")))
  }

  test("ALTER TABLE RENAME/DROP COLUMN: metadata-only, time travel across the rename") {
    s2.sql("CREATE NAMESPACE graft.cm")
    s2.sql("CREATE TABLE graft.cm.t (id BIGINT, v DOUBLE, s STRING) USING `graft-snapshot`")
    s2.sql("INSERT INTO graft.cm.t VALUES (1, 1.5, 'a'), (2, 2.5, 'b')") // v2
    val tdir = s"$warehouse/cm/t"
    val filesBefore = SnapshotTable.liveFiles(s2, tdir).toSet
    s2.sql("ALTER TABLE graft.cm.t RENAME COLUMN v TO value")            // v3
    assert(SnapshotTable.liveFiles(s2, tdir).toSet === filesBefore,
      "SQL rename must rewrite zero files")
    assert(s2.sql("SELECT sum(value) FROM graft.cm.t").head().getDouble(0) === 4.0)
    s2.sql("INSERT INTO graft.cm.t VALUES (3, 3.5, 'c')")                // v4
    assert(s2.sql("SELECT sum(value) FROM graft.cm.t").head().getDouble(0) === 7.5)
    // time travel to before the rename: the OLD logical name
    assert(s2.sql("SELECT sum(v) FROM graft.cm.t VERSION AS OF 2")
      .head().getDouble(0) === 4.0)
    s2.sql("ALTER TABLE graft.cm.t DROP COLUMN s")                       // v5
    assert(s2.sql("SELECT * FROM graft.cm.t").columns.toSeq === Seq("id", "value"))
    assert(s2.sql("SELECT s FROM graft.cm.t VERSION AS OF 4")
      .collect().map(_.getString(0)).sorted.toSeq === Seq("a", "b", "c"))
    // SQL DML through the mapped table
    s2.sql("UPDATE graft.cm.t SET value = 0.0 WHERE id = 1")
    assert(s2.sql("SELECT value FROM graft.cm.t WHERE id = 1")
      .head().getDouble(0) === 0.0)
  }

  test("ALTER COLUMN TYPE widens losslessly via SQL; lossy changes refused") {
    s2.sql("CREATE NAMESPACE graft.tw")
    s2.sql("CREATE TABLE graft.tw.t (k INT, s STRING) USING `graft-snapshot`")
    s2.sql("INSERT INTO graft.tw.t VALUES (1, 'a')")                     // v2
    val tdir = s"$warehouse/tw/t"
    val filesBefore = SnapshotTable.liveFiles(s2, tdir).toSet
    s2.sql("ALTER TABLE graft.tw.t ALTER COLUMN k TYPE BIGINT")          // v3
    assert(SnapshotTable.liveFiles(s2, tdir).toSet === filesBefore,
      "SQL widen must rewrite zero files")
    assert(s2.table("graft.tw.t").schema("k").dataType
      === org.apache.spark.sql.types.LongType)
    s2.sql("INSERT INTO graft.tw.t VALUES (9000000000, 'big')")
    assert(s2.sql("SELECT sum(k) FROM graft.tw.t").head().getLong(0)
      === 9000000001L)
    // the INT era is preserved under time travel
    assert(s2.sql("SELECT k FROM graft.tw.t VERSION AS OF 2").schema("k")
      .dataType === org.apache.spark.sql.types.IntegerType)
    intercept[Exception](
      s2.sql("ALTER TABLE graft.tw.t ALTER COLUMN k TYPE INT"))
  }

  test("CREATE TABLE ... CLUSTER BY records the liquid spec at create") {
    s2.sql("CREATE NAMESPACE graft.lc")
    s2.sql("CREATE TABLE graft.lc.t (a BIGINT, b DOUBLE) " +
      "USING `graft-snapshot` CLUSTER BY (a, b)")
    val tdir = s"$warehouse/lc/t"
    s2.sql("INSERT INTO graft.lc.t SELECT id, CAST(id % 7 AS DOUBLE) " +
      "FROM range(1000)")
    s2.sql("INSERT INTO graft.lc.t SELECT id, CAST(id % 7 AS DOUBLE) " +
      "FROM range(1000, 2000)")
    val before = SnapshotTable.liveFiles(s2, tdir).toSet
    // the spec was recorded at CREATE: no full OPTIMIZE ZORDER needed
    SnapshotTable.optimizeIncremental(s2, tdir)
    assert(SnapshotTable.liveFiles(s2, tdir).toSet.intersect(before).isEmpty,
      "every pre-pass file was unclustered and must be rewritten")
    assert(s2.sql("SELECT count(*) FROM graft.lc.t").head().getLong(0) === 2000)
    val v = SnapshotTable.latestVersion(s2, tdir).get
    assert(SnapshotTable.optimizeIncremental(s2, tdir) === v,
      "second pass must be a no-op")
  }

  test("ALTER COLUMN FIRST/AFTER reorders metadata-only via SQL") {
    s2.sql("CREATE NAMESPACE graft.ro")
    s2.sql("CREATE TABLE graft.ro.t (a INT, b STRING, c DOUBLE) USING `graft-snapshot`")
    s2.sql("INSERT INTO graft.ro.t VALUES (1, 'x', 2.5)")                // v2
    val tdir = s"$warehouse/ro/t"
    val filesBefore = SnapshotTable.liveFiles(s2, tdir).toSet
    s2.sql("ALTER TABLE graft.ro.t ALTER COLUMN c FIRST")                // v3
    assert(s2.table("graft.ro.t").columns.toSeq === Seq("c", "a", "b"))
    s2.sql("ALTER TABLE graft.ro.t ALTER COLUMN c AFTER a")              // v4
    assert(s2.table("graft.ro.t").columns.toSeq === Seq("a", "c", "b"))
    assert(SnapshotTable.liveFiles(s2, tdir).toSet === filesBefore,
      "SQL reorder must rewrite zero files")
    // values still bind by NAME, order is pure projection
    assert(s2.sql("SELECT a, b, c FROM graft.ro.t").head()
      === org.apache.spark.sql.Row(1, "x", 2.5))
    // positional INSERT follows the NEW order
    s2.sql("INSERT INTO graft.ro.t VALUES (2, 9.5, 'y')")
    assert(s2.sql("SELECT a, b, c FROM graft.ro.t WHERE a = 2").head()
      === org.apache.spark.sql.Row(2, "y", 9.5))
    // the old order is preserved under time travel
    assert(s2.sql("SELECT * FROM graft.ro.t VERSION AS OF 2")
      .columns.toSeq === Seq("a", "b", "c"))
    // unknown anchors refused
    intercept[Exception](
      s2.sql("ALTER TABLE graft.ro.t ALTER COLUMN a AFTER nope"))
  }

  test("a multi-change ALTER TABLE statement is ATOMIC: a refused change " +
      "rolls the whole statement back") {
    s2.sql("CREATE NAMESPACE graft.atomic")
    s2.sql("CREATE TABLE graft.atomic.t (id BIGINT, v DOUBLE) USING `graft-snapshot`")
    s2.sql("INSERT INTO graft.atomic.t VALUES (1, 1.5)")
    val tdir = s"$warehouse/atomic/t"
    val vBefore = SnapshotTable.latestVersion(s2, tdir).get
    // second ADD collides with an existing column — the statement must
    // publish NOTHING, not land 'w' and then fail
    intercept[Exception](
      s2.sql("ALTER TABLE graft.atomic.t ADD COLUMNS (w STRING, v INT)"))
    assert(SnapshotTable.latestVersion(s2, tdir).get === vBefore,
      "half-applied ALTER must publish nothing")
    assert(!s2.table("graft.atomic.t").columns.contains("w"))
    // and a multi-change statement that is fully valid lands as ONE
    // commit carrying every change
    s2.sql("ALTER TABLE graft.atomic.t ADD COLUMNS (w STRING, n INT)")
    assert(SnapshotTable.latestVersion(s2, tdir).get === vBefore + 1)
    assert(s2.table("graft.atomic.t").columns.toSeq
      === Seq("id", "v", "w", "n"))
  }

  test("SET/UNSET TBLPROPERTIES toggle bloom columns and auto-compaction") {
    s2.sql("CREATE NAMESPACE graft.props")
    s2.sql("CREATE TABLE graft.props.t (id STRING, v DOUBLE) USING `graft-snapshot`")
    s2.sql("ALTER TABLE graft.props.t SET TBLPROPERTIES(" +
      "'graft.bloomFilterColumns'='id', 'graft.autoCompact'='4,1000')")
    val tdir = s"$warehouse/props/t"
    assert(SnapshotTable.bloomColumns(s2, tdir) === Seq("id"))
    assert(SnapshotTable.autoCompactPolicy(s2, tdir) === Some((4, 1000L)))
    // SHOW TBLPROPERTIES reflects both
    val props = s2.sql("SHOW TBLPROPERTIES graft.props.t").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("graft.bloomFilterColumns") === Some("id"))
    assert(props.get("graft.autoCompact") === Some("4,1000"))
    // the toggles act: a burst of tiny inserts converges and files
    // carry blooms
    (1 to 8).foreach(i =>
      s2.sql(s"INSERT INTO graft.props.t VALUES ('x$i', $i.0)"))
    assert(SnapshotTable.liveFiles(s2, tdir).size <= 4)
    val entries = SnapshotTable.readManifest(s2, tdir,
      SnapshotTable.latestVersion(s2, tdir).get).filter(_.rows > 1)
    assert(entries.forall(_.blooms.exists(_._1 == "id")))
    s2.sql("ALTER TABLE graft.props.t UNSET TBLPROPERTIES(" +
      "'graft.bloomFilterColumns', 'graft.autoCompact')")
    assert(SnapshotTable.bloomColumns(s2, tdir).isEmpty)
    assert(SnapshotTable.autoCompactPolicy(s2, tdir).isEmpty)
    // an unrelated property is refused loudly, not silently dropped
    val e = intercept[Exception] {
      s2.sql("ALTER TABLE graft.props.t SET TBLPROPERTIES('foo'='bar')")
    }
    assert(e.getMessage.contains("SET|UNSET TBLPROPERTIES"))
  }

  test("rowTracking via TBLPROPERTIES: CREATE opts in, SET enables later, " +
      "UNSET refused, SHOW reflects it") {
    s2.sql("CREATE NAMESPACE graft.rid")
    s2.sql("CREATE TABLE graft.rid.born (id STRING, v DOUBLE) " +
      "USING `graft-snapshot` TBLPROPERTIES('graft.rowTracking'='true')")
    val born = s"$warehouse/rid/born"
    assert(SnapshotTable.rowTrackingEnabled(s2, born))
    s2.sql("INSERT INTO graft.rid.born VALUES ('a', 1.0), ('b', 2.0)")
    assert(SnapshotTable.readWithRowIds(s2, born)
      .select(SnapshotTable.RowIdCol).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted === Array(0L, 1L))
    // later opt-in on an existing table
    s2.sql("CREATE TABLE graft.rid.later (id STRING) USING `graft-snapshot`")
    val later = s"$warehouse/rid/later"
    s2.sql("INSERT INTO graft.rid.later VALUES ('x')")
    s2.sql("ALTER TABLE graft.rid.later SET TBLPROPERTIES('graft.rowTracking'='true')")
    assert(SnapshotTable.rowTrackingEnabled(s2, later))
    val props = s2.sql("SHOW TBLPROPERTIES graft.rid.later").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("graft.rowTracking") === Some("true"))
    // one-way: UNSET and non-'true' values are refused
    assert(intercept[Exception] {
      s2.sql("ALTER TABLE graft.rid.later UNSET TBLPROPERTIES('graft.rowTracking')")
    }.getMessage.contains("cannot be disabled"))
    assert(intercept[Exception] {
      s2.sql("ALTER TABLE graft.rid.later SET TBLPROPERTIES('graft.rowTracking'='false')")
    }.getMessage.contains("one-way"))
  }

  test("tags resolve through VERSION AS OF; metadata tables reachable by name") {
    s2.sql("CREATE NAMESPACE graft.meta")
    s2.sql("CREATE TABLE graft.meta.t (id BIGINT) USING `graft-snapshot`")
    s2.sql("INSERT INTO graft.meta.t VALUES (1)")
    s2.sql("INSERT INTO graft.meta.t VALUES (2)")
    val path = s"$warehouse/meta/t"
    SnapshotTable.tag(s2, path, "golden", Some(2L))
    assert(s2.sql("SELECT count(*) FROM graft.meta.t VERSION AS OF 'golden'")
      .head().getLong(0) === 1L)
    val hist = s2.sql("SELECT version, operation FROM graft.meta.t.history").collect()
    assert(hist.map(_.getLong(0)).toSeq === Seq(3L, 2L, 1L))
    assert(hist.map(_.getString(1)).toSeq === Seq("append", "append", "create"))
    assert(s2.sql("SELECT count(*) FROM graft.meta.t.files").head().getLong(0) >= 2L)
  }

  test("branch refs resolve through VERSION AS OF to the branch head") {
    s2.sql("CREATE NAMESPACE graft.br")
    s2.sql("CREATE TABLE graft.br.t (id BIGINT) USING `graft-snapshot`")
    s2.sql("INSERT INTO graft.br.t VALUES (1)")
    val path = s"$warehouse/br/t"
    SnapshotTable.createBranch(s2, path, "dev")
    val bh = SnapshotTable.branchHandle(path, "dev")
    import s2.implicits._
    SnapshotTable.append(Seq(2L, 3L).toDF("id"), bh)
    // branch head through SQL; main untouched
    assert(s2.sql("SELECT count(*) FROM graft.br.t VERSION AS OF 'dev'")
      .head().getLong(0) === 3L)
    assert(s2.sql("SELECT count(*) FROM graft.br.t").head().getLong(0) === 1L)
    // unknown ref names a tag-or-branch error, not a silent fallback
    val e = intercept[Exception](
      s2.sql("SELECT * FROM graft.br.t VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("no tag or branch"))
  }

  test("DataFrame writeTo API appends; constraints enforce on catalog writes") {
    s2.sql("CREATE NAMESPACE graft.api")
    s2.sql("CREATE TABLE graft.api.t (id BIGINT, v DOUBLE) USING `graft-snapshot`")
    import s2.implicits._
    Seq((1L, 0.5)).toDF("id", "v").writeTo("graft.api.t").append()
    assert(s2.sql("SELECT count(*) FROM graft.api.t").head().getLong(0) === 1L)
    s2.sql("ALTER TABLE graft.api.t ADD CONSTRAINT v_pos CHECK (v > 0)")
    val e = intercept[Exception](
      s2.sql("INSERT INTO graft.api.t VALUES (2, -1.0)"))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("v_pos")), s"got: $e")
    s2.sql("ALTER TABLE graft.api.t DROP CONSTRAINT v_pos")
    s2.sql("INSERT INTO graft.api.t VALUES (2, -1.0)")
    assert(s2.sql("SELECT count(*) FROM graft.api.t").head().getLong(0) === 2L)
  }

  test("rename table; drop namespace cascade") {
    s2.sql("CREATE NAMESPACE graft.mv")
    s2.sql("CREATE TABLE graft.mv.a (id BIGINT) USING `graft-snapshot`")
    s2.sql("INSERT INTO graft.mv.a VALUES (7)")
    // the RENAME TO target is an identifier WITHIN the same catalog
    s2.sql("ALTER TABLE graft.mv.a RENAME TO mv.b")
    assert(s2.sql("SELECT id FROM graft.mv.b").head().getLong(0) === 7L)
    intercept[Exception](s2.sql("SELECT * FROM graft.mv.a").collect())
    s2.sql("DROP NAMESPACE graft.mv CASCADE")
    assert(!s2.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).contains("mv"))
  }

  test("rename re-anchors BRANCH logs too: branch reads and writes survive the move") {
    import graft.lake.SnapshotTable
    s2.sql("CREATE NAMESPACE graft.rnb")
    s2.sql("CREATE TABLE graft.rnb.t (id BIGINT) USING `graft-snapshot`")
    s2.sql("INSERT INTO graft.rnb.t VALUES (1)")
    val oldPath = warehouse + "/rnb/t"
    SnapshotTable.createBranch(s2, oldPath, "dev")
    import s2.implicits._
    SnapshotTable.append(Seq(2L).toDF("id"),
      SnapshotTable.branchHandle(oldPath, "dev"))

    s2.sql("ALTER TABLE graft.rnb.t RENAME TO rnb.t2")
    val newPath = warehouse + "/rnb/t2"
    // main reads at the new home; the branch's manifests (incl. the
    // fork base and its own commit) must have been re-anchored too —
    // stale absolute paths would fail the read or silently read the
    // OLD location
    assert(SnapshotTable.read(s2, newPath).as[Long].collect().toSeq === Seq(1L))
    val bh = SnapshotTable.branchHandle(newPath, "dev")
    assert(SnapshotTable.read(s2, bh).as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(SnapshotTable.liveFiles(s2, bh).forall(_.contains("/rnb/t2/")),
      "branch manifest still references the pre-rename path")
    // and the branch stays writable at the new home
    SnapshotTable.append(Seq(3L).toDF("id"), bh)
    assert(SnapshotTable.read(s2, bh).count() === 3L)
  }

  test("ALTER TABLE ... ADD COLUMN ... DEFAULT: initial default via SQL DDL") {
    import s2.implicits._
    s2.sql("CREATE TABLE graft.cd.t (k BIGINT, s STRING) USING `graft-snapshot`")
    s2.sql("INSERT INTO graft.cd.t VALUES (1, 'a')")
    // constant expressions fold at ALTER time (41 + 1 → 42)
    s2.sql("ALTER TABLE graft.cd.t ADD COLUMN c INT DEFAULT 41 + 1")
    s2.sql("INSERT INTO graft.cd.t VALUES (2, 'b', 7)")
    val got = s2.sql("SELECT k, c FROM graft.cd.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === Seq((1L, 42), (2L, 7)))
    // non-constant defaults are refused loudly
    val e = intercept[Exception] {
      s2.sql("ALTER TABLE graft.cd.t ADD COLUMN d INT DEFAULT k + 1")
    }
    assert(e.getMessage.toLowerCase.contains("default"))
  }

  test("CREATE TABLE (... DEFAULT): column-list INSERT fills it; omitted-column appends read it") {
    import s2.implicits._
    s2.sql("CREATE TABLE graft.cd.t2 (k BIGINT, c INT DEFAULT 5) " +
      "USING `graft-snapshot`")
    // analyzer-side: a column-list INSERT missing c fills the default
    s2.sql("INSERT INTO graft.cd.t2 (k) VALUES (1)")
    // read-side: a direct append whose file simply lacks c serves it
    SnapshotTable.append(Seq(2L).toDF("k"),
      s"$warehouse/cd/t2")
    val got = s2.sql("SELECT k, c FROM graft.cd.t2 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === Seq((1L, 5), (2L, 5)))
  }
}
