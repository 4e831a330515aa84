package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** ROW TRACKING ([[SnapshotTable.enableRowTracking]] /
  * [[SnapshotTable.readWithRowIds]]): stable per-row Long identity in
  * the Delta row-tracking / Iceberg v3 row-lineage shape — driver-
  * assigned base ids for appended files (zero data-path cost),
  * materialized `__rid` only in rewritten files, a monotone
  * `#rowIdHigh=` watermark, and exact CDF update-image pairing by row
  * id even for KEYLESS rewrites (the gap the opKeys heuristic left).
  * Reference intent: the gold sink's Iceberg v2 row-level semantics
  * (reference jobs/ev_sessions_gold_etl.py:147-156) extended to the
  * v3 row-lineage surface. */
class RowTrackingSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-rid").toString + "/t"

  /** key -> row id map of the current table state. */
  private def idsByKey(path: String): Map[Int, Long] =
    SnapshotTable.readWithRowIds(spark, path)
      .select(col("k").cast("int"), col(SnapshotTable.RowIdCol))
      .as[(Int, Long)].collect().toMap

  private def allIds(path: String): Seq[Long] =
    SnapshotTable.readWithRowIds(spark, path)
      .select(col(SnapshotTable.RowIdCol)).as[Long].collect().toSeq

  test("create(rowTracking) assigns dense ids across appends; watermark advances") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    assert(SnapshotTable.rowTrackingEnabled(spark, path))
    assert(SnapshotTable.nextRowId(spark, path) === 0L)
    SnapshotTable.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), path)
    SnapshotTable.append(Seq((4, "d"), (5, "e")).toDF("k", "v"), path)
    val got = allIds(path)
    assert(got.sorted === (0L until 5L), s"dense ids expected, got $got")
    assert(SnapshotTable.nextRowId(spark, path) === 5L)
    // plain read never exposes row ids or the physical column
    val plain = SnapshotTable.read(spark, path)
    assert(!plain.columns.contains(SnapshotTable.RowIdCol))
    assert(!plain.columns.contains("__rid"))
  }

  test("enableRowTracking on an existing table numbers live rows; idempotent") {
    val path = tmp()
    SnapshotTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), path)
    SnapshotTable.append(Seq((3, "c")).toDF("k", "v"), path)
    assert(!SnapshotTable.rowTrackingEnabled(spark, path))
    intercept[IllegalArgumentException] {
      SnapshotTable.readWithRowIds(spark, path)
    }
    val v = SnapshotTable.enableRowTracking(spark, path)
    assert(allIds(path).sorted === (0L until 3L))
    // second enable is a no-op returning the current version
    assert(SnapshotTable.enableRowTracking(spark, path) === v)
    assert(SnapshotTable.latestVersion(spark, path) === Some(v))
  }

  test("user data may not claim the reserved __rid column") {
    val path = tmp()
    intercept[IllegalArgumentException] {
      SnapshotTable.create(spark, path,
        StructType(Seq(StructField("__rid", LongType))), rowTracking = true)
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.append(Seq((1L, "a")).toDF("__rid", "v"), path + "2")
    }
  }

  test("UPDATE rewrite keeps every surviving row's id (changed and carried)") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    SnapshotTable.append((1 to 8).map(i => (i, s"v$i")).toDF("k", "v"), path)
    val before = idsByKey(path)
    SnapshotTable.update(spark, path,
      Seq("v" -> lit("UPDATED")), col("k") % 2 === 0)
    val after = idsByKey(path)
    assert(after === before, "update must not renumber any row")
    val upd = SnapshotTable.read(spark, path)
      .filter(col("v") === "UPDATED").select("k").as[Int].collect().sorted
    assert(upd === Array(2, 4, 6, 8))
  }

  test("DELETE / deleteKeys / DV delete keep survivor ids") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    SnapshotTable.append((1 to 10).map(i => (i, s"v$i")).toDF("k", "v"), path)
    val before = idsByKey(path)
    SnapshotTable.delete(spark, path, col("k") === 1)          // rewrite
    SnapshotTable.deleteKeys(Seq(2).toDF("k"), path, Seq("k")) // keyed rewrite
    SnapshotTable.deleteWithVectors(spark, path, col("k") === 3) // DV, no rewrite
    val after = idsByKey(path)
    assert(after.keySet === (4 to 10).toSet)
    after.foreach { case (k, id) => assert(id === before(k),
      s"survivor k=$k renumbered: ${before(k)} -> $id") }
  }

  test("MERGE: updated rows keep their id, inserted rows get fresh unique ids") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    SnapshotTable.append((1 to 5).map(i => (i, s"v$i")).toDF("k", "v"), path)
    val before = idsByKey(path)
    // update k=2,4; insert k=6,7
    SnapshotTable.merge(Seq((2, "U2"), (4, "U4"), (6, "N6"), (7, "N7"))
      .toDF("k", "v"), path, Seq("k"))
    val after = idsByKey(path)
    (1 to 5).foreach(k => assert(after(k) === before(k),
      s"merge renumbered existing row k=$k"))
    val fresh = Seq(after(6), after(7))
    assert(fresh.toSet.size === 2)
    fresh.foreach(id => assert(!before.values.toSet.contains(id),
      s"inserted row reused live id $id"))
    assert(after.values.toSeq.distinct.size === after.size, "ids must stay unique")
    assert(SnapshotTable.nextRowId(spark, path) > after.values.max)
  }

  test("deleteRowIds retires merge-INSERTED rows in a MIXED rewritten file " +
      "(ids above the carried __rid footer range)") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    SnapshotTable.append((1 to 5).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), path)
    val before = idsByKey(path)
    // ONE merge that both updates (k=2: carried row, materialized
    // __rid) and inserts (k=6..10: NULL __rid, ids read as the fresh
    // base + position): the rewritten file MIXES both families, so
    // its __rid footer stats cover only the carried ids — the
    // inserted rows' effective ids lie ABOVE that range
    SnapshotTable.merge(
      (Seq((2, "U2")) ++ (6 to 10).map(i => (i, s"N$i"))).toDF("k", "v"),
      path, Seq("k"))
    val after = idsByKey(path)
    val mixed = SnapshotTable.readManifestFull(spark, path,
        SnapshotTable.latestVersion(spark, path).get).entries
      .filter(e => e.ridMat && e.stats.exists(_._1 == SnapshotTable.RidCol))
    assert(mixed.nonEmpty,
      "precondition: the rewritten file must carry __rid footer stats")
    // target only inserted ids ABOVE the footer range's unit widening
    // — exactly the ids a stats-only range prune would silently skip
    val carriedMax = before.values.max
    val victims = (6 to 10).map(after).filter(_ > carriedMax + 2)
    assert(victims.nonEmpty,
      "precondition: an inserted row must land past position 1")
    SnapshotTable.deleteRowIds(victims.toDF("rid"), path)
    val fin = idsByKey(path)
    val goneKeys = (6 to 10).filter(k => victims.contains(after(k)))
    goneKeys.foreach(k =>
      assert(!fin.contains(k), s"inserted k=$k survived deleteRowIds"))
    assert(fin.keySet === after.keySet -- goneKeys)
    fin.foreach { case (k, id) => assert(id === after(k),
      s"survivor k=$k renumbered by the mixed-file retirement") }
  }

  test("compact preserves ids, including through an earlier DV delete") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    (1 to 4).foreach(i =>
      SnapshotTable.append(Seq((i, s"v$i")).toDF("k", "v"), path))
    SnapshotTable.deleteWithVectors(spark, path, col("k") === 2)
    val before = idsByKey(path)
    SnapshotTable.compact(spark, path, numFiles = 1)
    val after = idsByKey(path)
    assert(after === before, "compaction must not renumber rows")
    assert(after.keySet === Set(1, 3, 4))
  }

  test("RESTORE: rows keep birth ids; watermark is monotone, never rewound") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    SnapshotTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), path) // v2
    val idsV2 = idsByKey(path)
    val highV2 = SnapshotTable.nextRowId(spark, path)
    SnapshotTable.append(Seq((3, "c")).toDF("k", "v"), path)           // v3
    val highV3 = SnapshotTable.nextRowId(spark, path)
    assert(highV3 > highV2)
    SnapshotTable.restore(spark, path, 2L)
    assert(idsByKey(path) === idsV2, "restored rows must keep their birth ids")
    assert(SnapshotTable.nextRowId(spark, path) === highV3,
      "watermark must not rewind across restore")
    // a post-restore append must not reuse the discarded rows' ids
    SnapshotTable.append(Seq((9, "z")).toDF("k", "v"), path)
    val ids = allIds(path)
    assert(ids.distinct.size === ids.size)
    assert(idsByKey(path)(9) >= highV3)
  }

  test("restore to a PRE-tracking version re-enables with fresh bases") {
    val path = tmp()
    SnapshotTable.append(Seq((1, "a")).toDF("k", "v"), path)  // v1, untracked
    SnapshotTable.enableRowTracking(spark, path)               // v2
    SnapshotTable.append(Seq((2, "b")).toDF("k", "v"), path)  // v3
    val high = SnapshotTable.nextRowId(spark, path)
    SnapshotTable.restore(spark, path, 1L)
    assert(SnapshotTable.rowTrackingEnabled(spark, path),
      "tracking survives a restore to pre-enable history")
    val ids = allIds(path)
    assert(ids.size === 1 && ids.head >= high,
      s"pre-tracking file must be re-based above the watermark, got $ids")
  }

  test("CDF pairs a KEYLESS update by row id; off by default; ids stable in feed") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    // duplicate values make value-keyed pairing impossible: only row
    // identity can match pre to post images
    SnapshotTable.append(Seq((1, "same"), (1, "same"), (2, "x")).toDF("k", "v"), path)
    val before = SnapshotTable.readWithRowIds(spark, path)
    val dupIds = before.filter(col("k") === 1)
      .select(SnapshotTable.RowIdCol).as[Long].collect().sorted
    val vUpd = SnapshotTable.update(spark, path,
      Seq("v" -> lit("upd")), col("k") === 1)
    val feed = SnapshotTable.changes(spark, path, vUpd - 1, vUpd, None,
      includeRowIds = true)
    val pre = feed.filter(col("_change_type") === "update_preimage")
      .select(SnapshotTable.RowIdCol).as[Long].collect().sorted
    val post = feed.filter(col("_change_type") === "update_postimage")
      .select(SnapshotTable.RowIdCol).as[Long].collect().sorted
    assert(pre === dupIds, s"preimages must carry the updated rows' ids")
    assert(post === dupIds, "postimages must pair by the same ids")
    assert(feed.filter(col("_change_type").isin("insert", "delete")).count() === 0,
      "a pure update must emit no bare insert/delete rows when ids pair it")
    // default shape: no _row_id column (feed schema matches untracked)
    val plainFeed = SnapshotTable.changes(spark, path, vUpd - 1, vUpd)
    assert(!plainFeed.columns.contains(SnapshotTable.RowIdCol))
    // the carried row k=2 cancels in the diff entirely
    assert(feed.filter(col("k") === 2).count() === 0)
  }

  test("CDF: DV delete names the dying row's id; merge inserts carry fresh ids") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    SnapshotTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), path)
    val before = idsByKey(path)
    val vDel = SnapshotTable.deleteWithVectors(spark, path, col("k") === 1)
    val delFeed = SnapshotTable.changes(spark, path, vDel - 1, vDel, None,
      includeRowIds = true)
    val died = delFeed.filter(col("_change_type") === "delete")
      .select(SnapshotTable.RowIdCol).as[Long].collect()
    assert(died.toSeq === Seq(before(1)))
    val vM = SnapshotTable.merge(Seq((2, "B2"), (5, "new")).toDF("k", "v"),
      path, Seq("k"))
    val mFeed = SnapshotTable.changes(spark, path, vM - 1, vM, None,
      includeRowIds = true)
    val pairIds = mFeed.filter(col("_change_type").startsWith("update_"))
      .select(SnapshotTable.RowIdCol).as[Long].collect().toSeq
    assert(pairIds.toSet === Set(before(2)), "update images pair on the stable id")
    val ins = mFeed.filter(col("_change_type") === "insert")
    assert(ins.count() === 1)
    val insId = ins.select(SnapshotTable.RowIdCol).as[Long].head()
    assert(!before.values.toSet.contains(insId))
  }

  test("readWithRowIds time-travels: an old version serves the ids it had then") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    SnapshotTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), path) // v2
    val atV2 = idsByKey(path)
    SnapshotTable.delete(spark, path, col("k") === 1)                   // v3
    SnapshotTable.append(Seq((3, "c")).toDF("k", "v"), path)           // v4
    val old = SnapshotTable.readWithRowIds(spark, path, Some(2L))
      .select(col("k").cast("int"), col(SnapshotTable.RowIdCol))
      .as[(Int, Long)].collect().toMap
    assert(old === atV2, "version 2 must serve its own id assignment")
    assert(idsByKey(path).keySet === Set(2, 3))
  }

  test("CDF: a compaction on a tracked table contributes nothing (values AND ids cancel)") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    (1 to 4).foreach(i =>
      SnapshotTable.append(Seq((i, s"v$i")).toDF("k", "v"), path))
    val vC = SnapshotTable.compact(spark, path, numFiles = 1)
    assert(SnapshotTable.opOf(spark, path, vC).contains("compact"))
    assert(SnapshotTable.changes(spark, path, vC - 1, vC, None,
      includeRowIds = true).count() === 0L,
      "carried rows must cancel in the diff: same values, same ids")
  }

  test("pre-tracking history still serves through changes() untagged") {
    val path = tmp()
    SnapshotTable.append(Seq((1, "a")).toDF("k", "v"), path)   // v1 untracked
    SnapshotTable.enableRowTracking(spark, path)                // v2
    SnapshotTable.append(Seq((2, "b")).toDF("k", "v"), path)   // v3
    val feed = SnapshotTable.changes(spark, path, 0L, 3L, None,
      includeRowIds = true)
    // v1's commit predates tracking: its rows surface without ids
    val v1 = feed.filter(col("_commit_version") === 1L)
    assert(v1.count() === 1)
    if (v1.columns.contains(SnapshotTable.RowIdCol))
      assert(v1.filter(col(SnapshotTable.RowIdCol).isNull).count() === 1)
    val v3 = feed.filter(col("_commit_version") === 3L)
    assert(v3.filter(col(SnapshotTable.RowIdCol).isNotNull).count() === 1)
  }

  test("cherry-pick re-bases a metadata-only commit; refuses materialized ids") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    SnapshotTable.append(Seq((1, "a")).toDF("k", "v"), path)
    SnapshotTable.createBranch(spark, path, "dev")
    val dev = SnapshotTable.branchHandle(path, "dev")
    // plain append on the branch: cherry-pick re-bases it onto main
    SnapshotTable.append(Seq((2, "b")).toDF("k", "v"), dev)
    // main advances so the branch's assigned base collides
    SnapshotTable.append(Seq((3, "c")).toDF("k", "v"), path)
    val bv = SnapshotTable.latestVersion(spark, dev).get
    SnapshotTable.cherryPick(spark, path, "dev", bv)
    val ids = allIds(path)
    assert(ids.distinct.size === ids.size,
      s"cherry-pick must re-base the imported file's ids, got $ids")
    assert(SnapshotTable.read(spark, path).select("k").as[Int].collect().sorted
      === Array(1, 2, 3))
    // a branch REWRITE materializes ids assigned on the branch — the
    // pick must refuse rather than import possibly-colliding identities
    SnapshotTable.update(spark, dev, Seq("v" -> lit("X")), col("k") === 2)
    val bv2 = SnapshotTable.latestVersion(spark, dev).get
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.cherryPick(spark, path, "dev", bv2)
    }
    assert(e.getMessage.contains("materialized row ids"))
  }

  test("reader-features gate and DESCRIBE DETAIL properties name row tracking") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType))), rowTracking = true)
    SnapshotTable.append(Seq(1, 2, 3).toDF("k"), path)
    val d = SnapshotTable.describeDetail(spark, path).head()
    assert(d.getSeq[String](d.fieldIndex("readerFeatures"))
      .contains("row-tracking"))
    val props = d.getMap[String, String](d.fieldIndex("properties"))
    assert(props.get("rowTracking").contains("true"))
    assert(props.get("rowIdHighWatermark").contains("3"))
  }

  test("rid state round-trips through CHECKPOINT manifests and survives vacuum") {
    // 25 commits crosses the checkpoint cadence (20): the rid entry
    // tokens and the #rowIdHigh header must serialize through the
    // checkpoint writer identically to delta version files, and a
    // vacuum that swaps checkpoints must not lose either
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    (1 to 22).foreach(i =>
      SnapshotTable.append(Seq((i, s"v$i")).toDF("k", "v"), path))
    SnapshotTable.update(spark, path, Seq("v" -> lit("X")), col("k") <= 3)
    val before = idsByKey(path)
    val high = SnapshotTable.nextRowId(spark, path)
    SnapshotTable.compact(spark, path, numFiles = 1)
    SnapshotTable.vacuum(spark, path, keepVersions = 1)
    assert(idsByKey(path) === before,
      "ids must survive checkpointed manifests + vacuum")
    assert(SnapshotTable.nextRowId(spark, path) >= high)
    SnapshotTable.append(Seq((99, "z")).toDF("k", "v"), path)
    val ids = allIds(path)
    assert(ids.distinct.size === ids.size)
  }

  test("shallowClone copies rid state; clone and source then diverge independently") {
    val dir = Files.createTempDirectory("graft-rid-clone").toString
    val (src, dst) = (s"$dir/src", s"$dir/dst")
    SnapshotTable.create(spark, src,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    SnapshotTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), src)
    val srcIds = idsByKey(src)
    SnapshotTable.shallowClone(spark, src, dst)
    // the clone reads the SAME ids (shared files, copied bases)
    assert(idsByKey(dst) === srcIds)
    assert(SnapshotTable.nextRowId(spark, dst) ===
      SnapshotTable.nextRowId(spark, src))
    // post-clone writes number independently per table (Delta's clone
    // semantics: row ids are table-scoped lineage, not global)
    SnapshotTable.append(Seq((3, "c")).toDF("k", "v"), dst)
    SnapshotTable.append(Seq((4, "d")).toDF("k", "v"), src)
    assert(idsByKey(dst)(3) === idsByKey(src)(4),
      "both sides assign the next id from their own copied watermark")
    val dstIds = allIds(dst)
    assert(dstIds.distinct.size === dstIds.size)
  }

  test("DML x row-id fuzz: ids unique and stable for carried rows across random op mix") {
    dmlRidFuzz(seed = 15015, esc = false)
  }

  test("DML x row-id fuzz on an ESCAPED partition layout: the probe fallback " +
      "holds under the full rewrite alphabet") {
    // every read the rewrites make (readGroupsWithRid inheritance,
    // DV anti-joins) rides the percent-decode-fixpoint probe here —
    // the layout is partitioned by a ':'-bearing value
    dmlRidFuzz(seed = 16016, esc = true)
  }

  /** The random op mix, on a plain layout (fast raw-path keys) or an
    * ESCAPED hive layout (every path segment percent-encodes → the
    * scanFileKey probe fallback). The model asserts per step: ids
    * unique, carried rows never renumbered, watermark above every
    * live id; overwrite assigns fresh ids above the old watermark. */
  private def dmlRidFuzz(seed: Long, esc: Boolean): Unit = {
    val dir = Files.createTempDirectory(
      if (esc) "graft-ridfuzz esc" else "graft-ridfuzz").toString
    val path = s"$dir/t"
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType),
        StructField("p", StringType), StructField("v", StringType))),
      rowTracking = true)
    val parts = if (esc) Seq("p") else Nil
    val rnd = new scala.util.Random(seed)
    var nextKey = 1
    def freshRows(n: Int): Seq[(Int, String, String)] = {
      val r = (nextKey until nextKey + n).map(i => (i, s"c:${i % 3}", s"v$i"))
      nextKey += n; r
    }
    SnapshotTable.append(freshRows(6).toDF("k", "p", "v"), path, parts)
    // model: key -> id for rows whose identity must persist
    var model: Map[Int, Long] = idsByKey(path)
    for (step <- 1 to 26) {
      val live = model.keys.toSeq.sorted
      rnd.nextInt(11) match {
        case 0 => // append
          SnapshotTable.append(
            freshRows(1 + rnd.nextInt(3)).toDF("k", "p", "v"), path, parts)
        case 7 => // full overwrite: every old id dies, fresh rows get new ids
          val high = SnapshotTable.nextRowId(spark, path)
          SnapshotTable.overwrite(freshRows(2).toDF("k", "p", "v"), path, parts)
          val now0 = idsByKey(path)
          assert(now0.values.forall(_ >= high),
            s"step $step: overwrite must assign FRESH ids above $high, got $now0")
          model = Map.empty // nothing survives an overwrite
        case 8 => // clustered append (plain) / partitioned append (esc —
          // a clustered write is unpartitioned and would mix layouts)
          if (esc) SnapshotTable.append(freshRows(3).toDF("k", "p", "v"), path, parts)
          else SnapshotTable.appendClustered(
            freshRows(3).toDF("k", "p", "v"), path, "k", numFiles = 2)
        case 1 if live.nonEmpty => // predicate update
          val k = live(rnd.nextInt(live.size))
          SnapshotTable.update(spark, path,
            Seq("v" -> lit(s"u$step")), col("k") === k)
        case 2 if live.nonEmpty => // rewrite delete
          val k = live(rnd.nextInt(live.size))
          SnapshotTable.delete(spark, path, col("k") === k)
          model -= k
        case 3 if live.nonEmpty => // DV delete
          val k = live(rnd.nextInt(live.size))
          SnapshotTable.deleteWithVectors(spark, path, col("k") === k)
          model -= k
        case 4 if live.nonEmpty => // merge: update one, insert one
          val k = live(rnd.nextInt(live.size))
          val ins = freshRows(1)
          SnapshotTable.merge(
            (Seq((k, s"c:${k % 3}", s"m$step")) ++ ins).toDF("k", "p", "v"),
            path, Seq("k"))
        case 5 => // compact
          SnapshotTable.compact(spark, path, numFiles = 2)
        case 9 if live.nonEmpty => // full-clause merge: conditional
          // update one row, matched-DELETE another, star-insert a
          // fresh one, NMBS-stamp the even keys
          val k1 = live(rnd.nextInt(live.size))
          val rest = live.filterNot(_ == k1)
          val k2 = if (rest.nonEmpty) Some(rest(rnd.nextInt(rest.size))) else None
          val src = (Seq((k1, s"c:${k1 % 3}", "up")) ++
            k2.map(k => (k, s"c:${k % 3}", "del")) ++ freshRows(1))
            .toDF("k", "p", "v")
          SnapshotTable.mergeClauses(src, path, Seq("k"),
            matched = Seq(
              MergeUpdate(Some(col("s.v") === "up"),
                Seq("v" -> lit(s"mc$step"))),
              MergeDelete(Some(col("s.v") === "del"))),
            notMatched = Seq(MergeInsert(None, Nil)),
            notMatchedBySource = Seq(
              MergeUpdate(Some(col("t.k") % 2 === 0),
                Seq("v" -> lit(s"nm$step")))),
            partitionCols = parts)
          k2.foreach(model -= _)
        case 10 if live.nonEmpty => // retire by stable row id
          val k = live(rnd.nextInt(live.size))
          SnapshotTable.deleteRowIds(Seq(model(k)).toDF("rid"), path)
          model -= k
        case _ if live.nonEmpty => // deleteKeys
          val k = live(rnd.nextInt(live.size))
          SnapshotTable.deleteKeys(Seq(k).toDF("k"), path, Seq("k"))
          model -= k
        case _ =>
          SnapshotTable.append(freshRows(2).toDF("k", "p", "v"), path, parts)
      }
      val now = idsByKey(path)
      assert(now.values.toSeq.distinct.size === now.size,
        s"step $step: duplicate row ids: $now")
      model.foreach { case (k, id) => assert(now(k) === id,
        s"step $step: surviving row k=$k renumbered ${id} -> ${now(k)}") }
      // adopt newly appeared rows (appends/merge inserts) into the model
      model = now
      val high = SnapshotTable.nextRowId(spark, path)
      assert(now.values.forall(_ < high),
        s"step $step: watermark $high not above a live id in $now")
    }
  }

  test("a NO-CHANGE range keeps the requested feed shape (incl. _row_id)") {
    // metadata-only commits contribute nothing to the feed, so a
    // range covering only them hits the empty fallback — which must
    // still carry _row_id when asked, or batch consumers that select
    // or union on it throw on every quiet range
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    SnapshotTable.append(Seq((1, "a")).toDF("k", "v"), path)
    val vMeta = SnapshotTable.addCheckConstraint(spark, path, "kpos", "k > 0")
    val quiet = SnapshotTable.changes(spark, path, vMeta - 1, vMeta,
      None, includeRowIds = true)
    assert(quiet.count() === 0)
    assert(quiet.columns.contains(SnapshotTable.RowIdCol),
      "empty-range fallback dropped _row_id from the feed schema")
    // and it unions cleanly with a non-empty tracked feed
    val busy = SnapshotTable.changes(spark, path, 1, 2, None,
      includeRowIds = true)
    assert(quiet.unionByName(busy).count() === busy.count())
    // untracked shape stays untracked
    assert(!SnapshotTable.changes(spark, path, vMeta - 1, vMeta)
      .columns.contains(SnapshotTable.RowIdCol))
  }

  test("merge and deleteKeys refuse a source carrying the reserved __rid") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    SnapshotTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), path)
    val bad = Seq((1, "z", 99L)).toDF("k", "v", "__rid")
    val em = intercept[IllegalArgumentException] {
      SnapshotTable.merge(bad, path, Seq("k"))
    }
    assert(em.getMessage.contains("reserved column '__rid'"),
      s"wrong merge error: ${em.getMessage}")
    val ed = intercept[IllegalArgumentException] {
      SnapshotTable.deleteKeys(bad.select("k", "__rid"), path, Seq("k"))
    }
    assert(ed.getMessage.contains("reserved column '__rid'"),
      s"wrong deleteKeys error: ${ed.getMessage}")
  }

  test("readWhereWithRowIds: the pruned tracked read — fewer files, same ids") {
    val path = tmp()
    SnapshotTable.create(spark, path,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
      rowTracking = true)
    val df = (1 to 600).map(i => (i, s"v$i")).toDF("k", "v")
    SnapshotTable.appendClustered(df, path, "k", numFiles = 6)
    val total = SnapshotTable.liveFiles(spark, path).size
    def scanned(q: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      q.collect() // execute THIS dataset's own QE (metrics live there)
      def files(p: SparkPlan): Long = p.collect {
        case a: AdaptiveSparkPlanExec => files(a.executedPlan)
        case st: QueryStageExec       => files(st.plan)
        case sc: FileSourceScanExec   => sc.metrics("numFiles").value
      }.sum
      files(q.queryExecution.executedPlan)
    }
    val q = SnapshotTable.readWhereWithRowIds(spark, path, col("k") <= 100)
    val n = scanned(q)
    assert(n >= 1 && n < total, s"pruned tracked read scanned $n of $total files")
    // same ids the full tracked read serves for that subset
    val viaFull = SnapshotTable.readWithRowIds(spark, path)
      .filter(col("k") <= 100)
      .select(col("k"), col(SnapshotTable.RowIdCol)).as[(Int, Long)]
      .collect().toMap
    val viaPruned = q.select(col("k"), col(SnapshotTable.RowIdCol))
      .as[(Int, Long)].collect().toMap
    assert(viaPruned === viaFull)
    // stable across a rewrite that touches the pruned range
    SnapshotTable.update(spark, path, Seq("v" -> lit("U")), col("k") % 10 === 3)
    val after = SnapshotTable.readWhereWithRowIds(spark, path, col("k") <= 100)
      .select(col("k"), col(SnapshotTable.RowIdCol)).as[(Int, Long)]
      .collect().toMap
    assert(after === viaFull, "rewrite renumbered pruned tracked rows")
    // empty prune keeps the feed shape
    val none = SnapshotTable.readWhereWithRowIds(spark, path, col("k") > 10000)
    assert(none.count() === 0)
    assert(none.columns.contains(SnapshotTable.RowIdCol))
    // refused without tracking
    val plain = tmp()
    SnapshotTable.append(Seq((1, "a")).toDF("k", "v"), plain)
    intercept[IllegalArgumentException] {
      SnapshotTable.readWhereWithRowIds(spark, plain, col("k") > 0)
    }
  }
}
