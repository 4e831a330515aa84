package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StructField, StructType, StringType}
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.lake.SnapshotTable

/** Randomized FULL-DDL-alphabet fuzz against ONE long-lived
  * `graft-changes` stream — the CDF counterpart of
  * [[StreamDdlFuzzSpec]]. The raw-source fuzz pins the shared
  * [[SchemaStability]] guard; what it cannot reach is the
  * changes-source's OWN translation seam: every batch re-serves
  * historical commits through `changes(..., namesAsOf = capture)`,
  * so a rename/drop+re-add/widen between a commit and its
  * CONSUMPTION must re-map that commit's physical columns to the
  * capture-era names (values intact through renames, dropped bytes
  * NEVER resurfacing under a re-added name, int-era rows upcast).
  * The alphabet includes DELETE so rewrite-commit changes (rows read
  * back from superseded files) cross eras too, and ENABLE ROW
  * TRACKING as the schema-invariant op that must never trip the
  * guard — with the capture upgraded to `includeRowIds` afterwards,
  * asserting post-enable events carry ids and pre-enable history
  * serves NULL.
  *
  * Contracts at every crossing, per seed:
  *  - a batch whose end version passes a post-capture DDL fails
  *    LOUDLY with the restart-to-adopt message;
  *  - restart (fresh capture, same offsets) re-serves the same range;
  *  - across the whole plan every (row, change_type) event arrives
  *    EXACTLY ONCE with its model value.
  */
class ChangesDdlFuzzSpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** (source, feedSchema, capturedVersion) exactly as createSource
    * builds them at query (re)start. */
  private def capture(path: String,
      rid: Boolean): (SnapshotChangesStreamingSource, StructType, Long) = {
    val v = SnapshotTable.latestVersion(spark, path).get
    val user = SnapshotTable.schemaOf(spark, path, Some(v)).get.fields
      .filterNot(_.name.startsWith("__p_")).map(_.copy(nullable = true))
    val sch = StructType(user ++
      (if (rid) Seq(StructField(SnapshotTable.RowIdCol, LongType,
        nullable = true)) else Nil) :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false))
    (new SnapshotChangesStreamingSource(spark, path, sch, 1L, None, v, rid),
      sch, v)
  }

  private case class Ev(id: Long, kind: String, v: Option[Double], n: Long,
      version: Long)

  /** Consume (from, to] through the production batch path. Returns
    * (id, kind, v, n, version, rowId) rows. */
  private def readBatch(src: SnapshotChangesStreamingSource,
      sch: StructType, from: Long, to: Long)
      : Seq[(Long, String, Option[Double], Long, Long, Option[Long])] = {
    val hasRid = sch.fieldNames.contains(SnapshotTable.RowIdCol)
    val vName = sch.fields.map(_.name).find(n => n == "v" || n == "w")
    src.batchFor(from, to).collect().toSeq.map { r =>
      val vIdx = vName.map(r.fieldIndex)
      (r.getLong(r.fieldIndex("id")),
        r.getString(r.fieldIndex("_change_type")),
        vIdx.filterNot(r.isNullAt).map(r.getDouble),
        { val i = r.fieldIndex("n")
          if (sch.fields(i).dataType == LongType) r.getLong(i)
          else r.getInt(i).toLong },
        r.getLong(r.fieldIndex("_commit_version")),
        if (!hasRid) None
        else Option(r.fieldIndex(SnapshotTable.RowIdCol))
          .filterNot(r.isNullAt).map(r.getLong))
    }
  }

  private val genOp: Gen[String] = Gen.frequency(
    5 -> Gen.const("append"), 2 -> Gen.const("rename"),
    2 -> Gen.const("dropReadd"), 1 -> Gen.const("widen"),
    2 -> Gen.const("delete"), 1 -> Gen.const("enableRid"),
    4 -> Gen.const("consume"))

  test("random append x delete x rename x drop+re-add x widen x enable-rid plans " +
      "under ONE long-lived changes stream: loud-fail at DDL crossings, " +
      "restart-adopt, exactly-once events (4 seeds)") {
    (61L to 64L).foreach(run)
  }

  private def run(seed: Long): Unit = {
    val path = Files.createTempDirectory(s"graft-cdffuzz-$seed").toString + "/t"
    val plan = sample(Gen.listOfN(18, genOp), seed)

    var vName = "v"
    var widened = false
    var era = 0                      // bumped per dropReadd
    var ridEnabled = false
    var ridEnabledAt = Long.MaxValue // version of the enable commit
    var nextId = 0L
    // the model: every change EVENT the stream owes us, keyed
    // (id, kind). An unconsumed event's value nulls at a dropReadd
    // (the era that bore it is gone — dropped bytes must not
    // resurface); consumed events keep what they were consumed as.
    var expected = Map[(Long, String), Ev]()
    var consumed = Map[(Long, String), (Option[Double], Long, Long, Option[Long])]()
    // current table content readable under the live schema
    var curV = Map[Long, Option[Double]]()
    var curN = Map[Long, Long]()
    var liveIds = Vector[Long]()

    def ver: Long = SnapshotTable.latestVersion(spark, path).get

    def append(i: Int, n: Int): Unit = {
      val rows = (0 until n).map(j => (nextId + j, i * 10.0 + j, (i + j).toLong))
      if (widened)
        SnapshotTable.append(rows.toDF("id", vName, "n").coalesce(1), path)
      else
        SnapshotTable.append(rows.map { case (id, v, nn) => (id, v, nn.toInt) }
          .toDF("id", vName, "n").coalesce(1), path)
      val v = ver
      rows.foreach { case (id, vv, nn) =>
        expected += (id, "insert") -> Ev(id, "insert", Some(vv), nn, v)
        curV += id -> Some(vv); curN += id -> nn
        liveIds :+= id
      }
      nextId += n
    }

    append(0, 2) // seed the table
    var (live, liveSchema, capturedV) = capture(path, rid = false)
    var (capVName, capEra, capWide, capRid) = (vName, era, widened, false)
    var consumedTo = 0L

    def consume(i: Int): Unit = {
      val latest = ver
      val crossing = vName != capVName || era != capEra || widened != capWide ||
        (ridEnabled && !capRid)
      val ddlCrossing = vName != capVName || era != capEra || widened != capWide
      if (latest <= consumedTo && !ddlCrossing) {
        // a pure enableRid between captures must NOT trip the guard —
        // but we still re-capture below to upgrade to includeRowIds
        if (!crossing) return
      }
      if (ddlCrossing && latest > consumedTo) {
        val e = intercept[IllegalStateException] {
          readBatch(live, liveSchema, consumedTo, latest)
        }
        assert(e.getMessage.contains("restart the query"),
          s"seed=$seed op $i: wrong crossing error: ${e.getMessage}")
      }
      if (crossing) {
        val c = capture(path, rid = ridEnabled)
        live = c._1; liveSchema = c._2; capturedV = c._3
        capVName = vName; capEra = era; capWide = widened; capRid = ridEnabled
      }
      if (latest > consumedTo) {
        val got = readBatch(live, liveSchema, consumedTo, latest)
        got.foreach { case (id, kind, v, n, cv, ridVal) =>
          val key = (id, kind)
          assert(!consumed.contains(key),
            s"seed=$seed op $i: event $key re-emitted (exactly-once broken)")
          consumed += key -> ((v, n, cv, ridVal))
        }
        consumedTo = latest
      }
    }

    plan.zipWithIndex.foreach { case (op, i0) =>
      val i = i0 + 1
      op match {
        case "append" => append(i, (i % 3) + 1)
        case "rename" =>
          val to = if (vName == "v") "w" else "v"
          SnapshotTable.renameColumn(spark, path, vName, to)
          vName = to
        case "dropReadd" =>
          SnapshotTable.dropColumn(spark, path, vName)
          era += 1
          // unconsumed events lose their value — that IS the drop;
          // the live table's rows all read NULL for the re-added col
          expected = expected.map { case (k, ev) =>
            k -> (if (consumed.contains(k)) ev else ev.copy(v = None))
          }
          curV = curV.map { case (id, _) => id -> None }
          append(i, 1)
        case "widen" if !widened =>
          SnapshotTable.widenColumnType(spark, path, "n", LongType)
          widened = true
        case "widen" => ()
        case "enableRid" if !ridEnabled =>
          SnapshotTable.enableRowTracking(spark, path)
          ridEnabled = true; ridEnabledAt = ver
        case "enableRid" => ()
        case "delete" if liveIds.nonEmpty =>
          val id = liveIds.head
          liveIds = liveIds.tail
          SnapshotTable.delete(spark, path, col("id") === id)
          val v = ver
          expected += (id, "delete") -> Ev(id, "delete", curV(id), curN(id), v)
          curV -= id; curN -= id
        case "delete" => ()
        case "consume" => consume(i)
      }
    }
    consume(99) // final tail

    assert(consumed.keySet === expected.keySet,
      s"seed=$seed: event set diverged — lost ${expected.keySet -- consumed.keySet}, " +
        s"phantom ${consumed.keySet -- expected.keySet}")
    expected.foreach { case (key, ev) =>
      val (v, n, cv, ridVal) = consumed(key)
      assert(v === ev.v,
        s"seed=$seed $key: value diverged (got $v, want ${ev.v})")
      assert(n === ev.n, s"seed=$seed $key: n diverged (got $n, want ${ev.n})")
      assert(cv === ev.version,
        s"seed=$seed $key: commit version diverged (got $cv, want ${ev.version})")
      // row ids: only assertable for events consumed under a rid
      // capture; post-enable commits carry a non-null id, pre-enable
      // history serves NULL (the manifest at that version has no
      // bases). Which capture consumed the event isn't tracked, so
      // assert the one direction that is era-independent: a non-null
      // id can only appear on a post-enable event.
      if (ridVal.isDefined)
        assert(ev.version > ridEnabledAt || ev.version == ridEnabledAt,
          s"seed=$seed $key: _row_id on a pre-tracking commit")
    }
    // and the sharp rid contract, directly: with tracking on, a
    // fresh rid capture over the full history must serve non-null
    // ids for every post-enable event and NULL for every pre-enable
    // one
    if (ridEnabled) {
      val (src, sch, _) = capture(path, rid = true)
      val all = readBatch(src, sch, 0L, ver)
      all.foreach { case (id, kind, _, _, cv, ridVal) =>
        if (cv > ridEnabledAt)
          assert(ridVal.isDefined,
            s"seed=$seed: post-enable event ($id,$kind) at v$cv lacks _row_id")
        else
          assert(ridVal.isEmpty,
            s"seed=$seed: pre-enable event ($id,$kind) at v$cv carries _row_id")
      }
    }
  }
}
