package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.lake.SnapshotTable

/** Randomized FULL-DDL-alphabet × long-lived-stream fuzz — the mode
  * the per-drain rename fuzz (HeaderFeatureModelSpec) structurally
  * cannot reach: there every drain is a fresh AvailableNow query, so
  * the capture is always newer than every DDL and the post-capture
  * guard never fires. Here ONE consumer (the MicroBatchStream a live
  * query holds, driven through the production `planInputPartitions` +
  * reader path) spans the whole random plan of appends, renames,
  * drop+re-adds, and type widenings, and at every crossing the fuzz
  * asserts the restart-to-adopt contract:
  *
  *  - a batch whose end version is past a post-capture DDL fails
  *    LOUDLY ([[SchemaStability]]) — never silent NULLs (drop+re-add),
  *    stale names (rename), or decoder ClassCastExceptions (widen);
  *  - a RESTART (fresh capture, same offsets) then consumes the same
  *    range successfully;
  *  - across the whole plan every appended row is consumed EXACTLY
  *    ONCE with its model value: dropped-column history reads NULL
  *    (dropped bytes never resurface under the re-added name),
  *    renamed columns keep their values, int-era rows upcast wide.
  */
class StreamDdlFuzzSpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** The live query's stream object — capture (schema + colmap +
    * version) exactly as `getTable` makes it at load(). */
  private def capture(path: String): (SnapshotMicroBatchStream, StructType, Long) = {
    val v = SnapshotTable.latestVersion(spark, path).get
    val schema = StructType(SnapshotTable.schemaOf(spark, path).get.fields
      .filterNot(_.name.startsWith("__p_")).map(_.copy(nullable = true)))
    (new SnapshotMicroBatchStream(path, schema,
      SnapshotTable.columnMappingAt(spark, path, v), v,
      SnapshotStreamOptions(0L, ignoreChanges = false, None, "auto",
        16L << 20, 128L << 20)), schema, v)
  }

  /** Consume (from, to] through the production read path, returning
    * (id, value, n) per row — value/n null-safe. */
  private def readBatch(ms: SnapshotMicroBatchStream, schema: StructType,
      from: Long, to: Long): Seq[(Long, Option[Double], Option[Long])] = {
    val parts = ms.planInputPartitions(
      SnapshotVersionOffset(from), SnapshotVersionOffset(to))
    val rf = ms.createReaderFactory()
    val idI = schema.fieldIndex("id")
    val vI = schema.fields.indexWhere(f => f.name == "v" || f.name == "w")
    val nI = schema.fieldIndex("n")
    val nT = schema.fields(nI).dataType
    parts.toSeq.flatMap { p =>
      val r = rf.createReader(p)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Option[Double], Option[Long])]()
      while (r.next()) {
        val row = r.get()
        out += ((row.getLong(idI),
          if (vI < 0 || row.isNullAt(vI)) None else Some(row.getDouble(vI)),
          if (row.isNullAt(nI)) None
          else Some(if (nT == LongType) row.getLong(nI) else row.getInt(nI).toLong)))
      }
      r.close()
      out.toSeq
    }
  }

  private val genOp: Gen[String] = Gen.frequency(
    5 -> Gen.const("append"), 2 -> Gen.const("rename"),
    2 -> Gen.const("dropReadd"), 1 -> Gen.const("widen"),
    // schema-INVARIANT metadata DDL: must never trip the stability
    // guard or perturb the stream (its commit adds no files)
    1 -> Gen.const("enableRid"),
    4 -> Gen.const("consume"))

  test("random append x rename x drop+re-add x widen plans under ONE long-lived " +
      "stream: loud-fail at every DDL crossing, restart-adopt, exactly-once values (4 seeds)") {
    (51L to 54L).foreach(run)
  }

  private def run(seed: Long): Unit = {
    val path = Files.createTempDirectory(s"graft-ddlfuzz-$seed").toString + "/t"
    val plan = sample(Gen.listOfN(16, genOp), seed)

    var vName = "v"                       // current name of the value column
    var widened = false                   // n: int (false) → long (true)
    var era = 0                           // bumped per dropReadd (fresh physical)
    var nextId = 0L
    // per-id EXPECTED stream observation; a drop+re-add nulls the
    // value of every not-yet-consumed row (dropped bytes must not
    // resurface); consumed rows keep what they were consumed as
    var expectedV = Map[Long, Option[Double]]()
    var expectedN = Map[Long, Long]()
    var consumedIds = Set[Long]()
    var streamed = Map[Long, (Option[Double], Option[Long])]()

    def append(i: Int, n: Int): Unit = {
      val rows = (0 until n).map(j => (nextId + j, i * 10.0 + j, i + j))
      if (widened)
        SnapshotTable.append(
          rows.map { case (id, v, nn) => (id, v, nn.toLong) }
            .toDF("id", vName, "n").coalesce(1), path)
      else
        SnapshotTable.append(rows.toDF("id", vName, "n").coalesce(1), path)
      rows.foreach { case (id, v, nn) =>
        expectedV += id -> Some(v); expectedN += id -> nn.toLong
      }
      nextId += n
    }

    append(0, 2) // seed the table
    var (live, liveSchema, capturedV) = capture(path)
    // the guard compares the batch-END schema against the capture, so
    // the model must too: a rename that nets back (v→w→v) before the
    // next batch legitimately does not trip it — physical names make
    // the middle era decode correctly
    var (capVName, capEra, capWide) = (vName, era, widened)
    var consumed = SnapshotTable.latestVersion(spark, path).get
    // consume the bootstrap so "consumed" matches the offset semantics
    readBatch(live, liveSchema, 0L, consumed).foreach { case (id, v, n) =>
      streamed += id -> ((v, n)); consumedIds += id
    }

    def consume(i: Int): Unit = {
      val latest = SnapshotTable.latestVersion(spark, path).get
      val crossing = vName != capVName || era != capEra || widened != capWide
      if (latest <= consumed && !crossing) return
      if (crossing) {
        val e = intercept[IllegalStateException] {
          readBatch(live, liveSchema, consumed, math.max(latest, consumed + 1))
        }
        assert(e.getMessage.contains("restart the query"),
          s"seed=$seed op $i: wrong crossing error: ${e.getMessage}")
        // restart: fresh capture, SAME offsets (the checkpoint)
        val c = capture(path)
        live = c._1; liveSchema = c._2; capturedV = c._3
        capVName = vName; capEra = era; capWide = widened
      }
      if (latest > consumed) {
        val got = readBatch(live, liveSchema, consumed, latest)
        got.foreach { case (id, v, n) =>
          assert(!streamed.contains(id),
            s"seed=$seed op $i: id $id re-emitted (exactly-once broken)")
          streamed += id -> ((v, n)); consumedIds += id
        }
        consumed = latest
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
          era += 1 // the re-add mints a fresh physical name
          // unconsumed history loses its value — that IS the drop
          expectedV = expectedV.map { case (id, v) =>
            id -> (if (consumedIds(id)) v else None)
          }
          append(i, 1) // re-add via the append path (fresh physical name)
        case "widen" if !widened =>
          SnapshotTable.widenColumnType(spark, path, "n", LongType)
          widened = true
        case "widen"  => () // already wide — idempotent skip
        case "enableRid" =>
          SnapshotTable.enableRowTracking(spark, path); ()
        case "consume" => consume(i)
      }
    }
    consume(99) // final tail

    assert(streamed.keySet === expectedV.keySet,
      s"seed=$seed: row set diverged (lost or phantom rows)")
    streamed.foreach { case (id, (v, n)) =>
      assert(v === expectedV(id),
        s"seed=$seed id $id: value diverged (got $v, want ${expectedV(id)})")
      assert(n === Some(expectedN(id)),
        s"seed=$seed id $id: n diverged (got $n, want ${expectedN(id)})")
    }
  }
}
