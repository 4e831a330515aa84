package graft.lake

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.SnapshotTable.{Entry, Manifest}

/** The KnownHeaderPrefixes ↔ headerBlock sync contract, mechanically.
  *
  * KnownHeaderPrefixes is what parseManifest uses to decide which `#`
  * lines are MODELED state vs forward-carried `unknownHeaders`. If
  * headerBlock ever emits a header whose prefix is missing from that
  * list, the line is parsed into unknownHeaders AND re-derived from
  * state on the next serialization — duplicated on every round trip,
  * and `lines.find` could then read the stale duplicate. Until this
  * spec, only a comment guarded the sync; these tests make the drift
  * a compile-adjacent failure: populate EVERY field that drives a
  * header emission, serialize, and assert (a) each emitted line
  * matches a known prefix and (b) a re-parse leaves unknownHeaders
  * empty and reproduces the manifest field-for-field.
  *
  * The forward-carry half (genuinely unknown headers surviving
  * verbatim, not duplicating) is pinned here too — it is the same
  * sync contract seen from the future library's side. */
class HeaderRoundTripSpec extends AnyFunSuite {

  import SnapshotTable.{KnownHeaderPrefixes, headerBlock, manifestBytes,
    deltaManifestBytes, parseManifest}

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", StringType, nullable = true,
      metadata = new MetadataBuilder()
        .putString("EXISTS_DEFAULT", "'x'")
        .putString("CURRENT_DEFAULT", "'x'").build()),
    StructField("p", StringType)))

  private def fullEntry(i: Int) = Entry(
    commitDir = s"file:/tmp/t/data/c$i/",
    filePath = s"file:/tmp/t/data/c$i/p=a b/part-$i.parquet",
    rows = 10L + i,
    stats = Seq(("k", 1.0 + i, 9.0 + i)),
    dv = Some((s"file:/tmp/t/dv/d$i#x.bin", 3L)),
    sstats = Seq(("v", s"a#lo $i", s"z hi")),
    blooms = Seq(("k", "QUJDRA==")),
    nulls = Seq(("v", 2L)),
    rid = Some(100L * i),
    ridMat = i % 2 == 0,
    clusterTag = Some("0011223344556677"))

  /** Every field that can emit a header, populated. A new Manifest
    * field added without wiring it here keeps the test honest only if
    * it also emits nothing by default — which is exactly the safe
    * default for an unwired field. */
  private val full = Manifest(
    schema = Some(schema),
    entries = Seq(fullEntry(1), fullEntry(2)),
    op = Some("merge"),
    constraints = Map("c_pos" -> "k > 0"),
    transforms = Seq(DaysTransform("k"), BucketTransform(8, "v")),
    retiredTransforms = Seq(MonthsTransform("k")),
    txns = Map("app-1" -> 42L),
    bloomCols = Seq("k"),
    opKeys = Seq("k 1", "v,2"),
    colmap = Map("v" -> "__c2"),
    droppedPhys = Seq("__c9"),
    autoCompact = Some((4, 1000L)),
    rowIdHigh = Some(5000L),
    clusterCols = Seq("k", "v"),
    autoCluster = Some(6))

  test("every headerBlock emission matches a KnownHeaderPrefixes entry") {
    val lines = headerBlock(full).split("\n").filter(_.nonEmpty)
    assert(lines.nonEmpty)
    val orphans = lines.filterNot(l => KnownHeaderPrefixes.exists(l.startsWith))
    assert(orphans.isEmpty,
      s"headerBlock emits header(s) parseManifest does not model — they " +
        s"would duplicate on every re-serialization: ${orphans.mkString("; ")}")
    // and the dual: the delta marker is modeled too
    assert(KnownHeaderPrefixes.contains("#delta="))
  }

  test("checkpoint round trip: unknownHeaders empty, fields reproduced") {
    val (parsed, deltaBase, removes) =
      parseManifest(new String(manifestBytes(full), "UTF-8"))
    assert(deltaBase.isEmpty && removes.isEmpty)
    assert(parsed.unknownHeaders.isEmpty,
      s"modeled headers leaked into unknownHeaders: ${parsed.unknownHeaders}")
    // writerFeatures is parse-populated (the emitted derived header),
    // everything else must round-trip exactly
    assert(parsed.copy(writerFeatures = Nil, schema = None) ==
      full.copy(schema = None))
    assert(parsed.schema.get.json == schema.json)
    assert(parsed.writerFeatures.nonEmpty) // derived header was emitted
    // idempotence: a second round trip is byte-identical
    val again = new String(manifestBytes(parsed), "UTF-8")
    assert(again == new String(manifestBytes(parsed), "UTF-8"))
    val (parsed2, _, _) = parseManifest(again)
    assert(parsed2.copy(schema = None) == parsed.copy(schema = None))
  }

  test("delta round trip: base and signed entries survive") {
    val adds = Seq(fullEntry(3))
    val removes = Seq(fullEntry(1))
    val (parsed, deltaBase, gotRemoves) = parseManifest(
      new String(deltaManifestBytes(full, 7L, adds, removes), "UTF-8"))
    assert(deltaBase.contains(7L))
    assert(parsed.entries == adds)
    assert(gotRemoves == removes)
    assert(parsed.unknownHeaders.isEmpty)
  }

  test("forward-carry: unknown headers ride verbatim without duplicating") {
    val future = full.copy(
      writerFeatures = Seq("clustering", "frobnication"),
      unknownHeaders = Seq("#frobnicationState=abc def", "#zeta=1"))
    val bytes1 = new String(manifestBytes(future), "UTF-8")
    assert(bytes1.contains("#writerFeatures=clustering,frobnication\n"),
      "raw writer-features header with an unknown feature must re-emit verbatim")
    val (p1, _, _) = parseManifest(bytes1)
    assert(p1.unknownHeaders == future.unknownHeaders)
    // second serialization must not duplicate the carried lines
    val bytes2 = new String(manifestBytes(p1), "UTF-8")
    assert(bytes2.linesIterator.count(_.startsWith("#frobnicationState=")) == 1)
    assert(bytes2.linesIterator.count(_.startsWith("#zeta=")) == 1)
    val (p2, _, _) = parseManifest(bytes2)
    assert(p2.unknownHeaders == future.unknownHeaders)
  }
}
