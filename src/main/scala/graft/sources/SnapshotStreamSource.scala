package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.SnapshotTable

/** Structured Streaming source over a snapshot table — the
  * `spark.readStream` half of the lake (Delta's streaming-source
  * parity; the batch-driven contract lives in
  * [[graft.lake.SnapshotIncremental]]):
  *
  *   spark.readStream.format("graft-snapshot").load(tablePath)
  *     .writeStream... // each microbatch = the files NEW commits added
  *
  * Offsets are table VERSIONS (checkpointed by the engine), so a
  * restarted query resumes exactly after the last committed version.
  * Each microbatch reads ONLY the files its commit range added —
  * O(new data) IO, no rescans. A commit that removed or rewrote files
  * (merge/delete/update/compact) — or changed a deletion vector —
  * fails the query by default, naming the version and operation;
  * `.option("ignoreChanges", true)` accepts re-emission of rewritten
  * carried-over rows instead (the Delta semantics of the same
  * option). Under ignoreChanges a DELETION-VECTOR commit re-emits the
  * touched files' still-live rows only — dead positions are applied
  * in the reader, so DV'd rows never reach the sink, matching what a
  * batch read of the same version returns.
  *
  * Options: `startingVersion` — the first table version the stream
  * emits, INCLUSIVE, matching Delta's option of the same name
  * (`startingVersion = N` means the first batch covers commits
  * N..latest; absent = 0 = bootstrap the whole table);
  * `ignoreChanges` (default false); `vectorizedReader` —
  * `auto` (default) | `always` | `never`; `vectorizedThresholdBytes`
  * (auto mode switches to the vectorized reader when a batch spans at
  * least this many bytes, default 16 MiB); `maxBytesPerPartition`
  * (vectorized files split into byte ranges of at most this, default
  * 128 MiB, so one fat bootstrap file fans out over tasks).
  *
  * COLUMN MAPPING: on a renamed table ([[SnapshotTable.renameColumn]])
  * the data files store PHYSICAL names while the stream's schema uses
  * LOGICAL ones. Both decode paths resolve each requested field
  * through the table's logical→physical mapping, captured ONCE when
  * the query (re)starts — the same moment the schema is inferred, so
  * the two are consistent by construction. Physical names are STABLE
  * across renames (a rename is metadata-only and a dropped physical
  * name is tombstoned, never reused), which is what makes one
  * captured mapping correct for every file in the stream regardless
  * of which side of a rename wrote it: a field the mapping does not
  * cover (e.g. the old logical name during a mid-query rename) is its
  * own physical name, and a file that lacks the resolved physical
  * field genuinely predates the column — the true schema-evolution
  * NULL, now distinguishable from a renamed column's data.
  *
  * SCHEMA CHANGES AFTER the capture (drop, drop+re-add, rename, type
  * widening) fail the first batch that crosses them LOUDLY with a
  * restart-to-adopt message — [[SchemaStability.requireStable]],
  * shared with `graft-changes`, checked against each batch's end
  * version before any read is planned. A restarted query re-captures
  * and replays the same offset ranges exactly-once under the new
  * schema; columns added after the capture stay invisible until a
  * restart (Delta's semantics).
  *
  * Reader notes: TWO decode paths share the partition-value logic.
  * Small commit-sized batches use parquet-hadoop's Group API (simple,
  * per-row); batches at bootstrap scale route through Spark's
  * VectorizedParquetRecordReader with byte-range file splitting — the
  * same columnar decoder the batch reader uses, so bootstrapping a
  * large table through the stream is no longer row-at-a-time with one
  * task per file. Flat (primitive-column) schemas only, which is what
  * the snapshot writer produces; hive partition-directory values are
  * filled from the file path exactly like the batch reader; columns a
  * file predates read as NULL. Timestamps handle both INT96 and
  * annotated INT64 encodings.
  */
class SnapshotStreamSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  private def pathOf(options: java.util.Map[String, String]): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-snapshot needs the table path: .load(<tablePath>) or .option(\"path\", ...)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val path = pathOf(options)
    // a SINK may target a not-yet-created table (first epoch creates
    // it, like a batch append) — empty schema here; the write path
    // uses the query's schema and the READ path guards loudly in
    // newScanBuilder instead
    if (SnapshotTable.latestVersion(spark, path).isEmpty)
      return new StructType()
    val s = SnapshotTable.schemaOf(spark, path)
      .getOrElse(SnapshotTable.read(spark, path).schema)
    // hidden partition columns (any era) are layout, not data — the
    // stream exposes the same user schema as the batch read; fields
    // are forced NULLABLE exactly like Spark's file sources (and the
    // batch read): a file predating a column null-fills it, and a
    // non-nullable field would silently zero-fill that NULL when the
    // row deserializes (Row over a non-nullable double reads 0.0)
    StructType(s.fields.filterNot(_.name.startsWith("__p_"))
      .map(_.copy(nullable = true)))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties carry the options with their ORIGINAL key case —
    // normalize so .option("ignoreChanges", ...) matches
    val opts = new CaseInsensitiveStringMap(properties)
    val vectorized = Option(opts.get("vectorizedreader")).getOrElse("auto")
    require(Set("auto", "always", "never")(vectorized),
      s"vectorizedReader must be auto|always|never, got '$vectorized'")
    // Delta spells streaming CDF as an option on the same format;
    // here the change feed is its own source — point there rather
    // than silently ignoring the option
    require(!opts.getBoolean("readchangefeed", false),
      "the change-data feed is its own source: " +
        "spark.readStream.format(\"graft-changes\").load(tablePath)")
    // version, schema and logical→physical mapping resolved as ONE
    // atomic capture (query start / restart) — see the class doc for
    // why one capture is correct for every file the stream will read;
    // the capture VERSION anchors the post-capture stability guard
    // ([[SchemaStability]]) every batch end is checked against. The
    // schema is RE-derived here at the pinned version rather than
    // trusting `schema` (inferSchema's capture, moments earlier): a
    // DDL committed in that window is <= capturedVersion and therefore
    // invisible to the stability guard — the stale capture would serve
    // silently. Version files are immutable, so reads at one version
    // are consistent by construction.
    val spark = SparkSession.active
    val path = pathOf(opts)
    val capturedVersion =
      SnapshotTable.latestVersion(spark, path).getOrElse(0L)
    val pinnedSchema =
      if (capturedVersion == 0L) schema // sink target: not yet created
      else StructType(
        SnapshotTable.schemaOf(spark, path, Some(capturedVersion))
          .getOrElse(SnapshotTable.read(spark, path, Some(capturedVersion)).schema)
          .fields.filterNot(_.name.startsWith("__p_"))
          .map(_.copy(nullable = true)))
    val colmap = capturedVersion match {
      case 0L => Map.empty[String, String]
      case v  => SnapshotTable.columnMappingAt(spark, path, v)
    }
    // startingTimestamp (Delta's option): resolved to the first
    // version committed at or after it, ONCE at query start
    val ts = Option(opts.get("startingtimestamp"))
    require(ts.isEmpty || opts.get("startingversion") == null,
      "startingVersion and startingTimestamp are mutually exclusive")
    val startV = ts
      .map(StartingTimestamp.resolve(SparkSession.active, pathOf(opts), _))
      .orElse(Option(opts.get("startingversion")).map(_.toLong)).getOrElse(0L)
    new SnapshotStreamTable(path, pinnedSchema, colmap, capturedVersion,
      SnapshotStreamOptions(
      startV,
      opts.getBoolean("ignorechanges", false),
      Option(opts.get("maxversionspertrigger")).map(_.toLong),
      vectorized,
      opts.getLong("vectorizedthresholdbytes", 16L << 20),
      opts.getLong("maxbytesperpartition", 128L << 20)))
  }
}

private case class SnapshotStreamOptions(startingVersion: Long,
    ignoreChanges: Boolean, maxVersionsPerTrigger: Option[Long],
    vectorizedReader: String, vectorizedThresholdBytes: Long,
    maxBytesPerPartition: Long)

private class SnapshotStreamTable(path: String, tableSchema: StructType,
    colmap: Map[String, String], capturedVersion: Long,
    opts: SnapshotStreamOptions) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  import org.apache.spark.sql.connector.write.{LogicalWriteInfo, Write, WriteBuilder}

  override def name(): String = s"graft-snapshot($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = {
        require(tableSchema.nonEmpty,
          s"no committed version at $path — create the table (or stream " +
            "into it) before reading it as a stream")
        tableSchema
      }
      override def description(): String = s"SnapshotStream $path"
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new SnapshotMicroBatchStream(path, tableSchema, colmap, capturedVersion, opts)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          val o = info.options()
          new SnapshotStreamingWrite(path, info.schema(), info.queryId(),
            Option(o.get("failmode")).getOrElse("reject").toLowerCase,
            Option(o.get("quarantinepath")))
        }
      }
    }
}

private case class SnapshotVersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

private class SnapshotMicroBatchStream(path: String, schema: StructType,
    colmap: Map[String, String], capturedVersion: Long,
    opts: SnapshotStreamOptions)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  private val startingVersion = opts.startingVersion
  private val ignoreChanges = opts.ignoreChanges
  private val maxVersionsPerTrigger = opts.maxVersionsPerTrigger

  private def spark = SparkSession.active

  // Trigger.AvailableNow drains up to the versions present when the
  // query started, across as many rate-limited batches as needed
  private var availableAtStart: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableAtStart = Some(SnapshotTable.latestVersion(spark, path).getOrElse(0L))

  // offsets are EXCLUSIVE lower bounds (batch = (start, end]), so the
  // inclusive startingVersion option maps to offset startingVersion-1
  override def initialOffset(): Offset =
    SnapshotVersionOffset(math.max(0L, startingVersion - 1))

  override def latestOffset(): Offset =
    SnapshotVersionOffset(SnapshotTable.latestVersion(spark, path).getOrElse(0L))

  /** Rate limiting (`maxVersionsPerTrigger`, the Delta
    * maxFilesPerTrigger analogue at commit granularity): a microbatch
    * advances at most that many versions, so bootstrapping a long
    * history proceeds in bounded batches instead of one giant first
    * batch. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SnapshotVersionOffset].version
    val latest = availableAtStart
      .getOrElse(SnapshotTable.latestVersion(spark, path).getOrElse(0L))
    SnapshotVersionOffset(maxVersionsPerTrigger
      .map(m => math.min(latest, s + math.max(1L, m))).getOrElse(latest))
  }

  override def reportLatestOffset(): Offset =
    SnapshotVersionOffset(SnapshotTable.latestVersion(spark, path).getOrElse(0L))

  override def deserializeOffset(json: String): Offset =
    SnapshotVersionOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotVersionOffset].version
    val e = end.asInstanceOf[SnapshotVersionOffset].version
    if (e <= s) return Array.empty
    // a batch crossing a POST-capture schema change must fail BEFORE
    // planning any read: the stale capture would silently null-fill a
    // drop+re-add, serve a rename under the old logical name, or
    // crash the decoder on a widen — same guard, same message as the
    // change-feed source (restart-to-adopt; see [[SchemaStability]])
    SchemaStability.requireStable(spark, path, capturedVersion, colmap,
      schema.fields.toSeq, e)
    // one manifest read per version in the range (the file set carries
    // forward), with the append-only verification riding the same pass
    val (_, added, dvChanged) =
      graft.lake.SnapshotIncremental.addedBetween(spark, path, s, e,
        onRemoved = if (ignoreChanges) None else Some { (v, _) =>
          throw new IllegalStateException(
            s"version $v of $path is not append-only (op=" +
              s"${SnapshotTable.opOf(spark, path, v).getOrElse("unknown")}): rewritten " +
              "files would re-emit carried rows in the stream — set " +
              ".option(\"ignoreChanges\", true) to accept re-emission")
        })
    // DV-aware ignoreChanges (Delta's semantics on a DV table): a
    // deletion-vector commit re-emits the touched files' STILL-LIVE
    // rows — never the dead ones — and an added file DV'd inside the
    // same range is emitted with its dead positions already removed.
    // Positions are driver-read (bounded by the DV-delete cap) and
    // shipped in the partition; DV'd files use the position-tracking
    // row reader (a byte-range split cannot know its row offset).
    val emit = added ++ (if (ignoreChanges) dvChanged else Nil)
    // executor-side reads must see the session's Hadoop settings
    // (s3a/abfs credentials, endpoints) — capture them serializably
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sized = emit.map { en =>
      val dead = en.dv.map(d => SnapshotTable.readDv(spark, path, d._1))
        .getOrElse(Array.empty[Long])
      (en, fs.getFileStatus(new Path(en.filePath)).getLen, dead)
    }
    val totalBytes = sized.map(_._2).sum
    val vectorize = opts.vectorizedReader match {
      case "always" => true
      case "never"  => false
      // auto: commit-sized batches stay on the simple Group reader;
      // a bootstrap-sized batch gets the columnar decoder + splitting
      case _        => totalBytes >= opts.vectorizedThresholdBytes
    }
    // split sizing mirrors FilePartition.maxSplitBytes: cap at
    // maxBytesPerPartition but SHRINK toward totalBytes/parallelism
    // (floored at a 4 MiB open cost) so a bootstrap batch of a few
    // fat files fans out over every core instead of one task per
    // 128 MiB — this was the round-7 bootstrap-vs-batch gap
    val openCost = 4L << 20
    val splitBytes = math.max(openCost, math.min(opts.maxBytesPerPartition,
      totalBytes / math.max(1, spark.sparkContext.defaultParallelism)))
    sized.flatMap { case (en, len, dead) =>
      if (!vectorize || dead.nonEmpty)
        Seq(SnapshotFilePartition(en.filePath, en.commitDir, schema, colmap,
          conf, 0L, Long.MaxValue, vectorized = false, dead): InputPartition)
      else
        // byte-range splits: the parquet reader takes the row groups
        // whose midpoint falls in [start, start+length) — standard file
        // splitting, so one fat bootstrap file fans out over tasks
        (0L until math.max(len, 1L) by splitBytes).map { off =>
          SnapshotFilePartition(en.filePath, en.commitDir, schema, colmap,
            conf, off, math.min(splitBytes, len - off),
            vectorized = true): InputPartition
        }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => {
      val sp = p.asInstanceOf[SnapshotFilePartition]
      if (sp.vectorized) new SnapshotVectorReader(sp) else new SnapshotFileReader(sp)
    }
}

/** java-serializable Hadoop Configuration carrier (the session's
  * `spark.hadoop.*` settings must reach executor-side ParquetReaders —
  * a default `Configuration()` there would lack object-store
  * credentials/endpoints even though the batch path has them). */
private class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

private case class SnapshotFilePartition(filePath: String, commitDir: String,
    schema: StructType, colmap: Map[String, String],
    conf: SerializableHadoopConf,
    start: Long, length: Long, vectorized: Boolean,
    deadPositions: Array[Long] = Array.empty) extends InputPartition {
  /** Physical (on-disk parquet / partition-dir) name of a logical
    * schema field — identity when the table was never renamed. */
  def phys(c: String): String = colmap.getOrElse(c, c)
}

/** Existence-default evaluation shared by the stream readers (the
  * row-path mirror of what Spark's vectorized reader does natively
  * from the same `EXISTS_DEFAULT` StructField metadata): a file that
  * does not CONTAIN a defaulted column serves the declared default
  * instead of NULL — [[graft.lake.SnapshotTable.addColumns]] initial
  * defaults. Session-free (CatalystSqlParser + constant Cast), so it
  * evaluates on executors; the stored text is a constant-folded
  * literal by construction. */
private[sources] object ExistsDefaults {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.catalyst.parser.CatalystSqlParser

  private val Key = "EXISTS_DEFAULT"

  def of(f: StructField): Any =
    if (!f.metadata.contains(Key)) null
    else Cast(CatalystSqlParser.parseExpression(f.metadata.getString(Key)),
      f.dataType, Some("UTC")).eval(InternalRow.empty)

  def has(f: StructField): Boolean = f.metadata.contains(Key)
}

/** Hive partition-value handling shared by both decode paths: parse
  * the `k=v` path segments and convert a directory-string value to
  * its Catalyst representation under the table schema's type. */
private object SnapshotPartValues {
  import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils

  def parse(filePath: String, commitDir: String): Map[String, String] =
    filePath.stripPrefix(commitDir).split("/")
      .filter(seg => seg.nonEmpty && seg.contains("="))
      .map { seg =>
        val k = ExternalCatalogUtils.unescapePathName(seg.takeWhile(_ != '='))
        val v = ExternalCatalogUtils.unescapePathName(seg.dropWhile(_ != '=').drop(1))
        k -> v
      }.toMap

  def toCatalyst(v: String, dt: DataType, name: String): Any =
    if (v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
    else dt match {
      case StringType  => UTF8String.fromString(v)
      case IntegerType => v.toInt
      case LongType    => v.toLong
      case ShortType   => v.toShort
      case DoubleType  => v.toDouble
      case FloatType   => v.toFloat
      case BooleanType => v.toBoolean
      case DateType    => java.time.LocalDate.parse(v).toEpochDay.toInt
      case TimestampType =>
        // partition-dir timestamps are rendered in the writing
        // session's timezone; every engine session pins UTC, so parse
        // as UTC with full microsecond precision
        val ldt = java.time.LocalDateTime.parse(v.replace(' ', 'T'))
        val ins = ldt.toInstant(java.time.ZoneOffset.UTC)
        ins.getEpochSecond * 1000000L + ins.getNano / 1000L
      case other => throw new UnsupportedOperationException(
        s"unsupported partition column type ${other.simpleString} ('$name')")
    }
}

/** Bootstrap-scale decode path: Spark's vectorized parquet reader
  * over a byte range of one file (row groups chosen by split range),
  * partition columns appended as constant vectors, rows projected
  * back into table-schema order. This is the columnar decoder the
  * batch read uses — bootstrap throughput tracks the batch reader
  * instead of the per-row Group API. */
private class SnapshotVectorReader(p: SnapshotFilePartition)
    extends PartitionReader[InternalRow] {

  import org.apache.hadoop.mapreduce.TaskAttemptID
  import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

  import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, UnsafeProjection}
  import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader

  // files and partition dirs are laid out under PHYSICAL names —
  // resolve every schema field through the captured mapping
  private val partValues = SnapshotPartValues.parse(p.filePath, p.commitDir)
  private val partFields = p.schema.fields.filter(f => partValues.contains(p.phys(f.name)))
  private val dataFields = p.schema.fields.filterNot(f => partValues.contains(p.phys(f.name)))

  private val conf = new org.apache.hadoop.conf.Configuration(p.conf.value)
  // the requested-schema contract of Spark's parquet record reader
  // (missing columns surface as NULL vectors — schema evolution);
  // requested under physical names, projected back positionally below
  conf.set("org.apache.spark.sql.parquet.row.requested_schema",
    StructType(dataFields.map(f => f.copy(name = p.phys(f.name)))).json)
  conf.set("parquet.read.support.class",
    "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
  // keys ParquetFileFormat normally pins on the hadoopConf before
  // handing it to this reader (schema-converter construction needs
  // them present); setIfUnset so propagated session values win
  Seq("spark.sql.parquet.binaryAsString" -> "false",
    "spark.sql.parquet.int96AsTimestamp" -> "true",
    "spark.sql.caseSensitive" -> "false",
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    "spark.sql.legacy.parquet.nanosAsLong" -> "false")
    .foreach { case (k, v) => if (conf.get(k) == null) conf.set(k, v) }

  private val reader = new VectorizedParquetRecordReader(
    null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
  // Spark's reader base casts the split to the mapred-API FileSplit
  // (which extends the mapreduce one in Hadoop 3) — construct that
  reader.initialize(
    new org.apache.hadoop.mapred.FileSplit(
      new Path(p.filePath), p.start, p.length, Array.empty[String]),
    new TaskAttemptContextImpl(conf, new TaskAttemptID()))
  reader.initBatch(StructType(partFields), InternalRow.fromSeq(
    partFields.toIndexedSeq.map(f =>
      SnapshotPartValues.toCatalyst(partValues(p.phys(f.name)), f.dataType, f.name))))

  // batch rows come out as (dataFields ++ partFields); project back to
  // the table schema's column order, copying off the mutable batch row
  private val batchOrder = (dataFields ++ partFields).map(_.name)
  private val proj = UnsafeProjection.create(p.schema.fields.map { f =>
    BoundReference(batchOrder.indexOf(f.name), f.dataType, nullable = true): Expression
  }.toIndexedSeq)

  override def next(): Boolean = reader.nextKeyValue()
  override def get(): InternalRow =
    proj(reader.getCurrentValue.asInstanceOf[InternalRow])
  override def close(): Unit = reader.close()
}

/** One parquet data file → InternalRows under the table schema:
  * file columns via the Group API, hive partition columns from the
  * path, columns the file predates as NULL. */
private class SnapshotFileReader(p: SnapshotFilePartition)
    extends PartitionReader[InternalRow] {

  private val partValues: Map[String, String] =
    SnapshotPartValues.parse(p.filePath, p.commitDir)

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(p.filePath))
      .withConf(p.conf.value).build()
  private var current: Group = _

  // deletion-vector application: skip the dead row positions (sorted
  // array + cursor — the scan is sequential, so this is O(1) amortized)
  private val dead = p.deadPositions
  private var deadIdx = 0
  private var rowIdx = -1L

  override def next(): Boolean = {
    while (true) {
      current = reader.read()
      if (current == null) return false
      rowIdx += 1
      while (deadIdx < dead.length && dead(deadIdx) < rowIdx) deadIdx += 1
      if (deadIdx >= dead.length || dead(deadIdx) != rowIdx) return true
    }
    false
  }

  // initial defaults for columns the file does not contain (computed
  // once per reader; null for undecorated fields — the plain
  // schema-evolution NULL)
  private val fieldDefaults: Array[Any] = p.schema.fields.map(ExistsDefaults.of)

  override def get(): InternalRow = {
    val g = current
    val gt = g.getType
    InternalRow.fromSeq(p.schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
      // the file (and partition dir) store PHYSICAL names — resolve
      // the logical field through the captured mapping; a file that
      // lacks the physical field genuinely predates the column (true
      // schema-evolution NULL — or its declared initial default,
      // never a renamed column's data)
      val pn = p.phys(f.name)
      if (gt.containsField(pn)) {
        val idx = gt.getFieldIndex(pn)
        if (g.getFieldRepetitionCount(idx) == 0) null else extract(g, idx, f)
      } else partValues.get(pn) match {
        case None    => fieldDefaults(i)
        case Some(v) => SnapshotPartValues.toCatalyst(v, f.dataType, f.name)
      }
    })
  }

  private def extract(g: Group, idx: Int, f: StructField): Any = {
    val pt = g.getType.getType(idx)
    // standard 3-level LIST (Spark's `element`, pyarrow's `item`, the
    // sink's own writer): decoded index-based so the element-field
    // name never matters — the vector-column surface (array<float>
    // embeddings and friends) streams like any primitive
    (f.dataType, pt.isPrimitive) match {
      case (ArrayType(et, _), false) =>
        val lg = g.getGroup(idx, 0)
        val n = lg.getFieldRepetitionCount(0)
        val out = new Array[Any](n)
        var j = 0
        while (j < n) {
          val e = lg.getGroup(0, j)
          out(j) =
            if (e.getFieldRepetitionCount(0) == 0) null
            else et match {
              case FloatType   => e.getFloat(0, 0)
              case DoubleType  => e.getDouble(0, 0)
              case IntegerType => e.getInteger(0, 0)
              case LongType    => e.getLong(0, 0)
              case other => throw new UnsupportedOperationException(
                s"unsupported list element ${other.simpleString} in '${f.name}'")
            }
          j += 1
        }
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      case _ =>
        require(pt.isPrimitive,
          s"graft-snapshot streams flat primitive (or primitive-list) " +
            s"schemas; '${f.name}' is nested")
    }
    val prim = pt.asPrimitiveType().getPrimitiveTypeName
    f.dataType match {
      // files written before a METADATA-ONLY type widening
      // ([[SnapshotTable.widenColumnType]]) store the narrower
      // physical primitive — upcast exactly like the batch readers
      case LongType if prim == PrimitiveTypeName.INT32 =>
        g.getInteger(idx, 0).toLong
      case LongType    => g.getLong(idx, 0)
      case IntegerType => g.getInteger(idx, 0)
      case ShortType   => g.getInteger(idx, 0).toShort
      case ByteType    => g.getInteger(idx, 0).toByte
      case DoubleType if prim == PrimitiveTypeName.FLOAT =>
        g.getFloat(idx, 0).toDouble
      case DoubleType if prim == PrimitiveTypeName.INT32 =>
        g.getInteger(idx, 0).toDouble
      case DoubleType  => g.getDouble(idx, 0)
      case FloatType   => g.getFloat(idx, 0)
      case BooleanType => g.getBoolean(idx, 0)
      case StringType  => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
      case BinaryType  => g.getBinary(idx, 0).getBytes
      case DateType    => g.getInteger(idx, 0) // parquet DATE = epoch days
      case TimestampType => prim match {
        case PrimitiveTypeName.INT96 =>
          // 12 bytes LE: nanos-of-day then julian day
          val buf = java.nio.ByteBuffer.wrap(g.getInt96(idx, 0).getBytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val nanos = buf.getLong
          val julian = buf.getInt
          (julian - 2440588).toLong * 86400L * 1000000L + nanos / 1000L
        case _ =>
          val raw = g.getLong(idx, 0)
          pt.getLogicalTypeAnnotation match {
            case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              ts.getUnit match {
                case LogicalTypeAnnotation.TimeUnit.MILLIS => raw * 1000L
                case LogicalTypeAnnotation.TimeUnit.MICROS => raw
                case LogicalTypeAnnotation.TimeUnit.NANOS  => raw / 1000L
              }
            case _ => raw // assume micros
          }
      }
      case other => throw new UnsupportedOperationException(
        s"graft-snapshot stream reader does not support ${other.simpleString} ('${f.name}')")
    }
  }

  override def close(): Unit = reader.close()
}
