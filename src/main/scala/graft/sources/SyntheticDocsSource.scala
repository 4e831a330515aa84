package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2: a deterministic synthetic `documents`
  * generator table —
  *
  *   spark.read.format("graft-docs")
  *     .option("rows", 1000000).option("partitions", 64).load()
  *
  * Demonstrates the full connector surface the engine's sources build
  * on: TableProvider → Table → ScanBuilder (with column pruning:
  * un-projected columns are never generated — the analogue of parquet
  * ReadSchema pruning) → Batch → InputPartition / PartitionReader.
  * Each input partition owns a disjoint id range, so the source
  * parallelizes like a real sharded table and rows are reproducible
  * from (seed, doc_id) alone — no data files, no driver memory.
  */
class SyntheticDocsSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-docs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocsSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt,
      properties.getOrDefault("seed", "42").toLong)
}

object SyntheticDocsSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  val vocab: Array[String] = Array(
    "spark", "join", "merge", "scan", "sort", "row", "data", "batch",
    "stream", "filter", "agg", "key", "hash", "table", "query", "window",
    "part", "small", "big", "fast", "slow", "value", "column", "vector",
    "group", "line", "customer", "order", "the", "a")

  val langs: Array[String] = Array("en", "es", "fr", "de", "zh")

  def textFor(id: Long, seed: Long): String = {
    val rnd = new scala.util.Random(seed ^ (id * 0x9e3779b97f4a7c15L))
    val n = 30 + rnd.nextInt(50)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(rnd.nextInt(vocab.length)))
      i += 1
    }
    sb.toString
  }
}

private class SyntheticDocsTable(rows: Long, partitions: Int, seed: Long)
    extends Table with SupportsRead {

  override def name(): String = s"graft-docs($rows)"
  override def schema(): StructType = SyntheticDocsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticDocsScanBuilder(rows, partitions, seed)
}

private class SyntheticDocsScanBuilder(rows: Long, partitions: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = SyntheticDocsSource.schema

  /** Column pruning: the reader generates ONLY the projected columns
    * (skipping text synthesis entirely for e.g. a doc_id count). */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"SyntheticDocs rows=$rows cols=${required.fieldNames.mkString(",")}"

    override def planInputPartitions(): Array[InputPartition] = {
      val per = math.max(1L, (rows + partitions - 1) / partitions)
      (0L until rows by per).map { start =>
        DocsRange(start, math.min(start + per, rows), seed,
          required.fieldNames): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      (p: InputPartition) => new DocsReader(p.asInstanceOf[DocsRange])
  }
}

private case class DocsRange(start: Long, end: Long, seed: Long,
    cols: Array[String]) extends InputPartition

private class DocsReader(range: DocsRange) extends PartitionReader[InternalRow] {
  private var id = range.start - 1
  private val needText = range.cols.contains("text") || range.cols.contains("n_chars")

  override def next(): Boolean = { id += 1; id < range.end }

  override def get(): InternalRow = {
    val text = if (needText) SyntheticDocsSource.textFor(id, range.seed) else null
    val values: Array[Any] = range.cols.map {
      case "doc_id" => id
      case "text" => UTF8String.fromString(text)
      case "lang" =>
        UTF8String.fromString(SyntheticDocsSource.langs((id % 5).toInt))
      case "source" => UTF8String.fromString("synthetic")
      case "n_chars" => text.length.toLong
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = ()
}
