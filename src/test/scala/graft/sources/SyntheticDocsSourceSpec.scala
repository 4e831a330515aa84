package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.TextDedup

class SyntheticDocsSourceSpec extends SparkTestBase {

  private def docs(rows: Long, parts: Int = 8) =
    spark.read.format("graft-docs")
      .option("rows", rows).option("partitions", parts).load()

  test("short-name registration, row count, and schema") {
    val df = docs(1000)
    assert(df.schema.fieldNames.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(df.count() === 1000)
    assert(df.select("doc_id").distinct().count() === 1000)
  }

  test("generation is deterministic across reads") {
    val a = docs(200).select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = docs(200).select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    // n_chars is consistent with the generated text
    assert(docs(200).filter(length(col("text")) =!= col("n_chars")).count() === 0)
  }

  test("column pruning reaches the reader (scan reports pruned schema)") {
    val pruned = docs(100).select("doc_id")
    val scan = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("doc_id"))
    assert(pruned.count() === 100)
  }

  test("partitions parallelize as disjoint id ranges") {
    val df = docs(10000, parts = 16)
    assert(df.rdd.getNumPartitions === 16)
    assert(df.select(min("doc_id"), max("doc_id")).head().toSeq === Seq(0L, 9999L))
  }

  test("plugs into the dedup operators end-to-end") {
    val nd = TextDedup.exactDuplicates(docs(2000))
    // 30-80 token docs over a 30-word vocab: exact dups are unlikely
    // but the pipeline must run regardless
    assert(nd.agg(sum("n_copies")).head().getLong(0) === 2000)
  }
}
