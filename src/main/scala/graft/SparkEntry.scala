package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.EvQueries
import graft.ops.{QDef, Relational, Similarity, TextAnalysis, TextDedup}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in
  * [[queries]]; SQL-expressible ones carry a DuckDB oracle in
  * [[oracleSql]] (the driver hash-compares both results at sf0.01).
  */
object SparkEntry {

  /** All query catalogs, concatenated. Modules own their definitions;
    * this object is just the aggregation point the driver reads. */
  private[graft] def allDefs: Seq[QDef] =
    Relational.catalog ++ EvQueries.catalog ++
      TextDedup.catalog ++ TextAnalysis.catalog ++ Similarity.catalog ++
      graft.ops.Ivf.catalog ++ graft.multimodal.Media.catalog

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.tpchQ1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
