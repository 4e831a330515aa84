package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md /
  * FIXTURES.md §4). One parquet file per table under the sf dir.
  *
  * All readers are plain `spark.read.parquet` so Catalyst pushes
  * projection + predicates into the scan (verified via
  * `.explain("formatted")` — PushedFilters / ReadSchema).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** The raw `events` table carries nanosecond timestamps — beyond
    * Spark's µs TimestampType. Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (graft.Spark does),
    * which surfaces `ts` as a Long of epoch-nanos; we convert to a
    * whole-second TimestampType so Spark and the DuckDB oracle agree
    * on values. `DIV` keeps the arithmetic in exact integer space
    * (a double division would lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_seconds(expr("ts DIV 1000000000")))
      case _ =>
        raw.withColumn("ts", date_trunc("second", col("ts")))
    }
  }

  /** Events without the ts column (for ops that never touch it —
    * avoids any dependency on the ns-timestamp read path). */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
}
