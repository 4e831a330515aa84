package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** DataFrame-from-LogicalPlan bridge (private[sql] in Spark 4), for
  * libraries that define custom logical operators. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame (for substitution into a
    * plan under analysis, e.g. view-style relation resolution). */
  def planOf(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Re-tag a batch DataFrame as a STREAMING one (`isStreaming=true`
    * leaf) — what a v1 streaming `Source.getBatch` must return
    * (MicroBatchExecution asserts it). The batch plan compiles to its
    * InternalRow RDD lazily here; execution still happens distributed
    * inside the microbatch that consumes it. This is the
    * `internalCreateDataFrame` route Spark's own FileStreamSource-era
    * sources use, private[sql] in Spark 4. */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
