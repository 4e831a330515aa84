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
}
