package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives (SURVEY.md §7.4 "100 TB posture").
  *
  * AQE's skew-join splitting (on by default in Spark 4) handles most
  * runtime skew; these helpers cover the cases AQE can't: a single
  * hot GROUP BY key whose partial aggregate still overwhelms one
  * task's final-merge, and broadcast-ineligible joins against a
  * skewed fact side.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) computes
    * partials spread over `salts` tasks per key, then a second
    * groupBy (key) merges. Use for algebraic aggregates (sum/count/
    * min/max) on keys with pathological frequency — turns one
    * hot-partition reducer into `salts` parallel ones.
    *
    * aggs maps output column name → (partial agg of input, final
    * merge of the partial column). E.g. count: (count(lit(1)),
    * sum) ; sum(x): (sum(x), sum).
    */
  def saltedAggregate(
      df: DataFrame,
      keyCols: Seq[String],
      salts: Int,
      partial: Seq[(String, Column)],
      merge: String => Column): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val p = salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    p.groupBy(keyCols.map(col): _*)
      .agg(merge(partial.head._1).as(partial.head._1),
        partial.tail.map { case (n, _) => merge(n).as(n) }: _*)
  }

  /** Salted join for a skewed left (fact) side against a modest right
    * (dim) side that is still too big to broadcast: the fact side
    * gets a random salt in [0, salts); the dim side is replicated
    * `salts` times with every salt value. The join key becomes
    * (key, salt), spreading each hot key over `salts` tasks. The dim
    * replication multiplies its shuffle volume by `salts` — use only
    * when the fact-side skew dominates, and keep `salts` small.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val saltsDf = fact.sparkSession.range(salts).select(col("id").cast("int").as("_salt"))
    val replicatedDim = dim.crossJoin(saltsDf)
    saltedFact
      .join(replicatedDim, Seq(key, "_salt"), joinType)
      .drop("_salt")
  }
}
