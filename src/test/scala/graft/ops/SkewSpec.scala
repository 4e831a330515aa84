package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.lake.LakeWriter
import graft.model.Tables

class SkewSpec extends SparkTestBase {

  test("salted aggregation equals plain aggregation") {
    val li = Tables.lineitem(spark, sf0001)
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedAggregate(
      li, Seq("l_returnflag"), salts = 8,
      partial = Seq("n" -> count(lit(1)), "q" -> sum(col("l_quantity"))),
      merge = c => sum(col(c)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet === plain.keySet)
    plain.foreach { case (k, (n, q)) =>
      assert(salted(k)._1 === n)
      assert(math.abs(salted(k)._2 - q) < 1e-6)
    }
  }

  test("salted join equals plain join") {
    val orders = Tables.orders(spark, sf0001)
    val custAgg = Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(custAgg, Seq("o_custkey"))
      .groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(orders, custAgg, "o_custkey", salts = 4)
      .groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    LakeWriter.writeBucketed(
      Tables.orders(spark, sf0001), "orders_b", Seq("o_custkey"), 4, Seq("o_custkey"))
    LakeWriter.writeBucketed(
      Tables.customer(spark, sf0001).withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", Seq("o_custkey"), 4, Seq("o_custkey"))
    val joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
    val exchanges = joined.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"bucketed join should be shuffle-free:\n${joined.queryExecution.executedPlan}")
    // and it still returns the right rows
    val plain = Tables.orders(spark, sf0001).join(
      Tables.customer(spark, sf0001).withColumnRenamed("c_custkey", "o_custkey"),
      "o_custkey").count()
    assert(joined.count() === plain)
  }
}
