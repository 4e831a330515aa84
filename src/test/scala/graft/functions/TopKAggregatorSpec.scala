package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.Tables

class TopKAggregatorSpec extends SparkTestBase {

  test("heap top-k per group equals the window row_number formulation") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf0001)

    val viaAgg = orders
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new TopKAggregator(3).toColumn)
      .collect()
      .map { case (cust, top) => cust -> top.toSeq }
      .toMap

    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_totalprice", "o_orderkey")
      .as[(Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(t => (-t._1, t._2)).toSeq)
      .toMap

    assert(viaAgg.keySet === viaWindow.keySet)
    viaWindow.foreach { case (cust, want) =>
      assert(viaAgg(cust) === want, s"customer $cust")
    }
  }

  test("merge keeps only k across partitions") {
    import spark.implicits._
    // 1000 elements for one key spread over many partitions
    val data = (1 to 1000).map(i => (1L, i.toDouble, i.toLong))
    val ds = spark.createDataset(data).repartition(13)
    val top = ds.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new TopKAggregator(5).toColumn)
      .collect().head._2
    assert(top.map(_._1).toSeq === Seq(1000.0, 999.0, 998.0, 997.0, 996.0))
  }
}
