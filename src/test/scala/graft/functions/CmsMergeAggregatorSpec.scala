package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.SparkTestBase
import graft.model.Tables

class CmsMergeAggregatorSpec extends SparkTestBase {

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Byte] =
    df.agg(expr("count_min_sketch(l_suppkey, 0.001d, 0.999d, 42)"))
      .head().getAs[Array[Byte]](0)

  test("merged fine-grain sketches estimate like one global sketch") {
    val li = Tables.lineitem(spark, sf0001)
    val merged = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("count_min_sketch(l_suppkey, 0.001d, 0.999d, 42)").as("sk"))
      .agg(Cms.mergeUdaf(col("sk")))
      .head().getAs[Array[Byte]](0)
    val global = sketchOf(li)
    val m = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(merged))
    val g = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(global))
    assert(m.totalCount() === g.totalCount())
    val keys = li.select("l_suppkey").distinct()
      .collect().map(_.getLong(0))
    keys.foreach { k =>
      assert(m.estimateCount(k) === g.estimateCount(k), s"key $k")
    }
  }

  test("estimates never undercount the exact frequency") {
    val li = Tables.lineitem(spark, sf0001)
    val sk = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchOf(li)))
    val exact = li.groupBy("l_suppkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    exact.foreach { case (k, c) =>
      assert(sk.estimateCount(k) >= c, s"key $k undercounted")
    }
  }

  test("merging sketches of different shapes fails loudly") {
    val a = CountMinSketch.create(0.001, 0.999, 42)
    val b = CountMinSketch.create(0.01, 0.999, 42)
    def ser(s: CountMinSketch) = {
      val o = new java.io.ByteArrayOutputStream(); s.writeTo(o); o.toByteArray
    }
    val agg = new CmsMergeAggregator()
    assertThrows[org.apache.spark.util.sketch.IncompatibleMergeException](
      agg.merge(ser(a), ser(b)))
  }
}
