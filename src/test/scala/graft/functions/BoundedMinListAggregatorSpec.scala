package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BoundedMinListAggregatorSpec extends SparkTestBase {

  import spark.implicits._

  test("minList(col, k) equals sort-ascending-take-k per group") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map(_ => (rnd.nextInt(5), rnd.nextLong().abs))
    val got = rows.toDF("g", "v").repartition(8)
      .groupBy("g").agg(BoundedMinList.minList(col("v"), 7).as("mins"))
      .as[(Int, Array[Long])].collect().toMap
    val expected = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.take(7).toSeq).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (g, arr) => assert(arr.toSeq === expected(g), s"group $g") }
  }

  test("buffer stays capped and sorted through reduce and merge") {
    val agg = new BoundedMinListAggregator(3)
    val b = Seq(5L, 1L, 9L, 3L, 7L, 2L).foldLeft(agg.zero)(agg.reduce)
    assert(b.toSeq === Seq(1L, 2L, 3L))
    // a full buffer rejects above-cutoff rows without allocation
    assert(agg.reduce(b, 100L) eq b)
    assert(agg.merge(Array(1L, 2L, 3L), Array(0L, 2L, 9L)).toSeq === Seq(0L, 1L, 2L))
    assert(agg.merge(agg.zero, Array(4L)).toSeq === Seq(4L))
    // duplicates are values, not a set
    assert(agg.merge(Array(2L, 2L), Array(2L)).toSeq === Seq(2L, 2L, 2L))
  }
}
