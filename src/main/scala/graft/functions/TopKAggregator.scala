package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable grouped top-k: a typed Aggregator whose buffer is a
  * bounded min-heap of (score, id) pairs.
  *
  * The scalable alternative to `row_number().over(partitionBy)` +
  * `filter(rn <= k)`: the window form sorts every group's FULL row
  * set (shuffle + per-group sort of n rows); this aggregator keeps at
  * most k entries per group on each map task, merges heaps on the
  * reduce side, and ships only O(groups × k) through the shuffle.
  * At 100 TB, for "top-k neighbors per query" / "top orders per
  * customer" shapes, that's the difference between shuffling the
  * table and shuffling the answer.
  *
  * Usage:
  *   val agg = new TopKAggregator(k).toColumn
  *   ds.groupByKey(_.key).agg(agg)   // → Array[(score, id)] desc
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), mutable.PriorityQueue[(Double, Long)], Array[(Double, Long)]] {

  // min-heap by score (reverse of the natural desc ordering we return)
  private def heapOrdering: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)](t => (-t._1, -t._2))

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrdering)

  override def reduce(
      buf: mutable.PriorityQueue[(Double, Long)],
      elem: (Double, Long)): mutable.PriorityQueue[(Double, Long)] = {
    buf.enqueue(elem)
    while (buf.size > k) buf.dequeue()
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(a.enqueue(_))
    while (a.size > k) a.dequeue()
    a
  }

  override def finish(buf: mutable.PriorityQueue[(Double, Long)]): Array[(Double, Long)] =
    buf.toArray.sortBy(t => (-t._1, t._2))

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
}
