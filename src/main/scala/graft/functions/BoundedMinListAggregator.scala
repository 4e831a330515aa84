package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Smallest-k collection as a COMBINABLE aggregate: the buffer is a
  * sorted array capped at k, so map-side partial aggregation bounds
  * every agg buffer at k longs no matter how many rows a key has.
  *
  * This is what makes posting-list materialization survive corpus
  * scale: `sort_array(collect_list(id))[0:k]` forms the FULL list per
  * key first (a stopword's postings = the corpus), and a
  * `row_number() OVER (PARTITION BY term)` window sorts each key on
  * one task (same skew, plus a shuffle). A bounded combinable buffer
  * keeps the stopword key at k elements from the map side onward.
  */
class BoundedMinListAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 1, "k must be >= 1")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], elem: Long): Array[Long] =
    if (buf.length == k && elem >= buf(k - 1)) buf
    else {
      // insertion into a <=k sorted array: O(k) worst case, O(1) for
      // the common above-cutoff row once the buffer is full
      val n = math.min(buf.length + 1, k)
      val out = new Array[Long](n)
      var i = 0
      while (i < buf.length && buf(i) < elem) { out(i) = buf(i); i += 1 }
      if (i < n) out(i) = elem
      var j = i + 1
      while (j < n) { out(j) = buf(j - 1); j += 1 }
      out
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length) {
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { out(o) = a(i); i += 1 }
        else { out(o) = b(j); j += 1 }
        o += 1
      }
      out
    }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object BoundedMinList {

  /** `minList(col, k)` — the k smallest values of `col` per group,
    * sorted ascending, as one array column. */
  def minList(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new BoundedMinListAggregator(k)).apply(c)
}
