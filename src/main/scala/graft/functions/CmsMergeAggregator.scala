package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable count-min-sketch re-aggregation: merges the BINARY
  * sketches Spark's built-in `count_min_sketch(...)` aggregate emits
  * per fine grain into coarser grains — the heavy-hitter member of
  * the mergeable-sketch trio (HLL distinct counts q79, KLL quantiles
  * q84, CMS frequencies q104). This is the sketch-table pattern at
  * lake scale: persist tiny fine-grain sketches once, re-aggregate to
  * any coarser grain later without touching the fact table.
  *
  * The buffer stays in serialized form (Spark's own
  * `org.apache.spark.util.sketch.CountMinSketch` stream format, the
  * exact bytes the built-in aggregate produces) and deserializes only
  * to merge, so the shuffle ships one sketch per group per map task.
  * Merging requires identical (depth, width, seed) on both sides —
  * build every fine sketch with the same (eps, confidence, seed)
  * literal, which `CountMinSketch.mergeInPlace` enforces at runtime
  * (IncompatibleMergeException otherwise).
  */
class CmsMergeAggregator extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {

  private def read(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))

  private def write(s: CountMinSketch): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    s.writeTo(o)
    o.toByteArray
  }

  override def zero: Array[Byte] = Array.emptyByteArray

  override def reduce(buf: Array[Byte], elem: Array[Byte]): Array[Byte] =
    merge(buf, elem)

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val s = read(a)
      s.mergeInPlace(read(b))
      write(s)
    }

  override def finish(buf: Array[Byte]): Array[Byte] = buf

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object Cms {

  /** The aggregator as an untyped column function, for
    * DataFrame.agg(...) use. */
  val mergeUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CmsMergeAggregator())

  /** Point-frequency estimate from a serialized sketch. Long keys use
    * the same long-hash path the built-in aggregate used to add them.
    * Driver/probe-side helper: deserializes per call, so use it on
    * the handful of (group, key) probe rows, not per fact row. */
  def estimate(bytes: Array[Byte], key: Long): Long =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      .estimateCount(key)
}
