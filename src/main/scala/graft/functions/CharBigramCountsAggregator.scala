package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Char-bigram count-matrix aggregation over normalized `[a-z ]`
  * strings: one 27×27 long matrix (row-major, ' ' = slot 26) updated
  * by walking each string's adjacent char pairs in place.
  *
  * This replaces the explode-per-bigram formulation of LM-model
  * training: a corpus of D documents averaging L chars used to push
  * D·(L−1) exploded rows through a hash aggregate before the ≤729
  * groups combined; here the same counts come from ONE pass over the
  * D strings — no per-bigram row materialization, no exchange beyond
  * one 729-long buffer per map task. The counts are bit-identical to
  * the exploded groupBy's (same pairs, same longs), so every
  * downstream IEEE divide — and therefore every LM score the model
  * produces — is unchanged.
  *
  * Inputs are assumed pre-normalized (the caller strips `[^a-z ]`);
  * a defensive bounds check skips any stray out-of-range char rather
  * than corrupting a neighboring slot.
  */
class CharBigramCountsAggregator extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](729)

  @inline private def ix(c: Char): Int =
    if (c == ' ') 26 else if (c >= 'a' && c <= 'z') c - 'a' else -1

  override def reduce(buf: Array[Long], s: String): Array[Long] = {
    if (s != null && s.length >= 2) {
      var i = 1
      var prev = ix(s.charAt(0))
      while (i < s.length) {
        val cur = ix(s.charAt(i))
        if (prev >= 0 && cur >= 0) buf(prev * 27 + cur) += 1L
        prev = cur
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 729) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CharBigramCounts {

  /** The aggregator as an untyped column function for
    * DataFrame.agg(...). */
  val udafFn: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CharBigramCountsAggregator())
}
