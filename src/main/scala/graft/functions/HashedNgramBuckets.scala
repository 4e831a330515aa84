package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Row-local hashing-trick feature extraction: for a document's token
  * array, count every unigram and every adjacent `w1_w2` bigram into
  * `md5`-derived buckets and return the per-bucket term frequencies
  * as `array<struct<bucket:int, tf:bigint>>`, sorted by bucket.
  *
  * This is the whole (doc_id, bucket, tf) feature computation of
  * q124 fused into ONE expression: the explode-per-token →
  * md5-hex → conv → pmod → groupBy(doc, bucket) pipeline pushed a
  * corpus-token-sized row stream through a hash aggregate (the
  * dominant shuffle of the hashed-features job at scale); here the
  * counts never leave the row, so the operator is map-only — the
  * same 100 TB shape as the other codegen'd text metrics
  * (TopBigramCount, CharBigramScore).
  *
  * Bucket arithmetic is BIT-IDENTICAL to the SQL formulation (and
  * the DuckDB oracle): `conv(substring(md5(token), 1, 6), 16, 10) %
  * numBuckets` reads the digest's first 24 bits big-endian, which is
  * exactly `((b0&0xff)<<16 | (b1&0xff)<<8 | (b2&0xff)) % numBuckets`
  * on the raw digest bytes — no hex-string materialization. Tokens
  * hash over their UTF-8 bytes; the bigram digest feeds
  * `w1 ++ '_' ++ w2` without building a String. The heavy loop lives
  * in a static helper the generated code calls, so the expression
  * stays inside whole-stage codegen (the Janino-friendly pattern).
  */
case class HashedNgramBuckets(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "hashed_ngram_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numBuckets > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numBuckets > 0, got $numBuckets")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    HashedNgramBuckets.compute(v.asInstanceOf[ArrayData], numBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.HashedNgramBuckets.compute($arr, $numBuckets);")

  override protected def withNewChildInternal(newChild: Expression): HashedNgramBuckets =
    copy(child = newChild)
}

object HashedNgramBuckets {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  // per-thread count plane + touched list, reused across rows (32 KB
  // at the default 4096 buckets; re-allocated only if a wider
  // numBuckets shows up on the same thread)
  private val planes = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](0)
  }

  private def bucketOf(md: MessageDigest, n: Int): Int = {
    val d = md.digest()
    (((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)) % n
  }

  /** Static entry point for both eval and generated code.
    *
    * Null tokens are skipped and break bigram adjacency (matching
    * [[BigramCounts]]/[[TermCounts]]). The reused per-thread count
    * plane is reset in a `finally` over the touched list, so a row
    * that throws mid-loop can never leak nonzero buckets into later
    * rows computed on the same executor thread.
    */
  def compute(arr: ArrayData, numBuckets: Int): ArrayData = {
    val md = digests.get()
    var counts = planes.get()
    if (counts.length < numBuckets) {
      counts = new Array[Long](numBuckets)
      planes.set(counts)
    }
    val n = arr.numElements()
    val touched = new java.util.ArrayList[Integer](math.min(n * 2, 256))
    try {
      val underscore = '_'.toByte
      var prevBytes: Array[Byte] = null
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) {
          prevBytes = null // a null token breaks bigram adjacency
        } else {
          val curBytes = arr.getUTF8String(i).getBytes
          md.reset()
          md.update(curBytes)
          val b1 = bucketOf(md, numBuckets)
          if (counts(b1) == 0L) touched.add(b1)
          counts(b1) += 1L
          if (prevBytes != null) {
            md.reset()
            md.update(prevBytes)
            md.update(underscore)
            md.update(curBytes)
            val b2 = bucketOf(md, numBuckets)
            if (counts(b2) == 0L) touched.add(b2)
            counts(b2) += 1L
          }
          prevBytes = curBytes
        }
        i += 1
      }
      java.util.Collections.sort(touched)
      val out = new Array[Any](touched.size())
      var j = 0
      while (j < touched.size()) {
        val b = touched.get(j).intValue()
        out(j) = InternalRow(b, counts(b))
        j += 1
      }
      new GenericArrayData(out)
    } finally {
      var j = 0
      while (j < touched.size()) {
        counts(touched.get(j).intValue()) = 0L
        j += 1
      }
    }
  }
}
