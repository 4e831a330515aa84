package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local term-frequency map: collapse a token array to its
  * distinct terms with counts, `array<struct<term:string,
  * tf:bigint>>` sorted by term (binary UTF-8 order).
  *
  * The per-document half of TF-IDF (and any bag-of-words feature)
  * without the corpus-token-sized explode + (doc, term) shuffle: the
  * exploded formulation shuffles every token occurrence to count
  * duplicates that only ever collide WITHIN their own document —
  * counting them in the row makes the tf stage map-only, and
  * everything downstream (document frequency, idf joins) starts from
  * the distinct-term stream, which is the same row count the old
  * shuffle produced. Counts are identical to groupBy(doc, term) by
  * construction. NULL array elements are skipped (the exploded
  * formulation never produced NULL term rows either).
  *
  * Heavy loop in a static helper the generated code calls — the
  * HashedNgramBuckets pattern, inside whole-stage codegen.
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "term_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    TermCounts.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TermCounts.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {

  /** Static entry point for both eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Long]](Math.max(16, n))
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val c = counts.get(t)
        if (c == null) counts.put(t.clone(), Array(1L)) else c(0) += 1L
      }
      i += 1
    }
    val terms = counts.keySet().toArray(new Array[UTF8String](counts.size()))
    java.util.Arrays.sort(terms, new java.util.Comparator[UTF8String] {
      override def compare(a: UTF8String, b: UTF8String): Int = a.compareTo(b)
    })
    val out = new Array[Any](terms.length)
    var j = 0
    while (j < terms.length) {
      out(j) = InternalRow(terms(j), counts.get(terms(j))(0))
      j += 1
    }
    new GenericArrayData(out)
  }
}
