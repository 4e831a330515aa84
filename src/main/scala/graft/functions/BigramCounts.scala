package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local adjacent-bigram frequency map over a token array:
  * `array<struct<w1:string, w2:string, tf:bigint>>` sorted by
  * (w1, w2) in binary UTF-8 order — [[TermCounts]]' bigram sibling.
  *
  * The word-LM pipeline used to explode every adjacent pair twice
  * (once into the model aggregation, once into the scoring join);
  * collapsing a document's pairs in the row leaves both downstream
  * consumers reading the per-document DISTINCT pair stream with
  * counts, which aggregates to bit-identical model counts and
  * carries the instance multiplicity for scoring. NULL tokens break
  * adjacency (no pair is formed across one), matching the exploded
  * formulation's NULL-dropping joins.
  */
case class BigramCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = false),
    StructField("w2", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "bigram_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    BigramCounts.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.BigramCounts.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): BigramCounts =
    copy(child = newChild)
}

object BigramCounts {

  /** Static entry point for both eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val counts =
      new java.util.HashMap[(UTF8String, UTF8String), Array[Long]](Math.max(16, n))
    var prev: UTF8String = if (n > 0 && !arr.isNullAt(0)) arr.getUTF8String(0) else null
    var i = 1
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (prev != null && cur != null) {
        val c = counts.get((prev, cur))
        if (c == null)
          // clone on retention: ArrayData strings may alias a reused
          // row buffer, and map keys (and the output) outlive the row
          counts.put((prev.clone(), cur.clone()), Array(1L))
        else c(0) += 1L
      }
      prev = cur
      i += 1
    }
    val keys = counts.keySet()
      .toArray(new Array[(UTF8String, UTF8String)](counts.size()))
    java.util.Arrays.sort(keys, new java.util.Comparator[(UTF8String, UTF8String)] {
      override def compare(a: (UTF8String, UTF8String),
          b: (UTF8String, UTF8String)): Int = {
        val c = a._1.compareTo(b._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    })
    val out = new Array[Any](keys.length)
    var j = 0
    while (j < keys.length) {
      val k = keys(j)
      out(j) = InternalRow(k._1, k._2, counts.get(k)(0))
      j += 1
    }
    new GenericArrayData(out)
  }
}
