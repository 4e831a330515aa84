package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass document quality score — the native form of the
  * composed-Column formula in [[graft.ops.TextAnalysis.qualityScore]]:
  *
  *   0.4·min(chars/500, 1) + 0.3·min(5·stopRatio, 1) + 0.3·typeToken
  *
  * The composed form references the token array in five places
  * (size ×2, an `isin` filter, array_distinct) and the stopword
  * filter is a higher-order function — CodegenFallback, which both
  * interprets that probe AND blocks whole-stage codegen's common
  * subexpression elimination from hoisting the shared
  * `split(lower(text))`, so the split runs several times per row.
  * Here one tokenization feeds all three terms.
  *
  * BIT-IDENTICAL doubles, not just close: the q33 oracle compares
  * unrounded doubles against DuckDB, which works only because every
  * engine runs the same IEEE op sequence. This expression reproduces
  * the composed form's sequence exactly — same casts, same
  * multiply/divide shapes, same left-associated final sum — and
  * tokenizes through the same Java regex split on the same
  * `UTF8String.toLowerCase` string that `split(lower(text), " ")`
  * uses, so empties from consecutive/trailing spaces count
  * identically. NULL text → NULL, like the composed form. The
  * equivalence spec pins native == composed with exact double
  * equality corpus-wide. */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "quality_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    QualityScore.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.QualityScore.compute($t);")

  override protected def withNewChildInternal(
      newChild: Expression): QualityScoreExpr = copy(child = newChild)
}

object QualityScore {

  private val EN: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    LangId.stopwords("en").foreach(s.add)
    s
  }

  /** Static entry point for both eval and generated code. */
  def compute(text: UTF8String): Double = {
    // length(text) counts characters of the ORIGINAL text
    val lenScore = math.min(text.numChars().toDouble / 500.0, 1.0)
    // the same tokens split(lower(text), " ") produces: Java regex
    // split (limit -1) over the UTF8String-lowercased string
    val toks = text.toLowerCase.toString.split(" ", -1)
    val n = toks.length // >= 1 even for empty text, like size(split(..))
    var en = 0
    var distinct = 0
    val seen = new java.util.HashSet[String](Math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val t = toks(i)
      if (EN.contains(t)) en += 1
      if (seen.add(t)) distinct += 1
      i += 1
    }
    val stopTerm = math.min(en.toDouble / n.toDouble * 5.0, 1.0)
    val typeToken = distinct.toDouble / n.toDouble
    0.4 * lenScore + 0.3 * stopTerm + 0.3 * typeToken
  }
}
