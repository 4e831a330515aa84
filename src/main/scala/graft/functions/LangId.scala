package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass stopword language ID — the native form of the
  * composed-Column classifier in [[graft.ops.TextAnalysis]]
  * (`split(lower(text), " ")` → four `size(filter(_, isin(...)))`
  * probes → argmax). The composed form pays the split FOUR times per
  * row plus four interpreted array-filter passes: higher-order
  * functions are CodegenFallback, so whole-stage codegen cannot hoist
  * the shared `split(lower(text))` subtree out of the four
  * independent filter evals, and each `isin` probes every token
  * against every stopword. Here one byte scan over the lowercased
  * text tokenizes on the same literal-space delimiter and counts all
  * four languages at once through a 28-entry open-addressed
  * packed-token table (every stopword is <= 3 ASCII bytes, so a token
  * packs into one int; longer tokens skip the lookup entirely) — no
  * token array, no per-token allocation, fully inside whole-stage
  * codegen.
  *
  * Semantics are BIT-IDENTICAL to the composed form, including its
  * edge cases, which the equivalence spec pins corpus-wide:
  *  - lowercasing is `UTF8String.toLowerCase` (what `lower()` does);
  *  - tokens split on the literal single space (consecutive spaces
  *    yield empty tokens that match nothing, like `split`'s);
  *  - a token counts for EVERY language whose list contains it
  *    ("de"/"la" overlap es/fr deliberately);
  *  - argmax tie order en > es > fr > de;
  *  - empty text → all-zero counts → "en";
  *  - NULL text → "de" (the composed `when` chain's conditions are
  *    all NULL, so the `otherwise` fires — preserved, not "fixed",
  *    because gates and oracles pin the composed behavior). */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = false

  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def eval(input: InternalRow): Any =
    LangId.predict(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${c.code}
        |UTF8String ${ev.value} =
        |  graft.functions.LangId.predict(${c.isNull} ? null : ${c.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangId {

  /** The probe lists — canonical here; [[graft.ops.TextAnalysis
    * .stopwords]] aliases this map and the equivalence spec asserts
    * native == composed corpus-wide, so list drift fails loudly. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit"))

  private val EN = UTF8String.fromString("en")
  private val ES = UTF8String.fromString("es")
  private val FR = UTF8String.fromString("fr")
  private val DE = UTF8String.fromString("de")

  /** A <=3-byte token packed into one int with a length tag; 0 never
    * occurs (the tag is non-zero), so 0 marks an empty table slot. */
  private def pack(bs: Array[Byte]): Int = {
    require(bs.length >= 1 && bs.length <= 3)
    var k = bs.length << 24
    var i = 0
    while (i < bs.length) { k |= (bs(i) & 0xff) << (16 - 8 * i); i += 1 }
    k
  }

  // 128-slot linear-probe table over the 24 distinct packed stopwords
  private val tableKeys = new Array[Int](128)
  private val tableMasks = new Array[Int](128)
  locally {
    val langBit = Map("en" -> 1, "es" -> 2, "fr" -> 4, "de" -> 8)
    for ((lang, words) <- stopwords.toSeq; w <- words) {
      val bs = w.getBytes("UTF-8")
      require(bs.length <= 3 && bs.forall(b => b >= 0x20),
        s"stopword '$w' breaks the <=3-ASCII-byte packing the native " +
          "lookup relies on — widen pack() before extending the lists")
      val key = pack(bs)
      var idx = slotOf(key)
      while (tableKeys(idx) != 0 && tableKeys(idx) != key)
        idx = (idx + 1) & 127
      tableKeys(idx) = key
      tableMasks(idx) |= langBit(lang)
    }
  }

  private def slotOf(key: Int): Int = (key * 0x9e3779b1) >>> 25

  private def maskOf(key: Int): Int = {
    var idx = slotOf(key)
    while (true) {
      val k = tableKeys(idx)
      if (k == key) return tableMasks(idx)
      if (k == 0) return 0
      idx = (idx + 1) & 127
    }
    0
  }

  /** Static entry point for both eval and generated code. */
  def predict(text: UTF8String): UTF8String = {
    if (text == null) return DE
    val lower = text.toLowerCase
    val n = lower.numBytes
    var en = 0; var es = 0; var fr = 0; var de = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || lower.getByte(i) == ' ') {
        val len = i - start
        if (len >= 1 && len <= 3) {
          var key = len << 24
          var j = 0
          while (j < len) {
            key |= (lower.getByte(start + j) & 0xff) << (16 - 8 * j)
            j += 1
          }
          val mask = maskOf(key)
          if (mask != 0) {
            en += mask & 1
            es += (mask >> 1) & 1
            fr += (mask >> 2) & 1
            de += (mask >> 3) & 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (en >= es && en >= fr && en >= de) EN
    else if (es >= fr && es >= de) ES
    else if (fr >= de) FR
    else DE
  }
}
