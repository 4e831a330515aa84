package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over
  * array<float>/array<double> columns.
  *
  * Why a custom Expression (SURVEY.md §2.10 preference order): the
  * HOF formulation (`aggregate(zip_with(...))`) is CodegenFallback —
  * interpreted per row with per-element boxing — and builds three
  * intermediate arrays per comparison. This expression emits a single
  * fused primitive loop via doGenCode (one pass computes dot product
  * and both norms), participating in whole-stage codegen. On the ANN
  * rerank path this is the per-candidate inner loop, so it's the
  * operator's hot spot at scale.
  *
  * Null semantics: NULL if either array is NULL (BinaryExpression
  * nullSafeEval); array elements are assumed non-null (embedding
  * columns), matching the HOF version's behavior on such data.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (tl, tr) = (elemType(left).get, elemType(right).get)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = get(x, i, tl); val yv = get(y, i, tr)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    val (tl, tr) = (elemType(left).get, elemType(right).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${getter(tl, a, i)};
         |  double $yv = ${getter(tr, b, i)};
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Same fused-loop treatment for the dot product alone. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (tl, tr) = (elemType(left).get, elemType(right).get)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xv = if (tl == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (tr == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    val (tl, tr) = (elemType(left).get, elemType(right).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (${getter(tl, a, i)}) * (${getter(tr, b, i)});
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd polynomial rolling hash over a string's UTF-16 units:
  * fold (acc * base + charCode) % mod. Matches the HOF formulation
  * (`aggregate` over `split(text, "")` + `ascii`) for all
  * basic-multilingual-plane text, without the per-character array
  * materialization and interpreted fold.
  */
case class RollingHash(child: Expression, base: Long, mod: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def nullSafeEval(v: Any): Any = {
    val s = v.toString
    var acc = 0L
    var i = 0
    while (i < s.length) { acc = (acc * base + s.charAt(i)) % mod; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * ${base}L + $s.charAt($i)) % ${mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact integer dot product over int8-quantized vectors stored as
  * BINARY (one signed byte per dimension — the compact layout an
  * Array[Byte] column encodes to): the inner loop of quantized ANN
  * search. Returns LONG — the accumulation is exact (|q| ≤ 127, so
  * 64 dims cap at ~10^6 per pair; no float rounding until the caller
  * applies the two scale factors), which keeps cross-engine parity
  * trivial and the loop free of FP latency chains. Same fused-loop
  * codegen tier as DotProduct: the quantized corpus is the
  * memory-bound scan at scale (4× smaller than float32), and this
  * keeps its arithmetic inside whole-stage codegen over plain
  * byte[]. */
case class DotProductI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_product_i8"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary (int8-vector) inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    val n = math.min(x.length, y.length)
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x(i).toLong * y(i).toLong
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Most-frequent-adjacent-bigram multiplicity of a token array, as a
  * single codegen'd pass (0 when the array has fewer than 2 tokens).
  *
  * Why an Expression: the bigram-repetition quality metric (Gopher
  * rule shape) is a ROW-LOCAL property of the token array, but the
  * compositional formulation (explode bigrams → count per (doc, gram)
  * → max per doc) pushes every token through TWO shuffles — at corpus
  * scale that is shuffle volume proportional to total tokens, for a
  * value each row can compute alone. This keeps the metric inside
  * whole-stage codegen with zero data movement.
  *
  * Bigram keys join the two tokens with a space; a token containing a
  * space could alias a pair boundary, which whitespace-split tokens
  * never contain.
  */
case class TopBigramCount(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "top_bigram_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var max = 0L
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Long]()
      var prev = String.valueOf(arr.getUTF8String(0))
      var i = 1
      while (i < n) {
        val cur = String.valueOf(arr.getUTF8String(i))
        val key = prev + " " + cur
        val c = counts.merge(key, 1L, (a, b) => a + b)
        if (c > max) max = c
        prev = cur
        i += 1
      }
    }
    max
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val max = ctx.freshName("max")
      val counts = ctx.freshName("counts")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      val key = ctx.freshName("key")
      val c = ctx.freshName("c")
      val o = ctx.freshName("o")
      // Janino cannot compile method references (Long::sum) or rely on
      // autoboxing — raw HashMap + explicit get/put/valueOf keeps this
      // inside whole-stage codegen instead of silently falling back
      s"""
         |int $n = $arr.numElements();
         |long $max = 0L;
         |if ($n >= 2) {
         |  java.util.HashMap $counts = new java.util.HashMap();
         |  String $prev = String.valueOf($arr.getUTF8String(0));
         |  for (int $i = 1; $i < $n; $i++) {
         |    String $cur = String.valueOf($arr.getUTF8String($i));
         |    String $key = $prev + " " + $cur;
         |    Object $o = $counts.get($key);
         |    long $c = ($o == null) ? 1L : ((java.lang.Long) $o).longValue() + 1L;
         |    $counts.put($key, java.lang.Long.valueOf($c));
         |    if ($c > $max) $max = $c;
         |    $prev = $cur;
         |  }
         |}
         |${ev.value} = $max;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Mean char-bigram probability of a pre-normalized `[a-z ]` string
  * under a 27×27 model passed as a plain literal (the model is tiny —
  * a driver-collected array — so scoring is a MAP-ONLY pass: no
  * second bigram explode, no join, no per-doc shuffle; that join
  * formulation measured ~3× slower at 1M docs). Index = c1*27 + c2
  * with 'a'..'z' → 0..25, ' ' → 26. NULL for strings shorter than 2.
  * Probabilities sum in document order; consumers round before
  * cross-engine comparison (summation-order ulps).
  */
case class CharBigramScore(child: Expression, probs: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "char_bigram_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if probs.length == 729 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a 729-entry model, got ${probs.length}")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  @transient private lazy val parr: Array[Double] = probs.toArray

  private def idx(b: Byte): Int = if (b == ' ') 26 else b - 'a'

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = bytes.length
    if (n < 2) null
    else {
      var s = 0.0
      var prev = idx(bytes(0))
      var i = 1
      while (i < n) {
        val cur = idx(bytes(i))
        s += parr(prev * 27 + cur)
        prev = cur
        i += 1
      }
      s / (n - 1)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val model = ctx.addReferenceObj("bigramProbs", parr, "double[]")
    nullSafeCodeGen(ctx, ev, str => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      // explicit primitives only — Janino has no autoboxing/lambdas
      s"""
         |byte[] $bytes = $str.getBytes();
         |int $n = $bytes.length;
         |if ($n < 2) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  int $prev = ($bytes[0] == (byte) ' ') ? 26 : ($bytes[0] - (byte) 'a');
         |  for (int $i = 1; $i < $n; $i++) {
         |    int $cur = ($bytes[$i] == (byte) ' ') ? 26 : ($bytes[$i] - (byte) 'a');
         |    $s += $model[$prev * 27 + $cur];
         |    $prev = $cur;
         |  }
         |  ${ev.value} = $s / ($n - 1);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {

  /** Column API for the native expressions. */
  def cosine_similarity(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def rolling_hash(c: Column, base: Long = 131L, mod: Long = 1000000007L): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c), base, mod))

  def top_bigram_count(c: Column): Column =
    ColumnBridge.column(TopBigramCount(ColumnBridge.expression(c)))

  def dot_product_i8(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductI8(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def char_bigram_score(c: Column, probs: Seq[Double]): Column =
    ColumnBridge.column(CharBigramScore(ColumnBridge.expression(c), probs))

  def hashed_ngram_buckets(c: Column, numBuckets: Int): Column =
    ColumnBridge.column(HashedNgramBuckets(ColumnBridge.expression(c), numBuckets))

  def term_counts(c: Column): Column =
    ColumnBridge.column(TermCounts(ColumnBridge.expression(c)))

  def bigram_counts(c: Column): Column =
    ColumnBridge.column(BigramCounts(ColumnBridge.expression(c)))

  /** SQL registration: SELECT cosine_similarity(a, b) ... */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product_i8", exprs => DotProductI8(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs(0), 131L, 1000000007L), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_bigram_count", exprs => TopBigramCount(exprs(0)), "built-in")
  }
}
