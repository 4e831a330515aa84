package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.Tables
import graft.ops.Similarity

class VectorExpressionsSpec extends SparkTestBase {

  lazy val emb = Tables.embeddings(spark, sf0001)
  lazy val pairs = emb.select(col("vec_id"), col("embedding"))
    .crossJoin(emb.filter(col("vec_id") === 0L).select(col("embedding").as("q")))

  test("native cosine matches the HOF formulation exactly") {
    val both = pairs.select(
      Similarity.cosine(col("embedding"), col("q")).as("native"),
      Similarity.cosineHof(col("embedding"), col("q")).as("hof"))
    val maxDiff = both.agg(max(abs(col("native") - col("hof")))).head().getDouble(0)
    assert(maxDiff < 1e-12, s"native vs HOF diverged by $maxDiff")
  }

  test("native dot matches the HOF formulation exactly") {
    val both = pairs.select(
      Similarity.dot(col("embedding"), col("q")).as("native"),
      Similarity.dotHof(col("embedding"), col("q")).as("hof"))
    val maxDiff = both.agg(max(abs(col("native") - col("hof")))).head().getDouble(0)
    assert(maxDiff < 1e-12)
  }

  test("expression participates in whole-stage codegen") {
    import spark.implicits._
    // scan → project shape (a join would hide codegen behind
    // BroadcastNestedLoopJoin); the projection containing the native
    // expression must sit inside WholeStageCodegen
    val qv = emb.filter(col("vec_id") === 0L)
      .select("embedding").as[Array[Float]].head().toSeq
    val plan = emb.select(Similarity.cosine(col("embedding"), typedlit(qv)).as("c"))
      .queryExecution.executedPlan
    val wsc = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, s"no WholeStageCodegenExec in:\n$plan")
    // and the projection with our expression lives inside it
    assert(wsc.exists(_.toString.contains("cosine_similarity")))
    // the generated source must actually compile under Janino
    org.apache.spark.sql.graftbridge.CodegenBridge.compileWholeStage(plan)
  }

  test("SQL registration exposes the functions") {
    VectorFunctions.register(spark)
    emb.createOrReplaceTempView("emb_v")
    val r = spark.sql(
      """SELECT a.vec_id, cosine_similarity(a.embedding, b.embedding) AS c,
        |       dot_product(a.embedding, b.embedding) AS d
        |FROM emb_v a JOIN emb_v b ON b.vec_id = 0 LIMIT 5""".stripMargin)
    assert(r.count() === 5)
    assert(r.filter(col("c").isNull || col("d").isNull).count() === 0)
    // the newer expressions are SQL-visible too
    val r2 = spark.sql(
      """SELECT top_bigram_count(split('a b a b', ' ')) AS t,
        |       rolling_hash('abc') AS h,
        |       dot_product_i8(CAST('ab' AS BINARY), CAST('ab' AS BINARY)) AS d8""".stripMargin)
      .head()
    assert(r2.getLong(0) === 2L) // "a b" occurs twice
    assert(!r2.isNullAt(1))
    // 'a'=97, 'b'=98 → 97*97 + 98*98
    assert(r2.getLong(2) === 97L * 97 + 98L * 98)
  }

  test("NULL array yields NULL, mismatched lengths use the common prefix") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 0.0f)), Some(Seq(1.0f, 0.0f))),
      (None, Some(Seq(1.0f, 0.0f)))).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).isNullAt(0))
  }

  test("native rolling hash matches the HOF character fold") {
    import graft.ops.TextAnalysis
    val docs = Tables.documents(spark, sf0001)
    val both = docs.select(
      TextAnalysis.rollingHash(col("text")).as("native"),
      TextAnalysis.rollingHashHof(col("text")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    // empty and unicode-BMP strings agree too
    import spark.implicits._
    val edge = Seq("", "a", "héllo wörld", "日本語テキスト").toDF("s")
    val e = edge.select(
      TextAnalysis.rollingHash(col("s")).as("native"),
      TextAnalysis.rollingHashHof(col("s")).as("hof"))
    assert(e.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("top_bigram_count matches the explode+groupBy formulation") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
    val native = docs.select(col("doc_id"),
      VectorFunctions.top_bigram_count(col("toks")).as("top_c"))
    val exploded = docs.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
        .as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
    val joined = native.join(exploded, Seq("doc_id"), "left")
      .select(native("top_c").as("a"),
        coalesce(exploded("top_c"), lit(0L)).as("b"))
    assert(joined.filter(col("a") =!= col("b")).count() === 0)
    // edge cases: empty, single token, all-same tokens, nulls
    import spark.implicits._
    val edge = Seq("", "one", "x x x x", "a b a b a").toDF("text")
      .select(VectorFunctions.top_bigram_count(split(col("text"), " ")).as("c"))
      .as[Long].collect()
    assert(edge.toSeq === Seq(0L, 0L, 3L, 2L))
  }

  test("dot_product_i8 matches exact integer arithmetic and stays codegen'd") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, Array.fill(64)((rnd.nextInt(255) - 127).toByte),
        Array.fill(64)((rnd.nextInt(255) - 127).toByte))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
      VectorFunctions.dot_product_i8(col("a"), col("b")).as("d"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, a, b) =>
      val want = a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
      assert(got(id) === want, s"id $id")
    }
    // a LocalTableScan short-circuits codegen — assert over the real
    // quantized-corpus shape instead
    val plan = graft.ops.Similarity.quantize(emb)
      .select(VectorFunctions.dot_product_i8(col("qvec"), col("qvec")).as("nq"))
      .queryExecution.executedPlan
    val compiled = org.apache.spark.sql.graftbridge.CodegenBridge.compileWholeStage(plan)
    assert(compiled > 0, s"no WholeStageCodegenExec in:\n$plan")
  }

  test("top_bigram_count stays inside whole-stage codegen") {
    val docs = Tables.documents(spark, sf0001)
    val plan = docs
      .select(VectorFunctions.top_bigram_count(split(col("text"), " ")).as("c"))
      .queryExecution.executedPlan
    // force-compile the generated source: a Janino-incompatible
    // construct otherwise falls back to interpreted execution with
    // only a WARN (this caught a Long::sum method reference)
    val compiled = org.apache.spark.sql.graftbridge.CodegenBridge.compileWholeStage(plan)
    assert(compiled > 0, s"no WholeStageCodegenExec in:\n$plan")
  }

  test("native expression is faster than the HOF fold on repeated evaluation") {
    // inflate the pair count so per-row interpretation cost dominates
    val big = emb.crossJoin(emb.limit(40).select(col("embedding").as("q")))
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      big.select(c.as("v")).agg(sum("v")).head()
      (System.nanoTime() - t0) / 1e9
    }
    time(Similarity.cosine(col("embedding"), col("q"))) // warm
    val native = time(Similarity.cosine(col("embedding"), col("q")))
    val hof = time(Similarity.cosineHof(col("embedding"), col("q")))
    info(f"native=$native%.3fs hof=$hof%.3fs speedup=${hof / native}%.1fx")
    assert(native < hof, f"native ($native%.3fs) not faster than HOF ($hof%.3fs)")
  }
}
