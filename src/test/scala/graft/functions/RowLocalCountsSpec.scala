package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Edge semantics of the row-local counting expressions (TermCounts,
  * BigramCounts, HashedNgramBuckets): null/empty inputs, null
  * elements, output ordering, and parity with the exploded
  * formulations they replace. */
class RowLocalCountsSpec extends SparkTestBase {

  import spark.implicits._
  import graft.functions.{VectorFunctions => V}

  test("TermCounts: counts, sort order, null array, null elements, empties") {
    val df = Seq(
      (1, Seq("b", "a", "b", "a", "b")),
      (2, Seq.empty[String]),
      (4, Seq("", "x", ""))).toDF("id", "toks")
      .unionByName(Seq((3, null.asInstanceOf[Seq[String]])).toDF("id", "toks"))
      .unionByName(Seq((5, Seq("y", null, "y"))).toDF("id", "toks"))
    val out = df.select(col("id"), V.term_counts(col("toks")).as("tc"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Row](1)).toMap
    assert(out(1).map(r => (r.getString(0), r.getLong(1))) === Seq("a" -> 2L, "b" -> 3L))
    assert(out(2).isEmpty)
    assert(out(3) == null)
    // empty string is a real term; binary order puts it first
    assert(out(4).map(r => (r.getString(0), r.getLong(1))) === Seq("" -> 2L, "x" -> 1L))
    // null elements are skipped (the exploded form never emitted them)
    assert(out(5).map(r => (r.getString(0), r.getLong(1))) === Seq("y" -> 2L))
  }

  test("BigramCounts: multiplicity, null breaks adjacency, short arrays") {
    val df = Seq(
      (1, Seq("a", "b", "a", "b", "a")), // ab x2, ba x2
      (2, Seq("solo")),
      (3, Seq.empty[String])).toDF("id", "toks")
      .unionByName(Seq((4, Seq("a", null, "b"))).toDF("id", "toks"))
    val out = df.select(col("id"), V.bigram_counts(col("toks")).as("bc"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Row](1)).toMap
    assert(out(1).map(r => (r.getString(0), r.getString(1), r.getLong(2))) ===
      Seq(("a", "b", 2L), ("b", "a", 2L)))
    assert(out(2).isEmpty)
    assert(out(3).isEmpty)
    // a null token forms no pair on either side
    assert(out(4).isEmpty)
  }

  test("HashedNgramBuckets matches the exploded md5 formulation exactly") {
    val docs = Seq(
      (1, "the quick brown fox jumps over the lazy dog the quick"),
      (2, "a  b"), // double space -> empty token, hashed like the old path
      (3, "single"),
      (4, "")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        explode(V.hashed_ngram_buckets(split(col("text"), " "), 4096)).as("bt"))
      .select(col("doc_id"), col("bt.bucket"), col("bt.tf"))
    // the pre-fusion formulation, DuckDB-oracle-identical by round 6.
    // Single-token docs are excluded from ITS input: Spark's
    // descending sequence(1, 0) makes it element_at past the array
    // end there — an ANSI error (so the corpus provably never held
    // such docs), where the fused expression simply emits no bigram
    val want = docs.filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), explode(expr(
        "concat(ws, transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), '_', element_at(ws, i + 1))))"))
        .as("token"))
      .withColumn("bucket",
        pmod(conv(substring(md5(col("token")), 1, 6), 16, 10).cast("long"),
          lit(4096L)).cast("int"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("tf"))
    val multi = got.filter(col("doc_id") =!= 3 && col("doc_id") =!= 4)
    assert(multi.exceptAll(want).isEmpty && want.exceptAll(multi).isEmpty)
    assert(got.filter(col("doc_id") === 3).count() === 1) // one unigram, no bigram
    assert(got.filter(col("doc_id") === 4).count() === 1) // md5("") bucket, tf=1
  }

  test("HashedNgramBuckets: null elements skipped and break bigram adjacency") {
    val df = Seq((1, Seq("a", "b"))).toDF("id", "toks")
      .unionByName(Seq((2, Seq("a", null, "b"))).toDF("id", "toks"))
      .unionByName(Seq((3, null.asInstanceOf[Seq[String]])).toDF("id", "toks"))
    val out = df.select(col("id"), V.hashed_ngram_buckets(col("toks"), 4096).as("h"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Row](1)).toMap
    // doc 1: a, b, a_b -> 3 total tf; doc 2: the null forms no bigram,
    // so just the two unigrams; doc 3: null array -> null result
    assert(out(1).map(_.getLong(1)).sum === 3L)
    assert(out(2).map(_.getLong(1)).sum === 2L)
    assert(out(3) == null)
    // doc 2's unigram buckets equal doc 1's (same tokens), with no
    // bigram bucket — and repeated evaluation on the same thread stays
    // clean (the reused count plane is reset per row)
    val u1 = out(1).map(r => (r.getInt(0), r.getLong(1))).toMap
    val u2 = out(2).map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(u2.forall { case (b, tf) => u1.getOrElse(b, 0L) >= tf })
  }
}
