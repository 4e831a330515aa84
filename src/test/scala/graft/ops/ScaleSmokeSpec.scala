package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Scale-shape smoke tests: the text/vector testdata stays at 500
  * rows per scale factor, so these generate larger synthetic corpora
  * on the fly and check the bucket-first plans complete in bounded
  * wall time (the point is no quadratic blowup, not microbenchmark
  * numbers). */
class ScaleSmokeSpec extends SparkTestBase {

  private def timed[A](label: String, budgetSec: Double)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"$label: $secs%.1f s (budget $budgetSec%.0f)")
    assert(secs < budgetSec, f"$label took $secs%.1f s > $budgetSec%.0f s budget")
    r
  }

  test("minhash LSH sweep over 50k synthetic docs stays bucket-bound") {
    import spark.implicits._
    val vocab = Array("spark", "join", "merge", "scan", "sort", "row", "data",
      "batch", "stream", "filter", "agg", "key", "hash", "table", "query",
      "window", "part", "small", "big", "fast", "slow", "value", "column")
    val docs = spark.range(50000).map { id =>
      val rnd = new scala.util.Random(id)
      val words = Array.fill(40 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length)))
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
    val nPairs = timed("minhash candidates 50k docs", 120.0) {
      TextDedup.minhashCandidates(docs).count()
    }
    // random docs over a 23-word vocab share shingles rarely; the
    // candidate set must stay far below all-pairs (1.25e9)
    assert(nPairs < 5000000L, s"candidate explosion: $nPairs pairs")
  }

  test("LSH ANN over 100k synthetic vectors never goes all-pairs") {
    import spark.implicits._
    val emb = spark.range(100000).map { id =>
      val rnd = new scala.util.Random(id)
      (id, Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    timed("LSH top-10 for 5 queries over 100k vectors", 120.0) {
      Similarity.lshTopK(emb, Seq(0L, 1L, 2L, 3L, 4L), 10).count()
    }
  }

  test("salted aggregation handles a pathologically hot key") {
    import spark.implicits._
    // 2M rows, 90% on one key
    val df = spark.range(2000000)
      .select((when(pmod(col("id"), lit(10)) < 7, lit(0L)).otherwise(col("id")))
        .as("k"), (col("id") % 1000).cast("double").as("v"))
    val r = timed("salted agg 2M rows hot key", 60.0) {
      Skew.saltedAggregate(df, Seq("k"), salts = 16,
        partial = Seq("n" -> count(lit(1)), "s" -> sum(col("v"))),
        merge = c => sum(col(c)))
        .orderBy(col("n").desc).limit(1).collect().head
    }
    assert(r.getLong(1) === 1400000L) // the hot key kept every row
  }
}
