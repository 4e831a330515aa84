package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.Tables

class SimilaritySpec extends SparkTestBase {

  lazy val emb = Tables.embeddings(spark, sf0001)

  test("semDedup drops every planted scaled copy, keeps the distinct base corpus") {
    import spark.implicits._
    val base = emb.select("vec_id", "embedding").limit(100)
    val copies = base.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), x => x * lit(4.0f)).as("embedding"))
    val out = Similarity.semDedup(base.unionByName(copies), k = 4, threshold = 0.99)
      .as[(Long, Int, Boolean)].collect()
    assert(out.length === 200)
    val (planted, originals) = out.partition(_._1 >= 1000000L)
    // every ×4 copy normalizes to its base's unit vector → same
    // cluster, cosine 1.0, higher id → dropped
    assert(planted.forall(!_._3), "all planted copies dropped")
    // random 64-dim base vectors are nowhere near cosine 0.99 of each
    // other → the base corpus survives intact
    assert(originals.forall(_._3), "all distinct bases kept")
    // copy and base agree on the cluster assignment
    val cluster = out.map(r => r._1 -> r._2).toMap
    assert(planted.forall(p => cluster(p._1 - 1000000L) === p._2))
  }

  test("cosine HOF matches a locally computed reference value") {
    import spark.implicits._
    val rows = emb.filter(col("vec_id").isin(0L, 1L))
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val (a, b) = (rows(0L).map(_.toDouble), rows(1L).map(_.toDouble))
    val expected = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val got = emb.filter(col("vec_id") === 0L)
      .crossJoin(emb.filter(col("vec_id") === 1L).select(col("embedding").as("e2")))
      .select(Similarity.cosine(col("embedding"), col("e2")).as("c"))
      .head().getDouble(0)
    assert(math.abs(got - expected) < 1e-9)
  }

  test("brute-force top-k is ordered and self-excluding") {
    import spark.implicits._
    val topk = Similarity.bruteForceTopK(emb, 0L, 10).collect()
    assert(topk.length === 10)
    assert(!topk.map(_.getLong(0)).contains(0L))
    val cosines = topk.map(_.getDouble(1))
    assert(cosines.sameElements(cosines.sorted(Ordering[Double].reverse)))
  }

  test("LSH ANN finds planted near-neighbors") {
    import spark.implicits._
    // plant 5 small deterministic perturbations of vectors 0..2 —
    // genuine near-neighbors (cosine ≈ 1), the workload LSH exists
    // for (isotropic random vectors have no neighbor structure and
    // any bucketing scheme legitimately degrades there)
    val queries = Seq(0L, 1L, 2L)
    val planted = (1 to 5).map { i =>
      emb.filter(col("vec_id").isin(queries: _*))
        .select(
          (col("vec_id") + lit(1000L * i)).as("vec_id"),
          transform(col("embedding"), x => x + lit(0.01f * i)).as("embedding"),
          col("label"))
    }.reduce(_ unionByName _)
    val corpus = emb.unionByName(planted)
    val lsh = Similarity.lshTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = queries.map { q =>
      val want = (1 to 5).map(i => q + 1000L * i).toSet
      want.intersect(lsh.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.8, s"planted-neighbor recall $meanRecall too low")
  }

  test("embedding near-dup finds planted perturbed copies") {
    import spark.implicits._
    val planted = emb.select(
      (col("vec_id") + lit(10000000L)).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.005f)).as("embedding"))
    val pairs = Similarity.embeddingNearDups(
      emb.select("vec_id", "embedding").unionByName(planted), 0.98)
      .filter(col("id_b") === col("id_a") + 10000000L)
    val recall = pairs.count().toDouble / emb.count()
    assert(recall >= 0.9, s"planted perturbed-copy recall $recall < 0.9")
    // and every surviving pair really is above the cosine threshold
    pairs.select("cosine").as[Double].collect().foreach(c => assert(c >= 0.98))
  }

  test("LSH candidates rerank uses exact cosine (scores match brute force)") {
    import spark.implicits._
    val lsh = Similarity.lshTopK(emb, Seq(0L), 10)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toMap
    val exact = Similarity.bruteForceTopK(emb, 0L, 499)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toMap
    lsh.foreach { case (id, c) => assert(math.abs(c - exact(id)) < 1e-9) }
  }

  test("int8 quantization bounds per-component error and preserves cosine closely") {
    import spark.implicits._
    val floats = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    val q = Similarity.quantize(emb)
      .as[(Long, Double, Array[Byte])].collect()
    assert(q.length === floats.size)
    q.foreach { case (id, scale, qv) =>
      val v = floats(id)
      assert(qv.length === v.length)
      // reconstruction error per component is at most half a step
      v.indices.foreach { i =>
        assert(math.abs(qv(i) * scale - v(i)) <= scale / 2 + 1e-6,
          s"vec $id component $i")
      }
    }
    // quantized cosine tracks float cosine for a sample of pairs
    def qcos(a: (Double, Array[Byte]), b: (Double, Array[Byte])): Double = {
      def dot(x: Array[Byte], y: Array[Byte]) =
        x.zip(y).map { case (p, r) => p.toLong * r.toLong }.sum.toDouble
      dot(a._2, b._2) / (math.sqrt(dot(a._2, a._2)) * math.sqrt(dot(b._2, b._2)))
    }
    def fcos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val byId = q.map(t => t._1 -> (t._2, t._3)).toMap
    val ids = floats.keys.toSeq.sorted.take(20)
    for (a <- ids; b <- ids if a < b) {
      assert(math.abs(qcos(byId(a), byId(b)) - fcos(floats(a), floats(b))) < 0.02,
        s"pair ($a, $b)")
    }
  }

  test("filtered exact search equals brute force over the pre-filtered corpus") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf0001)
    val allowed = emb.select(col("vec_id")).filter(col("vec_id") % 3 === 0)
    val got = Similarity.filteredTopK(emb, allowed, queryVecId = 0L, k = 8)
      .as[(Long, Double)].collect().toSeq
    // reference: restrict the corpus FIRST (query vector re-injected
    // since 0 % 3 == 0 keeps it anyway), then plain brute force
    val restricted = emb.join(allowed, Seq("vec_id"), "left_semi")
    val want = Similarity.bruteForceTopK(restricted, queryVecId = 0L, k = 8)
      .as[(Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.forall(_._1 % 3 == 0))
    assert(got.size === 8)
  }
}
