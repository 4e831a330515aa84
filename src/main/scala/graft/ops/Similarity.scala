package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Similarity search over embedding columns (array<float>).
  *
  * Two paths, per the standard ANN playbook:
  *  - brute-force cosine top-k — the exact baseline. One broadcast of
  *    the query vectors, one scan of the corpus, TakeOrderedAndProject
  *    for the top-k: correct at any scale where a full scan is
  *    affordable.
  *  - multi-table random-hyperplane LSH — the scale path. Each vector
  *    maps to `numTables` sign-pattern buckets (pure Column
  *    expressions over literal hyperplanes, fixed seed); candidate
  *    generation is an equi-join on (table, bucket) — shuffle volume
  *    O(n · tables), never O(n²) — followed by exact cosine rerank of
  *    candidates only.
  *
  * Dot products / norms are HOF folds (`zip_with` + `aggregate`) in
  * double precision — codegen'd, no UDF.
  */
object Similarity {

  /** HOF formulations — correct and dependency-free, but
    * CodegenFallback (interpreted). Kept for reference/tests; the hot
    * paths use the native codegen'd expressions below. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosineHof(a: Column, b: Column): Column = dotHof(a, b) / (l2norm(a) * l2norm(b))

  /** Native fused-loop Catalyst expressions (graft.functions) — same
    * double-precision math and accumulation order as the HOF forms,
    * so results (and the DuckDB oracles) are unchanged. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot_product(a, b)

  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_similarity(a, b)

  // ---- LSH machinery ------------------------------------------------

  val numTables = 4
  val bitsPerTable = 8
  val dim = 64

  /** Deterministic hyperplanes (fixed seed), flat array for the
    * tight loop: plane (t, j) occupies
    * [(t*bitsPerTable + j) * dim, …+dim). */
  private val planesFlat: Array[Double] = {
    val rng = new scala.util.Random(7)
    Array.fill(numTables * bitsPerTable * dim)(rng.nextGaussian())
  }

  /** All table buckets of one vector — tight loop on purpose (the
    * HOF-expression formulation of 32 plane dot products per row is
    * CodegenFallback/interpreted; same rationale as the minhash
    * signature, see TextDedup). */
  def bucketsOf(v: Array[Float]): Array[Long] = {
    val out = new Array[Long](numTables)
    val n = math.min(v.length, dim)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var j = 0
      while (j < bitsPerTable) {
        val base = (t * bitsPerTable + j) * dim
        var d = 0.0
        var i = 0
        while (i < n) { d += v(i) * planesFlat(base + i); i += 1 }
        if (d > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  /** (id, tbl, bucket) — one row per table per vector, computed in a
    * typed per-partition pass (no shuffle until the consuming join). */
  def bucketize(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        bucketsOf(v).iterator.zipWithIndex.map { case (b, t) => (id, t, b) }
      }
      .toDF(idCol, "tbl", "bucket")
  }

  // ---- brute force --------------------------------------------------

  /** Exact top-k neighbors of one stored vector (excluding itself). */
  def bruteForceTopK(emb: DataFrame, queryVecId: Long, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.filter(col(idCol) === queryVecId).select(col(vecCol).as("qv"))
    emb.filter(col(idCol) =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col(idCol), round(cosine(col(vecCol), col("qv")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  // ---- LSH ANN ------------------------------------------------------

  /** Approximate top-k for a set of stored query ids: bucket join →
    * dedup candidates → exact cosine rerank → top-k per query. */
  def lshTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val queries = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val qBuckets = broadcast(
      bucketize(queries.withColumnRenamed("query_id", "query_id_tmp"), "query_id_tmp", "qv")
        .withColumnRenamed("query_id_tmp", "query_id"))
    val candidates = bucketize(emb, idCol, vecCol)
      .join(qBuckets, Seq("tbl", "bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol))
      .distinct()
    val rescored = candidates
      .join(emb.select(col(idCol), col(vecCol)), idCol)
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col(idCol),
        round(cosine(col(vecCol), col("qv")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    rescored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Embedding-cosine near-duplicate pairs: LSH bucket self-join
    * (candidates share a (table, bucket)), native-cosine verification
    * ≥ threshold. The dedup-by-embedding analogue of
    * TextDedup.nearDuplicates — same O(n·tables) shuffle bound, exact
    * scoring only on candidates. */
  def embeddingNearDups(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val buckets = bucketize(emb, idCol, vecCol)
      .withColumnRenamed(idCol, "id")
    val cand = buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val vecs = emb.select(col(idCol), col(vecCol))
    cand
      .join(vecs.withColumnRenamed(idCol, "id_a").withColumnRenamed(vecCol, "va"), "id_a")
      .join(vecs.withColumnRenamed(idCol, "id_b").withColumnRenamed(vecCol, "vb"), "id_b")
      .select(col("id_a"), col("id_b"), round(cosine(col("va"), col("vb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ---- driver-gate queries -----------------------------------------

  def vectorNorms(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), round(l2norm(col("embedding")), 4).as("l2_norm"))
      .orderBy("vec_id")

  val vectorNormsSql: String =
    """SELECT vec_id, round(sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS l2_norm
      |FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t
      |GROUP BY vec_id ORDER BY vec_id""".stripMargin

  def annBruteForce(spark: SparkSession, dir: String): DataFrame =
    bruteForceTopK(Tables.embeddings(spark, dir), queryVecId = 0L, k = 20)

  val annBruteForceSql: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |x AS (
      |  SELECT e.vec_id,
      |    sum(CAST(e.embedding[i.i] AS DOUBLE) * CAST(q.qv[i.i] AS DOUBLE)) AS dp,
      |    sum(CAST(e.embedding[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE)) AS na,
      |    sum(CAST(q.qv[i.i] AS DOUBLE) * CAST(q.qv[i.i] AS DOUBLE)) AS nb
      |  FROM embeddings e, q, (SELECT unnest(generate_series(1, 64)) AS i) i
      |  WHERE e.vec_id <> 0
      |  GROUP BY e.vec_id
      |)
      |SELECT vec_id, round(dp / (sqrt(na) * sqrt(nb)), 6) AS cosine
      |FROM x ORDER BY cosine DESC, vec_id ASC LIMIT 20""".stripMargin

  /** LSH ANN for 3 stored queries — engine-specific hyperplanes → no
    * SQL oracle; recall vs brute force is unit-tested
    * (SimilaritySpec). */
  def annLsh(spark: SparkSession, dir: String): DataFrame =
    lshTopK(Tables.embeddings(spark, dir), queryIds = Seq(0L, 1L, 2L), k = 10)
      .orderBy(col("query_id").asc, col("cosine").desc, col("vec_id").asc)

  /** Embedding near-dup sweep over a corpus with planted perturbed
    * copies (deterministic small offsets) — always yields pairs, so
    * the full bucket→verify path is exercised in the gate. LSH planes
    * are engine-specific → rows-only; recall unit-tested. */
  def embeddingDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val planted = emb.select(
      (col("vec_id") + lit(10000000L)).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.005f)).as("embedding"))
    embeddingNearDups(emb.unionByName(planted), 0.98)
      .orderBy("id_a", "id_b")
  }

  val catalog: Seq[QDef] = Seq(
    QDef("q26_vector_norm", vectorNorms, Some(vectorNormsSql)),
    QDef("q31_ann_cosine_topk", annBruteForce, Some(annBruteForceSql)),
    QDef("q37_ann_lsh_topk", annLsh, None),
    QDef("q45_embedding_dedup", embeddingDedup, None),
  )
}
