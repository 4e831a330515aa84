package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.Tables

class IvfSpec extends SparkTestBase {

  lazy val emb = Tables.embeddings(spark, sf0001)

  test("training is deterministic and assignment covers every vector") {
    val m1 = Ivf.train(emb, k = 8, iters = 5, sampleSize = 500)
    val m2 = Ivf.train(emb, k = 8, iters = 5, sampleSize = 500)
    m1.centroids.zip(m2.centroids).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    val assigned = Ivf.assign(emb, m1)
    assert(assigned.count() === emb.count())
    assert(assigned.filter(col("cluster") < 0 || col("cluster") >= 8).count() === 0)
  }

  test("saved quantizer loads back and searches identically") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/model"
    val trained = Ivf.train(emb, k = 8, iters = 5, sampleSize = 500)
    Ivf.save(spark, trained, path)
    val loaded = Ivf.load(spark, path)
    trained.centroids.zip(loaded.centroids).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    val a = Ivf.search(emb, trained, Seq(0L, 1L), k = 5).collect().toSet
    val b = Ivf.search(emb, loaded, Seq(0L, 1L), k = 5).collect().toSet
    assert(a === b)
  }

  test("IVF search finds planted near-neighbors") {
    import spark.implicits._
    val queries = Seq(0L, 1L, 2L)
    val planted = (1 to 5).map { i =>
      emb.filter(col("vec_id").isin(queries: _*))
        .select((col("vec_id") + lit(1000L * i)).as("vec_id"),
          transform(col("embedding"), x => x + lit(0.01f * i)).as("embedding"),
          col("label"))
    }.reduce(_ unionByName _)
    val corpus = emb.unionByName(planted)
    val model = Ivf.train(corpus, k = 16, iters = 5, sampleSize = 600)
    val got = Vf(corpus, model, queries)
    val recalls = queries.map { q =>
      val want = (1 to 5).map(i => q + 1000L * i).toSet
      want.intersect(got.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"planted-neighbor IVF recall $mean too low")
  }

  private def Vf(corpus: org.apache.spark.sql.DataFrame, model: Ivf.Model,
      queries: Seq[Long]): Map[Long, Set[Long]] = {
    import spark.implicits._
    Ivf.search(corpus, model, queries, k = 10, nProbe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  test("distributed training matches sampled training's recall on planted neighbors") {
    import spark.implicits._
    val queries = Seq(0L, 1L, 2L)
    val planted = (1 to 5).map { i =>
      emb.filter(col("vec_id").isin(queries: _*))
        .select((col("vec_id") + lit(1000L * i)).as("vec_id"),
          transform(col("embedding"), x => x + lit(0.01f * i)).as("embedding"),
          col("label"))
    }.reduce(_ unionByName _)
    val corpus = emb.unionByName(planted)
    val model = Ivf.trainDistributed(corpus, k = 16, iters = 5, sampleSize = 600)
    assert(model.centroids.length === 16)
    val got = Vf(corpus, model, queries)
    val recalls = queries.map { q =>
      val want = (1 to 5).map(i => q + 1000L * i).toSet
      want.intersect(got.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"distributed-train IVF recall $mean too low")
    // full-corpus partial sums: every vector contributes, so no cell
    // exceeds the corpus and the cells partition it exactly
    val assigned = Ivf.assign(corpus, model)
    assert(assigned.count() === corpus.count())
    assert(assigned.groupBy("cluster").count()
      .agg(sum("count")).head().getLong(0) === corpus.count())
  }

  test("rerank scores are exact cosines") {
    import spark.implicits._
    val model = Ivf.train(emb, k = 8, iters = 3, sampleSize = 500)
    val ivf = Ivf.search(emb, model, Seq(0L), k = 5)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toMap
    val exact = Similarity.bruteForceTopK(emb, 0L, 499)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toMap
    ivf.foreach { case (id, c) => assert(math.abs(c - exact(id)) < 1e-9) }
  }

  test("quantized rerank returns nearly the float rerank's neighbors") {
    import spark.implicits._
    val model = Ivf.train(emb, k = 8, iters = 3, sampleSize = 500)
    val qids = Seq(0L, 7L, 42L)
    val fl = Ivf.search(emb, model, qids, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val i8 = Ivf.searchQuantized(emb, model, qids, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    qids.foreach { q =>
      val overlap = (fl(q) intersect i8(q)).size
      assert(overlap >= 8, s"query $q: only $overlap/10 overlap with float rerank")
    }
  }

  test("pre-built quantized index searches identically to candidate-only quantization") {
    val model = Ivf.train(emb, k = 8, iters = 3, sampleSize = 500)
    val qids = Seq(0L, 7L, 42L)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-q").toString + "/qindex"
    Ivf.buildQuantizedIndex(emb, path)
    val qcorp = Ivf.loadQuantizedIndex(spark, path)
    // exact copies quantize to identical bytes whichever pass produced
    // them, so the two tiers must return row-identical results
    val adhoc = Ivf.searchQuantized(emb, model, qids, k = 10).collect().toSet
    val indexed = Ivf.searchQuantizedIndexed(emb, qcorp, model, qids, k = 10)
      .collect().toSet
    assert(adhoc === indexed)
  }

  test("PQ training is deterministic; codes cover the codebook range") {
    import spark.implicits._
    val p1 = Ivf.trainPq(emb, m = 8, ksub = 16, iters = 5, sampleSize = 500)
    val p2 = Ivf.trainPq(emb, m = 8, ksub = 16, iters = 5, sampleSize = 500)
    p1.codebooks.zip(p2.codebooks).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
    assert(p1.subDim === 8)
    val codes = Ivf.encodePq(emb, p1)
    assert(codes.count() === emb.count())
    val lens = codes.select("pq_code").as[Array[Byte]]
      .collect().map(_.length).distinct
    assert(lens.toSeq === Seq(8))
  }

  test("ADC table scoring equals reconstructed-dot-product by hand") {
    import spark.implicits._
    val pq = Ivf.trainPq(emb, m = 8, ksub = 16, iters = 5, sampleSize = 500)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<float>")).as[Array[Float]].head()
    val v = emb.filter(col("vec_id") === 7L)
      .select(col("embedding").cast("array<float>")).as[Array[Float]].head()
    val code = pq.encode(v)
    val lut = pq.adcTable(q)
    val viaLut = code.indices.map(s => lut(s)(code(s) & 0xff).toDouble).sum
    // reconstruct v from its codes and dot with q directly
    val recon = code.indices.flatMap(s =>
      pq.codebooks(s)(code(s) & 0xff)).toArray
    val direct = q.zip(recon).map { case (a, b) => a.toDouble * b }.sum
    assert(math.abs(viaLut - direct) < 1e-4)
  }

  test("IVF-PQ search: planted exact copies survive probe + ADC " +
      "shortlist and rule the exact rerank at cosine 1.0") {
    import spark.implicits._
    val qids = Seq(0L, 1L, 2L)
    val corpus = Similarity.withPlantedQueries(
      emb.select("vec_id", "embedding"), qids)
    val ivf = Ivf.train(corpus, k = 16, iters = 5, sampleSize = 500)
    val pq = Ivf.trainPq(corpus, m = 8, ksub = 16, iters = 5, sampleSize = 500)
    val codes = Ivf.encodePq(corpus, pq)
    val res = Ivf.searchPq(corpus, codes, ivf, pq, qids, k = 10,
      nProbe = 4, shortlist = 100)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
    qids.foreach { q =>
      val mine = res.filter(_._1 == q)
      assert(mine.length === 10)
      assert(mine.exists(r => r._2 == q + 10000000L && r._3 == 1.0),
        s"query $q: planted copy lost (probe or ADC shortlist dropped it)")
      assert(mine.map(_._3).max === 1.0)
    }
  }

  test("IVF-PQ returns mostly the float rerank's neighbors") {
    import spark.implicits._
    val model = Ivf.train(emb, k = 8, iters = 3, sampleSize = 500)
    val pq = Ivf.trainPq(emb, m = 8, ksub = 16, iters = 5, sampleSize = 500)
    val codes = Ivf.encodePq(emb, pq)
    val qids = Seq(0L, 7L, 42L)
    val fl = Ivf.search(emb, model, qids, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pqr = Ivf.searchPq(emb, codes, model, pq, qids, k = 10,
      nProbe = 4, shortlist = 100)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    qids.foreach { q =>
      val overlap = (fl(q) intersect pqr(q)).size
      assert(overlap >= 7, s"query $q: only $overlap/10 overlap with float rerank")
    }
  }

  test("OPQ: rotation is orthonormal, training is deterministic, and " +
      "the kept iteration is never worse than plain residual PQ") {
    import spark.implicits._
    val ivf = Ivf.train(emb, k = 16, iters = 5, sampleSize = 500)
    val o1 = Ivf.trainOpqResidual(emb, ivf, m = 8, ksub = 16, iters = 5,
      opqIters = 3, sampleSize = 500)
    val o2 = Ivf.trainOpqResidual(emb, ivf, m = 8, ksub = 16, iters = 5,
      opqIters = 3, sampleSize = 500)
    o1.rotation.zip(o2.rotation).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    // R^T R = I within float dust
    val d = o1.dim
    (0 until d).foreach { i =>
      (0 until d).foreach { j =>
        var s = 0.0
        (0 until d).foreach(k => s += o1.rotation(k)(i).toDouble * o1.rotation(k)(j))
        assert(math.abs(s - (if (i == j) 1.0 else 0.0)) < 1e-4,
          s"R^T R deviates at ($i,$j): $s")
      }
    }
    // the kept (R, PQ) minimizes measured sample distortion, so it is
    // <= the opqIters=1 result (which IS plain residual PQ: identity
    // rotation, no Procrustes applied before the only fit)
    val plain = Ivf.trainOpqResidual(emb, ivf, m = 8, ksub = 16, iters = 5,
      opqIters = 1, sampleSize = 500)
    assert(plain.rotation.zipWithIndex.forall { case (row, i) =>
      row.zipWithIndex.forall { case (x, j) =>
        x == (if (i == j) 1.0f else 0.0f) } },
      "opqIters=1 must return the identity rotation")
    def residualDistortion(o: Ivf.OpqModel): Double = {
      val sample = emb.orderBy(col("vec_id")).limit(500)
        .select(col("embedding").cast("array<float>"))
        .as[Array[Float]].collect()
      sample.map { v =>
        val cen = ivf.centroids(ivf.nearest(v))
        val res = Array.tabulate(v.length)(i => (v(i) - cen(i)).toFloat)
        val y = o.rotate(res)
        val dec = o.pq.decode(o.pq.encode(y))
        y.zip(dec).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
      }.sum / sample.length
    }
    assert(residualDistortion(o1) <= residualDistortion(plain) + 1e-9,
      "OPQ kept an iteration worse than plain residual PQ")
  }

  test("residual ADC scoring equals the decomposed inner product by hand") {
    import spark.implicits._
    val ivf = Ivf.train(emb, k = 16, iters = 5, sampleSize = 500)
    val opq = Ivf.trainOpqResidual(emb, ivf, m = 8, ksub = 16, iters = 5,
      opqIters = 3, sampleSize = 500)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<float>")).as[Array[Float]].head()
    val v = emb.filter(col("vec_id") === 7L)
      .select(col("embedding").cast("array<float>")).as[Array[Float]].head()
    val cell = ivf.nearest(v)
    val cen = ivf.centroids(cell)
    val res = Array.tabulate(v.length)(i => (v(i) - cen(i)).toFloat)
    val code = opq.pq.encode(opq.rotate(res))
    // search-path score: <q, c_cell> + rotated-query LUT over the code
    val lut = opq.pq.adcTable(opq.rotate(q))
    val cellDot = q.zip(cen).map { case (a, b) => a.toDouble * b }.sum
    val viaLut = cellDot +
      code.indices.map(s => lut(s)(code(s) & 0xff).toDouble).sum
    // by hand: un-rotate the reconstruction (R^T = R^{-1}) and dot
    // the UNROTATED query against centroid + residual reconstruction
    val dec = opq.pq.decode(code)
    val d = opq.dim
    val unrot = Array.tabulate(d) { i =>
      (0 until d).map(k => opq.rotation(k)(i).toDouble * dec(k)).sum
    }
    val direct = cellDot + q.zip(unrot).map { case (a, b) => a * b }.sum
    assert(math.abs(viaLut - direct) < 1e-3,
      s"ADC $viaLut vs decomposed $direct")
  }

  test("IVFADC search: planted exact copies survive probe + residual " +
      "ADC shortlist and rule the exact rerank at cosine 1.0") {
    import spark.implicits._
    val qids = Seq(0L, 1L, 2L)
    val corpus = Similarity.withPlantedQueries(
      emb.select("vec_id", "embedding"), qids)
    val ivf = Ivf.train(corpus, k = 16, iters = 5, sampleSize = 500)
    val opq = Ivf.trainOpqResidual(corpus, ivf, m = 8, ksub = 16, iters = 5,
      opqIters = 3, sampleSize = 500)
    val codes = Ivf.encodePqResidual(corpus, ivf, opq)
    assert(codes.select("pq_code").as[Array[Byte]]
      .collect().map(_.length).distinct.toSeq === Seq(8))
    val res = Ivf.searchPqResidual(corpus, codes, ivf, opq, qids, k = 10,
      nProbe = 4, shortlist = 100)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
    qids.foreach { q =>
      val mine = res.filter(_._1 == q)
      assert(mine.length === 10)
      assert(mine.exists(r => r._2 == q + 10000000L && r._3 == 1.0),
        s"query $q: planted copy lost (probe or residual-ADC shortlist)")
      assert(mine.map(_._3).max === 1.0)
    }
  }

  test("saved PQ and OPQ models load back and serve identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pqio").toString
    val ivf = Ivf.train(emb, k = 16, iters = 5, sampleSize = 500)
    val pq = Ivf.trainPq(emb, m = 8, ksub = 16, iters = 5, sampleSize = 500)
    Ivf.savePq(spark, pq, s"$dir/pq")
    val pq2 = Ivf.loadPq(spark, s"$dir/pq")
    assert(pq2.dim === pq.dim && pq2.m === pq.m)
    pq.codebooks.zip(pq2.codebooks).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
    val opq = Ivf.trainOpqResidual(emb, ivf, m = 8, ksub = 16, iters = 5,
      opqIters = 3, sampleSize = 500)
    Ivf.saveOpq(spark, opq, s"$dir/opq")
    val opq2 = Ivf.loadOpq(spark, s"$dir/opq")
    opq.rotation.zip(opq2.rotation).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    val codes = Ivf.encodePqResidual(emb, ivf, opq)
    val a = Ivf.searchPqResidual(emb, codes, ivf, opq, Seq(0L, 7L), k = 5)
      .collect().toSet
    val b = Ivf.searchPqResidual(emb, codes, ivf, opq2, Seq(0L, 7L), k = 5)
      .collect().toSet
    assert(a === b)
    // a plain-PQ artifact refuses to load as OPQ (no rotation stored)
    val err = intercept[IllegalArgumentException](
      Ivf.loadOpq(spark, s"$dir/pq"))
    assert(err.getMessage.contains("no rotation"))
  }

  test("IVFADC returns mostly the float rerank's neighbors") {
    import spark.implicits._
    val model = Ivf.train(emb, k = 8, iters = 3, sampleSize = 500)
    val opq = Ivf.trainOpqResidual(emb, model, m = 8, ksub = 16, iters = 5,
      opqIters = 3, sampleSize = 500)
    val codes = Ivf.encodePqResidual(emb, model, opq)
    val qids = Seq(0L, 7L, 42L)
    val fl = Ivf.search(emb, model, qids, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val adc = Ivf.searchPqResidual(emb, codes, model, opq, qids, k = 10,
      nProbe = 4, shortlist = 100)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    qids.foreach { q =>
      val overlap = (fl(q) intersect adc(q)).size
      assert(overlap >= 7, s"query $q: only $overlap/10 overlap with float rerank")
    }
  }

  test("filtered IVF search post-filters with over-fetch; planted allowed copy always found") {
    import spark.implicits._
    val model = Ivf.train(emb, k = 8, iters = 3, sampleSize = 500)
    val qids = Seq(0L, 7L)
    // every even id is allowed — a wide predicate, the post-filter regime
    val allowed = emb.select(col("vec_id")).filter(col("vec_id") % 2 === 0)
    val r = Ivf.searchFiltered(emb, allowed, model, qids, k = 5, overfetch = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(r.nonEmpty)
    assert(r.forall(_._2 % 2 == 0), "a disallowed id leaked through the filter")
    assert(r.groupBy(_._1).forall(_._2.length <= 5))

    // plant an exact ALLOWED copy of query 0 (even id): it shares the
    // cell, survives the filter, and must surface at cosine 1.0
    val planted = emb.filter(col("vec_id") === 0L)
      .select(lit(10000000L).as("vec_id"), col("embedding"))
    val emb2 = emb.select("vec_id", "embedding").unionByName(planted)
    val allowed2 = emb2.select(col("vec_id")).filter(col("vec_id") % 2 === 0)
    val top = Ivf.searchFiltered(emb2, allowed2, model, Seq(0L), k = 3, overfetch = 4)
      .orderBy(col("cosine").desc).head()
    assert(top.getAs[Long]("vec_id") === 10000000L)
    assert(top.getAs[Double]("cosine") === 1.0)

    // overfetch = 1 with a filter that kills most near neighbors can
    // come back short — the documented failure over-fetching exists for
    val narrow = spark.range(1).select(lit(10000000L).as("vec_id"))
    val only = Ivf.searchFiltered(emb2, narrow, model, Seq(0L), k = 5, overfetch = 4)
      .select("vec_id").as[Long].collect()
    assert(only.toSeq === Seq(10000000L))
  }

  test("hybrid tier auto-selection: selective → pre-filter, wide → over-fetched post-filter") {
    import spark.implicits._
    // the pure routing rule, spec-pinned
    assert(Ivf.hybridTier(0.001, 0.05) === (("prefilter", 1)))
    assert(Ivf.hybridTier(0.05, 0.05) === (("prefilter", 1)))    // boundary inclusive
    assert(Ivf.hybridTier(0.5, 0.05) === (("ivf-postfilter", 2)))
    assert(Ivf.hybridTier(0.9, 0.05) === (("ivf-postfilter", 2)))
    assert(Ivf.hybridTier(0.06, 0.05)._2 === 17)                 // ceil(1/f) sizing
    assert(Ivf.hybridTier(0.01, 0.005) === (("ivf-postfilter", 64))) // clamp

    val model = Ivf.train(emb, k = 8, iters = 3, sampleSize = 500)
    // 0.1%-selective filter (one allowed id): the pre-filter tier must
    // return exactly that id — an over-fetch post-filter could miss it
    val one = emb.select(col("vec_id")).filter(col("vec_id") === 123L)
    val narrow = Ivf.hybridTopK(emb, one, model, queryVecId = 0L, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(narrow === Seq(123L), "selective predicate must route to exact pre-filter")

    // 50%-wide filter: routes to the IVF tier — identical output to
    // calling searchFiltered with the 1/f-sized overfetch by hand
    val wide = emb.select(col("vec_id")).filter(col("vec_id") % 2 === 0)
    val auto = Ivf.hybridTopK(emb, wide, model, queryVecId = 0L, k = 5)
      .collect().toSeq
    val manual = Ivf.searchFiltered(emb, wide, model, Seq(0L), k = 5, overfetch = 2)
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc).collect().toSeq
    assert(auto === manual)
    assert(auto.nonEmpty && auto.forall(_.getAs[Long]("vec_id") % 2 == 0))
  }

  test("incremental index sync converges to the corpus through append/update/delete") {
    import spark.implicits._
    import graft.lake.SnapshotTable
    val base = java.nio.file.Files.createTempDirectory("graft-ivf-sync").toString
    val (corpus, index, ckpt) = (s"$base/corpus", s"$base/index", s"$base/ckpt")
    def indexed = SnapshotTable.read(spark, index)
      .select("vec_id", "scale", "qvec")
    def expected = Similarity.quantize(
      SnapshotTable.read(spark, corpus).select("vec_id", "embedding"))
    def assertConverged(): Unit = {
      val got = indexed
      assert(got.exceptAll(expected).count() === 0 &&
        expected.exceptAll(got).count() === 0, "index != quantize(corpus)")
    }

    // bootstrap: first sync builds the index from scratch
    SnapshotTable.append(
      emb.select("vec_id", "embedding").filter(col("vec_id") < 100), corpus)
    assert(Ivf.syncQuantizedIndex(spark, corpus, index, ckpt).isDefined)
    assertConverged()
    // nothing new → None, index untouched
    assert(Ivf.syncQuantizedIndex(spark, corpus, index, ckpt).isEmpty)

    // append + delete + update, then one sync drains all three commits
    SnapshotTable.append(
      emb.select("vec_id", "embedding")
        .filter(col("vec_id") >= 100 && col("vec_id") < 120), corpus)
    SnapshotTable.delete(spark, corpus, col("vec_id") < 10)
    SnapshotTable.update(spark, corpus,
      Seq("embedding" -> org.apache.spark.sql.functions.transform(
        col("embedding"), x => x * lit(2.0f))),
      col("vec_id") === 50L)
    assert(Ivf.syncQuantizedIndex(spark, corpus, index, ckpt).isDefined)
    assertConverged()
    assert(indexed.filter(col("vec_id") < 10).count() === 0)

    // the maintained index serves searches identically to ad-hoc
    val model = Ivf.train(SnapshotTable.read(spark, corpus), k = 8,
      iters = 3, sampleSize = 500)
    val live = SnapshotTable.read(spark, corpus).select("vec_id", "embedding")
    val viaIndex = Ivf.searchQuantizedIndexed(live, indexed, model,
      Seq(20L, 110L), k = 5).collect().toSet
    val adhoc = Ivf.searchQuantized(live, model, Seq(20L, 110L), k = 5)
      .collect().toSet
    assert(viaIndex === adhoc)
  }

  test("sync collapses a multi-commit batch to the FINAL state per id") {
    import graft.lake.SnapshotTable
    val base = java.nio.file.Files.createTempDirectory("graft-ivf-sync2").toString
    val (corpus, index, ckpt) = (s"$base/corpus", s"$base/index", s"$base/ckpt")
    SnapshotTable.append(
      emb.select("vec_id", "embedding").filter(col("vec_id") < 50), corpus)
    assert(Ivf.syncQuantizedIndex(spark, corpus, index, ckpt).isDefined)

    // four commits drained by ONE sync:
    //   v: insert ids 200-204          — later deleted; must NOT land
    //   v+1: delete ids 200-204 and 10 — final state for all six: gone
    //   v+2: update id 20 (×2)         — two updates to one id in one
    //   v+3: update id 20 again (×3)   —   batch: no duplicate-key throw
    SnapshotTable.append(
      emb.select((col("vec_id") + 200).as("vec_id"), col("embedding"))
        .filter(col("vec_id") < 5), corpus)
    SnapshotTable.delete(spark, corpus,
      col("vec_id").between(200, 204) || col("vec_id") === 10)
    SnapshotTable.update(spark, corpus,
      Seq("embedding" -> transform(col("embedding"), x => x * lit(2.0f))),
      col("vec_id") === 20L)
    SnapshotTable.update(spark, corpus,
      Seq("embedding" -> transform(col("embedding"), x => x * lit(3.0f))),
      col("vec_id") === 20L)
    assert(Ivf.syncQuantizedIndex(spark, corpus, index, ckpt).isDefined)

    val got = SnapshotTable.read(spark, index).select("vec_id", "scale", "qvec")
    val want = Similarity.quantize(
      SnapshotTable.read(spark, corpus).select("vec_id", "embedding"))
    assert(got.exceptAll(want).count() === 0 &&
      want.exceptAll(got).count() === 0, "index != quantize(corpus)")
    // the insert-then-delete ids must not have been resurrected
    assert(got.filter(col("vec_id") >= 200).count() === 0)
    assert(got.filter(col("vec_id") === 10).count() === 0)
  }
}
