package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.Tables

class TextDedupSpec extends SparkTestBase {

  lazy val docs = Tables.documents(spark, sf0001).select("doc_id", "text")

  test("exact dedup keys duplicates by content hash") {
    import spark.implicits._
    val withDups = docs.limit(10)
      .unionByName(docs.limit(3).withColumn("doc_id", col("doc_id") + 1000L))
    val dedup = TextDedup.exactDuplicates(withDups)
    assert(dedup.count() === 10)
    assert(dedup.filter(col("n_copies") === 2).count() === 3)
    // kept id is always the minimum of the duplicate group
    val kept = dedup.filter(col("n_copies") === 2).select("keep_id")
      .as[Long].collect().toSet
    assert(kept.subsetOf(Set(0L, 1L, 2L)))
  }

  test("minhash LSH recovers planted near-duplicates") {
    val toks = TextDedup.tokensOf(col("text"))
    val mutated = docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), size(toks) - lit(1))).as("text"))
    val corpus = docs.unionByName(mutated)
    val found = TextDedup.nearDuplicates(corpus, 0.5)
      .filter(col("id_b") === col("id_a") + 1000000L)
    // dropping one token keeps Jaccard ≈ 1 → banding must catch
    // virtually every planted pair
    val recall = found.count().toDouble / docs.count()
    assert(recall >= 0.95, s"planted-pair recall $recall < 0.95")
  }

  test("near-dup candidates are verified by exact jaccard threshold") {
    val nd = TextDedup.nearDuplicates(docs, 0.9)
    import spark.implicits._
    val sims = nd.select("jaccard").as[Double].collect()
    sims.foreach(j => assert(j >= 0.9))
  }

  test("simhash of near-identical docs has small hamming distance") {
    import spark.implicits._
    val base = TextDedup.simhashes(docs).withColumnRenamed("simhash", "sh_a")
    val toks = TextDedup.tokensOf(col("text"))
    val mutated = docs.select(col("doc_id"),
      concat_ws(" ", slice(toks, lit(1), size(toks) - lit(1))).as("text"))
    val mut = TextDedup.simhashes(mutated).withColumnRenamed("simhash", "sh_b")
    val joined = base.join(mut, "doc_id")
      .select(TextDedup.hammingDistance(col("sh_a"), col("sh_b")).as("hd"))
    val avgHd = joined.agg(avg("hd")).head().getDouble(0)
    assert(avgHd <= 8.0, s"avg hamming distance $avgHd too large for near-dups")
    // sanity: unrelated docs differ a lot more
    val shifted = base.withColumn("doc_id", col("doc_id") + 1L)
      .withColumnRenamed("sh_a", "sh_c")
    val unrelated = base.join(shifted, "doc_id")
      .select(TextDedup.hammingDistance(col("sh_a"), col("sh_c")).as("hd"))
      .agg(avg("hd")).head().getDouble(0)
    assert(unrelated > avgHd)
  }

  test("simhash banding finds near-dup twins and excludes unrelated docs") {
    import spark.implicits._
    val toks = TextDedup.tokensOf(col("text"))
    val mutated = docs.select(
      (col("doc_id") + 500000L).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), size(toks) - lit(1))).as("text"))
    val corpus = docs.unionByName(mutated)
    val pairs = TextDedup.simhashNearDups(corpus, maxHamming = 10)
    val planted = pairs.filter(col("id_b") === col("id_a") + 500000L)
    val recall = planted.count().toDouble / docs.count()
    assert(recall >= 0.8, s"simhash twin recall $recall < 0.8")
    // every reported pair is genuinely close in Hamming space
    pairs.select("hamming").as[Int].collect().foreach(h => assert(h <= 10))
  }

  test("connected components label planted cliques, chains, and singletons correctly") {
    import spark.implicits._
    // component shapes: a 3-clique {1,2,3}, a LONG chain 100..160
    // (adversarial for plain min-propagation: diameter 60 — pointer
    // jumping must converge well inside maxIters), an isolated pair
    val clique = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val chain = (100L until 160L).map(i => (i, i + 1))
    val pair = Seq((900L, 901L))
    val edges = (clique ++ chain ++ pair).toDF("id_a", "id_b")
    // both tiers must produce identical labels: the driver union-find
    // (default for small graphs) and the distributed log-rounds loop
    // (forced via driverThreshold = 0)
    Seq(500000L, 0L).foreach { thr =>
      val got = TextDedup.connectedComponents(edges, driverThreshold = thr)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((1L to 3L).forall(got(_) === 1L), s"threshold=$thr")
      assert((100L to 160L).forall(got(_) === 100L), s"threshold=$thr")
      assert(got(900L) === 900L && got(901L) === 900L, s"threshold=$thr")
      assert(got.size === 3 + 61 + 2, s"threshold=$thr")
    }
  }

  test("dedup keeper: one keeper per cluster, longest doc wins, singletons kept") {
    import spark.implicits._
    val docs = graft.model.Tables.documents(spark, sf0001)
    val out = TextDedup.dedupKeepers(spark, sf0001)
      .as[(Long, Long, Int, Boolean)].collect()
    assert(out.length.toLong === docs.count(), "one row per corpus doc")
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (c, rows) =>
      assert(rows.count(_._4) === 1, s"cluster $c must have exactly one keeper")
      assert(rows.forall(_._3 === rows.length), s"cluster $c size mismatch")
    }
    // singletons keep themselves and are labeled by their own id
    byCluster.filter(_._2.length == 1).foreach { case (c, Array(row)) =>
      assert(row._4 && row._1 === c)
    }
    // the keeper is the longest doc, ties to the smallest id
    val chars = docs.select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    byCluster.filter(_._2.length > 1).foreach { case (c, rows) =>
      val want = rows.map(_._1).minBy(id => (-chars(id), id))
      val got = rows.filter(_._4).head._1
      assert(got === want, s"cluster $c keeper: got $got want $want")
    }
  }

  test("segment dedup keeps each segment at its first (id, pos) occurrence only") {
    import spark.implicits._
    // 4-word segments; "a b c d" appears in doc 1 (pos 0), doc 1 again
    // (pos 1), and doc 2 (pos 0) — only the first survives, both
    // within-doc and cross-doc. Doc 3 opens with "e f g h", which doc
    // 1 already owns at pos 2, so only its trailing partial segment
    // survives. Unique segments elsewhere are untouched.
    val docs = Seq(
      (1L, "a b c d a b c d e f g h"),
      (2L, "a b c d x y z w"),
      (3L, "e f g h tail"),
      (4L, "solo words only here")).toDF("doc_id", "text")
    val out = TextDedup.dedupSegments(docs, wordsPerSegment = 4)
      .orderBy("id")
      .select("id", "kept_segments", "dedup_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, "a b c d e f g h"),   // duplicate middle segment dropped
      (2L, 1L, "x y z w"),           // cross-doc duplicate dropped
      (3L, 1L, "tail"),              // "e f g h" already kept in doc 1
      (4L, 1L, "solo words only here")))
  }

  test("boilerplate removal drops frequent segments from EVERY doc, keeps empty docs visible") {
    import spark.implicits._
    // "a b c d" appears in 3 docs → boilerplate, removed everywhere
    // (unlike dedupSegments, the first occurrence dies too). Unique
    // segments survive; doc 3 is pure boilerplate and must still
    // appear with zero segments; repeating a segment INSIDE one doc
    // does not make it boilerplate (document frequency, not term
    // frequency).
    val docs = Seq(
      (1L, "a b c d keep me one"),
      (2L, "a b c d keep me two"),
      (3L, "a b c d"),
      (4L, "solo solo solo solo solo solo solo solo")).toDF("doc_id", "text")
    val out = TextDedup.removeBoilerplate(docs, wordsPerSegment = 4, minDocs = 3)
      .orderBy("id")
      .select("id", "kept_segments", "clean_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, "keep me one"),
      (2L, 1L, "keep me two"),
      (3L, 0L, ""),
      (4L, 2L, "solo solo solo solo solo solo solo solo")))

    // threshold boundary: minDocs=4 keeps everything (only 3 docs share)
    val loose = TextDedup.removeBoilerplate(docs, wordsPerSegment = 4, minDocs = 4)
      .orderBy("id").select("kept_segments").as[Long].collect().toSeq
    assert(loose === Seq(2L, 2L, 1L, 2L))
  }

  test("incremental dedup loop: each commit checked against the fp store, store grows by kept only") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-inc-dedup").toString
    val table = s"$base/docs"
    val store = s"$base/fps"
    val ckpt = s"$base/ckpt"
    graft.lake.SnapshotTable.append(
      Seq((1L, "alpha text"), (2L, "beta text")).toDF("doc_id", "text"), table)
    var flags = Map.empty[Long, (Boolean, Boolean, Boolean)]
    def drain(): Option[(Long, Long)] =
      TextDedup.dedupNewCommits(spark, table, store, ckpt) { (df, _, _) =>
        flags = df.as[(Long, Boolean, Boolean, Boolean)].collect()
          .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      }

    assert(drain() === Some((1L, 1L)))
    assert(flags === Map(1L -> (false, false, true), 2L -> (false, false, true)))
    assert(graft.lake.SnapshotTable.read(spark, store).count() === 2)

    // commit 2: a history dup, a novel doc, and an in-batch dup of it
    graft.lake.SnapshotTable.append(
      Seq((3L, "alpha text"), (4L, "gamma text"), (5L, "gamma text"))
        .toDF("doc_id", "text"), table)
    assert(drain() === Some((2L, 2L)))
    assert(flags === Map(
      3L -> (true, false, false),
      4L -> (false, false, true),
      5L -> (false, true, false)))
    // only gamma's fingerprint is new to the store
    assert(graft.lake.SnapshotTable.read(spark, store).distinct().count() === 3)

    // nothing new → no batch, store untouched
    assert(drain() === None)

    // a re-submission of already-kept content in a later commit is a
    // history dup now
    graft.lake.SnapshotTable.append(Seq((6L, "gamma text")).toDF("doc_id", "text"), table)
    assert(drain() === Some((3L, 3L)))
    assert(flags === Map(6L -> (true, false, false)))
  }

  test("simhash is deterministic") {
    val a = TextDedup.simhash64(Seq("spark", "join", "merge"))
    val b = TextDedup.simhash64(Seq("spark", "join", "merge"))
    assert(a === b)
    assert(TextDedup.simhash64(Seq("entirely", "different", "words")) !== a)
  }

  test("duplicate spans: first occurrence kept, later occurrences cut, regions merge") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a b c d e f"),            // owns every gram it contains
      (1L, "x y a b c d z"),          // re-occurring "a b c"/"b c d" at pos 2,3
      (2L, "a b c a b c a b c"))      // self-repetition past the first window
      .toDF("doc_id", "text")
    val out = TextDedup.duplicateSpans(corpus, spanLen = 3)
      .orderBy("id")
      .as[(Long, Long, Long, Long, Long, String)].collect()

    // doc 0: every window is the global first occurrence — untouched
    assert(out(0) === ((0L, 0L, 0L, 0L, 6L, "a b c d e f")))
    // doc 1: dup windows at pos 2 and 3 merge into one region covering
    // tokens 2..5 (4 tokens) — "a b c d" cut, frame survives
    assert(out(1) === ((1L, 2L, 1L, 4L, 3L, "x y z")))
    // doc 2: "a b c" owned by doc 0, and its own "b c a"/"c a b"
    // windows repeat — dup positions {0,3,4,5,6} cover all 9 tokens
    assert(out(2) === ((2L, 5L, 1L, 9L, 0L, "")))
  }

  test("duplicate spans: doc shorter than the span is never cut") {
    import spark.implicits._
    val corpus = Seq((0L, "a b"), (1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = TextDedup.duplicateSpans(corpus, spanLen = 4)
      .orderBy("id")
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(out.forall(_._2 == 0L), "no window fits → no duplicate can exist")
    assert(out.map(_._6).toSeq === Seq("a b", "a b", "a b c d"))
  }

  test("duplicate spans: kept_text token count always equals kept_tokens on real docs") {
    import spark.implicits._
    val out = TextDedup.duplicateSpans(Tables.documents(spark, sf0001))
    val bad = out.filter(
      when(col("kept_text") === "", lit(0L))
        .otherwise(size(split(col("kept_text"), " ")).cast("long"))
        =!= col("kept_tokens"))
    assert(bad.count() === 0)
    // the corpus genuinely exercises the operator at this SF
    assert(out.filter(col("n_dup") > 0).count() > 0)
  }
}
