package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (stopword-hit heuristic), quality scoring, token
  * counting, and document fingerprinting. All pure Column expression
  * composition — codegen'd, no UDFs, embarrassingly parallel over any
  * partitioning (no shuffle except the final aggregations).
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(lower(text), " ")

  // Small per-language stopword probes. Deliberately overlapping
  // (de/la/en appear in several languages) — the argmax with a fixed
  // tie order keeps the prediction deterministic. Canonical lists
  // live on the native expression; this alias keeps the public name.
  val stopwords: Map[String, Seq[String]] =
    graft.functions.LangId.stopwords

  def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang): _*)))

  /** Stopword language ID, argmax with fixed tie-break order
    * en > es > fr > de. Evaluates through the native single-pass
    * [[graft.functions.LangIdExpr]] — the composed-Column form below
    * pays `split(lower(text))` once per language probe because
    * higher-order functions are CodegenFallback (measured 26.6s vs
    * 0.7s over 1M docs, ScaleBench `lang_id`); the spec pins the two
    * row-identical over the corpus and on every edge case. */
  def predictLang(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.LangIdExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** The reference formulation predictLang is verified against:
    * pure built-in expression composition, kept as the executable
    * spec of the semantics (and for engines without the extension). */
  def predictLangComposed(text: Column): Column = {
    val t = tokens(text)
    val en = stopwordHits(t, "en")
    val es = stopwordHits(t, "es")
    val fr = stopwordHits(t, "fr")
    val de = stopwordHits(t, "de")
    when(en >= greatest(es, fr, de), lit("en"))
      .when(es >= greatest(fr, de), lit("es"))
      .when(fr >= de, lit("fr"))
      .otherwise(lit("de"))
  }

  // Character-n-gram profiles — the step up from stopword probes
  // (works on unsegmented/short text where token probes miss). Scores
  // are occurrence counts of distinctive grams, computed with the
  // engine-portable replace-count idiom, so the whole classifier
  // stays codegen'd expression composition.
  val ngramProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "he", "ing", "er", "an"),
    "es" -> Seq("os", "la", "ci", "qu", "ón"),
    "fr" -> Seq("ou", "ai", "eu", "le", "ux"),
    "de" -> Seq("ch", "ei", "ie", "un", "sch"))

  /** Total occurrences of `lang`'s profile grams in (lowercased)
    * text: Σ (len(t) − len(replace(t, g, ''))) / len(g). */
  def ngramHits(lowered: Column, lang: String): Column =
    ngramProfiles(lang).map { g =>
      ((length(lowered) - length(replace(lowered, lit(g), lit("")))) / g.length).cast("long")
    }.reduce(_ + _)

  /** Char-n-gram language ID, same argmax/tie order as
    * [[predictLang]]. */
  def predictLangNgram(text: Column): Column = {
    val t = lower(text)
    val en = ngramHits(t, "en")
    val es = ngramHits(t, "es")
    val fr = ngramHits(t, "fr")
    val de = ngramHits(t, "de")
    when(en >= greatest(es, fr, de), lit("en"))
      .when(es >= greatest(fr, de), lit("es"))
      .when(fr >= de, lit("fr"))
      .otherwise(lit("de"))
  }

  def charCount(text: Column): Column = length(text)

  /** Whitespace token count as space-count+1 — the formulation with
    * identical semantics in Spark and ANSI SQL engines. */
  def wordCount(text: Column): Column =
    length(text) - length(translate(text, " ", "")) + 1

  def avgWordLen(text: Column): Column =
    length(translate(text, " ", "")).cast("double") / wordCount(text)

  /** Heuristic quality score in [0,1]: length saturation + stopword
    * density + type-token ratio, the classic cheap pretraining-data
    * filters. */
  /** Length/stopword/type-token quality score. Evaluates through the
    * native single-pass [[graft.functions.QualityScoreExpr]] — the
    * composed form below references the token array five times and
    * its stopword filter is a CodegenFallback HOF (measured 6.7s vs
    * ~1s over 1M docs, ScaleBench `quality_score`); the spec pins the
    * two BIT-identical (exact doubles — the q33 oracle compares
    * unrounded). */
  def qualityScore(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.QualityScoreExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** The reference formulation qualityScore is verified against —
    * pure built-in composition, the executable spec of the
    * semantics. */
  def qualityScoreComposed(text: Column): Column = {
    val t = tokens(text)
    val lenScore = least(charCount(text).cast("double") / lit(500.0), lit(1.0))
    val stopRatio = stopwordHits(t, "en").cast("double") / size(t)
    val typeToken = size(array_distinct(t)).cast("double") / size(t)
    lit(0.4) * lenScore + lit(0.3) * least(stopRatio * lit(5.0), lit(1.0)) + lit(0.3) * typeToken
  }

  /** Whitespace-normalized md5 fingerprint (exact-dup key robust to
    * spacing differences). */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** 131-base polynomial rolling hash over characters, mod 1e9+7 —
    * kept below 2^63 at every step so it's ANSI-overflow-safe and
    * reproducible in any engine with a fold primitive. HOF reference
    * formulation, used to cross-check the codegen'd expression. */
  def rollingHashHof(text: Column): Column = {
    val codes = transform(split(text, ""), ch => ascii(ch).cast("long"))
    aggregate(codes, lit(0L), (acc, c) => (acc * lit(131L) + c) % lit(1000000007L))
  }

  /** Native codegen'd rolling hash (graft.functions.RollingHash) —
    * identical values on BMP text, single fused loop per row. */
  def rollingHash(text: Column): Column =
    graft.functions.VectorFunctions.rolling_hash(text)

  // ---- driver-gate queries -----------------------------------------

  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        charCount(col("text")).as("n_chars_calc"),
        (charCount(col("text")).cast("long") === col("n_chars")).as("n_chars_match"),
        wordCount(col("text")).as("n_words"),
        round(avgWordLen(col("text")), 6).as("avg_word_len"))
      .orderBy("doc_id")

  val textStatsSql: String =
    """SELECT doc_id,
      | CAST(length(text) AS INT) AS n_chars_calc,
      | length(text) = n_chars AS n_chars_match,
      | CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT) AS n_words,
      | round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |       / (length(text) - length(replace(text, ' ', '')) + 1), 6) AS avg_word_len
      |FROM documents ORDER BY doc_id""".stripMargin

  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), predictLang(col("text")).as("predicted"))
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")

  val langIdSql: String = {
    def hits(l: String) =
      s"len(list_filter(toks, t -> t IN (${stopwords(l).map(s => s"'$s'").mkString(",")})))"
    s"""WITH t AS (SELECT lang, string_split(lower(text), ' ') AS toks FROM documents),
       |s AS (SELECT lang, ${hits("en")} AS s_en, ${hits("es")} AS s_es,
       |        ${hits("fr")} AS s_fr, ${hits("de")} AS s_de FROM t),
       |p AS (SELECT lang,
       |  CASE WHEN s_en >= greatest(s_es, s_fr, s_de) THEN 'en'
       |       WHEN s_es >= greatest(s_fr, s_de) THEN 'es'
       |       WHEN s_fr >= s_de THEN 'fr'
       |       ELSE 'de' END AS predicted FROM s)
       |SELECT lang, predicted, count(*) AS n FROM p
       |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
  }

  def langIdNgram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), predictLangNgram(col("text")).as("predicted"))
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")

  val langIdNgramSql: String = {
    def hits(l: String) = ngramProfiles(l)
      .map(g => s"CAST((length(t) - length(replace(t, '$g', ''))) / ${g.length} AS BIGINT)")
      .mkString(" + ")
    s"""WITH lo AS (SELECT lang, lower(text) AS t FROM documents),
       |s AS (SELECT lang, ${hits("en")} AS s_en, ${hits("es")} AS s_es,
       |        ${hits("fr")} AS s_fr, ${hits("de")} AS s_de FROM lo),
       |p AS (SELECT lang,
       |  CASE WHEN s_en >= greatest(s_es, s_fr, s_de) THEN 'en'
       |       WHEN s_es >= greatest(s_fr, s_de) THEN 'es'
       |       WHEN s_fr >= s_de THEN 'fr'
       |       ELSE 'de' END AS predicted FROM s)
       |SELECT lang, predicted, count(*) AS n FROM p
       |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
  }

  def quality(spark: SparkSession, dir: String): DataFrame =
    // UNROUNDED: the score is a pure function of the row computed by
    // an identical IEEE op sequence on both engines (bit-identical
    // doubles), while round(x, 6) itself diverges at display
    // boundaries (seen live at sf0.1: 0.501113 vs 0.501112)
    Tables.documents(spark, dir)
      .select(col("doc_id"), qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  val qualitySql: String = {
    val en = stopwords("en").map(s => s"'$s'").mkString(",")
    s"""WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents)
       |SELECT doc_id,
       |  -- parenthesized to the SAME op order as the Spark column
       |  -- (0.3 * (dist / len), not (0.3 * dist) / len) so the
       |  -- doubles are bit-identical and need no rounding
       |  0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
       |  + 0.3 * least((CAST(len(list_filter(toks, x -> x IN ($en))) AS DOUBLE)
       |                 / len(toks)) * 5.0, 1.0)
       |  + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) AS quality
       |FROM t ORDER BY doc_id""".stripMargin
  }

  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        fingerprintMd5(col("text")).as("fp_md5"),
        rollingHash(col("text")).as("fp_rolling"))
      .orderBy("doc_id")

  val fingerprintsSql: String =
    """WITH c AS (SELECT doc_id, text,
      |    [CAST(ascii(ch) AS BIGINT) FOR ch IN string_split(text, '')] AS codes
      |  FROM documents)
      |SELECT doc_id,
      | md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp_md5,
      | list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
      |             (acc, x) -> (acc * 131 + x) % 1000000007) AS fp_rolling
      |FROM c ORDER BY doc_id""".stripMargin

  /** Corpus TF-IDF, top-20 weighted terms: tokenize on non-letters,
    * term frequency per (doc, term), document frequency per term,
    * idf = ln(N/df). Shuffle shape at scale: explode feeds a
    * map-side-combinable groupBy(doc, term); df is a second combine
    * over tf's output (already term-keyed); the tf⋈df join shuffles
    * on term; N rides in as a broadcast 1-row aggregate; the top-20
    * plans TakeOrderedAndProject. No all-pairs step anywhere. */
  def tfidf(spark: SparkSession, dir: String): DataFrame =
    tfidfOf(Tables.documents(spark, dir))

  def tfidfOf(docs: DataFrame): DataFrame = {
    // per-doc tf computed row-locally (TermCounts): the (doc, term)
    // shuffle that only ever collided within a document is gone; the
    // distinct-term stream feeding df/idf is unchanged
    val tf = docs.select(col("doc_id"),
        explode(graft.functions.VectorFunctions.term_counts(
          filter(split(lower(col("text")), "[^a-z]+"), t => length(t) > 0)))
          .as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .select("doc_id", "term", "tf", "df", "tfidf")
      .orderBy(col("tfidf").desc, col("doc_id").asc, col("term").asc)
      .limit(20)
  }

  val tfidfSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM toks
      |  WHERE length(term) > 0 GROUP BY doc_id, term
      |), dfreq AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY term
      |), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
      |SELECT doc_id, term, tf, df,
      |  round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      |FROM tf JOIN dfreq USING (term), n
      |ORDER BY tfidf DESC, doc_id ASC, term ASC LIMIT 20""".stripMargin

  /** PII scrubbing — the redaction pass a training-data pipeline runs
    * before anything ships: count then replace emails and phone
    * numbers with typed placeholders, pure regexp expression
    * composition (codegen'd, embarrassingly parallel). The synthetic
    * corpus carries no PII, so the gate PLANTS deterministic
    * doc_id-derived contact strings on both engines and proves the
    * scrub removes exactly them — the operator is exercised on
    * matching input, not vacuously green on clean text. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\d{3}-\\d{4}-\\d{4}"

  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(emailPattern), lit("<EMAIL>")),
      lit(phonePattern), lit("<PHONE>"))

  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(
      substring(col("text"), 1, 40),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or 555-"),
      lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
      lit("-9876 thanks"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(regexp_extract_all(planted, lit(emailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(planted, lit(phonePattern), lit(0))).as("n_phones"),
      scrubPii(planted).as("scrubbed"))
      .orderBy("doc_id")
  }

  val piiScrubSql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    substring(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
      |      || '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      || '-9876 thanks' AS txt
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(txt, '\d{3}-\d{4}-\d{4}')) AS INT) AS n_phones,
      |  regexp_replace(regexp_replace(txt,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\d{3}-\d{4}-\d{4}', '<PHONE>', 'g') AS scrubbed
      |FROM planted ORDER BY doc_id""".stripMargin

  /** Deterministic stratified source mixing — the "mix 30% web, 60%
    * code" primitive of training-data assembly: each source keeps a
    * source-dependent fraction of docs chosen by md5-prefix on the
    * doc id (portable, seedless, rerun-stable — q70's idiom with
    * per-stratum thresholds). Pure filter + combinable agg: no
    * shuffle before the final per-source rollup, scales trivially. */
  def stratifiedMix(spark: SparkSession, dir: String): DataFrame = {
    val tier = pmod(regexp_extract(col("source"), "(\\d+)", 1).cast("int"), lit(4))
    val thr = element_at(array(lit("20"), lit("40"), lit("80"), lit("c0")), tier + 1)
    Tables.documents(spark, dir)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < thr)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("chars_sampled"))
      .orderBy("source")
  }

  val stratifiedMixSql: String =
    """WITH d AS (
      |  SELECT *, CAST(regexp_extract(source, '(\d+)', 1) AS INT) % 4 AS tier
      |  FROM documents
      |)
      |SELECT source, count(*) AS n_sampled,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_sampled
      |FROM d
      |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < (['20','40','80','c0'])[tier + 1]
      |GROUP BY source ORDER BY source""".stripMargin

  /** Per-source running token total over (source, doc_id) order,
    * computed as a two-phase distributed prefix sum. The obvious
    * `sum().over(Window.partitionBy(source).orderBy(doc_id))` puts a
    * source's ENTIRE history on one task (window partitions never
    * split), and source cardinality is small — at 100 TB that is one
    * task per source doing a terabyte-sized sort. Here instead:
    *
    *  1. range-repartition + sort on (source, doc_id) — the same
    *     shuffle the window would need, but the data stays spread
    *     over ALL partitions (a source may span many);
    *  2. one per-partition pass folds each partition's per-source
    *     token totals; only (partition, source, total) rows — ≤
    *     partitions × sources — come to the driver, which prefix-sums
    *     them into per-(partition, source) start offsets;
    *  3. a second per-partition pass emits each row's running total
    *     as offset + local prefix.
    *
    * The eager localCheckpoint freezes the partition layout between
    * the two passes (a recompute could re-sample different range
    * bounds, silently pairing offsets with the wrong partitions). */
  def runningTokenTotals(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sorted = docs
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .select(col("doc_id").cast("long"), col("source"), col("n_tokens"))
      .as[(Long, String, Int)]
      .repartitionByRange(col("source"), col("doc_id"))
      .sortWithinPartitions("source", "doc_id")
      .localCheckpoint(true)
    val partials: Array[(Int, String, Long)] = sorted
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val totals = scala.collection.mutable.LinkedHashMap[String, Long]()
        it.foreach { case (_, src, n) => totals(src) = totals.getOrElse(src, 0L) + n }
        totals.iterator.map { case (s, t) => (pid, s, t) }
      }.collect()
    val offsets: Map[(Int, String), Long] = partials
      .groupBy(_._2).iterator.flatMap { case (src, rows) =>
        var cum = 0L
        rows.sortBy(_._1).map { case (pid, _, t) =>
          val off = cum; cum += t; (pid, src) -> off
        }
      }.toMap
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val cum = scala.collection.mutable.HashMap[String, Long]()
      it.map { case (id, src, n) =>
        val c = cum.getOrElse(src, bcOffsets.value.getOrElse((pid, src), 0L)) + n
        cum(src) = c
        (id, src, n, c)
      }
    }.toDF("doc_id", "source", "n_tokens", "cum_tokens")
  }

  /** Per-source token budgeting — fill each source's slice of a
    * training mix in deterministic doc order until the token budget
    * is spent: the scalable prefix sum above, then a plain filter on
    * the running total. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame =
    runningTokenTotals(Tables.documents(spark, dir))
      .filter(col("cum_tokens") <= 400)
      .orderBy("doc_id")

  val tokenBudgetSql: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      |  FROM t
      |)
      |SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
      |FROM c WHERE cum_tokens <= 400 ORDER BY doc_id""".stripMargin

  // ---- temperature-weighted source mixing --------------------------
  // α-sampling (the XLM / multilingual-rebalancing primitive, Lample &
  // Conneau 2019): source s with n_s docs gets a doc quota ∝ n_s^α —
  // α<1 upweights small sources relative to their natural share. The
  // quotas sum EXACTLY to the requested budget via deterministic
  // largest-remainder apportionment (floor the ideal shares, hand the
  // leftovers to the largest remainders, remainder-then-source order),
  // and each source keeps its first quota docs in (md5(doc_id),
  // doc_id) order — the corpus-stable seedless shuffle idiom of
  // q70/q82. Plan shape for 100 TB: the per-source counts are one
  // combinable agg collapsing to #sources rows (driver apportionment
  // is bounded and trivially cheap); selection ranks docs per source
  // with the SAME two-phase prefix pattern as runningTokenTotals —
  // weight-1 counting instead of token sums — so no per-source
  // single-task window anywhere. A quota larger than a source (budget
  // ≳ corpus) just keeps the whole source and under-fills the budget.
  def temperatureMixOf(docs: DataFrame, alpha: Double = 0.5,
                       budget: Long = 60): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // driver apportionment over the tiny (source, n_docs) table;
    // source-ascending fold order keeps the float sum deterministic
    val counts: Array[(String, Long)] = docs
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .as[(String, Long)].collect().sortBy(_._1)
    // α=0.5 → sqrt, which is IEEE-correctly-rounded on BOTH engines
    // (Math.pow(x, 0.5) is only 1-ulp-accurate; sqrt is exact)
    val wts = counts.map { case (s, n) =>
      (s, if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha))
    }
    val tw = wts.iterator.map(_._2).sum
    val shares = wts.map { case (s, w) =>
      val ideal = budget * w / tw
      (s, math.floor(ideal).toLong, ideal - math.floor(ideal))
    }
    val leftover = (budget - shares.iterator.map(_._2).sum).toInt
    val bumped = shares.sortBy { case (s, _, rem) => (-rem, s) }
      .take(leftover).map(_._1).toSet
    val quotas: Map[String, Long] = shares.map { case (s, base, _) =>
      s -> (base + (if (bumped(s)) 1L else 0L))
    }.toMap
    val bcQuotas = spark.sparkContext.broadcast(quotas)

    // per-source rank in (md5, doc_id) order: two-phase prefix count
    // (see runningTokenTotals for why not a per-source window)
    val keyed = docs
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("k"))
      .as[(Long, String, String)]
      .repartitionByRange(col("source"), col("k"), col("doc_id"))
      .sortWithinPartitions("source", "k", "doc_id")
      .localCheckpoint(true)
    val partials: Array[(Int, String, Long)] = keyed
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val n = scala.collection.mutable.LinkedHashMap[String, Long]()
        it.foreach { case (_, src, _) => n(src) = n.getOrElse(src, 0L) + 1L }
        n.iterator.map { case (s, t) => (pid, s, t) }
      }.collect()
    val offsets: Map[(Int, String), Long] = partials
      .groupBy(_._2).iterator.flatMap { case (src, rows) =>
        var cum = 0L
        rows.sortBy(_._1).map { case (pid, _, t) =>
          val off = cum; cum += t; (pid, src) -> off
        }
      }.toMap
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    keyed.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val cum = scala.collection.mutable.HashMap[String, Long]()
      it.flatMap { case (id, src, _) =>
        val r = cum.getOrElse(src, bcOffsets.value.getOrElse((pid, src), 0L)) + 1L
        cum(src) = r
        val q = bcQuotas.value.getOrElse(src, 0L)
        if (r <= q) Some((id, src, r, q)) else None
      }
    }.toDF("doc_id", "source", "rank", "quota")
      .orderBy("doc_id")
  }

  /** Gate query: the corpus's per-source counts are uniform at every
    * SF (α-weighting would be degenerate), so the gate first applies
    * q82's deterministic tier filter to create a SKEWED corpus — tier
    * thresholds keep ~12/25/50/75% per source — then α=0.5-mixes 60
    * docs from it. Small (heavily-filtered) sources must end up with
    * a larger quota share than their doc share. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val tier = pmod(regexp_extract(col("source"), "(\\d+)", 1).cast("int"), lit(4))
    val thr = element_at(array(lit("20"), lit("40"), lit("80"), lit("c0")), tier + 1)
    val skewed = Tables.documents(spark, dir)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < thr)
    temperatureMixOf(skewed, alpha = 0.5, budget = 60)
  }

  val temperatureMixSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(regexp_extract(source, '(\d+)', 1) AS INT) % 4 AS tier
      |  FROM documents
      |), skewed AS (
      |  SELECT doc_id, source FROM d
      |  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
      |    < (['20','40','80','c0'])[tier + 1]
      |), n AS (SELECT source, count(*) AS n_docs FROM skewed GROUP BY 1),
      |w AS (SELECT source, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS wt FROM n),
      |t AS (SELECT sum(wt) AS tw FROM w),
      |q AS (SELECT source, 60 * wt / tw AS ideal,
      |        floor(60 * wt / tw) AS base,
      |        60 * wt / tw - floor(60 * wt / tw) AS rem
      |      FROM w, t),
      |alloc AS (
      |  SELECT source, CAST(base AS BIGINT)
      |    + CASE WHEN row_number() OVER (ORDER BY rem DESC, source ASC)
      |        <= 60 - (SELECT CAST(sum(base) AS BIGINT) FROM q)
      |      THEN 1 ELSE 0 END AS quota
      |  FROM q
      |), r AS (
      |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM skewed
      |)
      |SELECT doc_id, source, CAST(rk AS BIGINT) AS rank, quota
      |FROM r JOIN alloc USING (source)
      |WHERE rk <= quota ORDER BY doc_id""".stripMargin

  // ---- Gopher-style repetition quality filter ----------------------
  // Per-document repetition metrics in the shape of the published
  // Gopher corpus rules (Rae et al. 2021, "Scaling Language Models"),
  // adapted to this corpus (no newlines/punctuation in the synthetic
  // docs, so the line- and symbol-based rules are vacuous here):
  // fraction of tokens covered by the most frequent 2-gram, duplicate
  // -word fraction, and a minimum word count, combined into a
  // keep/drop flag. Plan shape for 100 TB: every metric — including
  // the most-frequent-bigram count, via the codegen'd TopBigramCount
  // expression — is ROW-LOCAL, so the whole filter is one map-only
  // pass with zero shuffle. (The previous explode → count(doc, gram)
  // → max(doc) formulation shuffled every token twice: 23.8s → 6.4s
  // at 1M docs, the remainder being the final global sort.)
  def repetitionStats(spark: SparkSession, dir: String): DataFrame =
    repetitionStatsOf(Tables.documents(spark, dir))

  def repetitionStatsOf(docs: DataFrame): DataFrame = {
    val stats = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_words"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        graft.functions.VectorFunctions.top_bigram_count(col("toks")).as("top_c"))
    // both ratios are exact-integer quotients — bit-identical across
    // engines, so the keep-flag threshold compares cannot flip
    val t2 = lit(2.0) * col("top_c") / col("n_words")
    val dwf = lit(1.0) - col("n_distinct").cast("double") / col("n_words")
    stats
      .select(col("doc_id"), col("n_words"),
        round(t2, 6).as("top2gram_frac"),
        round(dwf, 6).as("dup_word_frac"),
        (col("n_words") >= 30 && t2 < 0.125 && dwf < 0.6).as("keep"))
      .orderBy("doc_id")
  }

  val repetitionStatsSql: String =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |        i -> toks[i] || ' ' || toks[i+1])) AS gram
      |      FROM t WHERE len(toks) >= 2),
      |top AS (SELECT doc_id, max(c) AS top_c
      |        FROM (SELECT doc_id, gram, count(*) AS c FROM b GROUP BY 1, 2)
      |        GROUP BY 1),
      |m AS (SELECT t.doc_id, len(toks) AS n_words,
      |        2.0 * coalesce(top_c, 0) / len(toks) AS t2,
      |        1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dwf
      |      FROM t LEFT JOIN top USING (doc_id))
      |SELECT doc_id, CAST(n_words AS INT) AS n_words,
      | round(t2, 6) AS top2gram_frac, round(dwf, 6) AS dup_word_frac,
      | (n_words >= 30 AND t2 < 0.125 AND dwf < 0.6) AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  // ---- overlapping chunking ----------------------------------------
  // Split each document into overlapping token windows (size W,
  // stride S) with token offsets — the chunking primitive RAG
  // ingestion and long-context training both start from. Entirely
  // row-local (one explode, no shuffle, no state): each row expands
  // to ceil(max(n - overlap, 1) / stride) chunks, so the op is
  // embarrassingly parallel at any corpus size. The last chunk keeps
  // the tail even when shorter than W.
  def chunkDocuments(spark: SparkSession, dir: String,
      window: Int = 40, stride: Int = 30): DataFrame = {
    require(stride > 0 && window >= stride,
      "need stride > 0 and window >= stride")
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_tokens"), posexplode(expr(
        s"""transform(
           |  sequence(0, greatest(cast(ceil((size(toks) - $window) / $stride) as int), 0)),
           |  i -> concat_ws(' ', slice(toks, i * $stride + 1, $window)))""".stripMargin))
        .as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("start_token"),
        size(split(col("chunk_text"), " ")).as("chunk_tokens"),
        col("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  val chunkDocumentsSql: String =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    unnest(range(0, greatest(CAST(ceil((len(toks) - 40) / 30.0) AS INT), 0) + 1))
      |      AS chunk_idx,
      |    toks
      |  FROM t
      |)
      |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
      | CAST(chunk_idx * 30 AS BIGINT) AS start_token,
      | CAST(len(toks[chunk_idx * 30 + 1 : chunk_idx * 30 + 40]) AS INT) AS chunk_tokens,
      | array_to_string(toks[chunk_idx * 30 + 1 : chunk_idx * 30 + 40], ' ') AS chunk_text
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ---- collocation mining ------------------------------------------
  // Corpus-level collocation scoring — the phrase-mining /
  // tokenizer-vocabulary primitive: bigrams whose observed frequency
  // beats the independence expectation, scored by lift
  // c12·N / (c1·c2) (PMI without the log — log(x) last-ulp behavior
  // differs across libm implementations; lift is a single IEEE
  // divide of exactly-derived doubles, bit-identical on both
  // engines). Plan shape for 100 TB: two explode → combinable-agg
  // passes (row-linear, map-side combined), the unigram table joined
  // in twice by token key (shuffle equi-joins — vocabulary can be
  // millions of rows, so no broadcast hint; AQE may still choose
  // one), a min-count floor BEFORE the joins, and a global top-30
  // that plans TakeOrderedAndProject. N comes off the tiny
  // checkpointed bigram aggregate as a driver scalar.
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir).select(tokens(col("text")).as("toks"))
    // total bigram count directly from the token counts — one cheap
    // scan instead of materializing the bigram aggregate twice (the
    // previous eager localCheckpoint held the whole aggregate in
    // executor memory for the rest of a bench suite)
    val nRow = toks.agg(sum(when(size(col("toks")) >= 2,
      (size(col("toks")) - 1).cast("long")).otherwise(lit(0L)))).head()
    require(!nRow.isNullAt(0), "collocations: no documents in " + dir)
    val n = nRow.getLong(0)
    // per-doc multiplicities collapse in the row (codegen'd
    // BigramCounts / TermCounts — the q78/q122/q124 pattern): both
    // aggregates consume distinct-key-per-doc streams with counts
    // instead of one row per occurrence, and the bigram key stays
    // (w1, w2) end-to-end — no concat/split_part round trip
    val bi = toks.filter(size(col("toks")) >= 2)
      .select(explode(
        graft.functions.VectorFunctions.bigram_counts(col("toks"))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(sum(col("b.tf")).as("c12"))
    val uni = toks.select(explode(
        graft.functions.VectorFunctions.term_counts(col("toks"))).as("tc"))
      .groupBy(col("tc.term").as("w")).agg(sum(col("tc.tf")).as("c"))
    val u1 = uni.select(col("w").as("w1"), col("c").as("c1"))
    val u2 = uni.select(col("w").as("w2"), col("c").as("c2"))
    bi.filter(col("c12") >= 5)
      .join(u1, "w1").join(u2, "w2")
      .select(col("w1"), col("w2"), col("c12"),
        round(col("c12").cast("double") * lit(n) /
          (col("c1").cast("double") * col("c2")), 6).as("lift"))
      .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
      .limit(30)
  }

  val collocationsSql: String =
    """WITH t AS (SELECT string_split(lower(text), ' ') AS toks FROM documents),
      |g AS (SELECT unnest(list_transform(range(1, len(toks)),
      |        i -> toks[i] || ' ' || toks[i+1])) AS gram
      |      FROM t WHERE len(toks) >= 2),
      |bi AS (SELECT gram, count(*) AS c12 FROM g GROUP BY 1),
      |n AS (SELECT CAST(sum(c12) AS BIGINT) AS nb FROM bi),
      |u AS (SELECT w, count(*) AS c
      |      FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1)
      |SELECT split_part(gram, ' ', 1) AS w1, split_part(gram, ' ', 2) AS w2,
      | CAST(c12 AS BIGINT) AS c12,
      | round(CAST(c12 AS DOUBLE) * nb / (CAST(u1.c AS DOUBLE) * u2.c), 6) AS lift
      |FROM bi, n
      |JOIN u u1 ON u1.w = split_part(gram, ' ', 1)
      |JOIN u u2 ON u2.w = split_part(gram, ' ', 2)
      |WHERE c12 >= 5
      |ORDER BY lift DESC, w1, w2 LIMIT 30""".stripMargin

  // ---- sequence packing --------------------------------------------
  // The final assembly step of a pretraining-data pipeline: lay the
  // corpus out as one deterministic token stream (doc_id order) and
  // cut it into fixed-length training sequences, documents crossing
  // chunk boundaries (the standard "packed" pretraining layout).
  // Emits, per document, its start offset in the stream and the chunk
  // span it lands on.
  //
  // Plan shape for 100 TB: the global running offset is the same
  // two-phase distributed prefix sum as runningTokenTotals — a range
  // repartition keeps the stream spread over ALL partitions, one
  // (partition, total) row per partition reaches the driver, and the
  // chunk arithmetic is row-local on top. The naive
  // Window.orderBy(doc_id) global cumsum would sort the entire corpus
  // on ONE task.
  def packSequencesOf(docs: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val sorted = docs
      .select(col("doc_id").cast("long"), size(tokens(col("text"))).as("n_tokens"))
      .as[(Long, Int)]
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .localCheckpoint(true)
    val partials: Array[(Int, Long)] = sorted
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var t = 0L
        it.foreach { case (_, n) => t += n }
        Iterator.single((pid, t))
      }.collect()
    val offsets: Map[Int, Long] = {
      var cum = 0L
      partials.sortBy(_._1).map { case (pid, t) =>
        val off = cum; cum += t; pid -> off
      }.toMap
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cum = bcOffsets.value.getOrElse(pid, 0L)
      it.map { case (id, n) =>
        val start = cum
        cum += n
        // a whitespace-split array is never empty, so n >= 1 and the
        // inclusive last-token offset start + n - 1 is well defined
        (id, n, start, start / seqLen, (start + n - 1) / seqLen)
      }
    }.toDF("doc_id", "n_tokens", "start_offset", "first_chunk", "last_chunk")
      .withColumn("n_chunks",
        (col("last_chunk") - col("first_chunk") + lit(1L)).cast("int"))
  }

  def packSequences(spark: SparkSession, dir: String): DataFrame =
    packSequencesOf(Tables.documents(spark, dir), 256).orderBy("doc_id")

  val packSequencesSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS start_offset
      |  FROM t
      |)
      |SELECT doc_id, n_tokens, start_offset,
      |  CAST(start_offset // 256 AS BIGINT) AS first_chunk,
      |  CAST((start_offset + n_tokens - 1) // 256 AS BIGINT) AS last_chunk,
      |  CAST((start_offset + n_tokens - 1) // 256 - start_offset // 256 + 1 AS INT)
      |    AS n_chunks
      |FROM c ORDER BY doc_id""".stripMargin

  // ---- benchmark decontamination ----------------------------------
  // The training-pipeline op that keeps eval sets out of the corpus:
  // per-document n-gram-shingle overlap against a benchmark set
  // (docs 0-9 stand in for the benchmark here; 3-gram shingles fit
  // this corpus' ~30-word vocabulary — real pipelines use 8-13-gram
  // windows, same plan). Plan shape for 100 TB: the benchmark shingle
  // set is SMALL by definition (eval sets are), so it broadcasts into
  // a left-semi probe; the corpus side is one explode + two
  // combinable hash aggs keyed by doc_id — row-linear, no all-pairs.
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    def shingles(df: DataFrame): DataFrame = df
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', slice(toks, i + 1, 3)))"))
        .as("s"))
      .distinct()
    val docs = Tables.documents(spark, dir)
    val bench = shingles(docs.filter(col("doc_id") < 10)).select("s").distinct()
    val corpus = shingles(docs.filter(col("doc_id") >= 10))
    val totals = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hits = corpus.join(broadcast(bench), Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    val frac = coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_shingles")
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(frac, 6).as("overlap_frac"),
        (frac >= 0.2).as("contaminated"))
      .orderBy("doc_id")
  }

  val decontaminateSql: String =
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(t) - 1),
      |           i -> array_to_string(t[i:i+2], ' '))) AS s
      |       FROM toks WHERE len(t) >= 3),
      |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 10),
      |m AS (SELECT doc_id, count(*) AS n_shingles,
      |        count(*) FILTER (s IN (SELECT s FROM bench)) AS n_hit
      |      FROM sh WHERE doc_id >= 10 GROUP BY 1)
      |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
      | CAST(n_hit AS BIGINT) AS n_hit,
      | round(1.0 * n_hit / n_shingles, 6) AS overlap_frac,
      | 1.0 * n_hit / n_shingles >= 0.2 AS contaminated
      |FROM m ORDER BY doc_id""".stripMargin

  // ---- inverted index ----------------------------------------------
  // Posting-list materialization — the retrieval-side primitive of a
  // corpus pipeline (BM25 lookup, contamination probes, targeted
  // re-crawl all start from term → documents). Plan shape for 100 TB:
  // one row-local explode of per-doc DISTINCT terms, then a single
  // combinable aggregation where the df count AND the bounded posting
  // list both map-side combine — BoundedMinListAggregator caps every
  // agg buffer at k ids, so a stopword key costs k longs, not the
  // corpus (see the aggregator scaladoc for why collect_list and
  // windows don't survive this). Global top-50 plans
  // TakeOrderedAndProject.
  def invertedIndexOf(docs: DataFrame, k: Int = 20, topTerms: Int = 50): DataFrame =
    docs
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        graft.functions.BoundedMinList.minList(col("doc_id"), k).as("plist"))
      // CSV render of the posting array: the oracle gate hashes scalar
      // columns (array cells don't sort/hash portably across engines)
      .select(col("term"), col("df"),
        array_join(transform(col("plist"), _.cast("string")), ",").as("postings"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(topTerms)

  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    invertedIndexOf(Tables.documents(spark, dir))

  val invertedIndexSql: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |           FROM documents),
      |d AS (SELECT DISTINCT doc_id, term FROM w)
      |SELECT term, CAST(count(*) AS BIGINT) AS df,
      | array_to_string(list_sort(list(doc_id))[1:20], ',') AS postings
      |FROM d GROUP BY term ORDER BY df DESC, term ASC LIMIT 50""".stripMargin

  // ---- character-bigram LM quality score ---------------------------
  // CCNet-style LM quality filtering without the external model: train
  // a char-bigram language model ON the corpus itself (one combinable
  // agg pass over exploded bigrams — the model is at most 27×27 rows
  // over [a-z ]), then score every document by its mean bigram
  // probability avg p(c2|c1). Natural text scores near the corpus
  // mode; gibberish / wrong-alphabet / boilerplate-free-noise docs sit
  // in the low tail, exactly where a perplexity filter would put them.
  // Log-free on purpose: log(x) last-ulp behavior differs across libm
  // implementations (the q105 lesson) while each p is one IEEE divide
  // of exactly-derived longs — cross-engine-stable under round(6).
  // Plan shape for 100 TB: bigram explode is row-local; both model
  // aggs map-side combine; the ≤729-row model broadcast-joins to the
  // per-doc bigram stream; the final per-doc avg is combinable.
  /** Train the ≤729-entry char-bigram model on the corpus and collect
    * it: one combinable agg pass; the result array is broadcast-sized
    * by construction. Shared by the LM score query and the filter
    * funnel. */
  def charLmModel(docs: DataFrame): Array[Double] = {
    // one custom-aggregate pass over the normalized strings (no
    // per-bigram row explosion — see CharBigramCountsAggregator);
    // counts are bit-identical to the exploded groupBy formulation,
    // so the p divides (and every downstream score) are unchanged
    val counts: Seq[Long] = docs
      .select(regexp_replace(lower(col("text")), "[^a-z ]", "").as("s"))
      .filter(length(col("s")) >= 2)
      .agg(graft.functions.CharBigramCounts.udafFn(col("s")).as("m"))
      .head().getSeq[Long](0)
    val parr = new Array[Double](729)
    var i = 0
    while (i < 27) {
      var c1 = 0L
      var j = 0
      while (j < 27) { c1 += counts(i * 27 + j); j += 1 }
      if (c1 > 0L) {
        j = 0
        while (j < 27) {
          val c12 = counts(i * 27 + j)
          if (c12 > 0L) parr(i * 27 + j) = c12.toDouble / c1.toDouble
          j += 1
        }
      }
      i += 1
    }
    parr
  }

  def charLmScoreOf(docs: DataFrame): DataFrame = {
    // the model is ≤729 rows — collect it and score ROW-LOCALLY with
    // the codegen'd CharBigramScore expression (one map-only pass; the
    // explode+join+re-agg formulation of the same score measured ~3×
    // slower at 1M docs). p values are the identical IEEE divides the
    // join would compute; summation order is the document's, rounded.
    val parr = charLmModel(docs)
    docs
      .select(col("doc_id"),
        regexp_replace(lower(col("text")), "[^a-z ]", "").as("s"))
      .filter(length(col("s")) >= 2)
      .select(col("doc_id"), (length(col("s")) - 1).cast("long").as("n_bigrams"),
        round(graft.functions.VectorFunctions.char_bigram_score(
          col("s"), parr.toIndexedSeq), 6).as("lm_score"))
      .orderBy("doc_id")
  }

  def charLmScore(spark: SparkSession, dir: String): DataFrame =
    charLmScoreOf(Tables.documents(spark, dir))

  val charLmScoreSql: String =
    """WITH t AS (SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', '', 'g') AS s
      |           FROM documents),
      |b AS (SELECT doc_id, unnest(list_transform(range(1, length(s)),
      |        i -> substr(s, i, 2))) AS bg
      |      FROM t WHERE length(s) >= 2),
      |m AS (SELECT bg, count(*) AS c12 FROM b GROUP BY 1),
      |u AS (SELECT substr(bg, 1, 1) AS c1ch, sum(c12) AS c1 FROM m GROUP BY 1),
      |p AS (SELECT bg, CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p
      |      FROM m JOIN u ON substr(bg, 1, 1) = c1ch)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      | round(avg(p), 6) AS lm_score
      |FROM b JOIN p USING (bg) GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- BM25 retrieval ----------------------------------------------
  // Okapi BM25 top-k over the corpus for a literal query — the scoring
  // half of the retrieval pair (q113's inverted index is the lookup
  // half); contamination probes and RAG-style corpus search both rank
  // with exactly this formula. Plan shape for 100 TB: the ONLY
  // corpus-sized work is two combinable aggregations over the token
  // stream (per-doc length; per-(doc, query-term) tf with the term
  // filter applied BEFORE the aggregation, so the shuffled tf table is
  // |query|-bounded, not vocabulary-sized). df and the (N, avgdl)
  // stats are tiny and broadcast; the per-doc score sum is combinable;
  // the top-k plans TakeOrderedAndProject. Deliberately re-scans the
  // parquet for the two token passes instead of caching the exploded
  // stream (measured slower to cache — see exactPercentileHist note).
  // Scores are rounded to 4dp and ties break on doc_id, so the
  // ordering is cross-engine-deterministic despite the ln in idf.
  def bm25TopKOf(docs: DataFrame, queryTerms: Seq[String], k: Int = 15,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // every per-document quantity is ROW-LOCAL on the token array:
    // dl = size(toks) (the old explode+groupBy re-derived exactly
    // this), per-query-term tf = one array filter per term with dl
    // riding the same row (the old dl join gone). The only corpus
    // aggregates left are the tiny (n_docs, avgdl) pair and the
    // |query|-bounded df — the operator is map-only until the final
    // combinable per-doc sum + TakeOrdered. Counts match the exploded
    // formulation exactly; docs with zero surviving tokens stay
    // excluded from the stats like before.
    // duplicate query terms would emit one struct row per occurrence
    // (inflating df and double-counting the term's contribution) —
    // dedup up front so the public API matches the old isin+groupBy
    // formulation for any caller.
    val terms = queryTerms.distinct
    val base = docs
      .select(col("doc_id"),
        filter(tokens(col("text")), t => length(t) > 0).as("toks"))
      .filter(size(col("toks")) > 0)
    val stats = base.agg(count(lit(1)).as("n_docs"),
      avg(size(col("toks"))).as("avgdl"))
    val qtf = base
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(array(terms.map(t => struct(lit(t).as("term"),
          size(filter(col("toks"), x => x === lit(t))).cast("long").as("tf"))): _*))
          .as("s"))
      .select(col("doc_id"), col("dl"), col("s.term"), col("s.tf"))
      .where(col("tf") > 0)
    val qdf = qtf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val norm = col("tf") +
      lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    qtf.join(broadcast(qdf), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), (idf * col("tf") * (k1 + 1) / norm).as("contrib"))
      .groupBy("doc_id")
      .agg(round(sum(col("contrib")), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Gate query: a 3-term query mixing one rare term ("dup", df≈25 at
    * every SF — idf carries the ranking) with two common ones. */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    bm25TopKOf(Tables.documents(spark, dir), Seq("dup", "customer", "stream"))

  val bm25TopKSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents
      |), toks2 AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY 1),
      |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      |qtf AS (SELECT doc_id, term, count(*) AS tf FROM toks2
      |        WHERE term IN ('dup', 'customer', 'stream') GROUP BY 1, 2),
      |qdf AS (SELECT term, count(*) AS df FROM qtf GROUP BY 1)
      |SELECT doc_id,
      |  round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
      |            * tf * 2.2
      |            / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
      |FROM qtf JOIN qdf USING (term) JOIN dl USING (doc_id), stats
      |GROUP BY doc_id ORDER BY bm25 DESC, doc_id ASC LIMIT 15""".stripMargin

  // ---- URL / domain analysis ---------------------------------------
  // The domain-level accounting step of a web-corpus pipeline: extract
  // URLs, reduce hosts to their registered domain, and report per
  // -domain url/doc counts with a blocklist flag — what you feed a
  // domain-mixing policy or a blocklist review. The synthetic corpus
  // carries no URLs, so the gate PLANTS deterministic doc_id-derived
  // URLs on both engines (the q80 piiScrub idiom: exercised on
  // matching input, not vacuously green). Plan shape for 100 TB:
  // regexp extraction and host parsing are row-local; one combinable
  // aggregation keyed by registered domain (web domain counts are
  // zipfian — the heavy key is exactly what map-side combine absorbs);
  // the blocklist is a literal isin here, a broadcast left-semi for
  // real blocklists (q93's decontamination shape).
  val urlPattern = "https?://[a-z0-9.-]+"

  /** host → registered domain (last two dot-labels). */
  def registeredDomain(host: Column): Column =
    concat_ws(".", slice(split(host, "\\."), -2, 2))

  def urlDomainReport(spark: SparkSession, dir: String): DataFrame = {
    val blocklist = Seq("ads0.net", "ads1.net", "ads2.net")
    val planted = concat(col("text"),
      lit(" visit https://www.site"),
      pmod(col("doc_id"), lit(20L)).cast("string"),
      lit(".com/p"), col("doc_id").cast("string"),
      lit(" and http://cdn.ads"),
      pmod(col("doc_id"), lit(5L)).cast("string"),
      lit(".net/track"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(
        regexp_extract_all(planted, lit(urlPattern), lit(0))).as("url"))
      .select(col("doc_id"),
        registeredDomain(regexp_extract(col("url"), "https?://([a-z0-9.-]+)", 1))
          .as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"))
      .withColumn("blocked", col("domain").isin(blocklist: _*))
      .orderBy("domain")
  }

  val urlDomainReportSql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    text || ' visit https://www.site' || CAST(doc_id % 20 AS VARCHAR)
      |      || '.com/p' || CAST(doc_id AS VARCHAR)
      |      || ' and http://cdn.ads' || CAST(doc_id % 5 AS VARCHAR)
      |      || '.net/track' AS txt
      |  FROM documents
      |), urls AS (
      |  SELECT doc_id, unnest(regexp_extract_all(txt, 'https?://[a-z0-9.-]+')) AS url
      |  FROM planted
      |), doms AS (
      |  SELECT doc_id, array_to_string(
      |    string_split(regexp_extract(url, 'https?://([a-z0-9.-]+)', 1), '.')[-2:],
      |    '.') AS domain
      |  FROM urls
      |)
      |SELECT domain, count(*) AS n_urls,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  domain IN ('ads0.net', 'ads1.net', 'ads2.net') AS blocked
      |FROM doms GROUP BY domain ORDER BY domain""".stripMargin

  // ---- corpus filter funnel ----------------------------------------
  // The report a production filtering pipeline actually emits: run the
  // quality rules as an ORDERED funnel and account every document to
  // its first failing rule — Gopher min-words, top-2-gram repetition,
  // duplicate-word fraction (q92's thresholds), then the char-bigram
  // LM floor (q114's score). Per-stage counts are what you tune
  // thresholds against and what you monitor release-over-release.
  // Plan shape for 100 TB: one corpus pass trains the ≤729-entry LM
  // model (combinable aggs, bounded collect); the funnel itself is ONE
  // map-only pass — every rule metric is row-local via the codegen'd
  // TopBigramCount and CharBigramScore expressions — feeding a ≤5-row
  // combinable count. No join, no window, nothing doc-keyed shuffles.
  // Rule metrics reuse the exact arithmetic of q92/q114, so the stage
  // assignment is cross-engine-deterministic (integer quotients;
  // CharBigramScore is null below 2 normalized chars on both engines,
  // and null comparisons fall through to kept identically).
  def filterFunnelOf(docs: DataFrame): DataFrame = {
    val parr = charLmModel(docs)
    val toks = tokens(col("text"))
    val nWords = size(toks)
    val t2 = lit(2.0) * graft.functions.VectorFunctions.top_bigram_count(toks) / nWords
    val dwf = lit(1.0) - size(array_distinct(toks)).cast("double") / nWords
    val lm = round(graft.functions.VectorFunctions.char_bigram_score(
      regexp_replace(lower(col("text")), "[^a-z ]", ""), parr.toIndexedSeq), 6)
    val stage = when(nWords < 30, "1_min_words")
      .when(t2 >= 0.125, "2_repetition")
      .when(dwf >= 0.6, "3_dup_words")
      .when(lm < 0.23, "4_lm_score")
      .otherwise("5_kept")
    docs.select(stage.as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_docs"))
      .orderBy("stage")
  }

  def filterFunnel(spark: SparkSession, dir: String): DataFrame =
    filterFunnelOf(Tables.documents(spark, dir))

  val filterFunnelSql: String =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |        i -> toks[i] || ' ' || toks[i+1])) AS gram
      |      FROM t WHERE len(toks) >= 2),
      |top AS (SELECT doc_id, max(c) AS top_c
      |        FROM (SELECT doc_id, gram, count(*) AS c FROM b GROUP BY 1, 2)
      |        GROUP BY 1),
      |rep AS (SELECT t.doc_id, len(toks) AS n_words,
      |          2.0 * coalesce(top_c, 0) / len(toks) AS t2,
      |          1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dwf
      |        FROM t LEFT JOIN top USING (doc_id)),
      |nt AS (SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', '', 'g') AS s
      |       FROM documents),
      |bgt AS (SELECT doc_id, unnest(list_transform(range(1, length(s)),
      |          i -> substr(s, i, 2))) AS bg
      |        FROM nt WHERE length(s) >= 2),
      |m AS (SELECT bg, count(*) AS c12 FROM bgt GROUP BY 1),
      |u AS (SELECT substr(bg, 1, 1) AS c1ch, sum(c12) AS c1 FROM m GROUP BY 1),
      |p AS (SELECT bg, CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p
      |      FROM m JOIN u ON substr(bg, 1, 1) = c1ch),
      |lmt AS (SELECT doc_id, round(avg(p), 6) AS lm_score
      |        FROM bgt JOIN p USING (bg) GROUP BY 1),
      |j AS (SELECT rep.doc_id, n_words, t2, dwf, lm_score
      |      FROM rep LEFT JOIN lmt USING (doc_id)),
      |st AS (SELECT CASE WHEN n_words < 30 THEN '1_min_words'
      |                   WHEN t2 >= 0.125 THEN '2_repetition'
      |                   WHEN dwf >= 0.6 THEN '3_dup_words'
      |                   WHEN lm_score < 0.23 THEN '4_lm_score'
      |                   ELSE '5_kept' END AS stage
      |       FROM j)
      |SELECT stage, count(*) AS n_docs FROM st GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- training-shard writer ---------------------------------------
  // The LAST step of a corpus pipeline: write the final mixture as N
  // shuffled shards. Training wants (a) document order decorrelated
  // from ingestion order, (b) byte-balanced shards, (c) bit-identical
  // re-runs (resumable jobs, reproducible ablations). Deterministic by
  // construction, not by seed-plumbing: shard = first 8 md5 hex chars
  // of (seed, doc_id) mod N, and rows sort within the shard by the
  // same digest — so the layout is a pure function of (corpus, seed,
  // N) regardless of cluster size or task scheduling (a plain
  // repartition+shuffle write is neither ordered nor stable across
  // configs; range-repartition samples its bounds, also unstable).
  // Plan shape for 100 TB: one md5 projection, one hash shuffle on
  // the shard id, per-partition sort riding the shuffle — no global
  // sort, no driver state. maxRecordsPerFile splits fat shards.
  def shardAssignment(seed: String, numShards: Int): Column = {
    require(numShards > 0, "need at least one shard")
    val key = md5(concat_ws(":", lit(seed), col("doc_id").cast("string")))
    pmod(conv(substring(key, 1, 8), 16, 10).cast("long"), lit(numShards.toLong))
  }

  def writeTrainingShards(docs: DataFrame, outDir: String, numShards: Int,
      seed: String = "graft", maxRecordsPerFile: Long = 0L): Unit = {
    val key = md5(concat_ws(":", lit(seed), col("doc_id").cast("string")))
    val w = docs
      .withColumn("shard", shardAssignment(seed, numShards))
      .withColumn("__pos", key)
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "__pos")
      .drop("__pos")
      .write.mode("overwrite").option("compression", "zstd")
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile) else w)
      .partitionBy("shard").parquet(outDir)
  }

  // ---- word-bigram LM quality score --------------------------------
  // The WORD-level counterpart of q114's char-bigram score — the
  // KenLM-style fluency signal corpus filters actually rank with. The
  // architectural contrast with q114 is the point: a char model is
  // ≤729 rows (collect it, score row-locally via a codegen'd
  // expression), but a word-bigram model is VOCABULARY²-bounded — at
  // corpus scale it cannot live on the driver or in a closure, so the
  // model stays distributed and scoring is a (w1, w2)-keyed JOIN of
  // the document bigram stream against the model table. Plan shape
  // for 100 TB: bigram explode is row-local; both model aggs map-side
  // combine; the scoring join shuffles on the bigram key (zipfian
  // head absorbed by partial aggregation on the model side; AQE
  // handles the skewed join); the per-doc avg is combinable. Each p
  // is one IEEE divide of exactly-derived longs (the q114/q105
  // log-free lesson), rounded at 6dp.
  def wordLmScoreOf(docs: DataFrame): DataFrame = {
    // per-doc bigram multiplicities collapse in the row (the
    // codegen'd BigramCounts expression), so BOTH the model
    // aggregation and the scoring join consume the distinct-pair
    // stream instead of every pair instance; model counts aggregate
    // to bit-identical longs (sum of per-doc counts), and the per-doc
    // mean over instances equals the count-weighted mean over distinct
    // pairs: sum(p·tf)/sum(tf). NOTE: equal mathematically, not
    // bit-for-bit in IEEE (p+p+p can round differently from 3·p), so
    // the 6dp rounding could in principle flip on an exact half-ulp
    // boundary vs the oracle's avg(p); gates have held at all three
    // SFs, but the equivalence is to last-ulp, not exact
    val grams = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.VectorFunctions.bigram_counts(col("toks"))).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"), col("b.tf"))
    // measured note: a two-window formulation (sum(tf) over w1 /
    // over (w1, w2), one exchange) was tried and ran ~2x SLOWER at
    // 1M docs — the two full sorts of the pair stream cost more than
    // these hash joins, which also get AQE skew handling on the
    // zipfian head. Keep the join shape.
    val model = grams.groupBy("w1", "w2").agg(sum(col("tf")).as("c12"))
    val firsts = model.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val scored = model.join(firsts, "w1")
      .select(col("w1"), col("w2"),
        (col("c12").cast("double") / col("c1").cast("double")).as("p"))
    grams.join(scored, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("p") * col("tf")) / sum(col("tf")), 6).as("lm_score"))
      .orderBy("doc_id")
  }

  /** [[wordLmScoreOf]] with the model PRUNED to the top-K
    * continuations per head word (the classic LM-pruning trade): keep
    * only the K most frequent (w1 → w2) rows per w1 — ties broken by
    * w2 for determinism — and renormalize p over the kept mass. The
    * model shrinks from vocabulary² to vocabulary·K rows, which at
    * real-corpus vocabularies turns the scoring join's build side
    * from "distributed-only" into "often broadcastable" (Catalyst /
    * AQE decide by size — no forced broadcast hint, because
    * vocabulary·K can still exceed the driver at web scale). Bigrams
    * outside the pruned model simply don't score (inner join), so
    * n_bigrams counts kept-pair instances — the bounded quality loss
    * the pruning buys its speed with. The round-8 A/B vs the full
    * model is recorded in ROADMAP (ScaleBench word_lm_topk). */
  def wordLmScoreTopKOf(docs: DataFrame, topK: Int = 64): DataFrame = {
    require(topK > 0, "topK must be positive")
    val grams = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.VectorFunctions.bigram_counts(col("toks"))).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"), col("b.tf"))
    val model = grams.groupBy("w1", "w2").agg(sum(col("tf")).as("c12"))
    val byHead = org.apache.spark.sql.expressions.Window
      .partitionBy("w1").orderBy(col("c12").desc, col("w2").asc)
    val pruned = model.withColumn("rn", row_number().over(byHead))
      .filter(col("rn") <= topK).drop("rn")
    val firsts = pruned.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val scored = pruned.join(firsts, "w1")
      .select(col("w1"), col("w2"),
        (col("c12").cast("double") / col("c1").cast("double")).as("p"))
    grams.join(scored, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("p") * col("tf")) / sum(col("tf")), 6).as("lm_score"))
      .orderBy("doc_id")
  }

  def wordLmScoreTopK(spark: SparkSession, dir: String): DataFrame =
    wordLmScoreTopKOf(Tables.documents(spark, dir), topK = 2)

  val wordLmScoreTopKSql: String =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
      |           FROM documents),
      |g AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(toks)),
      |          i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS g
      |      FROM t WHERE len(toks) >= 2),
      |b AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM g),
      |m AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
      |pr AS (SELECT w1, w2, c12 FROM m
      |       QUALIFY row_number() OVER (PARTITION BY w1
      |         ORDER BY c12 DESC, w2 ASC) <= 2),
      |u AS (SELECT w1, sum(c12) AS c1 FROM pr GROUP BY 1),
      |p AS (SELECT w1, w2, CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p
      |      FROM pr JOIN u USING (w1))
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  round(avg(p), 6) AS lm_score
      |FROM b JOIN p USING (w1, w2)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def wordLmScore(spark: SparkSession, dir: String): DataFrame =
    wordLmScoreOf(Tables.documents(spark, dir))

  val wordLmScoreSql: String =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
      |           FROM documents),
      |g AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(toks)),
      |          i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS g
      |      FROM t WHERE len(toks) >= 2),
      |b AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM g),
      |m AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
      |u AS (SELECT w1, sum(c12) AS c1 FROM m GROUP BY 1),
      |p AS (SELECT w1, w2, CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p
      |      FROM m JOIN u USING (w1))
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  round(avg(p), 6) AS lm_score
      |FROM b JOIN p USING (w1, w2)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- BPE vocabulary induction ------------------------------------
  // Tokenizer-training primitive: learn byte-pair-encoding merge rules
  // from the corpus. The classic trainer iterates over a WORD
  // FREQUENCY table, not the corpus — so the distributed shape is: one
  // combinable word-count pass over the corpus (the only corpus-sized
  // job), then each merge round runs on the distinct-word table
  // (vocabulary-sized): one weighted pair-count aggregation, a
  // driver-side argmax (count desc, pair asc — deterministic), and one
  // row-local merge application. Lineage is cut every few rounds
  // (iterative-loop precedent: connectedComponents). A min word-count
  // floor keeps the word table bounded at corpus scale (hapax
  // legomena carry no merge signal).

  /** Learned merge rules, most frequent first: (left, right, count). */
  /** Tiered like connectedComponents (TextDedup): the corpus-sized
    * work is ONE combinable word-count job either way; when the
    * surviving word table is small (≤ [[bpeDriverWordCap]], the
    * common case — minWordCount floors the vocabulary), the merge
    * rounds run as driver loops over the collected table instead of
    * `numMerges` distributed jobs with typed-lambda SerDe and
    * periodic lineage checkpoints (measured: the 8-round train was
    * ~3–4 s of the q143 gate at sf0.1; the driver loop is
    * milliseconds — and this is also the shape production tokenizer
    * trainers use, an in-memory word-frequency table). Both tiers
    * compute the identical deterministic sequence: weighted pair
    * counts, argmax by (count desc, left asc, right asc), exhaustive
    * left-to-right non-overlapping merge application. A vocabulary
    * past the cap keeps the distributed rounds unchanged. */
  private[graft] val bpeDriverWordCap: Int =
    sys.props.get("graft.bpe.driverWordCap").map(_.toInt).getOrElse(500000)

  private def bpeTrainDriver(words: Seq[(Array[String], Long)],
      numMerges: Int): Seq[(String, String, Long)] = {
    val tbl = words.map { case (s, c) => (scala.collection.mutable.ArrayBuffer
      .from(s), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var round = 0
    while (round < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      tbl.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) round = numMerges
      else {
        // argmax with the distributed tier's exact tie order:
        // count desc, l asc, r asc — string comparisons in UTF-8
        // binary order (UTF8String), i.e. exactly Spark's StringType
        // ordering, not JVM UTF-16 order (they differ above U+DFFF)
        import org.apache.spark.unsafe.types.UTF8String
        def cmp(a: ((String, String), Long), b: ((String, String), Long)): Boolean = {
          if (a._2 != b._2) return a._2 > b._2
          val l = UTF8String.fromString(a._1._1)
            .compareTo(UTF8String.fromString(b._1._1))
          if (l != 0) return l < 0
          UTF8String.fromString(a._1._2)
            .compareTo(UTF8String.fromString(b._1._2)) < 0
        }
        val ((l, r), n) = counts.reduceLeft((a, b) => if (cmp(b, a)) b else a)
        merges += ((l, r, n))
        tbl.foreach { case (syms, _) =>
          var i = 0
          var w = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              syms(w) = l + r; i += 2
            } else { syms(w) = syms(i); i += 1 }
            w += 1
          }
          syms.takeInPlace(w)
        }
        round += 1
      }
    }
    merges.toSeq
  }

  def bpeTrain(docs: DataFrame, numMerges: Int, minWordCount: Long = 1,
      textCol: String = "text"): Seq[(String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordTable = docs.select(explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minWordCount)
    // driver tier: one bounded collect (cap+1 probes the bound), then
    // the rounds are in-memory loops — identical decisions, zero
    // further jobs. The symbol arrays come from the SAME Spark
    // `split(word, "")` expression the distributed tier uses, so the
    // two tiers consume byte-identical inputs.
    val symsTable = wordTable
      .select(split(col("word"), "").as("syms"), col("c"))
    val head = symsTable.as[(Seq[String], Long)]
      .limit(bpeDriverWordCap + 1).collect()
    if (head.length <= bpeDriverWordCap)
      return bpeTrainDriver(
        head.toSeq.map { case (s, c) => (s.toArray, c) }, numMerges)
    var words = symsTable.as[(Seq[String], Long)]
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var round = 0
    while (round < numMerges) {
      val top = words.flatMap { case (syms, c) =>
        syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, c))
      }.toDF("l", "r", "c")
        .groupBy("l", "r").agg(sum("c").as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .as[(String, String, Long)]
        .take(1)
      if (top.isEmpty) round = numMerges
      else {
        val (l, r, n) = top.head
        merges += ((l, r, n))
        words = words.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toSeq, c)
        }
        round += 1
        // cut the per-round lineage so the plan doesn't deepen
        // linearly with merges; release the previous round's blocks
        if (round % 4 == 0 && round < numMerges)
          words = words.localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** BPE ENCODING — apply a trained merge list to text, the tokenize
    * step a training pipeline runs corpus-wide after [[bpeTrain]]
    * (per-doc token counts feed budgeting/packing; whitespace counts
    * under-estimate once the tokenizer exists). Semantics: merges
    * apply SEQUENTIALLY in training order, one exhaustive
    * left-to-right non-overlapping pass each — exactly the trainer's
    * own per-round update rule, so encoding the training words
    * reproduces the symbol sequences training ended with (pinned in
    * spec). Spaces are hard boundaries: no merge contains a space, so
    * a symbol never spans words.
    *
    * Shape: pure codegen'd column composition, no UDF and no
    * per-row driver state — the text lowers and explodes to a
    * unit-separator (U+001F) joined char string, and each merge (l, r) is ONE
    * literal `replace(s, l+SEP+r, l+r)` (string replace is
    * left-to-right non-overlapping, which is precisely the trainer's
    * ArrayBuffer walk — "aaa" under merge (a,a) → [aa, a]). The merge
    * list is bounded driver metadata (it IS the model), so the plan
    * is a fixed chain of |merges| replaces — map-only, whole-stage
    * codegen'd, scales like any projection. */
  def bpeEncodeSymbols(text: Column, merges: Seq[(String, String)]): Column = {
    val SEP = "\u001f"
    val init = array_join(split(lower(text), ""), SEP)
    val merged = merges.foldLeft(init) { case (c, (l, r)) =>
      replace(c, lit(l + SEP + r), lit(l + r))
    }
    split(merged, SEP)
  }

  /** Word-internal BPE token count per document: encoded symbols
    * minus the space symbols (a space is always exactly one symbol —
    * never merged). */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column = {
    val lt = lower(text)
    size(bpeEncodeSymbols(text, merges)) -
      (length(lt) - length(replace(lt, lit(" "), lit(""))))
  }

  /** Gate entry: the FIRST merge decision in closed form — weighted
    * adjacent-char pair counts over the word frequency table, top 10.
    * (The iterative trainer's later rounds depend on earlier merges —
    * not expressible as one SQL statement; TextAnalysisSpec pins them
    * against a driver-side reference implementation.) */
  def bpePairCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("c"))
      .select(col("word"), col("c"))
      .select(explode(expr(
        """transform(sequence(1, length(word) - 1),
          |  i -> struct(substring(word, i, 1) AS l,
          |              substring(word, i + 1, 1) AS r))""".stripMargin)).as("p"),
        col("c"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("c")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("l").asc, col("r").asc)
      .limit(10)

  val bpePairCountsSql: String =
    """WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS word
      |           FROM documents),
      |wc AS (SELECT word, count(*) AS c FROM w WHERE length(word) > 0 GROUP BY 1),
      |p AS (SELECT substr(word, i, 1) AS l, substr(word, i + 1, 1) AS r, c
      |      FROM wc, unnest(range(1, length(word))) AS t(i))
      |SELECT l, r, CAST(sum(c) AS BIGINT) AS pair_count
      |FROM p GROUP BY l, r
      |ORDER BY pair_count DESC, l ASC, r ASC LIMIT 10""".stripMargin

  /** q143: BPE TRAIN + ENCODE end-to-end — 8 merges trained on the
    * corpus word table (minWordCount 5), then every document encoded
    * with [[bpeTokenCount]] (per-doc word-internal token counts, the
    * number budgeting/packing would consume). The oracle recomputes
    * the WHOLE thing in SQL: eight chained CTE rounds each pick the
    * top weighted pair (same n DESC, l, r tie order) and apply it as
    * a separator-joined `replace` — the identical left-to-right
    * non-overlapping rewrite — then the final merge list re-applies
    * to every document. Train AND encode verified cross-engine, not
    * just the first merge decision (q117). */
  def bpeTokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = bpeTrain(docs, 8, minWordCount = 5)
      .map(m => (m._1, m._2))
    require(merges.size == 8, s"expected 8 merges, got ${merges.size}")
    docs.select(col("doc_id"),
      bpeTokenCount(col("text"), merges).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  val bpeTokenCountsSql: String = {
    val rounds = (0 until 8).map { k =>
      s"""p$k AS (
         |  SELECT l, r FROM (
         |    SELECT syms[i] AS l, syms[i + 1] AS r, sum(c) AS n
         |    FROM (SELECT string_split(s, chr(31)) AS syms, c FROM w$k),
         |         unnest(range(1, len(syms))) AS t(i)
         |    GROUP BY 1, 2 ORDER BY n DESC, l ASC, r ASC LIMIT 1)),
         |w${k + 1} AS (SELECT replace(s, p$k.l || chr(31) || p$k.r,
         |                     p$k.l || p$k.r) AS s, c FROM w$k, p$k),
         |d${k + 1} AS (SELECT doc_id, lt, replace(s, p$k.l || chr(31) || p$k.r,
         |                     p$k.l || p$k.r) AS s FROM d$k, p$k)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH wc AS (
       |  SELECT word, count(*) AS c
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
       |        FROM documents)
       |  WHERE length(word) > 0 GROUP BY 1 HAVING count(*) >= 5),
       |w0 AS (SELECT array_to_string(string_split(word, ''), chr(31)) AS s, c
       |       FROM wc),
       |d0 AS (SELECT doc_id, lower(text) AS lt,
       |         array_to_string(string_split(lower(text), ''), chr(31)) AS s
       |       FROM documents),
       |$rounds
       |SELECT doc_id,
       |  CAST(len(string_split(s, chr(31)))
       |       - (length(lt) - length(replace(lt, ' ', ''))) AS INT)
       |    AS n_bpe_tokens
       |FROM d8 ORDER BY doc_id""".stripMargin
  }

  /** FastText-style HASHED bag-of-ngrams features: each unigram and
    * word-bigram maps to a bucket in a fixed feature space via the
    * hashing trick (no vocabulary build, no driver state — the
    * property that makes feature hashing the scalable front-end for
    * classifier training over corpora whose vocabulary doesn't fit
    * anywhere). The bucket is the first 6 md5 hex chars of the token
    * taken as an integer mod `numBuckets` — engine-portable (md5 is
    * md5 everywhere; q70's idiom), deterministic across runs and
    * partitionings. Output is the sparse matrix in COO form
    * (doc, bucket, tf) — one row-local projection + explode, one
    * combinable count shuffle; nothing corpus-global. */
  def hashedNgramFeatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", numBuckets: Int = 4096): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    // one map-only pass: per-doc bucket counts computed inside the
    // codegen'd HashedNgramBuckets expression (identical md5-bucket
    // arithmetic to the SQL formulation), then exploded to the COO
    // rows — no corpus-token-sized explode, no (doc, bucket) shuffle
    docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.VectorFunctions.hashed_ngram_buckets(
          split(col(textCol), " "), numBuckets)).as("bt"))
      .select(col("doc_id"), col("bt.bucket").as("bucket"), col("bt.tf").as("tf"))
  }

  def hashedFeatures(spark: SparkSession, dir: String): DataFrame =
    hashedNgramFeatures(Tables.documents(spark, dir))
      .orderBy("doc_id", "bucket")

  /** fastText-style linear classifier INFERENCE over the hashed
    * bag-of-ngrams (the CCNet/LLaMA-pipeline quality filter: score
    * every document with a linear model on hashed features, keep the
    * positive margin). `weightOf` maps a bucket to an integer weight
    * in [-1000, 1000] — here a deterministic pseudo-random stand-in
    * for trained weights (a real model would broadcast its weight
    * array; the dataflow is identical). The margin accumulates in
    * EXACT integer space (Σ tf·w as a long, one divide at the end),
    * so the rounded score is bit-identical on any engine. Plan: one
    * map-only pass — row-local bucket counts (codegen'd
    * HashedNgramBuckets) folded in the row; NO shuffle before the
    * final sort, at any corpus size. */
  def qualityClassify(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", numBuckets: Int = 4096): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.VectorFunctions.hashed_ngram_buckets(
          split(col(textCol), " "), numBuckets).as("fb"))
      .select(col("doc_id"),
        expr("aggregate(fb, 0L, (acc, x) -> " +
          "acc + x.tf * ((x.bucket * 2654435761L) % 2001 - 1000))").as("mi"),
        expr("aggregate(fb, 0L, (acc, x) -> acc + x.tf)").as("n_feats"))
      .select(col("doc_id"),
        round(col("mi") / lit(1000.0), 6).as("margin"),
        (col("mi") > 0L).as("keep"),
        col("n_feats"))

  /** [[qualityClassify]] with REAL trained weights: `weights` maps a
    * feature bucket to its integer weight (missing buckets score 0).
    * The model ships to executors as a bucket-indexed array literal
    * riding the plan — at fastText scale (numBuckets ≤ a few million
    * ints) that is megabytes, the same order Spark broadcasts join
    * sides at; no per-row lookup structure is built. The margin
    * arithmetic is the same exact-integer fold, so handing this
    * function the stand-in weight formula reproduces
    * [[qualityClassify]] bit-for-bit (the spec pins that). */
  def qualityClassifyWeighted(docs: DataFrame, weights: Map[Int, Int],
      idCol: String = "doc_id", textCol: String = "text",
      numBuckets: Int = 4096): DataFrame = {
    require(weights.keys.forall(b => b >= 0 && b < numBuckets),
      s"weight bucket out of range [0, $numBuckets)")
    val warr = typedLit((0 until numBuckets).map(b => weights.getOrElse(b, 0)).toArray)
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.VectorFunctions.hashed_ngram_buckets(
          split(col(textCol), " "), numBuckets).as("fb"))
      .select(col("doc_id"),
        aggregate(col("fb"), lit(0L), (acc, x) =>
          acc + x.getField("tf").cast("long") *
            element_at(warr, x.getField("bucket") + 1).cast("long")).as("mi"),
        aggregate(col("fb"), lit(0L),
          (acc, x) => acc + x.getField("tf").cast("long")).as("n_feats"))
      .select(col("doc_id"),
        round(col("mi") / lit(1000.0), 6).as("margin"),
        (col("mi") > 0L).as("keep"),
        col("n_feats"))
  }

  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    qualityClassify(Tables.documents(spark, dir)).orderBy("doc_id")

  val qualityClassifierSql: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |), toks AS (
      |  SELECT doc_id, unnest(list_concat(ws,
      |    list_transform(generate_series(1, len(ws) - 1),
      |      i -> ws[i] || '_' || ws[i + 1]))) AS token
      |  FROM w
      |), f AS (
      |  SELECT doc_id,
      |    CAST(CAST('0x' || substring(md5(token), 1, 6) AS BIGINT) % 4096 AS INT)
      |      AS bucket,
      |    count(*) AS tf
      |  FROM toks GROUP BY doc_id, bucket
      |), m AS (
      |  SELECT doc_id,
      |    sum(tf * ((bucket * 2654435761) % 2001 - 1000)) AS mi,
      |    sum(tf) AS n_feats
      |  FROM f GROUP BY doc_id
      |)
      |SELECT doc_id, round(mi / 1000.0, 6) AS margin, mi > 0 AS keep,
      |  CAST(n_feats AS BIGINT) AS n_feats
      |FROM m ORDER BY doc_id""".stripMargin

  val hashedFeaturesSql: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |), toks AS (
      |  SELECT doc_id, unnest(list_concat(ws,
      |    list_transform(generate_series(1, len(ws) - 1),
      |      i -> ws[i] || '_' || ws[i + 1]))) AS token
      |  FROM w
      |)
      |SELECT doc_id,
      |  CAST(CAST('0x' || substring(md5(token), 1, 6) AS BIGINT) % 4096 AS INT)
      |    AS bucket,
      |  count(*) AS tf
      |FROM toks GROUP BY doc_id, bucket
      |ORDER BY doc_id, bucket""".stripMargin

  val catalog: Seq[QDef] = Seq(
    QDef("q29_text_stats", textStats, Some(textStatsSql)),
    QDef("q80_pii_scrub", piiScrub, Some(piiScrubSql)),
    QDef("q32_lang_id", langId, Some(langIdSql)),
    QDef("q71_lang_id_ngram", langIdNgram, Some(langIdNgramSql)),
    QDef("q33_quality_score", quality, Some(qualitySql)),
    QDef("q34_fingerprints", fingerprints, Some(fingerprintsSql)),
    QDef("q78_tfidf", tfidf, Some(tfidfSql)),
    QDef("q82_stratified_mix", stratifiedMix, Some(stratifiedMixSql)),
    QDef("q83_token_budget", tokenBudget, Some(tokenBudgetSql)),
    QDef("q92_repetition_filter", repetitionStats, Some(repetitionStatsSql)),
    QDef("q93_decontaminate", decontaminate, Some(decontaminateSql)),
    QDef("q96_sequence_packing", packSequences, Some(packSequencesSql)),
    QDef("q105_collocations", collocations, Some(collocationsSql)),
    QDef("q108_doc_chunking", (s, d) => chunkDocuments(s, d), Some(chunkDocumentsSql)),
    QDef("q113_inverted_index", invertedIndex, Some(invertedIndexSql)),
    QDef("q114_char_lm_score", charLmScore, Some(charLmScoreSql)),
    QDef("q117_bpe_pair_counts", bpePairCounts, Some(bpePairCountsSql)),
    QDef("q143_bpe_token_counts", bpeTokenCounts, Some(bpeTokenCountsSql)),
    QDef("q118_bm25_topk", bm25TopK, Some(bm25TopKSql)),
    QDef("q119_temperature_mix", temperatureMix, Some(temperatureMixSql)),
    QDef("q120_filter_funnel", filterFunnel, Some(filterFunnelSql)),
    QDef("q121_url_domains", urlDomainReport, Some(urlDomainReportSql)),
    QDef("q122_word_lm_score", wordLmScore, Some(wordLmScoreSql)),
    QDef("q126_word_lm_topk", wordLmScoreTopK, Some(wordLmScoreTopKSql)),
    QDef("q124_hashed_features", hashedFeatures, Some(hashedFeaturesSql)),
    QDef("q129_quality_classifier", qualityClassifier, Some(qualityClassifierSql)),
  )
}
