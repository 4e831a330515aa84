package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B bench for duplicateSpans formulations (uniform vs
  * planted-skew at 1M docs). Not part of the shipped surface. */
object DupBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("GRAFT_SCALE_ROWS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.format("graft-docs")
      .option("rows", rows).option("partitions", cpus.toInt * 2).load()
    val skewDocs = docs.withColumn("text",
      when(col("doc_id") % 2 === 0,
        concat(lit("common header tokens repeated across half the corpus | "),
          col("text"))).otherwise(col("text")))

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def timed(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      System.err.println(f"[dup] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val which = sys.env.getOrElse("GRAFT_DUP_CASES", "current,window")
      .split(",").toSet
    if (which("window")) {
      timed("window_uniform") { noop(spansWindowed(docs)) }
      timed("window_skew") { noop(spansWindowed(skewDocs)) }
    }
    if (which("current")) {
      timed("current_uniform") { noop(graft.ops.TextDedup.duplicateSpans(docs)) }
      timed("current_skew") { noop(graft.ops.TextDedup.duplicateSpans(skewDocs)) }
    }
    spark.stop()
  }

  /** The round-8 pure-window formulation, kept verbatim for A/B. */
  private def spansWindowed(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", spanLen: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = spanLen
    val toksed = docs.select(col(idCol).as("id"),
      split(lower(col(textCol)), " ").as("toks"))
    val keyed = toksed.select(col("id"),
      posexplode(expr(
        s"CASE WHEN size(toks) >= $L THEN transform(sequence(0, size(toks) - $L), " +
          s"i -> xxhash64(slice(toks, i + 1, $L))) " +
          "ELSE cast(array() as array<bigint>) END")).as(Seq("pos", "k64")))
    val wK = Window.partitionBy("k64")
    val candPos = keyed
      .withColumn("cnt", count(lit(1)).over(wK))
      .filter(col("cnt") > 1)
      .groupBy("id").agg(collect_list(col("pos")).as("cps"))
    val grams = toksed.join(candPos, Seq("id"))
      .select(col("id"), explode(expr(
        s"transform(cps, p -> struct(p as pos, " +
          s"array_join(slice(toks, p + 1, $L), ' ') as gk))")).as("pg"))
      .select(col("id"), col("pg.pos").as("pos"), col("pg.gk").as("gk"))
    val wG = Window.partitionBy("gk")
    val dups = grams
      .withColumn("first", min(struct(col("id"), col("pos"))).over(wG))
      .filter(struct(col("id"), col("pos")) > col("first"))
      .select("id", "pos")
    val wD = Window.partitionBy("id").orderBy("pos")
    val c = dups
      .withColumn("prev", lag("pos", 1).over(wD))
      .withColumn("new_region",
        when(col("prev").isNull || col("pos") - col("prev") > L, 1).otherwise(0))
      .withColumn("contrib",
        least(lit(L), coalesce(col("pos") - col("prev"), lit(L))).cast("long"))
      .withColumn("region", sum("new_region").over(wD))
    val regions = c.groupBy("id", "region")
      .agg(min("pos").as("rs"), (max("pos") + lit(L - 1)).as("re"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("rs"), col("re")))).as("regs"))
    val agg = c.groupBy("id").agg(
      count(lit(1)).as("n_dup"),
      sum("new_region").cast("long").as("n_regions"),
      sum("contrib").as("dup_tokens"))
    toksed
      .join(agg, Seq("id"), "left")
      .join(regions, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("n_regions"), lit(0L)).as("n_regions"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (size(col("toks")) - coalesce(col("dup_tokens"), lit(0L))).cast("long")
          .as("kept_tokens"),
        array_join(expr(
          "filter(toks, (t, i) -> regs IS NULL OR " +
            "NOT exists(regs, r -> i >= r.rs AND i <= r.re))"), " ")
          .as("kept_text"))
  }
}
