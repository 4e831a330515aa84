package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property tests over the cleaning semantics (SURVEY.md §5.3).
  * Uses raw ScalaCheck generators with fixed seeds (the
  * scalatest-scalacheck bridge isn't on the offline classpath).
  */
class CleanPropsSpec extends SparkTestBase {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val genTs: Gen[String] = for {
    prefix <- Gen.oneOf("0014", "0015", "2014", "2015")
    mo <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
    h <- Gen.choose(0, 23)
    mi <- Gen.choose(0, 59)
    s <- Gen.choose(0, 59)
  } yield f"$prefix-$mo%02d-$d%02d $h%02d:$mi%02d:$s%02d"

  test("fix_year is idempotent and eliminates 00 prefixes (20 seeds)") {
    import spark.implicits._
    (1L to 20L).foreach { seed =>
      val ts = sample(Gen.listOfN(30, genTs), seed)
      val df = ts.toDF("s")
      val once = df.select(SilverClean.fixYear(col("s")).as("f"))
      val twice = once.select(SilverClean.fixYear(col("f")).as("f"))
      assert(once.collect().map(_.getString(0)).toSeq ===
        twice.collect().map(_.getString(0)).toSeq, s"seed=$seed")
      assert(once.filter(col("f").startsWith("00")).count() === 0, s"seed=$seed")
    }
  }

  test("duration sign matches timestamp order for arbitrary pairs") {
    import spark.implicits._
    val genPair = for {
      a <- Gen.choose(1400000000L, 1500000000L)
      b <- Gen.choose(1400000000L, 1500000000L)
    } yield (a, b)
    val pairs = sample(Gen.listOfN(200, genPair), 42L)
    val df = pairs.toDF("c", "e")
      .select(timestamp_seconds(col("c")).as("created"),
        timestamp_seconds(col("e")).as("ended"))
    val d = GoldFeatures.derive(df.withColumn("kwhTotal", lit(1.0))
      .withColumn("dollars", lit(1.0)))
    val rows = d.select((col("ended") >= col("created")).as("ord"),
      (col("session_duration_minutes") >= 0).as("nonneg")).collect()
    rows.foreach(r => assert(r.getBoolean(0) === r.getBoolean(1)))
  }

  test("decode is total on domain and identity off domain") {
    import spark.implicits._
    val inputs = (SilverClean.weekdayMap.keys.toList ++ Seq("Thurs", "xyz", "MON")).toDF("w")
    val out = inputs.select(col("w"),
      SilverClean.decode(col("w"), SilverClean.weekdayMap).as("d")).collect()
    out.foreach { r =>
      val (in, dec) = (r.getString(0), r.getString(1))
      if (SilverClean.weekdayMap.contains(in)) assert(dec === SilverClean.weekdayMap(in))
      else assert(dec === in)
    }
  }
}
