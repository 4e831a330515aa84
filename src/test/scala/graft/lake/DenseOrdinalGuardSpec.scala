package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The identity ordinal's layout-stability guard.
  *
  * [[SnapshotTable.withDenseOrdinal]] runs a size-only count job and
  * the write job over the same plan; per-partition size stability
  * between the two is the correctness premise (zipWithIndex parity).
  * Two plan shapes break it — a nondeterministic input re-evaluates
  * to different rows per job, and an Exchange lets AQE coalesce the
  * two jobs into different partition layouts. The guard detects both
  * and pins one physical layout (eager localCheckpoint) before the
  * count. The unguarded formulation stays private[graft] so this
  * suite can DEMONSTRATE the misnumbering it is guarding against. */
class DenseOrdinalGuardSpec extends SparkTestBase {

  private def dense(df: DataFrame, ord: String): Boolean = {
    val r = df.agg(count(lit(1)), countDistinct(col(ord)),
      min(col(ord)), max(col(ord))).head()
    val n = r.getLong(0)
    n == 0L ||
      (r.getLong(1) == n && r.getLong(2) == 0L && r.getLong(3) == n - 1L)
  }

  test("layoutUnstable detects rand filters, sample, and exchanges — not plain scans") {
    val dir = Files.createTempDirectory("graft-ord-detect").toString
    spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
      .write.parquet(s"$dir/t")
    val base = spark.read.parquet(s"$dir/t")
    assert(!SnapshotTable.layoutUnstable(base))
    assert(!SnapshotTable.layoutUnstable(
      base.filter(col("k") > 2).select(col("id"), (col("id") * 2).as("d"))))
    assert(SnapshotTable.layoutUnstable(base.filter(rand() < 0.5)))
    assert(SnapshotTable.layoutUnstable(base.sample(0.5)))
    assert(SnapshotTable.layoutUnstable(base.withColumn("u", rand(42))))
    assert(SnapshotTable.layoutUnstable(
      base.groupBy(col("k")).agg(sum(col("id")).as("s"))))
    assert(SnapshotTable.layoutUnstable(base.repartition(8)))
    assert(SnapshotTable.layoutUnstable(base.join(
      spark.range(5).select(col("id").as("k2")),
      col("k") === col("k2"))))
  }

  test("UNGUARDED formulation misnumbers under AQE layout divergence — guarded does not") {
    // The deterministic reproduction of the ADVICE hazard: the count
    // job column-prunes the (incompressible — AQE stats are post-
    // compression shuffle bytes) payload out of the shuffle, so its
    // post-shuffle bytes AQE-coalesce into FEWER partitions than the
    // write job keeps (~0.5 MB → 1 partition vs ~20 MB → 4, against
    // a 1 MB advisory size). The two jobs then see different
    // spark_partition_id layouts and the offset join mis-numbers
    // rows (here: null ordinals for every partition id the count job
    // never saw). AQE's coalescing decision is stats-driven and
    // deterministic, so this is not a flaky race.
    val conf = spark.conf
    val keys = Seq("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst")
    val old = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "1m")
      conf.set(keys(1), "64k")
      // parallelismFirst pins coalescing to core count, which hides
      // the size-driven divergence on a 4-core test JVM; production
      // clusters hit it whenever the two jobs' byte sizes straddle
      // an advisory boundary regardless of this flag
      conf.set(keys(2), "false")
      // repartition-by-col: no partial-agg reduction, so the write
      // job's shuffle stays payload-sized (~20 MB → 4 partitions)
      // while the count job's column-pruned shuffle (~0.5 MB)
      // coalesces to 1
      val src = spark.range(0L, 20000L, 1L, 8)
        .select(col("id").as("k"),
          concat_ws("", (1 to 15).map(i =>
          sha2(concat(col("id").cast("string"), lit(i)), 256)): _*).as("p"))
        .repartition(col("k") % 16)
      // the probe must stay WRITE-SHAPED: referencing the payload
      // keeps it in the verification query's shuffle (a payload-
      // pruned probe would coalesce like the count job and mask the
      // divergence a real parquet write hits)
      def denseWide(df: DataFrame): Boolean = {
        val r = df.agg(count(lit(1)), countDistinct(col("__ord")),
          min(col("__ord")), max(col("__ord")),
          sum(length(col("p")))).head()
        val n = r.getLong(0)
        r.getLong(1) == n && r.getLong(2) == 0L && r.getLong(3) == n - 1L
      }
      val out = SnapshotTable.withDenseOrdinalUnpinned(src, "__ord")
      assert(!denseWide(out),
        "unguarded two-job ordinal stayed dense under forced AQE " +
          "coalesce divergence — the guard spec premise no longer holds")
      val pinned = SnapshotTable.withDenseOrdinal(src, "__ord")
      assert(denseWide(pinned))
      assert(pinned.count() == 20000L)
    } finally old.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("guarded withDenseOrdinal stays dense on nondeterministic-expression inputs") {
    // Defense-in-depth half of the guard: rand()/sample frames are
    // pinned before the count (an unseeded rand is seeded at
    // analysis, but a genuinely nondeterministic filter is not
    // size-stable — the pin makes both irrelevant).
    val src = spark.range(0L, 200000L, 1L, 8)
      .select(col("id"), (col("id") % 13).cast("double").as("v"))
      .filter(rand() < 0.5)
    (1 to 3).foreach { _ =>
      val out = SnapshotTable.withDenseOrdinal(src, "__ord")
      assert(dense(out, "__ord"))
    }
  }

  test("guarded withDenseOrdinal stays dense through an exchange under AQE") {
    // A shuffle whose byte sizes differ between the column-pruned
    // count job and the full write job — the AQE-coalesce hazard
    // shape. Deterministic data, so this pins correctness of the
    // pinned path (the mis-layout itself cannot be forced
    // deterministically; detection covers it).
    val wide = spark.range(0L, 100000L, 1L, 16)
      .select(col("id"), (col("id") % 64).as("k"),
        concat_ws("", (1 to 20).map(i => conv(col("id") + i, 10, 16)): _*)
          .as("pad"))
    val shuffled = wide.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), max(col("pad")).as("p"))
    val out = SnapshotTable.withDenseOrdinal(shuffled, "__ord")
    assert(dense(out, "__ord"))
    assert(out.count() == 64L)
  }

  test("identity assignment through merge-shaped (exchange-bearing) frames stays unique") {
    // End-to-end: a tracked IDENTITY target ingesting a joined +
    // aggregated source — the mainline shape ADVICE flagged. Values
    // must be unique and exactly n per commit.
    import org.apache.spark.sql.catalyst.util.IdentityColumn
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-ord-e2e").toString
    val path = s"$dir/t"
    SnapshotTable.create(spark, path, StructType(Seq(
      StructField("sid", LongType, nullable = true, new MetadataBuilder()
        .putLong(IdentityColumn.IDENTITY_INFO_START, 1L)
        .putLong(IdentityColumn.IDENTITY_INFO_STEP, 1L)
        .putBoolean(IdentityColumn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT, false)
        .build()),
      StructField("k", LongType), StructField("n", LongType))))
    val src = spark.range(0L, 50000L, 1L, 8)
      .select((col("id") % 9999).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    SnapshotTable.append(src, path)
    val got = SnapshotTable.read(spark, path)
      .agg(count(lit(1)), countDistinct(col("sid")),
        min(col("sid")), max(col("sid"))).head()
    assert(got.getLong(0) == 9999L && got.getLong(1) == 9999L)
    assert(got.getLong(2) == 1L && got.getLong(3) == 9999L)
  }
}
