package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (lazy, UTC, ns-parquet conf). */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .getOrCreate()

  lazy val sf0001 = "/root/testdata/sf0.001"
  lazy val fixture = "/root/repo/data/ev_fixture.csv"

  override def afterAll(): Unit = {
    // keep the session alive across suites (forked JVM shares it);
    // stopping per-suite would thrash executor startup.
    super.afterAll()
  }
}
