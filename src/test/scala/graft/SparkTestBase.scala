package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One lazily-created local session per suite, configured like
  * Verify/Bench (UTC, nanos-as-long for the events table, small shuffle
  * partition count for local runs). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // match Verify/Bench: specs run under the session extension, so the
    // whole suite doubles as the no-regression witness for its rule
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf0001 = "/root/testdata/sf0.001"
}
