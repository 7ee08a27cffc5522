package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet readers for the driver testdata (TESTDATA.md).
  *
  * Schemas are carried by the parquet footers (no inference cost); the
  * reference's CSV-with-inferred-schema scans (reference extract.py:4-41)
  * map to schema-full parquet scans here. Explicit StructTypes for the
  * HR-shaped fixture tables live in [[graft.etl.HrSchemas]].
  */
object Tables {

  val testdataTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scan one testdata table. Column pruning + predicate pushdown reach the
    * parquet reader automatically because callers compose lazily on top.
    *
    * The `events` table stores parquet TIMESTAMP(NANOS), which Spark 4 only
    * reads as a raw long (under `spark.sql.legacy.parquet.nanosAsLong`,
    * set by [[Verify]]/[[Bench]]/test sessions) — normalize it to a
    * microsecond TIMESTAMP_NTZ here so queries see one timestamp type.
    * Integer `div` avoids the double rounding a 1e18-magnitude nanos value
    * would hit. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    else df
  }

  /** Source pre-flight check (reference main.py:41-45): all expected files
    * exist before any read is attempted. */
  def preflight(dir: String, names: Seq[String] = testdataTables): Seq[String] =
    names.filterNot(n => new java.io.File(s"$dir/$n.parquet").exists())
}
