package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    * parquet reader automatically because callers compose lazily on top. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Source pre-flight check (reference main.py:41-45): all expected files
    * exist before any read is attempted. */
  def preflight(dir: String, names: Seq[String] = testdataTables): Seq[String] =
    names.filterNot(n => new java.io.File(s"$dir/$n.parquet").exists())
}
