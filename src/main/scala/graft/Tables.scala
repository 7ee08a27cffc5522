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
    * exist before any read is attempted. Resolved through the Hadoop
    * filesystem of the path's scheme (same fix as HrPipeline.stage, r3
    * ADVICE): a java.io.File probe is always false on hdfs://-style dirs,
    * which would report every table missing on a real lake. The contract
    * is "return the missing list", so an unservable path (no connector
    * for the scheme, malformed URI) REPORTS the table missing rather
    * than throwing — same graceful degradation the old File probe had. */
  def preflight(dir: String, names: Seq[String] = testdataTables): Seq[String] = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    names.filterNot { n =>
      scala.util.Try {
        val p = new org.apache.hadoop.fs.Path(s"$dir/$n.parquet")
        p.getFileSystem(conf).exists(p)
      }.getOrElse(false)
    }
  }

  /** Spread rows across every core before expensive per-row expression
    * work (shingle lambdas, signature hashing) — but only when needed.
    * The driver testdata ships ONE parquet file per table, which arrives
    * as a single input split; without a repartition the whole signature
    * stage runs on one core. A real lake layout is already split into
    * many files, and there the same repartition is an unconditional
    * full-text shuffle for nothing.
    *
    * Decision on the optimized LOGICAL plan (never executes anything):
    *  - wide lineage (join / aggregate / window / explicit repartition
    *    anywhere): pass through. Callers spread the underlying SCAN
    *    before widening (see [[graft.queries.DedupQueries]] collapseExact),
    *    so a wide frame is spread by construction — either by that
    *    repartition or by the wide operator's own shuffle — and consulting
    *    `df.rdd` here would eagerly materialize every upstream AQE stage
    *    (i.e. run the jobs twice).
    *  - narrow lineage (scan + project/filter/generate): here
    *    `df.rdd.getNumPartitions` is plan-only file-split arithmetic (no
    *    exchanges, so no AQE, no job) — repartition only when the scan
    *    yields fewer splits than `defaultParallelism`. */
  def spread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    // streaming frames: micro-batch parallelism is the source's business
    // (maxFilesPerTrigger etc.), and df.rdd is illegal on them anyway
    if (df.isStreaming) return df
    val wide = df.queryExecution.optimizedPlan.find {
      case _: Join | _: Aggregate | _: Window | _: RepartitionOperation |
           _: Sort => true
      case _ => false
    }.isDefined
    if (wide) df
    else if (df.rdd.getNumPartitions >=
        df.sparkSession.sparkContext.defaultParallelism) df
    else df.repartition(key)
  }
}
