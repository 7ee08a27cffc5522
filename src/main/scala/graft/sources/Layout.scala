package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical-layout helpers — the storage-side levers that matter at
  * 100 TB (SURVEY.md §4: the reference's only access-path tuning was
  * sink-side MySQL indexes; the Spark-native equivalents are bucketing
  * and partition layout).
  *
  *  - Bucketed tables: co-located joins and aggregations on the bucket
  *    key need no shuffle at read time — the exchange is paid once at
  *    write time. For a fact table joined on the same key by every
  *    downstream query, this removes the dominant shuffle.
  *  - Date-partitioned sinks: partition pruning turns time-range scans
  *    into file listings; a year of data with daily partitions reads
  *    1/365th of the bytes for a one-day query.
  */
object Layout {

  /** Write `df` as a bucketed, sorted managed table. Joins/group-bys on
    * `key` between tables bucketed the same way plan with zero Exchange. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Drop `table` AND clear its default warehouse location. A managed
    * table written by one session survives as FILES after the session's
    * in-memory catalog dies; the next session's `saveAsTable` then
    * fails with LOCATION_ALREADY_EXISTS because the catalog (which
    * would let Overwrite reclaim it) no longer knows the table. Any
    * query that materializes a working table (q_index_compact) resets
    * through this first, so it is re-runnable across sessions. */
  def resetTable(spark: org.apache.spark.sql.SparkSession,
                 table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Write `df` partitioned by a (typically date-derived) column; readers
    * filtering on it scan only matching directories. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Write `df` clustered along a space-filling-curve column —
    * q_layout_zorder's z value or q_layout_hilbert's d — the write path
    * those queries' tile reports audit: range-partition on the curve
    * (contiguous curve intervals per file, no global sort) and sort
    * within each partition, so every parquet row group covers a short
    * curve walk and its min/max stats stay tight on BOTH raw
    * dimensions. A two-dimensional range scan then prunes files like a
    * one-dimensional one. LayoutCurveSpec measures the claim: per-file
    * spans on both raw dimensions under the Hilbert key versus a
    * single-column sort's. */
  def writeCurveClustered(df: DataFrame, path: String, curveCol: String,
                          files: Int = 8): Unit =
    df.repartitionByRange(files, org.apache.spark.sql.functions.col(curveCol))
      .sortWithinPartitions(curveCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
