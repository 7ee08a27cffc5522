package graft.etl

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 maintenance: apply a batch of updated
  * dimension rows to a history table, closing superseded versions and
  * appending new ones — the warehouse-side operator the reference's
  * truncate-and-reload dimensions (load.py:29-47) cannot express, and the
  * natural next step for its star schema at scale (full reloads stop
  * being an option at 100 TB; SCD2 touches only changed keys).
  *
  * History schema = dimension columns + (valid_from DATE, valid_to DATE
  * nullable, is_current BOOLEAN). Everything is joins/unions on the
  * business key — one shuffle, no driver-side row handling.
  */
object Scd2 {

  /** Initialize a history table from a first dimension snapshot. */
  def init(dim: DataFrame, asOf: Date): DataFrame =
    dim.withColumn("valid_from", lit(asOf))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

  /** Apply `updates` (full rows, one per business key) effective `asOf`:
    *  - keys whose tracked attributes changed: current row closed
    *    (valid_to = asOf, is_current = false) + new version appended;
    *  - brand-new keys: appended as current;
    *  - unchanged keys and already-closed history: untouched.
    */
  def applyChanges(history: DataFrame, updates: DataFrame, key: String,
                   asOf: Date, trackedCols: Seq[String]): DataFrame = {
    val cmp = (side: String) =>
      md5(concat_ws("\u0001", trackedCols.map(c => coalesce(col(s"$side$c").cast("string"), lit("\u0000"))): _*))

    val current = history.filter(col("is_current"))
    val closed = history.filter(!col("is_current"))
    val histCols = current.columns

    val u = updates.columns.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"u_$c"))
    // Single pass: every joined row EXPLODES its 1-2 contribution rows
    // (changed key -> closed version + new version; new key -> new
    // version; otherwise -> the current row as-is) instead of the classic
    // three-filtered-branch union — which reads the full-outer join's
    // whole lineage into each branch and re-executes it per branch (the
    // derived-frame trap graft.queries.DedupQueries.bucketPairs
    // documents; measured on q_scd2_history: 12 parquet scans -> 4, one
    // join in the plan, same rows).
    val changed = col(key).isNotNull && col(s"u_$key").isNotNull &&
      cmp("") =!= cmp("u_")
    val newKey = col(key).isNull

    val currentRow = struct(histCols.map(c => col(c).as(c)): _*)
    val closedRow = struct(histCols.map {
      case "valid_to"   => lit(asOf).as("valid_to")
      case "is_current" => lit(false).as("is_current")
      case c            => col(c).as(c)
    }: _*)
    val freshRow = struct(histCols.map {
      case "valid_from" => lit(asOf).as("valid_from")
      case "valid_to"   => lit(null).cast("date").as("valid_to")
      case "is_current" => lit(true).as("is_current")
      case c            => col(s"u_$c").as(c)
    }: _*)

    val contributions = current.join(u, col(key) === col(s"u_$key"), "full")
      .select(explode(
        when(changed, array(closedRow, freshRow))
          .when(newKey, array(freshRow))
          .otherwise(array(currentRow))).as("__r"))
      .select(col("__r.*"))

    closed.unionByName(contributions)
  }

  /** Point-in-time view: the version of each key valid on `date`. */
  def asOf(history: DataFrame, date: Date): DataFrame =
    history.filter(col("valid_from") <= lit(date) &&
      (col("valid_to").isNull || col("valid_to") > lit(date)))
}
