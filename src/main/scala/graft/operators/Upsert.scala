package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed merge (MERGE INTO semantics as a DataFrame combinator) — the
  * upsert step every warehouse-shaped pipeline needs and plain Spark
  * tables lack: matched keys take the update row, unmatched target rows
  * survive, unmatched update rows insert, and an optional tombstone
  * column deletes.
  *
  * Scale shape: one full-outer hash join on the key columns — the same
  * exchange a MERGE's file-rewrite planning pays in any lakehouse
  * format. Neither side broadcasts (both are table-sized in general);
  * co-locating repeated merges is the caller's job via
  * [[graft.sources.Layout]] bucketing, which removes both exchanges.
  * The last-writer-wins pre-dedup is a per-key window, shuffled on the
  * same key as the join, so AQE/EnsureRequirements reuses the exchange.
  */
object Upsert {

  /** Merge `updates` into `target` by `keys`.
    *
    * @param versionCol when several update rows share a key, the row with
    *                   the highest value wins (ties break on a value hash
    *                   of the data columns — deterministic across runs);
    *                   None = updates must be key-unique (enforced lazily
    *                   by the join blowing up row counts, checked in
    *                   specs)
    * @param deleteCol  boolean column on `updates`: true = drop the key
    *                   from the result entirely (tombstone)
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String],
             versionCol: Option[String] = None,
             deleteCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val dataCols = target.columns.filterNot(keys.contains)
    val missing = (keys ++ dataCols).filterNot(updates.columns.contains)
    require(missing.isEmpty,
      s"updates frame lacks target columns: ${missing.mkString(", ")} " +
        "(align with a select before merging)")
    val latest = versionCol match {
      case Some(v) =>
        // version ties break on a hash of the data columns: deterministic
        // w.r.t. row VALUES (never partition/fetch order), and when two
        // tied rows are full duplicates either choice is the same row
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(v).desc, xxhash64(dataCols.map(col): _*))
        updates.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      case None => updates
    }
    // capture the tombstone flag BEFORE the data-column renames: reading
    // deleteCol after the merge would pick up a same-named TARGET column
    // for update-less rows and delete soft-flagged survivors
    val flagged = deleteCol match {
      case Some(d) =>
        latest.withColumn("__u_delete", coalesce(col(d), lit(false)))
      case None => latest
    }
    val u = dataCols.foldLeft(flagged.withColumn("__u_matched", lit(true))) {
      (df, c) => df.withColumnRenamed(c, s"__u_$c")
    }
    val joined = target.join(u, keys, "full_outer")
    val merged = dataCols.foldLeft(joined) { (df, c) =>
      // matched or insert: update value wins; target-only: keep target.
      // The __u_matched marker (never null on an update row)
      // distinguishes "update has null here" from "no update row", so an
      // update can null a column out.
      df.withColumn(c,
        when(coalesce(col("__u_matched"), lit(false)), col(s"__u_$c"))
          .otherwise(col(c)))
    }
    val deleted =
      if (deleteCol.isDefined)
        merged.filter(!coalesce(col("__u_delete"), lit(false)))
      else merged
    deleted.select(target.columns.map(col): _*)
  }
}
