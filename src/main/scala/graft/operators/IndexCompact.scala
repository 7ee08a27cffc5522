package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Batch maintenance for the incremental-dedup history indexes — the
  * production op the r18 verdict named as the missing piece: every
  * ingest round ADMITS rows against a bucketed history
  * (q_dedup_incremental / q_semdedup_incremental / the media band
  * indexes, LayoutSpec's one-exchange pins), and those admitted rows
  * must re-enter the bucketed layout before the NEXT round — without
  * rewriting a 100 TB history nightly.
  *
  * The op is [[Upsert]]'s insert-only specialization, append-shaped:
  * the history indexes are INSERT-ONLY under keep-first semantics
  * (matched keys keep the target row — exactly Upsert's keep-target
  * arm — and only unmatched update rows insert), so the full-outer
  * join a general MERGE pays collapses to an anti-join of the
  * increment plus a bucket-aligned APPEND. Spark bucketed tables
  * accept same-spec appends as new per-bucket files: the table's
  * hash-distribution contract survives (reads stay exchange-free on
  * the bucket key; only the per-bucket SORT guarantee is file-local,
  * which none of the one-exchange pins rely on), and the write cost
  * is one shuffle OF THE INCREMENT into bucket files — never a
  * history rewrite. IndexCompactSpec re-pins the next increment's
  * one-exchange plan against the compacted table; ScaleProbe's
  * compact block measures cost flat in history size.
  */
object IndexCompact {

  /** Merge `admits` into the bucketed history `table` under keep-first
    * semantics: rows whose `keys` already exist in the table are
    * dropped (first writer wins — re-admitting an already-indexed
    * fingerprint is a no-op, so the op is idempotent per round), the
    * rest append in the table's own bucket layout. Returns the number
    * of rows appended.
    *
    * The anti-join plans ONE exchange (the increment) against the
    * bucketed table — same shape as the admit query itself — and the
    * append shuffles only those survivors into bucket files. Column
    * order aligns to the table schema. */
  /** @param keys       the IDENTITY columns (keep-first grain) — the
    *                    anti-join keys
    * @param bucketCols  the table's physical bucket spec; must equal
    *                    what the table was written with (Spark verifies
    *                    the append) — defaults to `keys`, but a
    *                    composite-identity index bucketed on a prefix
    *                    (e.g. band rows keyed (band_idx, band_val,
    *                    hist_id) in a (band_idx, band_val)-bucketed
    *                    layout) passes its own spec */
  def compact(spark: SparkSession, table: String, admits: DataFrame,
              keys: Seq[String], buckets: Int = 8,
              bucketCols: Seq[String] = Nil): Long = {
    require(keys.nonEmpty, "compact needs at least one key column")
    val bcols = if (bucketCols.nonEmpty) bucketCols else keys
    // a PRIOR round's append must be visible to THIS round's anti-join
    // even when the session cached the table's file listing (the
    // streaming ingest loop compacts once per micro-batch and read a
    // stale pre-append listing without this — StreamCompactLoopSpec)
    spark.catalog.refreshTable(table)
    val target = spark.table(table)
    val missing = target.columns.filterNot(admits.columns.contains)
    require(missing.isEmpty,
      s"admits frame lacks index columns: ${missing.mkString(", ")}")
    // the admitted count rides the write job as an observed metric
    // (r20; the IndexRetract.fold r19 device): the old
    // localCheckpoint + write + count shape paid two extra Spark jobs
    // per op (a blocking materialization, then a count over the
    // blocks) purely so the count would see exactly the written rows —
    // observe() reports exactly the rows that flowed into the write,
    // by construction, with zero extra passes (WriteMetricsSpec pins
    // the value against a read-back count)
    val obs = new org.apache.spark.sql.Observation()
    val fresh = admits
      .select(target.columns.map(org.apache.spark.sql.functions.col): _*)
      .join(target, keys, "left_anti")
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    fresh.write
      .mode(SaveMode.Append)
      .bucketBy(buckets, bcols.head, bcols.tail: _*)
      .sortBy(bcols.head, bcols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
    // ...and THIS append must be visible to the session's next reader
    // (the stream-loop's follow-up batch, the caller's read-back) even
    // where the relation cache kept the pre-append listing
    spark.catalog.refreshTable(table)
    obs.get.getOrElse("rows", 0L).asInstanceOf[Long]
  }

  /** [[compact]] for a PARTITION-ROUTED store (the [[IndexRetract]]
    * layout, partitioned on a deterministic function of the key): same
    * keep-first semantics, same one-exchange-of-the-increment cost —
    * the anti-join plans against the table, and the append shuffles
    * only the survivors, partition-ALIGNED on the routing column so
    * each touched directory gains one file instead of one sliver per
    * task (the write-fan-out lesson from q_index_retract's store
    * build). Existing files are never rewritten: Append mode only adds
    * files, so untouched partitions stay byte-identical — pinned, with
    * the retraction composition, by IndexLifecycleSpec. Together with
    * [[IndexRetract.tombstone]]/[[IndexRetract.fold]] this gives the
    * partitioned index its full maintenance lifecycle: nightly admits
    * in, delete-lists out, never a store rewrite. */
  def compactPartitioned(spark: SparkSession, table: String,
                         admits: DataFrame, keys: Seq[String],
                         partCol: String): Long = {
    require(keys.nonEmpty, "compact needs at least one key column")
    spark.catalog.refreshTable(table) // see compact()
    val target = spark.table(table)
    val missing = target.columns.filterNot(admits.columns.contains)
    require(missing.isEmpty,
      s"admits frame lacks index columns: ${missing.mkString(", ")}")
    // observed-count-on-the-write, the compact() r20 device
    val obs = new org.apache.spark.sql.Observation()
    val fresh = admits
      .select(target.columns.map(org.apache.spark.sql.functions.col): _*)
      .join(target, keys, "left_anti")
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    fresh.repartition(org.apache.spark.sql.functions.col(partCol))
      .write.mode(SaveMode.Append).insertInto(table)
    spark.catalog.refreshTable(table) // see compact()
    obs.get.getOrElse("rows", 0L).asInstanceOf[Long]
  }
}
