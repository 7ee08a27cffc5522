package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions._

/** Delete PROPAGATION for partition-routed derived state — the
  * retraction sibling of [[IndexCompact]] (which only ever inserts).
  * A production corpus owes more than ingest maintenance: a GDPR /
  * takedown delete-list must be forgotten not just from the corpus
  * files but from every derived index built over them (fingerprint
  * histories, gram postings, band indexes), and at 100 TB "rewrite the
  * index nightly" is not an answer.
  *
  * The design is the merge-on-read / copy-on-write split every modern
  * table format converged on (Delta/Iceberg/Hudi — public designs):
  *
  *  - [[tombstone]] stages the delete-list as APPEND-ONLY tombstone
  *    rows — cost ∝ the delete-list, zero store rewrite. Readers that
  *    must see deletes immediately use [[readMor]] (store ⟕anti
  *    tombstones — one broadcast-sized anti-join, since delete-lists
  *    are small by nature).
  *  - [[fold]] is the scheduled copy-on-write: rewrite ONLY the store
  *    partitions the tombstoned keys route to. The store is
  *    partition-routed on a deterministic function of the key (the
  *    caller's `partCol`), so the tombstones' own routing values name
  *    exactly the directories that can contain a victim; everything
  *    else is untouched files (IndexRetractSpec pins this by file
  *    mtime). Cost ∝ affected-partition bytes — with partition
  *    fan-out sized to the corpus (the production rule: partitions ∝
  *    corpus / target-partition-size), a bounded delete-list touches a
  *    bounded byte volume no matter how large the store grows
  *    (ScaleProbe's op_index_retract block measures exactly that).
  *
  * Partitions whose rows ALL die need explicit care: dynamic partition
  * overwrite only replaces partitions PRESENT in the written frame, so
  * an all-victims partition would silently keep its stale files —
  * [[fold]] drops those directories itself and refreshes the table.
  */
object IndexRetract {

  /** Stage `dead` identity rows as tombstones (append-only, cost ∝ the
    * delete-list). `dead` must carry the store's key columns AND its
    * partition-routing column, derived with the same expression the
    * store was written with. Returns rows staged. */
  def tombstone(spark: SparkSession, tombTable: String,
                dead: DataFrame): Long = {
    // the staged count rides the write job as an observed metric (r20):
    // observe() reports exactly the rows the write consumed — the same
    // "count what was actually staged" guarantee the old localCheckpoint
    // + count shape bought with two extra Spark jobs, even under
    // expensive or non-deterministic lineage (the metric and the files
    // come from the ONE execution)
    val obs = new org.apache.spark.sql.Observation()
    dead.observe(obs, count(lit(1)).as("rows"))
      .write.mode(SaveMode.Append).format("parquet")
      .saveAsTable(tombTable)
    obs.get.getOrElse("rows", 0L).asInstanceOf[Long]
  }

  /** The merge-on-read view: store rows minus tombstoned identities —
    * what a reader sees between a [[tombstone]] and the next scheduled
    * [[fold]]. One anti-join against the (small, distinct) tombstone
    * set; equal to the folded store by construction (spec-pinned). */
  def readMor(spark: SparkSession, storeTable: String, tombTable: String,
              keys: Seq[String]): DataFrame = {
    val store = spark.table(storeTable)
    if (!spark.catalog.tableExists(tombTable)) store
    else store.join(
      spark.table(tombTable).select(keys.map(col): _*).distinct(),
      keys, "left_anti")
  }

  /** @param partitionsRewritten affected partitions — distinct
    *                            tombstone routing values; a value the
    *                            store has no directory for counts here
    *                            but rewrites nothing
    * @param rowsRemoved         victim rows physically dropped
    * @param partitionsDropped   affected partitions left with zero
    *                            survivors, whose directories were
    *                            deleted outright */
  case class FoldStats(partitionsRewritten: Int, rowsRemoved: Long,
                       partitionsDropped: Int)

  /** Copy-on-write fold: physically remove every tombstoned identity
    * from the store, rewriting ONLY the partitions the tombstones
    * route to, then clear the tombstone table (it is folded in). Safe
    * to call with no/empty tombstones (no-op) and idempotent — folding
    * an already-folded delete-list removes nothing. */
  def fold(spark: SparkSession, storeTable: String, tombTable: String,
           partCol: String, keys: Seq[String]): FoldStats = {
    if (!spark.catalog.tableExists(tombTable))
      return FoldStats(0, 0L, 0)
    val tomb = spark.table(tombTable)
      .select((keys :+ partCol).map(col): _*).distinct()
      // one materialization serves the routing-value collect AND the
      // anti-join below
      .localCheckpoint()
    val affected = tomb.select(partCol).distinct().collect().map(_.get(0))
    if (affected.isEmpty) {
      graft.sources.Layout.resetTable(spark, tombTable)
      return FoldStats(0, 0L, 0)
    }
    // partition-pruned read: only directories a victim can live in
    val pruned = spark.table(storeTable)
      .filter(col(partCol).isin(affected.toIndexedSeq: _*))
    // `before` rides the survivors job as an observed metric (r19):
    // a separate pruned.count() re-scanned every affected partition
    // only to size FoldStats.rowsRemoved. CollectMetrics sits above
    // the partition filter (pruning intact) and below the anti-join
    // (which eliminates no left rows at plan time), so the count is
    // exactly pruned's rows and the scan runs once.
    val obs = new org.apache.spark.sql.Observation()
    // `after` rides the SAME checkpoint job as a second observation
    // (r20): the survivors' materialization already computes every row,
    // so a separate count() over the checkpointed blocks was one more
    // Spark job per fold for a number the job in flight already knew
    val obsAfter = new org.apache.spark.sql.Observation()
    val survivors = pruned.observe(obs, count(lit(1)).as("rows"),
        collect_set(col(partCol)).as("pvals"))
      .join(tomb.drop(partCol), keys, "left_anti")
      .observe(obsAfter, count(lit(1)).as("rows"))
      // sever lineage from the very files the overwrite replaces
      .localCheckpoint()
    val after = obsAfter.get.getOrElse("rows", 0L).asInstanceOf[Long]
    val before = obs.get.getOrElse("rows", 0L).asInstanceOf[Long]
    // pruned's own distinct partition values, off the same observed
    // job — the third scan of the affected partitions the old shape
    // paid (pruned.distinct for the fullyDead anti-join) is gone
    val prunedVals = obs.get("pvals") match {
      case s: scala.collection.Seq[_] => s.toSeq.asInstanceOf[Seq[Any]]
      case a: Array[_] => a.toSeq.asInstanceOf[Seq[Any]]
      case other => throw new IllegalStateException(
        s"unexpected collect_set metric shape: ${other.getClass}")
    }
    // All-victims partitions = pruned's values minus the survivors' —
    // both sides STORE-typed (prunedVals comes off pruned itself, the
    // survivors inherit its schema), so the boxed set-difference cannot
    // hit the r16 coercion trap (that trap was TOMB-typed values boxed
    // against store-typed ones; the isin/join coercions still guard the
    // tomb side upstream). Materialized BEFORE the overwrite replaces
    // the files, exactly as the old pruned-vs-survivors anti-join was —
    // this form just reads the survivors' checkpointed blocks instead
    // of re-scanning the affected partitions a third time.
    val survivorVals = survivors.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSet
    val fullyDead = prunedVals.filterNot(survivorVals).toArray
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // positional: survivors carries the table's own column order
      // (data columns first, partition column last — spark.table's
      // layout for a partitioned datasource table). Repartition on the
      // routing column first: dynamic overwrite otherwise fans every
      // task into every affected directory (tasks × partitions small
      // files), and the rewritten partitions should come back as one
      // file each — the same layout the store was built with.
      survivors.repartition(col(partCol))
        .write.mode(SaveMode.Overwrite).insertInto(storeTable)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // all-victims partitions never appear in `survivors`, so dynamic
    // overwrite left their stale files — drop them through the catalog
    // (so a partition-managing catalog stays consistent) with a
    // VERIFIED filesystem fallback
    dropPartitions(spark, storeTable, partCol, fullyDead.toIndexedSeq)
    spark.catalog.refreshTable(storeTable)
    graft.sources.Layout.resetTable(spark, tombTable)
    FoldStats(affected.length, before - after, fullyDead.length)
  }

  /** Drop the named partitions of `table` — catalog first (`ALTER TABLE
    * … DROP PARTITION`, so a metastore that tracks partitions never
    * lists a directory the files no longer back), then a filesystem
    * sweep of any surviving directory under the PROPERLY ESCAPED
    * partition path (Spark escapes special characters in partition
    * directory names; a raw `s"$col=$v"` path makes the delete a silent
    * no-op for any value needing escaping — the 'forgotten identities
    * resurface' failure). Every delete is verified: a partition
    * directory that survives the drop fails loudly instead of leaving
    * stale victim rows in the store. */
  private[graft] def dropPartitions(spark: SparkSession, table: String,
                                    partCol: String,
                                    values: Seq[Any]): Unit = {
    if (values.isEmpty) return
    val loc = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table)).location
    val root = new org.apache.hadoop.fs.Path(loc)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    values.foreach { v =>
      require(v != null,
        s"cannot drop a null-valued $partCol partition: the routing " +
          "column of a partition-routed index must be non-null by " +
          "construction")
      val lit = v match {
        case s: String => "'" + s.replace("'", "''") + "'"
        case x => x.toString
      }
      // the catalog drop also removes the data directory where the
      // catalog manages partitions; where it does not (plain path
      // tables), the verified fs sweep below is the invariant
      try spark.sql(
        s"ALTER TABLE $table DROP IF EXISTS PARTITION ($partCol=$lit)")
      catch { case _: org.apache.spark.sql.AnalysisException => () }
      val dir = new org.apache.hadoop.fs.Path(root,
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(partCol, v.toString))
      if (fs.exists(dir))
        require(fs.delete(dir, true),
          s"failed to drop all-victims partition directory $dir")
      require(!fs.exists(dir),
        s"all-victims partition directory survived the drop: $dir")
    }
  }
}
