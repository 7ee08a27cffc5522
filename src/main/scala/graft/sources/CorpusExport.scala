package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The training-data EXPORT path — q_shard_assign's scaladoc promise
  * made real: at scale the per-shard `pos` window becomes write-time
  * `sortWithinPartitions` into per-shard files, and training order is
  * implicit in FILE ORDER. This object materializes exactly that
  * layout, so "the designed 100 TB route" is the implemented one:
  *
  *  - every document gets the deterministic md5 shuffle key
  *    ([[graft.queries.CurationQueries.shuffleKey]] — the SAME
  *    definition q_shard_assign reports, so the report IS the
  *    export's manifest);
  *  - `repartition(shard)` puts each shard's rows in one task (one
  *    parquet file per shard directory — the property that makes file
  *    order well-defined);
  *  - `sortWithinPartitions(shard, key, doc_id)` orders each file by
  *    the shuffle key, destroying crawl-order locality exactly as the
  *    assignment query specifies;
  *  - `partitionBy(shard)` gives readers per-shard directories: a
  *    1000-worker training job reads shard directories independently,
  *    no coordination, reproducible order.
  *
  * No global sort anywhere: the one exchange is the shard
  * repartition, and each task sorts only its own shard's slice —
  * at 100 TB the shard count rises so slices stay spillable, nothing
  * else changes (the q_shard_assign scale note, now executable).
  * CorpusExportSpec proves the contract: per-shard FILE ORDER read
  * back equals q_shard_assign's `pos` order, bit-for-bit. */
object CorpusExport {

  /** Write `docs` (any frame with a doc_id column) as a sharded,
    * shuffle-ordered parquet corpus under `outDir`. */
  def writeSharded(docs: DataFrame, outDir: String,
                   shards: Int = 16): Unit =
    docs
      .withColumn("__key", graft.queries.CurationQueries.shuffleKey)
      .withColumn("shard",
        pmod(col("__key"), lit(shards.toLong)).cast("int"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__key"), col("doc_id"))
      .drop("__key")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(outDir)
}
