package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.queries.CurationQueries

/** Structured Streaming faces of the corpus-curation operators: the
  * ingestion-time twin of [[graft.queries.CurationQueries]]'s batch
  * decontamination, for pipelines that screen documents as they arrive
  * rather than in a nightly sweep.
  *
  * Scale shape: the stream side is stateless — a stream-static join
  * probes the static benchmark gram set per micro-batch, and the
  * benchmark side broadcasts (eval suites are KBs; corpora are TBs), so
  * there is no streaming state store at all, no watermark bookkeeping,
  * and per-batch work is linear in batch size exactly like the batch
  * query's per-partition work.
  */
object DocStream {

  /** The documents schema as shipped in the testdata parquet. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Source: replay a parquet documents directory as a stream, one file
    * per micro-batch at most. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

  /** Streaming decontamination: every (doc_id, gram) hit of an incoming
    * document against the static benchmark gram set — the quarantine log
    * an ingestion pipeline writes before admitting a document to the
    * corpus. Append-mode safe: the exploded stream side semi-probes the
    * broadcast static side with no aggregation, so rows finalize
    * immediately.
    *
    * @param docs       streaming documents (schema: [[docSchema]])
    * @param benchGrams static frame with a `gram` column (e.g.
    *                   [[graft.queries.CurationQueries.gramInventory]]
    *                   over the benchmark slice, projected + distinct)
    */
  def contaminationHits(docs: DataFrame, benchGrams: DataFrame,
                        w: Int = 4): DataFrame = {
    // stream-static joins re-evaluate the static lineage EVERY micro-batch
    // — cache the (small) distinct gram set so batch N pays a cached scan,
    // not a re-tokenize + re-shingle + re-aggregate of the benchmark
    // corpus. The cache lives for the stream's lifetime, which is the
    // benchmark set's lifetime; callers managing many streams can
    // unpersist via spark.catalog.clearCache()
    val bench = benchGrams.select("gram").distinct().cache()
    CurationQueries.gramInventory(docs, w)
      .join(broadcast(bench), Seq("gram"))
      .select(col("doc_id"), col("gram"))
  }

  /** Streaming exact dedup over document fingerprints — the streaming
    * face of the batch collapse (the keeper selection inside every
    * near-dup query): the first arrival per normalized-text md5 passes,
    * later duplicates drop.
    *
    * With `eventTimeCol` set (the production shape), the column is
    * watermarked with `horizon` and carried THROUGH the projection, and
    * the dedup is `dropDuplicatesWithinWatermark` — fingerprints age out
    * of the state store once the watermark passes their horizon, so
    * state is bounded by distinct content per horizon window, not by the
    * life of the query. Without it (the testdata shape — documents
    * carry no timestamp) the dedup falls back to plain `dropDuplicates`,
    * whose state grows with distinct content for the query's lifetime:
    * acceptable for bounded replays, unbounded ingests must pass the
    * event-time column. (Earlier revisions only documented the
    * production shape while the emitted schema dropped every event-time
    * column — a caller could not actually reach it.) */
  def dedupDocs(docs: DataFrame, eventTimeCol: Option[String] = None,
                horizon: String = "24 hours"): DataFrame = {
    val fp = docs.filter(length(trim(col("text"))) > 0)
      .withColumn("fp",
        graft.Clean.fingerprint(col("text")))
    eventTimeCol match {
      case Some(c) =>
        fp.withWatermark(c, horizon)
          .dropDuplicatesWithinWatermark("fp")
          .select(col("doc_id"), col("lang"), col("source"), col("fp"), col(c))
      case None =>
        fp.dropDuplicates("fp")
          .select(col("doc_id"), col("lang"), col("source"), col("fp"))
    }
  }
}
