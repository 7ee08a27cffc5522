package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Oracle-backed faces of the multimodal binary-column plumbing
  * ([[graft.multimodal.Multimodal]]): payloads are opaque `binary`
  * columns, metadata is typed, and per-item feature extraction runs as
  * partition-local batch functions — the Scala analog of `mapInPandas`.
  *
  * The testdata carries no real media, so the payloads are the document
  * texts' UTF-8 bytes (built identically on the oracle side: for UTF-8
  * payloads DuckDB's `md5(text)` hashes the same bytes Spark's
  * `md5(binary)` does, and for the ASCII corpus `ord(char)` IS the
  * payload byte). What the oracle then verifies is real: the binary
  * metadata path end to end, and — in q_media_histogram — the actual
  * [[Multimodal.FakeCodec]] batch decode running inside a typed
  * `mapPartitions`, hash-matched against a pure-SQL replay. A real
  * image/audio codec swaps into the same seam (Multimodal scaladoc).
  */
object MediaQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-item binary metadata: byte size + content digest over the
    // opaque payload column — the manifest row a media lake keeps per
    // object. Built on the ONE payload seam (Multimodal.documentsAsMedia)
    // so a real ingestion swap carries every query with it. Map-only,
    // scan-bound; the digest doubles as the exact-dedup key for binary
    // payloads (same role `fp` plays for text).
    "q_media_meta" -> ((s, dir) => {
      import s.implicits._
      Multimodal.documentsAsMedia(s, dir)
        .select($"item_id", $"mime",
          length($"payload").cast("long").as("byte_size"),
          md5($"payload").as("payload_md5"))
        .orderBy("item_id")
    }),

    // Per-source byte histogram THROUGH the codec seam: payloads decode
    // via Multimodal.extractFeatures — FakeCodec inside mapPartitions,
    // one iterator per partition, no per-row driver round trips, exactly
    // how a real decoder runs — then the per-item histograms aggregate
    // distributedly. The typed stage is the one part Catalyst can't see
    // through; everything around it stays codegen'd.
    "q_media_histogram" -> ((s, dir) => {
      import s.implicits._
      Multimodal.extractFeatures(Multimodal.documentsAsMedia(s, dir))
        .select($"source", posexplode($"histogram"))
        .toDF("source", "bucket", "cnt")
        .groupBy($"source", $"bucket")
        .agg(sum($"cnt").as("byte_count"))
        .filter($"byte_count" > 0)
        .orderBy("source", "bucket")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_media_meta" ->
      """SELECT doc_id AS item_id, 'text/plain' AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_size,
        |  md5(text) AS payload_md5
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY item_id""".stripMargin,

    // replays FakeCodec.decodeHistogram (bucket = byte * 16 / 256 =
    // byte // 16) character-wise; the corpus is ASCII so ord(char) is
    // the UTF-8 payload byte
    "q_media_histogram" ->
      """WITH chars AS (
        |  SELECT source, text, unnest(range(1, length(text) + 1)) AS i
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (
        |  SELECT source,
        |    ord(substring(text, CAST(i AS INT), 1)) // 16 AS bucket
        |  FROM chars)
        |SELECT source, CAST(bucket AS INT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS byte_count
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
