package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._
import graft.SparkTestBase

/** The JSONL ingest face's failure mode: raw corpus drops contain
  * truncated/garbage lines, and a reader that either crashes or silently
  * drops them is wrong — PERMISSIVE mode must parse the good lines and
  * CAPTURE the bad ones in the corrupt-record column so the pipeline can
  * quarantine-count them (the q_scan_jsonl round-trip query deliberately
  * stages clean data; this spec owns the dirty half). */
class JsonlSourceSpec extends SparkTestBase {
  import spark.implicits._

  test("permissive jsonl read parses good lines and captures corrupt ones") {
    val dir = Files.createTempDirectory("jsonl_src")
    Files.write(dir.resolve("part-000.jsonl"), java.util.Arrays.asList(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "line with \"quotes\" and \n newline", "lang": "de"}""",
      """{"doc_id": 3, "text": "truncated""", // unterminated string
      """not json at all"""))

    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("_bad", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(dir.toString)
      .cache() // corrupt-column access requires the parsed frame, not a pushdown

    assert(df.count() === 4)
    val good = df.filter($"_bad".isNull)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(good === Map(
      1L -> "hello world",
      2L -> "line with \"quotes\" and \n newline"))
    val bad = df.filter($"_bad".isNotNull).select($"_bad").as[String].collect()
    assert(bad.length === 2)
    assert(bad.exists(_.contains("truncated")))
    assert(bad.exists(_.contains("not json at all")))
  }
}
