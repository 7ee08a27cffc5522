package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** The as-of enrichment state is one click triple per user; a restart
  * that lost it would enrich post-restart purchases with null — a
  * plausible-looking value (purchases with no prior click are legal), so
  * nothing downstream would crash. Replay a click before the restart and
  * purchases after it; the enrichment must come from the restored
  * triple, and the same-second tiebreak must also hold across batches. */
class AsOfRestartSpec extends SparkTestBase {
  import spark.implicits._

  private def writeBatch(dir: String,
                         rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts_ms", "user_id", "event_type", "value", "props")
      .select($"event_id",
        ($"ts_ms" * 1000000L).as("ts"),
        $"user_id", $"event_type", $"value", $"props")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(dir)

  test("enrichment survives restart; same-second tiebreak holds across batches") {
    val srcDir = Files.createTempDirectory("asof_src").toString
    val outDir = Files.createTempDirectory("asof_out").toString
    val ckptDir = Files.createTempDirectory("asof_ckpt").toString
    val base = 1700000000000L

    def runOnce(): Unit = {
      val q = EventStream.asofEnrich(spark,
        EventStream.readEvents(spark, srcDir)).toDF()
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // run 1: two clicks in the same second — the GREATER event_id's value
    // (7.0) must become state — plus one enriched purchase
    writeBatch(srcDir, Seq(
      (2L, base + 1000L, 9L, "click", 7.0, "{}"),
      (1L, base + 1500L, 9L, "click", 3.0, "{}"), // same sec, lower id
      (3L, base + 60000L, 9L, "purchase", 100.0, "{}")))
    runOnce()

    // run 2 (restart): a purchase with no new click — enrichment must
    // come from the RESTORED 7.0 triple; then a fresh click supersedes
    // and a later purchase picks it up
    writeBatch(srcDir, Seq(
      (4L, base + 120000L, 9L, "purchase", 200.0, "{}"),
      (5L, base + 180000L, 9L, "click", 11.0, "{}"),
      (6L, base + 240000L, 9L, "purchase", 300.0, "{}")))
    runOnce()

    val got = spark.read.parquet(outDir)
      .select($"eventId", $"lastClickValue")
      .as[(Long, Option[Double])].collect().toMap
    assert(got === Map(
      3L -> Some(7.0),   // same-second tiebreak: event 2 beat event 1
      4L -> Some(7.0),   // restored across the restart
      6L -> Some(11.0))) // superseded by the post-restart click
  }
}
