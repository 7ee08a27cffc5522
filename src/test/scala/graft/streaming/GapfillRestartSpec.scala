package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** The timer-driven gapfill grid is only trustworthy if its state — the
  * grid cursor AND the open hour counts — survives a checkpointed
  * restart: a resumed query that forgot a silent hour would emit a grid
  * with holes, which is exactly the defect the operator exists to
  * prevent. This spec runs the stream twice over a growing directory
  * with one checkpoint: counts observed before the restart must emit
  * (with interleaved zeros) after it, triggered purely by the watermark
  * advancing on post-restart data. */
class GapfillRestartSpec extends SparkTestBase {
  import spark.implicits._

  private def writeBatch(dir: String,
                         rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts_ms", "user_id", "event_type", "value", "props")
      .select($"event_id",
        ($"ts_ms" * 1000000L).as("ts"), // long nanos, like the real table
        $"user_id", $"event_type", $"value", $"props")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(dir)

  test("gapfill grid survives restart and zero-fills hours across it") {
    val srcDir = Files.createTempDirectory("gapfill_src").toString
    val outDir = Files.createTempDirectory("gapfill_out").toString
    val ckptDir = Files.createTempDirectory("gapfill_ckpt").toString
    val H = 3600000L
    val base = (1700000000000L / H + 1) * H // hour-aligned origin

    def runOnce(): Unit = {
      val q = EventStream.gapfillHourly(spark,
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

    // run 1: two events in hour 0, one in hour 1 — the 2h watermark ends
    // at hour0 − 1h, so NOTHING is emitted; the counts live only in the
    // checkpointed state store
    writeBatch(srcDir, Seq(
      (1L, base + 60000L, 7L, "m", 1.0, "{}"),
      (2L, base + 120000L, 7L, "m", 1.0, "{}"),
      (3L, base + H + 60000L, 7L, "m", 1.0, "{}")))
    runOnce()

    // run 2 (restart from the checkpoint): a single far-future event
    // advances the watermark to hour 4, and the TIMER sweep must emit the
    // pre-restart counts for hours 0–1 plus zeros for the silent hours
    // 2–3 — all from restored state
    writeBatch(srcDir, Seq((4L, base + 6 * H, 7L, "m", 1.0, "{}")))
    runOnce()

    val got = spark.read.parquet(outDir)
      .select($"eventType", $"hourTs".cast("long") * 1000, $"eventCount")
      .as[(String, Long, Long)].collect().toSeq.sorted
    val want = Seq(
      ("m", base, 2L), ("m", base + H, 1L),
      ("m", base + 2 * H, 0L), ("m", base + 3 * H, 0L))
    assert(got === want)
  }
}
