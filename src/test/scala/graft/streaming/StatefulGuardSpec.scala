package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** Guards on the stateful streaming twins' degenerate paths:
  *  - gapfill's optional retirement horizon (a permanently dead event
  *    type must stop emitting zeros and release its state instead of
  *    growing output and timer churn forever);
  *  - retention's cannot-rewind rule (a late event from BEFORE a user's
  *    stored cohort week must be dropped, never emitted as a negative
  *    week offset the batch grid could not contain). */
class StatefulGuardSpec extends SparkTestBase {
  import spark.implicits._

  private val H = 3600000L
  private val Week = 7 * 86400000L

  private def writeBatch(dir: String,
                         rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts_ms", "user_id", "event_type", "value", "props")
      .select($"event_id",
        ($"ts_ms" * 1000000L).as("ts"), // long nanos, like the real table
        $"user_id", $"event_type", $"value", $"props")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(dir)

  test("gapfill retires a silent key after maxSilentHours and stops the zero stream") {
    val srcDir = Files.createTempDirectory("gapfill_retire_src").toString
    val base = (1700000000000L / H + 1) * H // hour-aligned origin
    // type "m" has one event in hour 0 then goes silent forever; type "z"
    // far in the future only exists to drive the watermark to base+8h
    writeBatch(srcDir, Seq(
      (1L, base + 60000L, 7L, "m", 1.0, "{}"),
      (2L, base + 10 * H, 8L, "z", 1.0, "{}")))

    val q = EventStream.runToMemory(
      EventStream.gapfillHourly(spark,
        EventStream.readEvents(spark, srcDir),
        maxSilentHours = Some(2)).toDF(), "gapfill_retire")
    q.awaitTermination()

    val got = spark.table("gapfill_retire")
      .select($"eventType", $"hourTs".cast("long") * 1000, $"eventCount")
      .as[(String, Long, Long)].collect().toSeq.sorted
    // without the horizon the watermark (base+8h) would have zero-filled
    // "m" through hour 7; with maxSilentHours=2 the key emits its data
    // hour, exactly 2 zeros, then retires — and "z"'s own hour is still
    // open (10h+1h > watermark), so nothing else appears
    val want = Seq(
      ("m", base, 1L), ("m", base + H, 0L), ("m", base + 2 * H, 0L))
    assert(got === want)
  }

  test("retention drops a late pre-cohort week instead of emitting a negative offset") {
    val srcDir = Files.createTempDirectory("retention_rewind_src").toString
    val outDir = Files.createTempDirectory("retention_rewind_out").toString
    val ckptDir = Files.createTempDirectory("retention_rewind_ckpt").toString
    // 2024-01-01 was a Monday: a date_trunc("week") boundary
    val week1 = 1704067200000L

    def runOnce(): Unit = {
      val q = EventStream.retentionHits(spark,
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

    // batch 1: user 7 first seen 30 min AFTER the week boundary — the
    // cohort anchors to week1; watermark persists at ts − 2h
    writeBatch(srcDir, Seq((1L, week1 + 30 * 60000L, 7L, "m", 1.0, "{}")))
    runOnce()
    // batch 2: an event 30 min BEFORE the boundary — inside the 2h
    // watermark (so it reaches the operator) but in the PREVIOUS week;
    // without the off >= 0 guard this emitted weekOffset −1
    writeBatch(srcDir, Seq((2L, week1 - 30 * 60000L, 7L, "m", 1.0, "{}")))
    runOnce()

    val got = spark.read.parquet(outDir)
      .select($"cohortWeek".cast("long") * 1000, $"weekOffset")
      .as[(Long, Int)].collect().toSeq.sorted
    // exactly the batch-expressible row: cohort week1, offset 0; the
    // rewind event contributed nothing (and certainly nothing negative)
    assert(got === Seq((week1, 0)))
    // the cohort anchor itself must not have moved: a later same-cohort
    // week still reports against week1
    writeBatch(srcDir, Seq((3L, week1 + Week + 60000L, 7L, "m", 1.0, "{}")))
    runOnce()
    val after = spark.read.parquet(outDir)
      .select($"cohortWeek".cast("long") * 1000, $"weekOffset")
      .as[(Long, Int)].collect().toSeq.sorted
    assert(after === Seq((week1, 0), (week1, 1)))
  }
}
