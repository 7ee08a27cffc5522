package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** The trailing moving average's state carries BOTH open hour sums and
  * the ≤2 most recent CLOSED hours; a restart that lost the closed list
  * would silently emit window_hours=1 averages for every post-restart
  * hour — numerically plausible, wrong. This spec closes hours on both
  * sides of a checkpointed restart and asserts the trailing windows
  * span it. */
class MovingAvgRestartSpec extends SparkTestBase {
  import spark.implicits._

  private def writeBatch(dir: String,
                         rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts_ms", "user_id", "event_type", "value", "props")
      .select($"event_id",
        ($"ts_ms" * 1000000L).as("ts"),
        $"user_id", $"event_type", $"value", $"props")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(dir)

  test("trailing windows span a checkpointed restart") {
    val srcDir = Files.createTempDirectory("mavg_src").toString
    val outDir = Files.createTempDirectory("mavg_out").toString
    val ckptDir = Files.createTempDirectory("mavg_ckpt").toString
    val H = 3600000L
    val base = (1700000000000L / H + 1) * H

    def runOnce(): Unit = {
      val q = EventStream.movingAvgHourly(spark,
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

    // run 1: hour 0 sums to 10.0, hour 1 to 20.0, and a probe event in
    // hour 3 whose watermark (3h - 2h = hour 1 end... exactly hour 1
    // START) closes ONLY hour 0 — hour 1 and the closed-hours list must
    // survive in state
    writeBatch(srcDir, Seq(
      (1L, base + 60000L, 7L, "m", 4.0, "{}"),
      (2L, base + 120000L, 7L, "m", 6.0, "{}"),
      (3L, base + H + 60000L, 7L, "m", 20.0, "{}"),
      (4L, base + 3 * H + 1000L, 7L, "m", 30.0, "{}")))
    runOnce()

    // run 2 (restart): advance the watermark past hour 3 — hours 1 and 3
    // close now, and hour 1's window must include PRE-RESTART hour 0
    // (window_hours = 2), hour 3's must include hour 1 (2 hours back,
    // inclusive RANGE) and hour 3 itself
    writeBatch(srcDir, Seq((5L, base + 7 * H, 7L, "m", 0.0, "{}")))
    runOnce()

    val got = spark.read.parquet(outDir)
      .select($"hourTs".cast("long") * 1000, $"movingAvgValue", $"windowHours")
      .as[(Long, Double, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (base, 10.0, 1L),          // hour 0: closed in run 1, alone in frame
      (base + H, 15.0, 2L),      // hour 1: (10+20)/2 — window spans the restart
      (base + 3 * H, 25.0, 2L))) // hour 3: (20+30)/2 — hour 1 in range, hour 0 aged out
    // hour 7 (the run-2 probe) stays open: its end is past the final
    // watermark, so it must NOT appear
  }
}
