package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** Cohort stability across a checkpointed restart: a user's cohort week
  * is fixed by their FIRST event ever seen, so a post-restart event must
  * (a) not re-emit an offset already reported before the restart and
  * (b) compute new offsets against the ORIGINAL cohort week restored
  * from state — a query that lost CohortState would silently re-cohort
  * every user at their first post-restart event, shifting the whole
  * retention grid right. */
class RetentionRestartSpec extends SparkTestBase {
  import spark.implicits._

  private def writeBatch(dir: String,
                         rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts_ms", "user_id", "event_type", "value", "props")
      .select($"event_id",
        ($"ts_ms" * 1000000L).as("ts"),
        $"user_id", $"event_type", $"value", $"props")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(dir)

  test("cohort week and reported offsets survive a restart") {
    val srcDir = Files.createTempDirectory("ret_src").toString
    val outDir = Files.createTempDirectory("ret_out").toString
    val ckptDir = Files.createTempDirectory("ret_ckpt").toString
    val W = 7L * 86400000L
    // a Monday-aligned origin so week offsets are unambiguous
    val base = java.sql.Timestamp.valueOf("2026-01-05 00:00:00").getTime

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

    // run 1: user 7 active in weeks 0 and 1
    writeBatch(srcDir, Seq(
      (1L, base + 1000L, 7L, "click", 1.0, "{}"),
      (2L, base + W + 1000L, 7L, "click", 1.0, "{}")))
    runOnce()

    // run 2 (restart): week 1 AGAIN (must not re-emit) and week 3 (must
    // emit offset 3 against the restored week-0 cohort, not offset 0
    // against a re-derived post-restart cohort)
    writeBatch(srcDir, Seq(
      (3L, base + W + 2000L, 7L, "click", 1.0, "{}"),
      (4L, base + 3 * W + 1000L, 7L, "click", 1.0, "{}")))
    runOnce()

    val got = spark.read.parquet(outDir)
      .select($"cohortWeek".cast("long") * 1000, $"weekOffset")
      .as[(Long, Int)].collect().toSeq.sorted
    assert(got === Seq((base, 0), (base, 1), (base, 3)))
  }
}
