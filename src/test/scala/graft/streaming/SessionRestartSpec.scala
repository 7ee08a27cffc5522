package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Cross-batch stateful sessionization: state must survive a checkpointed
  * restart, and an out-of-order event (late but within the watermark)
  * arriving in a later batch must merge into — and only widen — the
  * existing session. */
class SessionRestartSpec extends SparkTestBase {
  import spark.implicits._

  private def writeBatch(dir: String, name: String,
                         rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts_ms", "user_id", "event_type", "value", "props")
      .select($"event_id",
        // files carry long nanos like the real events table
        ($"ts_ms" * 1000000L).as("ts"),
        $"user_id", $"event_type", $"value", $"props")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(dir)

  test("session state survives restart and merges late events by widening") {
    val srcDir = Files.createTempDirectory("events_src").toString
    val outDir = Files.createTempDirectory("events_out").toString
    val ckptDir = Files.createTempDirectory("events_ckpt").toString
    val base = 1700000000000L // arbitrary epoch ms

    def runOnce(): Unit = {
      val stream = EventStream.readEvents(spark, srcDir)
      val q = EventStream.sessionize(spark, stream).toDF()
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // batch 1: two events 10 min apart -> one open session [0, 10min]
    writeBatch(srcDir, "b1", Seq(
      (1L, base, 7L, "click", 1.0, "{}"),
      (2L, base + 10 * 60 * 1000, 7L, "click", 1.0, "{}")))
    runOnce()

    // batch 2: an OUT-OF-ORDER event inside the session (base+5min) must
    // widen nothing; a late event FAR BEFORE the session (beyond the gap,
    // inside the watermark) must become its own closed singleton, NOT
    // merge backward; then a far-future event closes the session.
    writeBatch(srcDir, "b2", Seq(
      (3L, base + 5 * 60 * 1000, 7L, "click", 1.0, "{}"),
      (5L, base - 60 * 60 * 1000, 7L, "click", 1.0, "{}"),
      (4L, base + 6 * 60 * 60 * 1000, 7L, "click", 1.0, "{}")))
    runOnce()

    val sessions = spark.read.parquet(outDir)
      .filter($"userId" === 7L)
      .select($"start".cast("long").as("start_s"),
        $"end".cast("long").as("end_s"), $"events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // the far-early late event is its own closed singleton session
    assert(sessions.nonEmpty, "no closed sessions emitted")
    val early = sessions.minBy(_._1)
    assert(early === ((base - 60 * 60 * 1000) / 1000,
      (base - 60 * 60 * 1000) / 1000, 1L))
    // the main session closed with its 3 events and the original
    // [base, base+10min] bounds (the in-session late event widened nothing)
    val main = sessions.sortBy(_._1).apply(1)
    assert(main._1 === base / 1000)
    assert(main._2 === (base + 10 * 60 * 1000) / 1000)
    assert(main._3 === 3L)
  }
}
