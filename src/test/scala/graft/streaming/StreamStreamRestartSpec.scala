package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.streaming.Trigger
import graft.{SparkTestBase, Tables}
import graft.queries.EventQueries

/** The outer stream-stream join is only trustworthy if its JOIN STATE
  * survives a checkpointed restart: purchases buffered before the stop
  * must still emit their null-view rows after it, triggered purely by
  * the post-restart watermark — a join that lost its buffer would
  * silently drop the unattributed purchases (the exact rows whose
  * emission the watermark had not yet authorized). This spec runs the
  * stream twice over a growing directory with one checkpoint: run 1
  * sees ONLY the real events (inner pairs may emit; outer nulls for
  * the tail cannot — no watermark authority yet), run 2 adds the
  * far-future flush batch, and the union of both runs' output must
  * equal the batch query exactly. */
class StreamStreamRestartSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  type AttribRow = (Long, Long, Long, Double, Option[Long], Option[Long], Option[Long])

  test("outer-join state survives a checkpointed restart: buffered " +
      "purchases emit their null rows post-restart") {
    val srcDir = Files.createTempDirectory("attrib_restart_src").toString
    val outDir = Files.createTempDirectory("attrib_restart_out").toString
    val ckptDir = Files.createTempDirectory("attrib_restart_ckpt").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(srcDir, "part-000.parquet"))

    def runOnce(): Unit = {
      val q = EventStream.attribJoin(EventStream.readEvents(spark, srcDir))
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runOnce() // run 1: no flush — the tail's null rows stay in state

    val raw = spark.read.parquet(s"$sf0001/events.parquet")
    val tsIsLong = raw.schema("ts").dataType == LongType
    val maxNanos =
      if (tsIsLong) raw.agg(max($"ts")).as[Long].head()
      else raw.agg(max(unix_micros($"ts".cast("timestamp")))).as[Long].head() * 1000L
    val flush0 = Seq(
      (900001L, maxNanos + 365L * 24 * 3600 * 1000000000L, -1L, "view", 0.0, "{}"),
      (900002L, maxNanos + 366L * 24 * 3600 * 1000000000L, -1L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val flush = if (tsIsLong) flush0
      else flush0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    flush.coalesce(1).write.mode(SaveMode.Append).parquet(srcDir)

    runOnce() // run 2 (restart): watermark authority arrives

    val got = spark.read.parquet(outDir)
      .filter($"user_id" =!= -1L)
      .as[AttribRow].collect().toSet
    val want = EventQueries.queries("q_events_attrib")(spark, sf0001)
      .as[AttribRow].collect().toSet
    assert(want.exists(_._5.isEmpty) && want.exists(_._5.nonEmpty))
    assert(got === want,
      s"restart lost join state: ${want.size - got.size} rows missing")
  }
}
