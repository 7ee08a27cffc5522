package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase
import graft.queries.EventQueries

/** The FULL-outer stream-stream join's contract — the strongest state
  * pin in the join family, because BOTH eviction arms carry output:
  * a null-view row exists only because the watermark closed a
  * purchase's lookback with no view in it, and a null-purchase row
  * only because the watermark closed a view's 2-hour FORWARD window
  * with no purchase in it. On a replay of the batch data (plus one
  * far-future flush batch), [[EventStream.attribJoinFull]] must emit
  * EXACTLY the batch twin's rows with both null arms populated, hold
  * only the interval's rows in state, and — across a checkpointed
  * restart — still emit the buffered rows whose emission the
  * watermark had not yet authorized at the stop. */
class StreamStreamFullOuterSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  type FullRow = (Option[Long], Long, Option[Long], Option[Double],
    Option[Long], Option[Long], Option[Long])

  /** Far-future flush rows (user -1, one view + one purchase a year
    * past the data) in the staged directory's own ts type. */
  private def flushRows(): org.apache.spark.sql.DataFrame = {
    val raw = spark.read.parquet(s"$sf0001/events.parquet")
    val tsIsLong = raw.schema("ts").dataType == LongType
    val maxNanos =
      if (tsIsLong) raw.agg(max($"ts")).as[Long].head()
      else raw.agg(max(unix_micros($"ts".cast("timestamp")))).as[Long].head() * 1000L
    val year = 365L * 24 * 3600 * 1000000000L
    val flush0 = Seq(
      (900001L, maxNanos + year, -1L, "view", 0.0, "{}"),
      (900002L, maxNanos + year + 1000000000L, -1L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    if (tsIsLong) flush0
    else flush0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  private def batchWant(): Set[FullRow] =
    EventQueries.queries("q_events_attrib_full")(spark, sf0001)
      .as[FullRow].collect().toSet

  test("full-outer attribution join replays to the batch rows with both " +
      "null arms populated and watermark-evicted state") {
    val srcDir = Files.createTempDirectory("attribf_src").toString
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      Paths.get(srcDir, "part-000.parquet"))
    flushRows().coalesce(1).write.mode(SaveMode.Append).parquet(srcDir)

    val q = EventStream.runToMemory(
      EventStream.attribJoinFull(EventStream.readEvents(spark, srcDir)),
      "attrib_full_pairs")
    q.awaitTermination()

    val got = spark.table("attrib_full_pairs")
      .filter($"user_id" =!= -1L)
      .as[FullRow].collect().toSet
    val want = batchWant()
    assert(want.exists(r => r._1.nonEmpty && r._5.isEmpty),
      "fixture degenerate: no unattributed purchases")
    assert(want.exists(r => r._1.isEmpty && r._5.nonEmpty),
      "fixture degenerate: no purchase-less views")
    assert(want.exists(r => r._1.nonEmpty && r._5.nonEmpty),
      "fixture degenerate: no attribution pairs")
    assert(got === want)

    // both-sided eviction: after the flush batch the join state may
    // hold at most the flush rows themselves
    val lastState = q.recentProgress.reverse
      .flatMap(_.stateOperators.headOption).headOption
    assert(lastState.isDefined, "no stateOperators progress recorded")
    assert(lastState.get.numRowsTotal <= 2,
      s"join state not evicted: ${lastState.get.numRowsTotal} rows retained")
  }

  test("right-outer attribution join replays to the batch rows — only " +
      "the view-side arm carries nulls") {
    val srcDir = Files.createTempDirectory("attribr_src").toString
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      Paths.get(srcDir, "part-000.parquet"))
    flushRows().coalesce(1).write.mode(SaveMode.Append).parquet(srcDir)

    val q = EventStream.runToMemory(
      EventStream.attribJoinRight(EventStream.readEvents(spark, srcDir)),
      "attrib_right_pairs")
    q.awaitTermination()

    val got = spark.table("attrib_right_pairs")
      .filter($"user_id" =!= -1L)
      .as[FullRow].collect().toSet
    val want = EventQueries.queries("q_events_attrib_right")(spark, sf0001)
      .as[FullRow].collect().toSet
    assert(!want.exists(r => r._1.nonEmpty && r._5.isEmpty),
      "right-outer must not emit purchase-side null rows")
    assert(want.exists(r => r._1.isEmpty && r._5.nonEmpty),
      "fixture degenerate: no purchase-less views")
    assert(got === want)
  }

  test("full-outer join state survives a checkpointed restart: both " +
      "arms' buffered rows emit post-restart") {
    val srcDir = Files.createTempDirectory("attribf_restart_src").toString
    val outDir = Files.createTempDirectory("attribf_restart_out").toString
    val ckptDir = Files.createTempDirectory("attribf_restart_ckpt").toString
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      Paths.get(srcDir, "part-000.parquet"))

    def runOnce(): Unit = {
      val q = EventStream
        .attribJoinFull(EventStream.readEvents(spark, srcDir))
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
    flushRows().coalesce(1).write.mode(SaveMode.Append).parquet(srcDir)
    runOnce() // run 2: watermark passes every real row's window

    val got = spark.read.parquet(outDir)
      .filter($"user_id" =!= -1L)
      .as[FullRow].collect().toSet
    assert(got === batchWant(),
      "union of pre- and post-restart output diverges from the batch twin")
  }
}
