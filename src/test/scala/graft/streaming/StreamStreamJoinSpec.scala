package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types.LongType
import graft.{SparkTestBase, Tables}
import graft.queries.EventQueries

/** The left-outer stream-stream join's contract: on a replay of the
  * batch data (plus one far-future flush batch to push the watermark
  * past the tail), [[EventStream.attribJoin]] emits EXACTLY the batch
  * query's rows — including the null-view rows, which only exist
  * because symmetric-hash-join state eviction declared their join
  * windows closed — and the final join state holds the interval's
  * rows, not the stream's. */
class StreamStreamJoinSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  type AttribRow = (Long, Long, Long, Double, Option[Long], Option[Long], Option[Long])

  test("left-outer attribution join replays to the batch rows with " +
      "watermark-evicted state") {
    val srcDir = Files.createTempDirectory("attrib_src").toString
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      Paths.get(srcDir, "part-000.parquet"))

    // far-future flush rows on a user the fixture never has (-1): one
    // view + one purchase a year past the data, so both sides'
    // watermarks pass every real row's join window and the outer nulls
    // emit. ts written in the staged file's own type (nanos-long under
    // the legacy flag, or plain timestamp) so the directory keeps one
    // schema.
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
    val flush = if (tsIsLong) flush0
      else flush0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    flush.coalesce(1).write.mode(SaveMode.Append).parquet(srcDir)

    val q = EventStream.runToMemory(
      EventStream.attribJoin(EventStream.readEvents(spark, srcDir)),
      "attrib_pairs")
    q.awaitTermination()

    val got = spark.table("attrib_pairs")
      .filter($"user_id" =!= -1L)
      .as[AttribRow].collect().toSet
    val want = EventQueries.queries("q_events_attrib")(spark, sf0001)
      .as[AttribRow].collect().toSet
    assert(want.exists(_._5.isEmpty), "fixture degenerate: no unattributed purchases")
    assert(want.exists(_._5.nonEmpty), "fixture degenerate: no attribution pairs")
    assert(got === want)

    // state eviction: after the flush batch the join state may hold at
    // most the flush rows themselves — every real row's window is past
    // the watermark. An unevicted join would hold ~all views+purchases.
    val lastState = q.recentProgress.reverse
      .flatMap(_.stateOperators.headOption).headOption
    assert(lastState.isDefined, "no stateOperators progress recorded")
    assert(lastState.get.numRowsTotal <= 2,
      s"join state not evicted: ${lastState.get.numRowsTotal} rows retained")
  }
}
