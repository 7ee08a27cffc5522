package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.queries.EventQueries

/** Streaming results must agree with their batch twins when the stream is
  * the replayed batch data. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  /** File-stream sources read directories; stage the single testdata file
    * into one (a production pipeline would already have a file-per-batch
    * directory). */
  lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-000.parquet"))
    dir.toString
  }

  lazy val docsStreamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("docs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/documents.parquet"),
      dir.resolve("part-000.parquet"))
    dir.toString
  }

  test("streaming decontamination hits match the batch query's doc set") {
    val batchDocs = Tables.table(spark, sf0001, "documents")
    val bench = graft.queries.CurationQueries.gramInventory(
      batchDocs.filter($"source" === "src0").select($"doc_id", $"text"), 4)
    val hits = DocStream.contaminationHits(
      DocStream.readDocs(spark, docsStreamDir)
        .filter($"source" =!= "src0"),
      bench)
    val q = EventStream.runToMemory(hits, "doc_hits", OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("doc_hits")
      .groupBy($"doc_id").count()
      .as[(Long, Long)].collect().toMap
    val batch = graft.SparkEntry.queries("q_doc_decontaminate")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    assert(streamed === batch)
  }

  test("streaming doc dedup keeps exactly one doc per batch fingerprint group") {
    val deduped = DocStream.dedupDocs(DocStream.readDocs(spark, docsStreamDir))
    val q = EventStream.runToMemory(deduped, "doc_dedup", OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("doc_dedup")
      .select($"fp", $"doc_id").as[(String, Long)].collect()

    val batch = Tables.table(spark, sf0001, "documents")
      .filter(length(trim($"text")) > 0)
      .select($"doc_id",
        md5(regexp_replace(lower(trim($"text")), "\\s+", " ")).as("fp"))
      .as[(Long, String)].collect()
    val groups = batch.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap

    // exactly one survivor per distinct fingerprint, and each survivor is
    // a genuine member of its group (WHICH member is partition-order
    // dependent, same as any first-arrival dedup)
    assert(streamed.length === groups.size)
    assert(streamed.map(_._1).toSet === groups.keySet)
    streamed.foreach { case (fp, id) => assert(groups(fp).contains(id)) }
  }

  test("streaming hourly counts match the batch aggregation") {
    val stream = EventStream.readEvents(spark, streamDir)
    val q = EventStream.runToMemory(
      EventStream.hourlyCounts(stream), "hourly", OutputMode.Complete)
    q.awaitTermination()

    val got = spark.table("hourly")
      .select($"hour_ts".cast("timestamp_ntz").as("hour_ts"), $"event_type",
        $"event_count")
      .orderBy("hour_ts", "event_type")
      .as[(java.time.LocalDateTime, String, Long)].collect()

    val want = EventQueries.queries("q_events_hourly")(spark, sf0001)
      .select($"hour_ts", $"event_type", $"event_count")
      .orderBy("hour_ts", "event_type")
      .as[(java.time.LocalDateTime, String, Long)].collect()

    assert(got.toSeq === want.toSeq)
  }

  test("streaming hopping windows match the batch hopping aggregation") {
    val stream = EventStream.readEvents(spark, streamDir)
    val q = EventStream.runToMemory(
      EventStream.hoppingCounts(stream), "hopping", OutputMode.Complete)
    q.awaitTermination()

    // counts only: the float total_value is summed in a different order
    // on the streaming side (same reason the hourly twin skips it)
    val got = spark.table("hopping")
      .select($"window_start".cast("timestamp_ntz").as("window_start"),
        $"event_type", $"event_count")
      .orderBy("window_start", "event_type")
      .as[(java.time.LocalDateTime, String, Long)].collect()

    val want = EventQueries.queries("q_events_hopping")(spark, sf0001)
      .select($"window_start", $"event_type", $"event_count")
      .orderBy("window_start", "event_type")
      .as[(java.time.LocalDateTime, String, Long)].collect()

    assert(got.toSeq === want.toSeq)
  }

  test("streaming dedup passes distinct event_ids through unchanged") {
    val stream = EventStream.readEvents(spark, streamDir)
    val q = EventStream.runToMemory(
      EventStream.dedupEvents(stream), "deduped")
    q.awaitTermination()
    // testdata event_ids are unique, so dedup must be a no-op pass-through
    val n = spark.table("deduped").count()
    val distinctIds = spark.table("deduped").select("event_id").distinct().count()
    assert(n === 1000L)
    assert(distinctIds === n)
  }

  test("native session_window sessions match the batch lag/sum sessionization") {
    val stream = EventStream.readEvents(spark, streamDir)
    val q = EventStream.runToMemory(
      EventStream.sessionizeNative(stream), "native_sessions",
      OutputMode.Complete)
    q.awaitTermination()
    val got = spark.table("native_sessions")
      .select($"user_id",
        $"session_start".cast("timestamp").cast("long").as("start_s"),
        $"event_count")
      .as[(Long, Long, Long)].collect().toSet
    val want = EventQueries.queries("q_events_sessions")(spark, sf0001)
      .select($"user_id", $"session_start".cast("timestamp").cast("long").as("s"),
        $"event_count")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("stream-stream interval join matches the batch attribution join") {
    val stream = EventStream.readEvents(spark, streamDir)
    val q = EventStream.runToMemory(
      EventStream.correlate(stream), "correlated")
    q.awaitTermination()
    val got = spark.table("correlated")
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet

    // batch twin: the same bounded-interval join on the static table
    val ev = Tables.table(spark, sf0001, "events")
      .select($"event_id", $"user_id", $"ts".cast("timestamp").as("ts"),
        $"event_type", $"value")
    val l = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("l_id"), $"ts".as("l_ts"))
    val r = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("r_user"), $"event_id".as("r_id"),
        $"ts".as("r_ts"))
    val want = l.join(r, expr(
        "user_id = r_user AND r_ts > l_ts AND r_ts <= l_ts + interval 30 minutes"))
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet

    assert(got === want)
    assert(want.nonEmpty) // the fixture actually exercises the join
  }

  test("streaming metrics listener accumulates observed row counts") {
    val listener = graft.operators.Metrics.attachStreaming(spark)
    try {
      val stream = EventStream.readEvents(spark, streamDir)
      val q = EventStream.runToMemory(
        graft.operators.Metrics.observeVolume(stream, "stream_volume",
          nullCountCols = Seq("event_type")),
        "observed_stream")
      q.awaitTermination()
      // progress events are async; poll like MetricsSpec does
      val deadline = System.currentTimeMillis() + 10000
      while (listener.rows("stream_volume").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(listener.rows("stream_volume") === Some(1000L))
      assert(listener.lastMetric("stream_volume").get
        .getAs[Long]("null_event_type") === 0L)
    } finally spark.streams.removeListener(listener)
  }

  test("streaming funnel matches the batch funnel summary") {
    val stream = EventStream.readEvents(spark, streamDir)
    val q = EventStream.runToMemory(
      EventStream.funnel(spark, stream).toDF(), "funnel", OutputMode.Update)
    q.awaitTermination()
    val snaps = spark.table("funnel")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
    // snapshots are monotone per user (stages only fill in); the final
    // one is the max by stages-reached
    val last = snaps.groupBy(_._1).map { case (_, rows) =>
      rows.maxBy(r => (r._2.size, r._3.size, r._4.size)) }.toSeq
    val got = (last.size.toLong, last.count(_._2.nonEmpty).toLong,
      last.count(_._3.nonEmpty).toLong, last.count(_._4.nonEmpty).toLong)
    val want = EventQueries.queries("q_events_funnel")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === want)
    assert(got._2 > 0) // the fixture actually reaches funnel stages
  }

  test("streaming sessionization closes sessions consistent with batch") {
    val stream = EventStream.readEvents(spark, streamDir)
    val q = EventStream.runToMemory(
      EventStream.sessionize(spark, stream).toDF(), "sessions")
    q.awaitTermination()
    val emitted = spark.table("sessions")

    val batch = EventQueries.queries("q_events_sessions")(spark, sf0001)
    val batchKeys = batch
      .select($"user_id", $"session_start".cast("timestamp").as("start"),
        $"event_count")
      .as[(Long, java.sql.Timestamp, Long)].collect()
      .map { case (u, st, n) => (u, st.getTime, n) }.toSet

    // Every emitted (closed) session must exist identically in the batch
    // result; open sessions legitimately stay in state at end-of-stream.
    // batch session_start is second-truncated; align before comparing
    val got = emitted.select($"userId", $"start", $"events")
      .as[(Long, java.sql.Timestamp, Long)].collect()
      .map { case (u, st, n) => (u, st.getTime / 1000 * 1000, n) }
    assert(got.nonEmpty)
    got.foreach(k => assert(batchKeys.contains(k), s"session $k not in batch"))
  }

  /** Final watermark of an AvailableNow replay of the fixture: max event
    * time (ms, micros truncate) minus the 2h delay — what every
    * timer-driven twin's emission horizon is measured against. */
  private lazy val fixtureWatermarkMs: Long = {
    val maxTs = Tables.table(spark, sf0001, "events")
      .agg(max($"ts".cast("timestamp"))).as[java.sql.Timestamp].collect().head
    maxTs.getTime - 2 * 3600000L
  }

  test("streaming gapfill emits the batch grid, zeros included, up to the watermark") {
    val stream = EventStream.readEvents(spark, streamDir)
    val q = EventStream.runToMemory(
      EventStream.gapfillHourly(spark, stream).toDF(), "gapfill")
    q.awaitTermination()
    val got = spark.table("gapfill")
      .select($"eventType", $"hourTs".cast("long") * 1000, $"eventCount")
      .as[(String, Long, Long)].collect().toSeq.sorted

    // expected: the batch gap-filled grid truncated to closed hours
    // (hour end <= final watermark), EXTENDED with the trailing zeros the
    // live grid keeps emitting after a type's last event — the batch grid
    // stops at each type's max hour, the stream's only stops at the
    // watermark
    val wm = fixtureWatermarkMs
    val batch = EventQueries.queries("q_events_gapfill")(spark, sf0001)
      .select($"event_type", $"hour_ts".cast("timestamp").cast("long") * 1000,
        $"event_count")
      .as[(String, Long, Long)].collect().toSeq
    val closed = batch.filter { case (_, h, _) => h + 3600000L <= wm }
    val trailing = batch.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      val maxH = rows.map(_._2).max
      Iterator.iterate(maxH + 3600000L)(_ + 3600000L)
        .takeWhile(_ + 3600000L <= wm).map((tpe, _, 0L)).toSeq
    }
    val want = (closed ++ trailing).sorted
    assert(got === want)
    // the fixture must actually exercise the zero-fill path
    assert(got.exists(_._3 == 0L), "no silent hours in the emitted grid")
  }

  test("streaming moving average matches the batch RANGE window on closed hours") {
    val stream = EventStream.readEvents(spark, streamDir)
    val q = EventStream.runToMemory(
      EventStream.movingAvgHourly(spark, stream).toDF(), "moving_avg")
    q.awaitTermination()
    val got = spark.table("moving_avg")
      .select($"eventType", $"hourTs".cast("long") * 1000,
        $"movingAvgValue", $"windowHours")
      .as[(String, Long, Double, Long)].collect().toSeq.sorted

    // the e2 fixed-point device makes this an EXACT comparison: both
    // sides sum identical snapped longs and round one division
    val wm = fixtureWatermarkMs
    val want = EventQueries.queries("q_events_moving_avg")(spark, sf0001)
      .select($"event_type", $"hour_ts".cast("timestamp").cast("long") * 1000,
        $"moving_avg_value", $"window_hours")
      .as[(String, Long, Double, Long)].collect().toSeq
      .filter { case (_, h, _, _) => h + 3600000L <= wm }
      .sorted
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming retention increments aggregate to the batch cohort grid") {
    val stream = EventStream.readEvents(spark, streamDir)
    val q = EventStream.runToMemory(
      EventStream.retentionHits(spark, stream).toDF(), "retention")
    q.awaitTermination()
    // increments are final on first observation (no watermark horizon),
    // so the aggregated grid matches the batch EXACTLY, not a prefix
    val got = spark.table("retention")
      .groupBy($"cohortWeek", $"weekOffset").count()
      .select($"cohortWeek".cast("long") * 1000, $"weekOffset", $"count")
      .as[(Long, Int, Long)].collect().toSeq.sorted
    val want = graft.SparkEntry.queries("q_events_retention")(spark, sf0001)
      .select($"cohort_week".cast("timestamp").cast("long") * 1000,
        $"week_offset", $"active_users")
      .as[(Long, Int, Long)].collect().toSeq.sorted
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("watermarked doc dedup keeps one survivor per fingerprint and carries event time") {
    // the production shape the ADVICE flagged as unreachable: an
    // event-time column must survive the projection so the watermark is
    // actually applied to the emitted frame
    val stream = DocStream.readDocs(spark, docsStreamDir)
      .withColumn("ingest_ts",
        timestamp_millis(lit(1700000000000L) + col("doc_id") * 1000))
    val deduped = DocStream.dedupDocs(stream, Some("ingest_ts"))
    assert(deduped.columns.contains("ingest_ts"))
    val q = EventStream.runToMemory(deduped, "doc_dedup_wm", OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("doc_dedup_wm")
      .select($"fp", $"doc_id").as[(String, Long)].collect()
    val groups = Tables.table(spark, sf0001, "documents")
      .filter(length(trim($"text")) > 0)
      .select($"doc_id",
        md5(regexp_replace(lower(trim($"text")), "\\s+", " ")).as("fp"))
      .as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(streamed.length === groups.size)
    streamed.foreach { case (fp, id) => assert(groups(fp).contains(id)) }
  }

  test("streaming as-of enrichment matches the batch as-of join exactly") {
    val stream = EventStream.readEvents(spark, streamDir)
    val q = EventStream.runToMemory(
      EventStream.asofEnrich(spark, stream).toDF(), "asof")
    q.awaitTermination()
    // emission is data-driven (no watermark wait), so the whole batch
    // result must appear — including purchases with no prior click
    // (null enrichment) and clicks carrying null values
    val got = spark.table("asof")
      .select($"eventId", $"userId", $"sec".cast("long"), $"value",
        $"lastClickValue")
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq.sorted
    val want = EventQueries.queries("q_events_asof")(spark, sf0001)
      .select($"event_id", $"user_id",
        $"purchase_ts".cast("timestamp").cast("long"),
        $"purchase_value", $"last_click_value")
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq.sorted
    assert(got === want)
    assert(want.exists(_._5.nonEmpty), "fixture never enriches")
  }

  test("online anomaly flags a spike after warm-up, never inside it") {
    // crafted series, one event type, strictly increasing ts: a steadily
    // alternating 9.9/10.1 baseline (stddev ~0.1 from the first scored
    // event, so in-pattern swings sit at |z| ~1), one 1000.0 spike, then
    // a return to baseline scored against spike-inflated moments
    val dir = java.nio.file.Files.createTempDirectory("anomaly_stream")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = ((1 to 60).map(i =>
      (i.toLong, if (i % 2 == 0) 9.9 else 10.1)) ++
      Seq((61L, 1000.0), (62L, 10.0))).map { case (i, v) =>
      (i, new java.sql.Timestamp(base + i * 60000L), 7L, "metric", v, "{}")
    }
    // file-stream sources read top-level files: write the frame out, then
    // stage its single part file into the watched directory
    val staging = java.nio.file.Files.createTempDirectory("anomaly_staging")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", unix_timestamp($"ts") * 1000000000L) // raw nanos
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val listing = java.nio.file.Files.list(staging)
    try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(p => java.nio.file.Files.copy(p, dir.resolve(p.getFileName)))
    } finally listing.close()

    val stream = EventStream.readEvents(spark, dir.toString)
    val q = EventStream.runToMemory(
      EventStream.onlineAnomaly(spark, stream).toDF(), "online_anomaly")
    q.awaitTermination()
    val got = spark.table("online_anomaly")
      .as[(Long, String, Double, Double)].collect().toSeq

    // exactly the spike: minCount shields the first 30 events, the
    // alternating baseline scores |z| ~1, and 62 scores against moments
    // the spike has already inflated (z far below 3)
    assert(got.map(_._1) === Seq(61L))
    val z = got.head._4
    assert(z > 3.0, s"spike z=$z")
    assert(got.head._3 === 1000.0)
  }
}
