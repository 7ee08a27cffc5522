package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** The streaming perceptual media dedup face ([[DocStream.mediaDedup]])
  * must agree with its batch twin (q_media_phash_incremental, which the
  * DuckDB oracle hash-matches) when the stream replays the batch
  * query's increment: every arriving payload is judged against the
  * STATIC banded history only, so the admitted sets must be identical
  * across micro-batch boundaries — with zero state rows. */
class MediaStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed media dedup equals the batch incremental on the " +
      "replayed increment, across micro-batches, with zero state") {
    val dir = Files.createTempDirectory("media_stream_inc")
    val docs = Tables.table(spark, sf0001, "documents")
    // the batch query's split: history = doc_id % 10 <> 0; the
    // increment replays as TWO micro-batches
    stageFile(docs.filter($"doc_id" % 10 === 0 && $"doc_id" < 250),
      dir, "b0.parquet", 1700000000000L)
    stageFile(docs.filter($"doc_id" % 10 === 0 && $"doc_id" >= 250),
      dir, "b1.parquet", 1700000100000L)

    val index = DocStream.prepareMediaIndex(
      docs.filter($"doc_id" % 10 =!= 0))
    try {
      val out = DocStream.mediaDedup(spark,
        DocStream.readDocs(spark, dir.toString), index).toDF()
      val q = EventStream.runToMemory(out, "media_dedup",
        OutputMode.Append())
      q.processAllAvailable()
      val stateRows = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsTotal).foldLeft(0L)(math.max)
      q.stop()
      assert(stateRows === 0L, "the media verdict face must keep no state")

      val admitted = spark.table("media_dedup")
        .filter($"admitted").select($"item_id").as[Long].collect().toSet
      val want = graft.SparkEntry.queries("q_media_phash_incremental")(
          spark, sf0001)
        .as[Long].collect().toSet
      assert(admitted === want)
      // every arrival is judged exactly once
      val all = spark.table("media_dedup").select($"item_id")
        .as[Long].collect()
      assert(all.length === all.distinct.length)
      assert(all.length === docs.filter($"doc_id" % 10 === 0 &&
        $"text".isNotNull && length($"text") > 0).count())
    } finally index.unpersist()
  }

  test("the REAL-decoder stream face equals its batch incremental on " +
      "the replayed increment, across micro-batches, with zero state") {
    // the wav twin of the test above: every arrival wraps into a
    // genuine RIFF container and WavCodec parses it inside the
    // stateless decode pass — admitted sets must match
    // q_media_wav_incremental (hash-matched by the DuckDB oracle)
    val dir = Files.createTempDirectory("media_stream_wav_inc")
    val docs = Tables.table(spark, sf0001, "documents")
    stageFile(docs.filter($"doc_id" % 10 === 0 && $"doc_id" < 250),
      dir, "b0.parquet", 1700000000000L)
    stageFile(docs.filter($"doc_id" % 10 === 0 && $"doc_id" >= 250),
      dir, "b1.parquet", 1700000100000L)

    val index = DocStream.prepareWavMediaIndex(
      docs.filter($"doc_id" % 10 =!= 0))
    try {
      val out = DocStream.mediaDedupWav(spark,
        DocStream.readDocs(spark, dir.toString), index).toDF()
      val q = EventStream.runToMemory(out, "media_dedup_wav",
        OutputMode.Append())
      q.processAllAvailable()
      val stateRows = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsTotal).foldLeft(0L)(math.max)
      q.stop()
      assert(stateRows === 0L, "the wav verdict face must keep no state")

      val admitted = spark.table("media_dedup_wav")
        .filter($"admitted").select($"item_id").as[Long].collect().toSet
      val want = graft.SparkEntry.queries("q_media_wav_incremental")(
          spark, sf0001)
        .as[Long].collect().toSet
      assert(admitted === want)
    } finally index.unpersist()
  }

  test("the BMP stream face equals its batch incremental on the " +
      "replayed increment, across micro-batches, with zero state") {
    // the image twin: every arrival wraps into a genuine 24-bpp BMP
    // and BmpCodec parses it inside the stateless decode pass —
    // admitted sets must match q_media_bmp_incremental (hash-matched
    // by the DuckDB oracle), closing the media symmetry
    val dir = Files.createTempDirectory("media_stream_bmp_inc")
    val docs = Tables.table(spark, sf0001, "documents")
    stageFile(docs.filter($"doc_id" % 10 === 0 && $"doc_id" < 250),
      dir, "b0.parquet", 1700000000000L)
    stageFile(docs.filter($"doc_id" % 10 === 0 && $"doc_id" >= 250),
      dir, "b1.parquet", 1700000100000L)

    val index = DocStream.prepareBmpMediaIndex(
      docs.filter($"doc_id" % 10 =!= 0))
    try {
      val out = DocStream.mediaDedupBmp(spark,
        DocStream.readDocs(spark, dir.toString), index).toDF()
      val q = EventStream.runToMemory(out, "media_dedup_bmp",
        OutputMode.Append())
      q.processAllAvailable()
      val stateRows = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsTotal).foldLeft(0L)(math.max)
      q.stop()
      assert(stateRows === 0L, "the bmp verdict face must keep no state")

      val admitted = spark.table("media_dedup_bmp")
        .filter($"admitted").select($"item_id").as[Long].collect().toSet
      val want = graft.SparkEntry.queries("q_media_bmp_incremental")(
          spark, sf0001)
        .as[Long].collect().toSet
      assert(admitted === want)
    } finally index.unpersist()
  }

  test("the compressed-format stream faces (PNG/JPEG/µ-law) equal their " +
      "batch incrementals on the replayed increment, with zero state") {
    // the compressed-codec twins: arrivals wrap into genuine PNG/JPEG
    // containers (the JDK's real inflate / IDCT paths) or format-7
    // µ-law WAVs (the real G.711 expansion) inside the stateless
    // decode pass — admitted sets must match q_media_png_incremental
    // and q_media_ulaw_incremental (both hash-matched) and
    // q_media_jpeg_incremental (the rows-only face's batch/stream
    // agreement anchor)
    val dir = Files.createTempDirectory("media_stream_img_inc")
    val docs = Tables.table(spark, sf0001, "documents")
    stageFile(docs.filter($"doc_id" % 10 === 0 && $"doc_id" < 250),
      dir, "b0.parquet", 1700000000000L)
    stageFile(docs.filter($"doc_id" % 10 === 0 && $"doc_id" >= 250),
      dir, "b1.parquet", 1700000100000L)

    for ((tag, prepare, face, query) <- Seq(
        ("png",
          DocStream.preparePngMediaIndex _,
          DocStream.mediaDedupPng _,
          "q_media_png_incremental"),
        ("jpeg",
          DocStream.prepareJpegMediaIndex _,
          DocStream.mediaDedupJpeg _,
          "q_media_jpeg_incremental"),
        ("ulaw",
          DocStream.prepareUlawMediaIndex _,
          DocStream.mediaDedupUlaw _,
          "q_media_ulaw_incremental"))) {
      val index = prepare(docs.filter($"doc_id" % 10 =!= 0))
      try {
        val out = face(spark,
          DocStream.readDocs(spark, dir.toString), index).toDF()
        val q = EventStream.runToMemory(out, s"media_dedup_$tag",
          OutputMode.Append())
        q.processAllAvailable()
        val stateRows = q.recentProgress
          .flatMap(p => Option(p.stateOperators).toSeq.flatten)
          .map(_.numRowsTotal).foldLeft(0L)(math.max)
        q.stop()
        assert(stateRows === 0L,
          s"the $tag verdict face must keep no state")

        val admitted = spark.table(s"media_dedup_$tag")
          .filter($"admitted").select($"item_id").as[Long].collect().toSet
        val want = graft.SparkEntry.queries(query)(spark, sf0001)
          .as[Long].collect().toSet
        assert(admitted === want, s"$tag stream face diverges from $query")
      } finally index.unpersist()
    }
  }

  test("the AVI stream face equals its batch incremental on the " +
      "replayed increment, across micro-batches, with zero state") {
    // the video twin at the frame-signature grain: every arrival wraps
    // into a genuine AVI container, AviCodec parses it inside the
    // stateless decode pass, and exact aligned (frame_idx, sig)
    // collisions against the static index decide admission — admitted
    // sets must match q_media_avi_incremental (hash-matched by the
    // DuckDB oracle)
    val dir = Files.createTempDirectory("media_stream_avi_inc")
    val docs = Tables.table(spark, sf0001, "documents")
    stageFile(docs.filter($"doc_id" % 10 === 0 && $"doc_id" < 250),
      dir, "b0.parquet", 1700000000000L)
    stageFile(docs.filter($"doc_id" % 10 === 0 && $"doc_id" >= 250),
      dir, "b1.parquet", 1700000100000L)

    val index = DocStream.prepareAviMediaIndex(
      docs.filter($"doc_id" % 10 =!= 0))
    try {
      val out = DocStream.mediaDedupAvi(spark,
        DocStream.readDocs(spark, dir.toString), index).toDF()
      val q = EventStream.runToMemory(out, "media_dedup_avi",
        OutputMode.Append())
      q.processAllAvailable()
      val stateRows = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsTotal).foldLeft(0L)(math.max)
      q.stop()
      assert(stateRows === 0L, "the avi verdict face must keep no state")

      val admitted = spark.table("media_dedup_avi")
        .filter($"admitted").select($"item_id").as[Long].collect().toSet
      val want = graft.SparkEntry.queries("q_media_avi_incremental")(
          spark, sf0001)
        .as[Long].collect().toSet
      assert(admitted === want)
      // rejections carry blame with at least the admit threshold
      val rejected = spark.table("media_dedup_avi").filter(!$"admitted")
      assert(rejected.filter($"dup_of".isNull ||
        $"matched" < graft.queries.MediaQueries.VideoMinMatched)
        .count() === 0L)
    } finally index.unpersist()
  }

  test("the MJPEG stream face equals its batch incremental on the " +
      "replayed increment, with zero state") {
    // the compressed-video twin at the frame-signature grain: every
    // arrival wraps into a genuine MJPEG AVI container, each '00dc'
    // frame decodes through the real JPEG pipeline inside the
    // stateless decode pass, and exact aligned (frame_idx, sig)
    // collisions against the static index decide admission — the
    // admitted sets must match q_media_avi_mjpeg_incremental (this pin
    // is one of the rows-only family's documented anchors)
    val dir = Files.createTempDirectory("media_stream_mjpeg_inc")
    val docs = Tables.table(spark, sf0001, "documents")
    stageFile(docs.filter($"doc_id" % 10 === 0 && $"doc_id" < 250),
      dir, "b0.parquet", 1700000000000L)
    stageFile(docs.filter($"doc_id" % 10 === 0 && $"doc_id" >= 250),
      dir, "b1.parquet", 1700000100000L)

    val index = DocStream.prepareMjpegMediaIndex(
      docs.filter($"doc_id" % 10 =!= 0))
    try {
      val out = DocStream.mediaDedupMjpeg(spark,
        DocStream.readDocs(spark, dir.toString), index).toDF()
      val q = EventStream.runToMemory(out, "media_dedup_mjpeg",
        OutputMode.Append())
      q.processAllAvailable()
      val stateRows = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsTotal).foldLeft(0L)(math.max)
      q.stop()
      assert(stateRows === 0L, "the mjpeg verdict face must keep no state")

      val admitted = spark.table("media_dedup_mjpeg")
        .filter($"admitted").select($"item_id").as[Long].collect().toSet
      val want = graft.SparkEntry.queries("q_media_avi_mjpeg_incremental")(
          spark, sf0001)
        .as[Long].collect().toSet
      assert(admitted === want)
      // and the lossless twin agrees on this corpus — the anchor
      // relationship, checked live
      val lossless = graft.SparkEntry.queries("q_media_avi_incremental")(
          spark, sf0001)
        .as[Long].collect().toSet
      assert(admitted === lossless,
        "the MJPEG and lossless admit sets diverged on the twin corpus")
    } finally index.unpersist()
  }

  test("planted fixture: byte-copy and near variant rejected with " +
      "blame, both judged against the banded history") {
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val near = base.replaceFirst("quick", "QUICK") // Hamming 3, shares band 3
    val far = "ZZZZ    aaaa    " * 14              // Hamming 32 from base
    def docsOf(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .select($"doc_id", $"text", lit("en").as("lang"),
          lit("s1").as("source"), length($"text").cast("long").as("n_chars"))
    val hist = docsOf(Seq((1L, base), (4L, far)))
    val dir = Files.createTempDirectory("media_stream_fx")
    stageFile(docsOf(Seq((10L, base), (13L, near), (14L, far))),
      dir, "b0.parquet", 1700000000000L)

    val index = DocStream.prepareMediaIndex(hist)
    try {
      val out = DocStream.mediaDedup(spark,
        DocStream.readDocs(spark, dir.toString), index).toDF()
      val q = EventStream.runToMemory(out, "media_dedup_fx",
        OutputMode.Append())
      q.processAllAvailable(); q.stop()
      val got = spark.table("media_dedup_fx")
        .select($"item_id", $"admitted", $"dup_of", $"hamming")
        .collect()
        .map(r => r.getAs[Long]("item_id") ->
          (r.getAs[Boolean]("admitted"),
            Option(r.getAs[java.lang.Long]("dup_of")).map(_.longValue),
            Option(r.getAs[java.lang.Long]("hamming")).map(_.longValue)))
        .toMap
      assert(got(10L) === ((false, Some(1L), Some(0L)))) // byte copy
      assert(got(13L) === ((false, Some(1L), Some(3L)))) // near variant
      assert(got(14L) === ((false, Some(4L), Some(0L)))) // copy of far
    } finally index.unpersist()
  }
}
