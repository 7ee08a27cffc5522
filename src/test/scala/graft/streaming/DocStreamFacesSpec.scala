package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{Clean, SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** The round-8 DocStream faces must agree with their batch twins when
  * the stream is the replayed batch corpus:
  *  - incrementalDedup == q_dedup_incremental on the replayed increment
  *    split (the flagship 100 TB ingest shape, live);
  *  - corpusHealth's final update-mode state == the q_corpus_health
  *    report (exact distinct fingerprints included);
  *  - docQuota's final manifest == q_doc_quota on an ordered replay,
  *    and drops actually engage at a small cap.
  * Documents are staged as TWO files in doc_id order (mtime-ordered, one
  * file per micro-batch) so the update path — state surviving across
  * micro-batches — is genuinely exercised, not just a one-batch fold. */
class DocStreamFacesSpec extends SparkTestBase {
  import spark.implicits._

  /** Full documents table split into two doc_id-ordered files. */
  lazy val twoBatchDir: String = {
    val dir = Files.createTempDirectory("docs_stream_2b")
    val docs = Tables.table(spark, sf0001, "documents")
    val mid = docs.agg((min($"doc_id") + max($"doc_id")) / 2)
      .as[Double].collect().head.toLong
    stageFile(docs.filter($"doc_id" <= mid), dir, "b0.parquet", 1700000000000L)
    stageFile(docs.filter($"doc_id" > mid), dir, "b1.parquet", 1700000100000L)
    dir.toString
  }

  test("streaming incremental dedup equals the batch anti-join on the replayed increment") {
    val dir = Files.createTempDirectory("docs_stream_inc")
    val docs = Tables.table(spark, sf0001, "documents")
    val inc = docs.filter($"doc_id" % 10 === 0)
    val mid = inc.agg((min($"doc_id") + max($"doc_id")) / 2)
      .as[Double].collect().head.toLong
    stageFile(inc.filter($"doc_id" <= mid), dir, "b0.parquet", 1700000000000L)
    stageFile(inc.filter($"doc_id" > mid), dir, "b1.parquet", 1700000100000L)

    val history = docs.filter($"doc_id" % 10 =!= 0)
      .select(Clean.fingerprint($"text").as("fp"))
    val out = DocStream.incrementalDedup(
      DocStream.readDocs(spark, dir.toString), history)
    val q = EventStream.runToMemory(out, "inc_dedup", OutputMode.Append())
    q.processAllAvailable(); q.stop()

    val got = spark.table("inc_dedup")
      .select($"doc_id", $"fp").as[(Long, String)].collect().toSet
    val want = graft.SparkEntry.queries("q_dedup_incremental")(spark, sf0001)
      .as[(Long, String)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming novel-span feed equals the batch anti-join on the " +
      "replayed increment") {
    val dir = Files.createTempDirectory("docs_stream_spans")
    val docs = Tables.table(spark, sf0001, "documents")
    val inc = docs.filter($"doc_id" % 10 === 0)
    val mid = inc.agg((min($"doc_id") + max($"doc_id")) / 2)
      .as[Double].collect().head.toLong
    stageFile(inc.filter($"doc_id" <= mid), dir, "b0.parquet", 1700000000000L)
    stageFile(inc.filter($"doc_id" > mid), dir, "b1.parquet", 1700000100000L)

    // plant one verbatim copy of an increment doc in the history so the
    // anti-join provably filters, independent of where the corpus's own
    // duplicates fell across the split
    val history = docs.filter($"doc_id" % 10 =!= 0)
      .unionByName(inc.orderBy($"doc_id").limit(1)
        .withColumn("doc_id", lit(999999L)))
    val idx = DocStream.prepareSpanIndex(history)
    val out = DocStream.novelSpans(
      DocStream.readDocs(spark, dir.toString), idx, prepared = true)
    val q = EventStream.runToMemory(out, "novel_spans", OutputMode.Append())
    q.processAllAvailable(); q.stop()

    val got = spark.table("novel_spans")
      .select($"doc_id", $"idx", $"tile_hash")
      .as[(Long, Int, String)].collect().toSet
    // batch twin: the increment's tiles minus every hash history holds
    val want = graft.queries.TextQueries.tiled(inc)
      .join(graft.queries.TextQueries.tiled(history)
          .select($"tile_hash").distinct(),
        Seq("tile_hash"), "left_anti")
      .select($"doc_id", $"idx", $"tile_hash")
      .as[(Long, Int, String)].collect().toSet
    idx.unpersist()
    assert(got === want)
    assert(got.nonEmpty)
    // the anti-join actually filtered something (shared spans exist
    // between history and increment on this corpus — if not, the test
    // corpus stopped exercising the probe and should be rebuilt)
    val allInc = graft.queries.TextQueries.tiled(inc).count()
    assert(got.size < allInc)
  }

  test("streaming mixture application under staged batch weights folds " +
      "to the batch manifest") {
    // stage the weights the production way: the batch report collected
    // and re-created as a detached tiny table
    val staged = graft.SparkEntry.queries("q_doc_mixture")(spark, sf0001)
      .select($"source", $"weight_e6").as[(String, Long)]
      .collect().toSeq.toDF("source", "weight_e6")
    val out = DocStream.applyMixture(
      DocStream.readDocs(spark, twoBatchDir), staged)
    val q = EventStream.runToMemory(out, "mix_apply", OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val got = spark.table("mix_apply").groupBy($"source")
      .agg(sum($"copies").as("out_docs"),
        sum($"copies" * $"tok").as("out_tokens"))
      .as[(String, Long, Long)].collect().toSet
    val want = graft.SparkEntry.queries("q_doc_mixture_apply")(spark, sf0001)
      .select($"source", $"out_docs", $"out_tokens")
      .as[(String, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming corpus health's final state equals the batch report, across batches") {
    val out = DocStream.corpusHealth(spark,
      DocStream.readDocs(spark, twoBatchDir))
    val q = EventStream.runToMemory(out.toDF(), "health", OutputMode.Update())
    q.processAllAvailable(); q.stop()

    val rows = spark.table("health")
      .select($"source", $"lang", $"nDocs", $"distinctTexts",
        $"degenerateDocs", $"avgChars", $"totalTokens", $"dupRate")
      .as[(String, String, Long, Long, Long, Option[Double], Long, Double)]
      .collect().toSeq
    // update mode re-emits a refreshed row per touched cell per batch:
    // the FINAL state per cell is the row with the largest nDocs
    // (monotonic counter); more rows than cells proves the cross-batch
    // update path actually ran
    val fin = rows.groupBy(r => (r._1, r._2)).values
      .map(_.maxBy(_._3)).toSeq.sortBy(r => (r._1, r._2))
    assert(rows.size > fin.size, "expected per-batch update emissions")

    val want = graft.SparkEntry.queries("q_corpus_health")(spark, sf0001)
      .select($"source", $"lang", $"n_docs", $"distinct_texts",
        $"degenerate_docs", $"avg_chars", $"total_tokens", $"dup_rate")
      .as[(String, String, Long, Long, Long, Option[Double], Long, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(fin === want)
    assert(want.nonEmpty)
  }

  test("streaming quota manifest equals the batch manifest on an ordered replay") {
    val out = DocStream.docQuota(spark,
      DocStream.readDocs(spark, twoBatchDir), n = 40)
    val q = EventStream.runToMemory(out.toDF(), "quota40", OutputMode.Update())
    q.processAllAvailable(); q.stop()

    val rows = spark.table("quota40")
      .select($"source", $"lang", $"keptDocs", $"droppedDocs", $"maxKeptDocId")
      .as[(String, String, Long, Long, Option[Long])].collect().toSeq
    val fin = rows.groupBy(r => (r._1, r._2)).values
      .map(_.maxBy(r => r._3 + r._4)).toSeq.sortBy(r => (r._1, r._2))

    val want = graft.SparkEntry.queries("q_doc_quota")(spark, sf0001)
      .select($"source", $"lang", $"kept_docs", $"dropped_docs",
        $"max_kept_doc_id")
      .as[(String, String, Long, Long, Option[Long])]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(fin === want)
    assert(want.nonEmpty)
  }

  test("streaming quota actually drops past a small cap, first-arrival wins") {
    val out = DocStream.docQuota(spark,
      DocStream.readDocs(spark, twoBatchDir), n = 5)
    val q = EventStream.runToMemory(out.toDF(), "quota5", OutputMode.Update())
    q.processAllAvailable(); q.stop()

    val fin = spark.table("quota5")
      .select($"source", $"lang", $"keptDocs", $"droppedDocs", $"maxKeptDocId")
      .as[(String, String, Long, Long, Option[Long])].collect().toSeq
      .groupBy(r => (r._1, r._2)).values
      .map(_.maxBy(r => r._3 + r._4)).toSeq.sortBy(r => (r._1, r._2))

    // independent derivation: per cell, the 5 smallest doc_ids are kept
    // (the replay is doc_id-ordered, so first-arrival == lowest-id)
    val want = Tables.table(spark, sf0001, "documents")
      .select($"source", $"lang", $"doc_id")
      .as[(String, String, Long)].collect().toSeq
      .groupBy(r => (r._1, r._2)).toSeq
      .map { case ((src, lang), rs) =>
        val ids = rs.map(_._3).sorted
        val kept = ids.take(5)
        (src, lang, kept.size.toLong, (ids.size - kept.size).toLong,
          Some(kept.max))
      }.sortBy(r => (r._1, r._2))
    assert(fin === want)
    // the cap must actually have engaged somewhere
    assert(want.exists(_._4 > 0L), "n=5 never dropped — fixture too small?")
  }

  test("streaming quality scoring equals the batch scorer row for row, " +
      "with an empty state store") {
    val w = DocStream.trainQuality(Tables.table(spark, sf0001, "documents"))
    val out = DocStream.scoreQuality(
      DocStream.readDocs(spark, twoBatchDir), w)
    val q = EventStream.runToMemory(out, "qlr_stream", OutputMode.Append())
    q.processAllAvailable()
    // pure projection: the face must not even register a state operator
    // (the LM faces pin state_rows == 0; this one is stateless a level
    // deeper — there is no stateful operator to report at all)
    assert(q.lastProgress.stateOperators.isEmpty,
      q.lastProgress.prettyJson)
    q.stop()

    val got = spark.table("qlr_stream")
      .select($"doc_id", $"y", $"score6", $"pred")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = graft.SparkEntry.queries("q_doc_quality_lr")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
