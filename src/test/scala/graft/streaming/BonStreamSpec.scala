package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** DocStream.selectBest — streaming best-of-n under staged LR reward
  * weights — must converge to the batch q_pref_bon manifest on a
  * replayed corpus: train the scorer batch-side, stage the weights to
  * disk (the Artifacts round-trip serving actually uses), replay the
  * documents across a real micro-batch boundary, and pin the final
  * per-cell emission equal to the batch rows — n, best, runner-up, and
  * margin alike — with exactly one state row per (source, lang) cell. */
class BonStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming best-of-n converges to the batch q_pref_bon manifest " +
      "under disk-staged weights") {
    val docs = Tables.table(spark, sf0001, "documents")

    // offline training + artifact staging (the curationPipelineWith
    // device): weights survive a disk round-trip before serving
    val feat = graft.queries.TextQueries.qlrFeatures(docs).persist()
    val trained = try {
      val h = graft.queries.TextQueries.qlrTrain(feat)
      Seq(h.last._2, h.last._3, h.last._4, h.last._5)
    } finally feat.unpersist()
    val wDir = Files.createTempDirectory("qlr_weights").toString
    graft.sources.Artifacts.writeQlrWeights(trained, spark, wDir)
    val staged = graft.sources.Artifacts.readQlrWeights(spark, wDir)
    assert(staged === trained)

    val dir = Files.createTempDirectory("docs_stream_bon")
    val mid = docs.agg((min($"doc_id") + max($"doc_id")) / 2)
      .as[Double].collect().head.toLong
    stageFile(docs.filter($"doc_id" <= mid), dir, "b0.parquet",
      1700000000000L)
    stageFile(docs.filter($"doc_id" > mid), dir, "b1.parquet",
      1700000100000L)

    val out = DocStream.selectBest(spark,
      DocStream.readDocs(spark, dir.toString), staged)
    val q = EventStream.runToMemory(out.toDF(), "bon_stream",
      OutputMode.Update())
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()

    val rows = spark.table("bon_stream")
      .select($"source", $"lang", $"n", $"best_doc", $"best_score6",
        $"runner_up6", $"margin6")
      .as[(String, String, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    // the manifest is a running argmax: n grows monotonically, so the
    // final emission per cell is simply the max-n one (n is the exact
    // arrival count — ties impossible within a cell)
    val fin = rows.groupBy(r => (r._1, r._2)).values
      .map(_.maxBy(_._3)).toSeq.sortBy(r => (r._1, r._2))
    assert(rows.size > fin.size, "expected per-batch update emissions")

    val want = graft.SparkEntry.queries("q_pref_bon")(spark, sf0001)
      .select($"source", $"lang", $"n", $"best_doc", $"best_score6",
        $"runner_up6", $"margin6")
      .as[(String, String, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(fin === want)
    assert(want.nonEmpty)

    // one state row per cell — the bounded-state contract's outer shell
    // (the two-entry inner bound is by construction)
    val cells = docs.filter($"text".isNotNull)
      .select($"source", $"lang").distinct().count()
    assert(stateRows == cells, s"state rows $stateRows != cells $cells")
  }
}
