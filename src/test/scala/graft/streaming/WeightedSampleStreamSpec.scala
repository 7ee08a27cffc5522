package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** DocStream.sampleWeighted — streaming per-stratum priority sampling —
  * must converge to the batch manifest on a replayed corpus: the final
  * emission per (lang, rank) equals q_sample_weighted_group row-for-row
  * (including the estimator, reconstructed from the emitted τ), state
  * stays at one row per language, and the monotone-convergence device
  * (priority and τ nondecreasing per rank) is exercised across a real
  * micro-batch boundary. */
class WeightedSampleStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming sample converges to the batch per-stratum manifest") {
    val dir = Files.createTempDirectory("docs_stream_wsample")
    val docs = Tables.table(spark, sf0001, "documents")
    val mid = docs.agg((min($"doc_id") + max($"doc_id")) / 2)
      .as[Double].collect().head.toLong
    stageFile(docs.filter($"doc_id" <= mid), dir, "b0.parquet",
      1700000000000L)
    stageFile(docs.filter($"doc_id" > mid), dir, "b1.parquet",
      1700000100000L)

    val out = DocStream.sampleWeighted(spark,
      DocStream.readDocs(spark, dir.toString))
    val q = EventStream.runToMemory(out.toDF(), "wsample",
      OutputMode.Update())
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()

    val rows = spark.table("wsample")
      .select($"lang", $"rank", $"docId", $"source", $"tokCount",
        $"prTicks", $"tauTicks")
      .as[(String, Int, Long, String, Long, Long, Long)].collect().toSeq
    // monotone convergence: final per (lang, rank) = componentwise max;
    // -docId breaks (prTicks, tauTicks) TIES deterministically — a
    // later batch can replace a rank's occupant at EQUAL priority under
    // the doc_id tiebreak, and the winner is then the smaller doc_id
    // (review catch: without it the pick among tied emissions was
    // collection-order dependent)
    val fin = rows.groupBy(r => (r._1, r._2)).values
      .map(_.maxBy(r => (r._6, r._7, -r._3))).toSeq
      .sortBy(r => (r._1, r._2))
    assert(rows.size > fin.size, "expected per-batch update emissions")

    val u6 = graft.queries.CurationQueries.SampleU * 1000000L
    val got = fin.map { case (l, r, id, src, w, p, tau) =>
      (l, r, id, src, w, p,
        math.floor(math.max(w * u6, tau).toDouble / u6.toDouble
          * 10000 + 0.5) / 10000)
    }
    val want = graft.SparkEntry.queries("q_sample_weighted_group")(
      spark, sf0001)
      .select($"lang", $"rank", $"doc_id", $"source", $"tok_count",
        $"pr_ticks", $"est_tokens")
      .as[(String, Int, Long, String, Long, Long, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(got === want)
    assert(want.nonEmpty)

    // one state row per stratum — the bounded-state contract's outer
    // shell (the K+1-entry inner bound is by construction)
    val langs = docs.select($"lang").distinct().count()
    assert(stateRows == langs, s"state rows $stateRows != langs $langs")
  }
}
