package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** DocStream.sketchFreq — the streaming count-min sketch — must fold to
  * the batch counter table across micro-batch boundaries, and its state
  * store must hold at most depth·width rows (the sketch IS the state):
  * the constant-memory claim, read off the progress metrics rather than
  * asserted. */
class CmsStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming sketch state folds to the batch counter table and " +
      "stays within the sketch's row budget") {
    val dir = Files.createTempDirectory("docs_stream_cms")
    val docs = Tables.table(spark, sf0001, "documents")
    val mid = docs.agg((min($"doc_id") + max($"doc_id")) / 2)
      .as[Double].collect().head.toLong
    stageFile(docs.filter($"doc_id" <= mid), dir, "b0.parquet",
      1700000000000L)
    stageFile(docs.filter($"doc_id" > mid), dir, "b1.parquet",
      1700000100000L)

    val out = DocStream.sketchFreq(DocStream.readDocs(spark, dir.toString))
    val q = EventStream.runToMemory(out, "cms_stream", OutputMode.Update())
    q.processAllAvailable()
    val peakState = q.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .map(_.numRowsTotal).foldLeft(0L)(math.max)
    q.stop()

    // update mode re-emits refreshed counters per touched key per
    // batch: the final value per (i, b) is the max (counters are
    // monotone); more rows than keys proves the cross-batch update
    // path actually ran
    val rows = spark.table("cms_stream")
      .select($"i", $"b", $"cnt").as[(Int, Long, Long)].collect().toSeq
    val fin = rows.groupBy(r => (r._1, r._2)).values
      .map(_.maxBy(_._3)).toSeq.sortBy(r => (r._1, r._2))
    assert(rows.size > fin.size, "expected per-batch update emissions")

    val want = graft.queries.TextQueries.cmsCounters(docs)
      .select($"i", $"b", $"cnt").as[(Int, Long, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(fin === want)
    assert(want.nonEmpty)

    assert(peakState > 0L)
    assert(peakState <=
      graft.queries.TextQueries.CmsDepth.toLong *
        graft.queries.TextQueries.CmsWidth,
      s"sketch state exceeded its row budget: $peakState")
  }
}
