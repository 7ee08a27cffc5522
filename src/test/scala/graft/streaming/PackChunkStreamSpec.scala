package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** The live packing face must reproduce the batch cut discipline on a
  * doc_id-ordered replay: [[DocStream.packChunk]]'s per-doc spans,
  * folded into per-window manifests JVM-side, must equal
  * q_doc_pack_chunk's manifest exactly — across TWO micro-batches, so
  * the running-offset state genuinely survives a batch boundary (a
  * doc arriving in batch 2 continues the tape where batch 1 left it,
  * including mid-window). */
class PackChunkStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed spans fold to the batch window manifest across batches") {
    val dir = Files.createTempDirectory("docs_stream_pack")
    val docs = Tables.table(spark, sf0001, "documents")
    val mid = docs.agg((min($"doc_id") + max($"doc_id")) / 2)
      .as[Double].collect().head.toLong
    stageFile(docs.filter($"doc_id" <= mid), dir, "b0.parquet",
      1700000000000L)
    stageFile(docs.filter($"doc_id" > mid), dir, "b1.parquet",
      1700000100000L)

    val out = DocStream.packChunk(spark,
      DocStream.readDocs(spark, dir.toString))
    val q = EventStream.runToMemory(out.toDF(), "pack_spans",
      OutputMode.Append())
    q.processAllAvailable(); q.stop()

    val spans = spark.table("pack_spans")
      .as[DocStream.PackSpan].collect().toSeq
    assert(spans.nonEmpty)

    // fold spans into the (lang, shard, window) manifest the batch
    // query emits: clipped token mass per touched window
    val w = 2048L
    val folded = spans.flatMap { sp =>
      (sp.first_window to sp.last_window).map { win =>
        val tokIn = math.min(sp.start_tok + sp.tok_count, (win + 1) * w) -
          math.max(sp.start_tok, win * w)
        ((sp.lang, sp.shard, win), (1L, tokIn, sp.doc_id))
      }
    }.groupBy(_._1).map { case (k, vs) =>
      (k._1, k._2, k._3, vs.size.toLong, vs.map(_._2._2).sum,
        vs.map(_._2._3).min, vs.map(_._2._3).max)
    }.toSeq.sortBy(t => (t._1, t._2, t._3))

    val batch = graft.SparkEntry.queries("q_doc_pack_chunk")(spark, sf0001)
      .as[(String, Int, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(t => (t._1, t._2, t._3))
    assert(folded === batch)
  }
}
