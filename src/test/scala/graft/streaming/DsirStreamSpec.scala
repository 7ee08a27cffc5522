package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** The streaming importance scorer must reproduce `q_doc_dsir`'s scores
  * row-for-row on a replayed corpus (the batch twin's output is its
  * top-K selection — every selected doc's (token_count, mean_logratio)
  * must match the stream's row for that doc), across micro-batch
  * boundaries, under LMs trained by the offline helper on the same
  * corpus. A synthetic batch pins the stream-only paths: a null-text doc
  * (no row) and an all-novel-token doc, which must score EXACTLY
  * (tgtFloor − rawFloor)/1e6 — the double-OOV rate no batch path can
  * reach. Zero state rows. */
class DsirStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming importance equals the batch selection's scores") {
    val dir = Files.createTempDirectory("docs_stream_dsir")
    val docs = Tables.table(spark, sf0001, "documents")
    stageFile(docs.filter($"doc_id" % 2 === 0), dir, "b0.parquet",
      1700000000000L)
    stageFile(docs.filter($"doc_id" % 2 === 1), dir, "b1.parquet",
      1700000100000L)
    stageFile(
      Seq((9001L, null: String, "en", "fixture", 0L),
          (9002L, "zzznovel1 zzznovel2", "de", "fixture", 19L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      dir, "b2.parquet", 1700000200000L)

    val (lm, rawF, tgtF) = DocStream.trainImportance(docs, "en")
    val out = DocStream.scoreImportance(
      DocStream.readDocs(spark, dir.toString), lm, rawF, tgtF)
    val q = EventStream.runToMemory(out.toDF(), "dsir_stream",
      OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val got = spark.table("dsir_stream")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // batch twin: every selected doc's scores must match the stream
    val batch = graft.SparkEntry.queries("q_doc_dsir")(spark, sf0001)
      .as[(Long, String, Long, Double)].collect()
    assert(batch.nonEmpty)
    batch.foreach { case (id, _, tc, score) =>
      assert(got.get(id).contains((tc, score)),
        s"doc $id: stream ${got.get(id)} != batch ($tc, $score)")
    }

    // stream-only pins: the double-OOV doc scores at the floor delta;
    // the null-text doc emits nothing; zero state rows throughout
    val floorScore =
      math.floor(((tgtF - rawF) * 2 / 1e6) / 2 * 10000 + 0.5) / 10000
    assert(got(9002L) === ((2L, floorScore)))
    assert(!got.contains(9001L))
    val peakState = q.recentProgress
      .map(_.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max)
    assert(peakState === 0L)
    lm.unpersist()
  }
}
