package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** The streaming unigram-tokenizer face must agree row-for-row with the
  * batch `q_doc_unigram_tok_apply` on a replayed corpus, under a
  * DISK-staged vocabulary, across micro-batch boundaries. A synthetic
  * third micro-batch exercises the stream-only paths: a novel word
  * segmenting under the trained scores, a word past the DP unroll on
  * the char fallback, and a null-text doc. Zero state rows. */
class UgStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming unigram segmentation equals the batch twin under a " +
      "disk-staged vocabulary") {
    val dir = Files.createTempDirectory("docs_stream_ug")
    val art = Files.createTempDirectory("ug_artifacts")
    val docs = Tables.table(spark, sf0001, "documents")
    val mid = 300L
    stageFile(docs.filter($"doc_id" < mid), dir, "b0.parquet",
      1700000000000L)
    stageFile(docs.filter($"doc_id" >= mid), dir, "b1.parquet",
      1700000100000L)
    val longWord = "z" * (graft.functions.UgKernels.MaxWordLen + 3)
    stageFile(
      Seq((9001L, null: String, "en", "fixture", 0L),
          (9002L, s"zzznovel $longWord", "en", "fixture", 30L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      dir, "b2.parquet", 1700000200000L)

    // offline training over the same token-count frame the batch
    // query builds, then the DISK round trip
    val tok = docs
      .select($"doc_id", explode(
        graft.queries.TextQueries.tokens(lower($"text"))).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
    val trained = graft.queries.TextQueries.unigramVocab(tok)
    graft.sources.Artifacts.writeUgVocab(trained, spark, art.toString)
    val staged = graft.sources.Artifacts.readUgVocab(spark, art.toString)
    assert(staged.pieces === trained.pieces, "vocab round trip must be exact")

    val out = DocStream.applyUnigram(
      DocStream.readDocs(spark, dir.toString), staged)
    val q = EventStream.runToMemory(out.toDF(), "ug_stream",
      OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val got = spark.table("ug_stream")
      .as[(Long, Long, Long, Double)].collect().toSet

    val batch = graft.SparkEntry
      .queries("q_doc_unigram_tok_apply")(spark, sf0001)
      .filter($"ws_tokens" > 0)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got.filter(_._1 < 9000L) === batch)

    // synthetic pins via the kernel: the novel word Viterbi-segments,
    // the over-unroll word pays one piece per char
    def ntok(w: String): Long = graft.functions.UgKernels
      .segment(org.apache.spark.unsafe.types.UTF8String.fromString(w),
        staged).numElements().toLong
    assert(ntok(longWord) === longWord.length.toLong)
    val expect9002 = (9002L, 2L, ntok("zzznovel") + ntok(longWord),
      math.floor((ntok("zzznovel") + ntok(longWord)).toDouble / 2
        * 10000 + 0.5) / 10000)
    assert(got.find(_._1 == 9002L).contains(expect9002))
    assert(!got.exists(_._1 == 9001L))

    val peakState = q.recentProgress
      .map(_.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max)
    assert(peakState === 0L,
      s"applyUnigram must never store state, saw $peakState rows")
  }
}
