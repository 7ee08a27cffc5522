package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** The streaming WordPiece face must agree row-for-row with the batch
  * `q_doc_wordpiece_apply` on a replayed corpus, under a DISK-staged
  * vocabulary (Artifacts round-trip), across micro-batch boundaries.
  * A synthetic third micro-batch exercises the stream-only paths: a
  * novel word segmenting greedily under the trained vocabulary, an
  * out-of-alphabet character on the counted OOV fallback, and a
  * null-text doc. Zero state rows at any arrival count. */
class WpStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming WordPiece equals the batch twin under a disk-staged " +
      "vocabulary") {
    val dir = Files.createTempDirectory("docs_stream_wp")
    val art = Files.createTempDirectory("wp_artifacts")
    val docs = Tables.table(spark, sf0001, "documents")
    val mid = 300L
    stageFile(docs.filter($"doc_id" < mid), dir, "b0.parquet",
      1700000000000L)
    stageFile(docs.filter($"doc_id" >= mid), dir, "b1.parquet",
      1700000100000L)
    stageFile(
      Seq((9001L, null: String, "en", "fixture", 0L),
          (9002L, "zzznovel é", "en", "fixture", 10L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      dir, "b2.parquet", 1700000200000L)

    // offline training over the same corpus-derived token-count frame
    // the batch query builds, then the DISK round trip
    val tok = docs
      .select($"doc_id", explode(
        graft.queries.TextQueries.tokens(lower($"text"))).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
    val trained = graft.queries.TextQueries.wordpieceVocab(tok)
    graft.sources.Artifacts.writeWpVocab(trained, spark, art.toString)
    val staged = graft.sources.Artifacts.readWpVocab(spark, art.toString)
    assert(staged.pieces === trained.pieces, "vocab round trip must be exact")

    val out = DocStream.applyWordpiece(
      DocStream.readDocs(spark, dir.toString), staged)
    val q = EventStream.runToMemory(out.toDF(), "wp_stream",
      OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val got = spark.table("wp_stream")
      .as[(Long, Long, Long, Long, Double)].collect().toSet

    val batch = graft.SparkEntry
      .queries("q_doc_wordpiece_apply")(spark, sf0001)
      .filter($"ws_tokens" > 0)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got.filter(_._1 < 9000L) === batch)

    // synthetic pins via the kernel itself (the stream face must equal
    // a direct kernel evaluation): novel word segments greedily, the
    // out-of-alphabet char counts as OOV
    def ref(w: String): (Long, Long) = {
      val r = graft.functions.WpKernels.stats(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), staged)
      (r.getLong(0), r.getLong(1))
    }
    val (t1, o1) = ref("zzznovel")
    val (t2, o2) = ref("é")
    assert(o2 === 1L, "an out-of-alphabet char must count as OOV")
    val expect9002 = (9002L, 2L, t1 + t2, o1 + o2,
      math.floor((t1 + t2).toDouble / 2 * 10000 + 0.5) / 10000)
    assert(got.find(_._1 == 9002L).contains(expect9002))
    assert(!got.exists(_._1 == 9001L))

    val peakState = q.recentProgress
      .map(_.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max)
    assert(peakState === 0L,
      s"applyWordpiece must never store state, saw $peakState rows")
  }
}
