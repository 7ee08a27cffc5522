package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** The diverse-serving face ([[DocStream.searchDiverse]]) must replay
  * the batch MMR selection exactly: with nprobe = the full cell count
  * the retrieved candidate set is the whole corpus, so the served
  * picks for a replayed probe must equal `q_select_mmr`'s rows — every
  * greedy decision re-made from integer ticks on the serving path —
  * while the face keeps ZERO state rows (a probe's candidates land in
  * its own micro-batch; the group fires once and never writes state). */
class MmrStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("exhaustive-probe diverse serving equals the batch MMR picks, " +
      "with zero state") {
    val vecs = Tables.table(spark, sf0001, "embeddings")
    val cents = graft.queries.SimilarityQueries.semCentroids(16, 64)
    val index = DocStream.prepareAnnIndex(vecs, cents)

    val dir = Files.createTempDirectory("vecs_stream_mmr")
    stageFile(vecs.filter($"vec_id" === 0), dir, "b0.parquet",
      1700000000000L)

    val out = DocStream.searchDiverse(spark,
      DocStream.readEmbeddings(spark, dir.toString), index, cents,
      nprobe = cents.size).toDF()
    val q = EventStream.runToMemory(out, "mmr_serve", OutputMode.Append())
    q.processAllAvailable()
    val stateRows = q.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .map(_.numRowsTotal).foldLeft(0L)(math.max)
    q.stop()
    assert(stateRows === 0L, "diverse serving must keep no state")

    val got = spark.table("mmr_serve")
      .select($"query_id", $"rank", $"vec_id", $"rel_t", $"maxsim_t",
        $"score_t")
      .as[(Long, Int, Long, Long, Long, Long)].collect().toSeq.sortBy(_._2)
    val want = graft.SparkEntry.queries("q_select_mmr")(spark, sf0001)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
      .map { case (r, vid, rel, ms, sc) => (0L, r, vid, rel, ms, sc) }
    assert(want.nonEmpty && got === want)
  }
}
