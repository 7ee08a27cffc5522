package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Concat-and-chunk packing invariants q_doc_pack_chunk must satisfy
  * beyond the oracle hash (which pins the exact manifest): the cut
  * discipline itself — every window except each stream's tail is
  * filled to exactly 2048 tokens, token mass is conserved, and each
  * stream's window ids are the contiguous prefix 0..max. */
class PackChunkSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val out =
    graft.SparkEntry.queries("q_doc_pack_chunk")(spark, sf0001)
      .collect().toSeq
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("shard"),
        r.getAs[Long]("window_id"), r.getAs[Long]("doc_count"),
        r.getAs[Long]("token_sum")))

  test("every non-tail window holds exactly 2048 tokens") {
    assert(out.nonEmpty)
    val byStream = out.groupBy { case (l, s, _, _, _) => (l, s) }
    byStream.foreach { case ((l, s), ws) =>
      val maxW = ws.map(_._3).max
      ws.filter(_._3 < maxW).foreach { case (_, _, w, _, ts) =>
        assert(ts == 2048L, s"stream ($l,$s) window $w holds $ts tokens")
      }
      // the tail never overfills
      assert(ws.find(_._3 == maxW).get._5 <= 2048L)
    }
  }

  test("the BPE-space chunk cut obeys the same fill discipline in its " +
      "own token space") {
    val bpe = graft.SparkEntry.queries("q_doc_pack_bpe_chunk")(spark, sf0001)
      .collect().toSeq
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("shard"),
        r.getAs[Long]("window_id"), r.getAs[Long]("token_sum")))
    assert(bpe.nonEmpty)
    bpe.groupBy { case (l, s, _, _) => (l, s) }.foreach { case ((l, s), ws) =>
      val maxW = ws.map(_._3).max
      ws.filter(_._3 < maxW).foreach { case (_, _, w, ts) =>
        assert(ts == 2048L, s"bpe stream ($l,$s) window $w holds $ts") }
    }
    // mass conservation against the per-doc BPE accounting itself
    val totalPacked = bpe.map(_._4).sum
    val totalBpe = TextQueries.bpePerDocTokens(spark, sf0001)
      .join(spark.read.parquet(s"$sf0001/documents.parquet")
        .filter(length(trim($"text")) > 0).select($"doc_id"), Seq("doc_id"))
      .agg(sum($"bpe_tokens")).as[Long].head()
    assert(totalPacked == totalBpe)
  }

  test("token mass is conserved and window ids are contiguous from 0") {
    val totalPacked = out.map(_._5).sum
    val totalTokens = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(length(trim($"text")) > 0)
      .select(size(split(trim($"text"), "\\s+")).cast("long").as("n"))
      .agg(sum($"n")).as[Long].head()
    assert(totalPacked == totalTokens)
    out.groupBy { case (l, s, _, _, _) => (l, s) }.foreach {
      case ((l, s), ws) =>
        val ids = ws.map(_._3).sorted
        assert(ids == (0L until ids.length).toList,
          s"stream ($l,$s) windows not contiguous: $ids")
    }
  }
}
