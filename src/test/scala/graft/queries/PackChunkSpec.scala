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

  test("the context sweep's 2048 rung IS the shipped chunk cut, and the " +
      "fragmentation/waste trade-off moves the right way") {
    val rungs = graft.SparkEntry.queries("q_doc_pack_tune")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rungs.map(_._1) === Seq(512L, 1024L, 2048L, 4096L))
    // cross-query pin: the 2048 rung's window count equals the shipped
    // chunk cut's distinct windows (same streams, same ceil arithmetic)
    val r2048 = rungs.find(_._1 === 2048L).get
    assert(r2048._2 === out.size.toLong,
      s"sweep n_windows ${r2048._2} != chunk manifest rows ${out.size}")
    // constants and monotonicities the cut geometry guarantees:
    // token mass is rung-invariant, window count and split counts are
    // non-increasing in the context length, crossings bound splits
    assert(rungs.map(_._3).distinct.size === 1)
    rungs.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 >= b._2, s"n_windows increased: $a -> $b")
      assert(a._4 >= b._4, s"split_docs increased: $a -> $b")
    }
    rungs.foreach(r => assert(r._5 >= r._4,
      s"crossings below split docs: $r"))
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
