package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** q_select_mmr's selection semantics, pinned two ways:
  *
  *  - a PLANTED geometry where diversity must beat pure relevance: the
  *    query sits between cluster A (two EXACT duplicates at +10°) and
  *    cluster B (one vector at −10°, equal relevance). Top-2 by
  *    relevance alone would take both A copies; MMR must pick one A,
  *    then B (the duplicate's marginal score is rel − 10000 < B's
  *    rel − cos20°), then the A duplicate, then the far-off C.
  *  - invariants on the real corpus: rank 1 is the pure-relevance
  *    argmax with maxsim 0, picked scores are monotone non-increasing
  *    (the greedy's defining property — a later pick scoring higher
  *    would mean an earlier argmax was wrong), and picks are distinct. */
class MmrSpec extends SparkTestBase {
  import spark.implicits._

  test("planted two-cluster geometry: MMR alternates clusters where " +
      "pure top-k would take the duplicate") {
    val dir = java.nio.file.Files.createTempDirectory("mmr_fix").toString
    val c10 = 0.9848f; val s10 = 0.1736f
    Seq(
      (0L, Array(1.0f, 0.0f), 0),    // the query
      (1L, Array(c10, s10), 0),      // A1, +10 degrees
      (2L, Array(c10, s10), 0),      // A2 = exact duplicate of A1
      (3L, Array(c10, -s10), 1),     // B, -10 degrees (rel equal to A)
      (4L, Array(0.0f, 1.0f), 2))    // C, orthogonal to the query
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = SparkEntry.queries("q_select_mmr")(spark, dir)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._2) === Seq(1L, 3L, 2L, 4L),
      s"selection order wrong: $got")
    // the duplicate's redundancy is total: maxsim = 10000 ticks (cos 1)
    assert(got.find(_._2 == 2L).get._4 === 10000L)
    // rank 1 is pure relevance: no selected set yet to be similar to
    assert(got.head._4 === 0L)
  }

  test("real-corpus invariants: relevance argmax first, monotone scores, " +
      "distinct picks") {
    val got = SparkEntry.queries("q_select_mmr")(spark, sf0001)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got.size === 10)
    assert(got.map(_._2).distinct.size === got.size)
    assert(got.head._4 === 0L, "rank 1 must carry maxsim 0")
    assert(got.head._3 === got.map(_._3).max,
      "rank 1 must be the pure-relevance argmax")
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._5 >= b._5,
        s"greedy scores must be non-increasing: $a then $b")
    }
    // scores are the documented identity
    got.foreach(r => assert(r._5 === r._3 - r._4))
  }

  test("the λ sweep's guaranteed endpoints: num=den reduces to pure " +
      "top-k, full budgets everywhere") {
    val rungs = SparkEntry.queries("q_select_mmr_tune")(spark, sf0001)
      .as[(Int, Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rungs.map(_._1) === Seq(1, 2, 3, 4))
    rungs.foreach(r => assert(r._3 === 10L, s"short selection: $r"))
    // λ = 1: score = 4·rel — the greedy IS top-k by (rel desc, id),
    // so overlap with the pure-relevance top-K must be total
    val pure = rungs.find(_._1 === 4).get
    assert(pure._7 === pure._3, s"num=den rung diverged from top-k: $pure")
  }
}
