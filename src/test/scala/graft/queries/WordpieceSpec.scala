package graft.queries

import graft.{SparkEntry, SparkTestBase}
import graft.functions.{WpKernels, WpVocab}
import org.apache.spark.unsafe.types.UTF8String

/** The WordPiece trainer + greedy segmenter. The oracles replay both
  * end to end; this spec pins the POLICIES: the likelihood-gain argmax
  * genuinely diverges from BPE's frequency argmax, and the greedy
  * longest-match kernel prefers long pieces and counts OOV fallbacks. */
class WordpieceSpec extends SparkTestBase {

  private def stats(vocab: Seq[String], w: String): (Long, Long) = {
    val r = WpKernels.stats(UTF8String.fromString(w), WpVocab(vocab))
    (r.getLong(0), r.getLong(1))
  }

  test("greedy longest match prefers the longest piece and falls back " +
      "one OOV char at a time") {
    val v = Seq("a", "b", "c", "ab", "abc", "bc")
    assert(stats(v, "abcab") === (2L, 0L)) // abc + ab, not a+b+c+a+b
    assert(stats(v, "cba") === (3L, 0L))   // c + b + a
    assert(stats(v, "abzc") === (3L, 1L))  // ab + z(OOV) + c
    assert(stats(v, "") === (0L, 0L))
    assert(stats(Seq.empty, "xy") === (2L, 2L)) // all-OOV char walk
  }

  test("the likelihood-gain argmax diverges from BPE's frequency argmax") {
    import spark.implicits._
    // pair (a)(b) occurs 4x but a and b are everywhere (gain is low);
    // pair (x)(y) occurs 3x and x/y occur ONLY together (gain is max)
    val words = Seq(
      ("(a)(b)", 4L), ("(a)(c)", 5L), ("(b)(d)", 5L),
      ("(x)(y)", 3L))
      .toDF("seg", "cnt")
    val wp = TextQueries.wordpieceMerges(words)
    assert(wp.head._2 === "x" && wp.head._3 === "y",
      s"wordpiece picked ${wp.head}")
    // BPE on the same table picks the raw-frequency winner instead
    val bpe = TextQueries.bpeMerges(words)
    assert(bpe.head._2 === "a" && bpe.head._3 === "c",
      s"bpe picked ${bpe.head}") // (a)(c) at 5, ties to lexicographic
  }

  test("the budget sweep is monotone: more merges never cost tokens, " +
      "OOV is budget-invariant, and the full rung equals the apply " +
      "query's global aggregate (sf0.001)") {
    val rungs = SparkEntry.queries("q_doc_wordpiece_tune")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Int]("merge_budget"), r.getAs[Long]("vocab_size"),
        r.getAs[Long]("ws_tokens"), r.getAs[Long]("wp_tokens"),
        r.getAs[Long]("oov_chars"))).sortBy(_._1)
    assert(rungs.map(_._1).toSeq === TextQueries.WpTuneBudgets)
    // EMPIRICAL pin, not a theorem: greedy longest match is not
    // globally monotone in the vocabulary (a longer piece can force a
    // worse tail — vocab {ab, cde}: "abcde" = 2 pieces, add "abc" and
    // greedy pays abc+d+e = 3), but merges trained by likelihood gain
    // on THIS corpus segment it monotonically — the property the tune
    // query's compression column banks on, checked rather than assumed
    rungs.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 <= a._4, s"budget ${b._1} costs more than ${a._1}")
      assert(b._2 >= a._2, "vocab must grow with the budget")
    }
    // the char alphabet is in every rung: OOV is budget-invariant
    assert(rungs.map(_._5).distinct.length === 1)
    // ws_tokens is the corpus constant
    assert(rungs.map(_._3).distinct.length === 1)
    // the full-budget rung IS q_doc_wordpiece_apply's global aggregate
    val apply = SparkEntry.queries("q_doc_wordpiece_apply")(spark, sf0001)
      .collect()
    val full = rungs.last
    assert(apply.map(_.getAs[Long]("ws_tokens")).sum === full._3)
    assert(apply.map(_.getAs[Long]("wp_tokens")).sum === full._4)
    assert(apply.map(_.getAs[Long]("oov_chars")).sum === full._5)
  }

  test("train and apply agree on sf0.001 and the vocabularies diverge " +
      "from BPE") {
    val wp = SparkEntry.queries("q_doc_wordpiece_train")(spark, sf0001)
      .collect().map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
    val bpe = SparkEntry.queries("q_doc_bpe_train")(spark, sf0001)
      .collect().map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
    assert(wp.length === TextQueries.WpMergeCount)
    assert(wp.toSeq !== bpe.toSeq, "objectives should pick different merges")
    // every doc's wp_tokens sits between piece-count bounds: at most
    // one piece per char, at least the whitespace token count
    val rows = SparkEntry.queries("q_doc_wordpiece_apply")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ws = r.getAs[Long]("ws_tokens")
      val t = r.getAs[Long]("wp_tokens")
      assert(t >= ws, s"doc ${r.getAs[Long]("doc_id")}: $t < $ws")
      assert(r.getAs[Long]("oov_chars") >= 0L)
    }
  }
}
