package graft.queries

import graft.{SparkEntry, SparkTestBase}
import graft.functions.{UgKernels, UgVocab}
import org.apache.spark.unsafe.types.UTF8String

/** The unigram-LM tokenizer (trainer + Viterbi segmenter). The oracles
  * replay the full EM lifecycle; this spec pins the POLICIES: Viterbi
  * optimality (where greedy longest-match is provably worse), the
  * deterministic tie-break, the char fallbacks, and the EM pruning. */
class UnigramTokSpec extends SparkTestBase {

  private def seg(vocab: Seq[(String, Long)], w: String): Seq[String] = {
    val a = UgKernels.segment(UTF8String.fromString(w), UgVocab(vocab))
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  test("Viterbi picks the best-scored segmentation where greedy " +
      "longest-match is worse") {
    // greedy would take 'abc' then pay chars for d,e (-1-5-5 = -11);
    // Viterbi composes ab+cde (-2)
    val v = Seq("ab" -> -1L, "cde" -> -1L, "abc" -> -1L,
      "a" -> -5L, "b" -> -5L, "c" -> -5L, "d" -> -5L, "e" -> -5L)
    assert(seg(v, "abcde") === Seq("ab", "cde"))
  }

  test("ties break toward fewer pieces, then the longer last piece") {
    // 'ab'+'cd' and 'abcd' both score -4; fewer pieces wins
    val v1 = Seq("ab" -> -2L, "cd" -> -2L, "abcd" -> -4L)
    assert(seg(v1, "abcd") === Seq("abcd"))
    // equal score AND equal piece count: longer LAST piece wins
    // 'abc'+'d' vs 'ab'+'cd' (both -4, both 2 pieces) -> last piece 'cd'
    val v2 = Seq("abc" -> -2L, "d" -> -2L, "ab" -> -2L, "cd" -> -2L)
    assert(seg(v2, "abcd") === Seq("ab", "cd"))
  }

  test("char fallback: words longer than the DP unroll and unreachable " +
      "words segment per character") {
    val v = Seq("a" -> -1L)
    assert(seg(v, "a" * (UgKernels.MaxWordLen + 1))
      === Seq.fill(UgKernels.MaxWordLen + 1)("a"))
    assert(seg(Seq.empty, "xy") === Seq("x", "y"))
    assert(seg(v, "") === Seq.empty)
  }

  test("hard EM prunes the seed: the trained vocabulary is a strict " +
      "subset of the seed substrings and covers every char (sf0.001)") {
    val rows = SparkEntry.queries("q_doc_unigram_tok_train")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("cnt"),
        r.getAs[Long]("lp6")))
    assert(rows.nonEmpty)
    // every surviving piece carries a positive count and a negative tick
    rows.foreach { case (p, c, lp) =>
      assert(c > 0, p); assert(lp < 0, p)
      assert(p.length <= TextQueries.UgMaxPiece, p)
    }
    // pruning happened: strictly fewer pieces than seed substrings
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val seeds = graft.Tables.table(spark, sf0001, "documents")
      .select(explode(TextQueries.tokens(lower($"text"))).as("w"))
      .filter(length($"w") > 0).distinct()
      .select($"w", explode(sequence(lit(1), length($"w"))).as("i"))
      .select($"w", $"i", explode(sequence(lit(1),
        least(lit(TextQueries.UgMaxPiece), length($"w") - $"i" + 1))).as("L"))
      .select(expr("substr(w, i, L)").as("p")).distinct().count()
    assert(rows.length < seeds, s"${rows.length} !< $seeds")
  }

  test("apply: every doc's unigram token count sits between the " +
      "whitespace count and the char mass (sf0.001)") {
    val rows = SparkEntry.queries("q_doc_unigram_tok_apply")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ws = r.getAs[Long]("ws_tokens")
      val ug = r.getAs[Long]("ug_tokens")
      assert(ug >= ws, s"doc ${r.getAs[Long]("doc_id")}")
    }
  }
}
