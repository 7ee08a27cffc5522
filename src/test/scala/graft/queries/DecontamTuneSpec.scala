package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** q_decontaminate_tune beyond the oracle hash: the width-4 rung must
  * be exactly q_doc_decontaminate aggregated (one definition, two
  * reports), and planted leaks must fall off the curve at the width
  * their overlap dictates — the property the knob exists to tune. */
class DecontamTuneSpec extends SparkTestBase {
  import spark.implicits._

  private def sweep(dir: String) =
    graft.SparkEntry.queries("q_decontaminate_tune")(spark, dir)
      .select($"gram_w", $"bench_grams", $"flagged_docs",
        $"matched_grams", $"hit_rows")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
      .map(r => r._1 -> r).toMap

  test("the width-4 rung equals the aggregated q_doc_decontaminate report") {
    val m = sweep(sf0001)
    val rows = graft.SparkEntry.queries("q_doc_decontaminate")(spark, sf0001)
      .select($"doc_id", $"shared_gram_count")
      .as[(Long, Long)].collect().toSeq
    assert(m(4)._3 == rows.size.toLong)
    assert(m(4)._5 == rows.map(_._2).sum)
    assert(m.keySet == Set(3, 4, 5, 6, 8))
  }

  test("a planted leak falls off the curve at the width its overlap dictates") {
    def toks(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i")
    val bench = toks("b", 1, 30).mkString(" ")
    // verbatim leak: the whole benchmark doc, re-crawled into the corpus
    val verbatim = bench
    // phrase leak: exactly 5 consecutive benchmark tokens inside
    // otherwise-novel text -> contains shared 3/4/5-grams but no
    // shared 6- or 8-gram
    val phrase = (toks("p", 1, 10) ++ toks("b", 11, 15) ++
      toks("q", 1, 10)).mkString(" ")
    val clean = toks("c", 1, 25).mkString(" ")
    val dir = Files.createTempDirectory("decontam_fixture").toString
    Seq(
      (0L, bench, "en", "src0", 0L),
      (1L, verbatim, "en", "s1", 0L),
      (2L, phrase, "en", "s2", 0L),
      (3L, clean, "en", "s3", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val m = sweep(dir)
    // both leaks at 3/4/5; only the verbatim copy at 6/8
    assert(m(3)._3 == 2L && m(4)._3 == 2L && m(5)._3 == 2L, m)
    assert(m(6)._3 == 1L && m(8)._3 == 1L, m)
    // the clean doc is never flagged at any width (implied by counts)
  }
}
