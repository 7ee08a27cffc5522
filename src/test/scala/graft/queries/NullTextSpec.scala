package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** Real corpora contain null, empty, and whitespace-only documents; the
  * driver testdata contains none, so nothing in the oracle gate pins how
  * the text/dedup pipelines behave on them. This spec documents and
  * pins the actual contract: degenerate texts must never crash a
  * pipeline, null-text docs must not be declared near-duplicates of
  * real documents, and the normalized-fingerprint grouping treats
  * null as its own group (SQL GROUP BY null semantics, same as DuckDB). */
class NullTextSpec extends SparkTestBase {
  import spark.implicits._

  lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("nulltext_fixture").toString
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    Seq(
      (0L, base, "en", "s0", base.length.toLong),
      (1L, base, "en", "s1", base.length.toLong),
      (2L, null.asInstanceOf[String], "en", "s2", 0L),
      (3L, null.asInstanceOf[String], "en", "s3", 0L),
      (4L, "", "en", "s4", 0L),
      (5L, "   ", "en", "s5", 3L),
      (6L, "one two", "en", "s6", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  private val textQueries = Seq(
    "q_dedup_exact", "q_dedup_ngram_jaccard", "q_dedup_containment",
    "q_dedup_minhash_lsh",
    "q_dedup_minhash_sql", "q_dedup_simhash", "q_dedup_simhash_sql",
    "q_dedup_clusters", "q_dedup_editdist", "q_doc_tokens",
    "q_doc_quality", "q_doc_repetition", "q_doc_fingerprint",
    "q_doc_langid", "q_doc_winnow", "q_dedup_span", "q_sample_weighted",
    "q_lsh_tune", "q_doc_cms", "q_sample_weighted_group",
    "q_dedup_tau_sweep", "q_decontaminate_tune")

  test("degenerate texts (null/empty/whitespace) never crash a pipeline") {
    textQueries.foreach { q =>
      val n = graft.SparkEntry.allQueries(q)(spark, fixtureDir).count()
      assert(n >= 0, s"$q failed")
    }
  }

  test("no-content docs are excluded from near-dup banding entirely") {
    // null/empty/whitespace texts all normalize to empty token content —
    // left in, they'd share one degenerate signature and pair null docs
    // with empty docs as "near-duplicates" (the original behavior this
    // spec caught); collapseExact filters them before banding
    val degenerate = Set(2L, 3L, 4L, 5L)
    Seq("q_dedup_minhash_lsh", "q_dedup_minhash_sql", "q_dedup_simhash",
      "q_dedup_simhash_sql", "q_dedup_containment").foreach { q =>
      val pairs = graft.SparkEntry.allQueries(q)(spark, fixtureDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bad = pairs.filter { case (a, b) =>
        degenerate.contains(a) || degenerate.contains(b) }
      assert(bad.isEmpty, s"$q banded no-content docs: $bad")
      assert(pairs.contains((0L, 1L)), s"$q lost its real duplicate pair")
    }
    // ngram keeps its oracle's semantics: "" and "   " share a fingerprint
    // and a length band, so they pair at jaccard 1.0 there — but null-text
    // docs (null group keys) never join into any pair
    val ngram = graft.SparkEntry.queries("q_dedup_ngram_jaccard")(
      spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ngram.forall { case (a, b) => a != 2L && a != 3L && b != 2L && b != 3L },
      s"ngram paired null-text docs: $ngram")
  }
}
