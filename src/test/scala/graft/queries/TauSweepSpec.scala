package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** q_dedup_tau_sweep beyond the oracle hash: the sweep must be exactly
  * the conditional aggregation of the (independently oracle-verified)
  * q_dedup_ngram_jaccard pair list, every column must be nonincreasing
  * in τ, and on a corpus with GRADED similarity the curve actually
  * steps (the sf0.01 corpus's near-dups are all exact copies, so its
  * curve is flat at every rung — a fixture with high/mid/low-overlap
  * variants exercises the rungs the report exists to separate). */
class TauSweepSpec extends SparkTestBase {
  import spark.implicits._

  private val taus = Seq(0.2, 0.35, 0.5, 0.65, 0.8)

  private def sweep(dir: String) =
    graft.SparkEntry.queries("q_dedup_tau_sweep")(spark, dir)
      .select($"tau", $"n_pairs", $"flagged_docs", $"flagged_chars")
      .as[(Double, Long, Long, Long)].collect().toSeq.sortBy(_._1)

  private def check(dir: String): Seq[(Double, Long, Long, Long)] = {
    val got = sweep(dir)
    assert(got.map(_._1) === taus)
    // the sweep IS the pair list, aggregated
    val pairs = graft.SparkEntry.queries("q_dedup_ngram_jaccard")(
      spark, dir)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    val chars = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    taus.zip(got).foreach { case (tau, (_, np, fd, fc)) =>
      val qualifying = pairs.filter(_._3 >= tau)
      assert(np == qualifying.size, s"n_pairs at $tau")
      val flagged = qualifying.map(_._2).distinct
      assert(fd == flagged.size, s"flagged_docs at $tau")
      assert(fc == flagged.map(chars).sum, s"flagged_chars at $tau")
    }
    // monotone nonincreasing in τ
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3 && a._4 >= b._4)
    }
    got
  }

  test("sweep equals the aggregated pair list on sf0.001, monotone") {
    check(sf0001)
  }

  test("a graded-similarity corpus steps the curve across rungs") {
    def tok(p: String, i: Int) = f"$p$i%02d"
    val base = (1 to 40).map(tok("w", _))
    def variant(p: String, keep: Int) =
      (base.take(keep) ++ ((keep + 1) to 40).map(tok(p, _))).mkString(" ")
    val dir = Files.createTempDirectory("tau_fixture").toString
    Seq(
      (0L, base.mkString(" ")),  // the original
      (1L, variant("x", 36)),    // high overlap (j ≈ 0.81)
      (2L, variant("y", 28)),    // mid overlap (j ≈ 0.52)
      (3L, variant("z", 16)))    // low overlap (j ≈ 0.23)
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val got = check(dir)
    val byTau = got.map(r => r._1 -> r._2).toMap
    // each variant falls off the curve at its own rung
    assert(byTau(0.2) > byTau(0.35), s"low-overlap rung missing: $got")
    assert(byTau(0.5) > byTau(0.65), s"mid-overlap rung missing: $got")
    assert(byTau(0.8) >= 1, s"high-overlap rung missing: $got")
  }
}
