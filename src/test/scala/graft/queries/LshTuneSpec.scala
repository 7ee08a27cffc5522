package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** q_lsh_tune beyond the oracle hash: the structural properties the
  * calibration report's interpretation rests on —
  *  - band layouts NEST (an 8-row band match implies its 4-row halves
  *    and 2-row quarters match), so candidate counts are monotone in
  *    looseness and the loosest layout's pooled recall anchors at 1.0;
  *  - the S-curve constants match an independent recomputation and
  *    order the layouts the way the theory says;
  *  - a planted near-identical pair is surfaced by every layout and
  *    verified as a true positive. */
class LshTuneSpec extends SparkTestBase {
  import spark.implicits._

  private def report(dir: String) =
    graft.SparkEntry.queries("q_lsh_tune")(spark, dir)
      .select($"cfg", $"n_candidates", $"n_true", $"pool_true",
        $"pooled_recall", $"p_collide_at_tau")
      .as[(String, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap

  test("candidate counts are monotone in layout looseness (nesting)") {
    val m = report(sf0001)
    assert(m("4x8")._2 <= m("8x4")._2)
    assert(m("8x4")._2 <= m("16x2")._2)
    // true positives nest the same way
    assert(m("4x8")._3 <= m("8x4")._3 && m("8x4")._3 <= m("16x2")._3)
  }

  test("the loosest layout anchors pooled recall at exactly 1.0") {
    val m = report(sf0001)
    // the pool is the union of candidate sets and 16x2 is a superset of
    // both others, so every pooled true pair is a 16x2 candidate
    assert(m("16x2")._4 > 0, "test corpus lost its near-dup pairs")
    assert(m("16x2")._5 == 1.0)
  }

  test("S-curve constants: independent recomputation and ordering") {
    val m = report(sf0001)
    def p(b: Int, r: Int) =
      math.floor((1d - math.pow(1d - math.pow(0.5, r), b)) * 1e4 + 0.5) / 1e4
    assert(m("4x8")._6 == p(4, 8))
    assert(m("8x4")._6 == p(8, 4))
    assert(m("16x2")._6 == p(16, 2))
    // looser rows-per-band -> higher collision probability at the
    // threshold — the S-curve's left shift
    assert(m("4x8")._6 < m("8x4")._6 && m("8x4")._6 < m("16x2")._6)
  }

  test("a planted near-identical pair is a true positive in every layout") {
    val dir = Files.createTempDirectory("lsh_tune_fixture").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    Seq(
      (1L, base, "en", "s0", 0L),
      (2L, base + " extra", "en", "s1", 0L), // near-identical, not exact
      (3L, (100 to 140).map(i => s"z$i").mkString(" "), "en", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val m = report(dir)
    Seq("4x8", "8x4", "16x2").foreach { cfg =>
      assert(m(cfg)._3 == 1L, s"$cfg missed the planted pair: ${m(cfg)}")
      assert(m(cfg)._4 == 1L)
      assert(m(cfg)._5 == 1.0)
    }
  }
}
