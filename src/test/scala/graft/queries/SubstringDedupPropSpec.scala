package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** Randomized equivalence witness for the collapse-first substring
  * pipeline: on seeded random corpora built to stress exactly the shapes
  * the collapse must preserve — verbatim duplicate groups, tiny shared
  * vocabularies (dense shingle collisions), within-doc repetition, sub-k
  * and degenerate documents, case/whitespace variants that normalization
  * folds into one fingerprint group, and a df cap low enough to engage on
  * copy-inflated shingles — the production query must equal an
  * independent UNCOLLAPSED brute-force reference (the same computation
  * the DuckDB oracle and SubstringDedupSpec's sf0.001 witness perform).
  * Fixed seed: failures replay exactly.
  */
class SubstringDedupPropSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 5 // SubstringShingleTokens
  private val MinRun = 15 // MinRunTokens

  private def write(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("substring_prop").toString
    rows.map { case (id, text) =>
      (id, text, "en", s"src$id", Option(text).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): Map[Long, (Long, Long)] =
    DedupQueries.queries("q_dedup_substring")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_of"), r.getAs[Long]("run_tokens"))).toMap

  /** Uncollapsed brute-force reference: normalize exactly as toks() does
    * (SQL trim = spaces only), positional k-shingles, df over DISTINCT
    * documents, gaps-and-islands runs per (a, b, diagonal), longest-run /
    * smallest-id blame. Mirrors the oracle SQL, shares nothing with the
    * production pipeline. */
  private def reference(rows: Seq[(Long, String)],
      dfCap: Int): Map[Long, (Long, Long)] = {
    val docs = rows.map { case (id, t) =>
      id -> Option(t).map(s =>
          s.toLowerCase.replaceAll("^ +| +$", "")
            .replaceAll("\\s+", " ").split(" ", -1).toSeq)
        .getOrElse(Seq.empty)
    }.filter(_._2.size >= K)
    val shingles = docs.flatMap { case (id, t) =>
      t.sliding(K).zipWithIndex.map { case (sh, i) =>
        (id, i + 1, sh.mkString(" ")) }
    }
    val df = shingles.groupBy(_._3).view
      .mapValues(_.map(_._1).distinct.size).toMap
    val kept = shingles.filter(s => df(s._3) <= dfCap)
    val matches = kept.groupBy(_._3).values.toSeq.flatMap { occ =>
      for { a <- occ; b <- occ if a._1 < b._1 }
        yield (a._1, b._1, b._2 - a._2, b._2)
    }
    val runs = matches.groupBy { case (a, b, d, _) => (a, b, d) }.flatMap {
      case ((a, b, _), ms) =>
        val ps = ms.map(_._4).sorted
        ps.zipWithIndex.groupBy { case (p, i) => p - i }
          .map { case (_, run) => (a, b, run.size) }
    }
    runs.groupBy { case (a, b, _) => (a, b) }.view
      .mapValues(_.map(_._3).max + K - 1).toSeq
      .map { case ((a, b), rt) => (a, b, rt.toLong) }
      .filter(_._3 >= MinRun)
      .groupBy(_._2).view.mapValues { cands =>
        val best = cands.minBy { case (a, _, rt) => (-rt, a) }
        (best._1, best._3)
      }.toMap
  }

  test("seeded random duplicate-heavy corpora match the uncollapsed " +
      "reference, with and without the df cap engaged") {
    val rnd = new scala.util.Random(20260813L)
    var flaggedTotal = 0
    for (iter <- 1 to 10) {
      val vocab = (1 to (6 + rnd.nextInt(10))).map(i => s"w$i")
      def sentence(n: Int): String =
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // base docs: mixed lengths incl. sub-k and degenerate shapes,
      // some with a deliberately repeated block (within-doc repetition)
      val base = (0 until (5 + rnd.nextInt(12))).map { i =>
        val body = rnd.nextInt(6) match {
          case 0 => sentence(rnd.nextInt(K)) // sub-k: never shingled
          case 1 => "   " // whitespace-only: degenerate
          case 2 =>
            val block = sentence(8 + rnd.nextInt(10))
            s"$block $block" // internal verbatim repetition
          case _ => sentence(10 + rnd.nextInt(30))
        }
        i.toLong -> body
      }
      // verbatim duplicates with fresh ids: some byte-identical, some
      // case/whitespace variants the normalization must fold into the
      // same fingerprint group
      var nextId = base.size.toLong
      val dups = base.flatMap { case (_, text) =>
        (1 to rnd.nextInt(3)).map { _ =>
          nextId += 1
          val variant = rnd.nextInt(3) match {
            case 0 => text
            case 1 => text.toUpperCase
            case _ => " " + text.replace(" ", "  ") + " "
          }
          nextId -> variant
        }
      }
      val corpus = rnd.shuffle(base ++ dups)
        .zipWithIndex.map { case ((_, t), i) => i.toLong -> t }
      val dir = write(corpus)
      // low caps make the df filter engage on copy-inflated shingles;
      // the high cap leaves the full match universe alive
      for (cap <- Seq(3 + rnd.nextInt(5), 100)) {
        spark.conf.set("spark.graft.dedup.maxGramDf", cap.toString)
        try {
          val got = run(dir)
          val want = reference(corpus, cap)
          assert(got === want,
            s"iter=$iter cap=$cap corpus=${corpus.take(30)}")
          flaggedTotal += got.size
        } finally spark.conf.unset("spark.graft.dedup.maxGramDf")
      }
    }
    // the generator must actually exercise the operator: across all
    // iterations some corpora flag documents (vacuous green is a
    // generator bug, not a pass)
    assert(flaggedTotal > 0)
  }
}
