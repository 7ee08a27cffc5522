package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** Randomized equivalence witness for the containment pipeline's
  * collapse + uncollapsed-df bookkeeping — the structural template the
  * substring query inherited (SubstringDedupPropSpec is its sibling).
  * Seeded random corpora with verbatim duplicate groups, case/whitespace
  * variants, tiny vocabularies, and sub-3-token documents (the
  * whole-text-gram fallback) run through the production query at an
  * engaged df cap and the default, and must equal an independent
  * uncollapsed brute-force reference mirroring the DuckDB oracle:
  * distinct 3-gram sets per document, df counted over DOCUMENTS,
  * containment = roundHalfUp(common / min(|a|, |b|), 4) >= 0.5 over
  * every same-lang pair sharing a surviving gram. */
class ContainmentPropSpec extends SparkTestBase {
  import spark.implicits._

  private def write(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("containment_prop").toString
    rows.map { case (id, text) =>
      (id, text, "en", s"src$id", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): Map[(Long, Long), Double] =
    DedupQueries.queries("q_dedup_containment")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("containment")).toMap

  private def roundHalfUp4(x: Double): Double =
    math.floor(x * 10000 + 0.5) / 10000

  /** Uncollapsed reference: every non-empty-after-trim doc, its DISTINCT
    * 3-gram set (whole normalized text as the one gram under 3 tokens),
    * df over distinct docs, all-pairs containment on df-surviving grams. */
  private def reference(rows: Seq[(Long, String)],
      dfCap: Int): Map[(Long, Long), Double] = {
    val docs = rows
      .filter { case (_, t) => t.replaceAll("^ +| +$", "").nonEmpty }
      .map { case (id, t) =>
        val toks = t.toLowerCase.replaceAll("^ +| +$", "")
          .replaceAll("\\s+", " ").split(" ", -1).toSeq
        val grams =
          (if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toVector
           else Vector(toks.mkString(" "))).distinct
        id -> grams
      }
    val df = docs.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val kept = docs.map { case (id, gs) =>
      id -> gs.filter(g => df(g) <= dfCap).toSet }
    (for {
      (a, ga) <- kept; (b, gb) <- kept
      if a < b && ga.nonEmpty && gb.nonEmpty
      common = (ga & gb).size
      if common > 0
      c = roundHalfUp4(common.toDouble / math.min(ga.size, gb.size))
      if c >= 0.5
    } yield (a, b) -> c).toMap
  }

  test("seeded random duplicate-heavy corpora match the uncollapsed " +
      "all-pairs reference, with and without the df cap engaged") {
    val rnd = new scala.util.Random(8131202L)
    var pairsTotal = 0
    for (iter <- 1 to 8) {
      val vocab = (1 to (5 + rnd.nextInt(8))).map(i => s"w$i")
      def sentence(n: Int): String =
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val base = (0 until (4 + rnd.nextInt(10))).map { i =>
        val body = rnd.nextInt(5) match {
          case 0 => sentence(1 + rnd.nextInt(2)) // sub-3: whole-text gram
          case 1 => // near-superset pair fodder: shared prefix + tail
            sentence(6 + rnd.nextInt(6)) + " " + sentence(rnd.nextInt(4))
          case _ => sentence(5 + rnd.nextInt(15))
        }
        i.toLong -> body
      }
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
      for (cap <- Seq(2 + rnd.nextInt(4), 100)) {
        spark.conf.set("spark.graft.dedup.maxGramDf", cap.toString)
        try {
          val got = run(dir)
          val want = reference(corpus, cap)
          assert(got === want,
            s"iter=$iter cap=$cap corpus=${corpus.take(30)}")
          pairsTotal += got.size
        } finally spark.conf.unset("spark.graft.dedup.maxGramDf")
      }
    }
    assert(pairsTotal > 0) // the generator must actually emit pairs
  }
}
