package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** Randomized witness for edit-distance near-dup on corpora the synthetic
  * testdata cannot provide: BMP-unicode text (accents, CJK — the 100 TB
  * design point is not ASCII), verbatim + case/whitespace-variant
  * duplicate groups, and single-character mutations placed specifically
  * AFTER the 16-char blocking prefix (so they stay in the block and must
  * be flagged when <= 10% of codepoints) and occasionally INSIDE it (so
  * the pair must NOT appear — blocking semantics are part of the
  * contract). The production query must equal an independent uncollapsed
  * brute-force reference: group identical (lang, norm), distance-0
  * within-group pairs at every length, codepoint levenshtein over
  * same-(lang, prefix16) representative pairs fanned out to members.
  * BMP-only vocabulary keeps String code units == codepoints, so the
  * reference's take(16)/length match SQL substring/length exactly.
  * Fixed seed: failures replay. */
class EditDistPropSpec extends SparkTestBase {
  import spark.implicits._

  private def write(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("editdist_prop").toString
    rows.map { case (id, text, lang) =>
      (id, text, lang, s"src$id", Option(text).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): Set[(Long, Long, Int, Int)] =
    DedupQueries.queries("q_dedup_editdist")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("edit_distance"), r.getAs[Int]("max_len"))).toSet

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def reference(
      rows: Seq[(Long, String, String)]): Set[(Long, Long, Int, Int)] = {
    val docs = rows.collect { case (id, t, lang) if t != null =>
      (id, lang, t.toLowerCase.replaceAll("^ +| +$", "")
        .replaceAll("\\s+", " "))
    }
    val groups = docs.groupBy(d => (d._2, d._3)).values.toSeq
    val within = groups.filter(_.size > 1).flatMap { g =>
      for { a <- g; b <- g if a._1 < b._1 }
        yield (a._1, b._1, 0, g.head._3.length)
    }
    val reps = groups.map(g => (g.map(_._1).min, g.head._2, g.head._3))
    val repPairs = reps.groupBy(r => (r._2, r._3.take(16))).values.toSeq
      .flatMap { block =>
        for { a <- block; b <- block if a._1 < b._1 } yield {
          val ml = math.max(a._3.length, b._3.length)
          (a._1, b._1, lev(a._3, b._3), ml)
        }
      }
      .filter { case (_, _, d, ml) => d <= ml / 10.0 }
    val members = groups.flatMap(g =>
      g.map(m => g.map(_._1).min -> m._1)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val cross = repPairs.flatMap { case (ra, rb, d, ml) =>
      for { ma <- members(ra); mb <- members(rb) }
        yield (math.min(ma, mb), math.max(ma, mb), d, ml)
    }
    (within ++ cross).toSet
  }

  test("seeded random BMP-unicode corpora with in-block and in-prefix " +
      "mutations match the uncollapsed blocked-levenshtein reference") {
    val rnd = new scala.util.Random(16081320L)
    val vocab = Vector("café", "über", "naïve", "日本語", "データ", "mañana",
      "œuvre", "règle", "straße", "word", "token", "текст")
    var flagged = 0
    for (iter <- 1 to 6) {
      def sentence(n: Int): String =
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val base = (0 until (4 + rnd.nextInt(8))).map(i =>
        i.toLong -> sentence(8 + rnd.nextInt(18)))
      var nextId = base.size.toLong
      val extras = base.flatMap { case (_, text) =>
        (1 to rnd.nextInt(3)).map { _ =>
          nextId += 1
          nextId -> (rnd.nextInt(4) match {
            case 0 => text // verbatim duplicate
            case 1 => " " + text.toUpperCase + " " // folds to the same norm
            case _ => // 1-char substitution: ~half beyond the 16-char
              // prefix (stays blocked, near-dup when <=10% of chars),
              // ~half inside it (leaves the block, must NOT pair)
              val norm = text.toLowerCase
              val pos =
                if (rnd.nextBoolean() && norm.length > 20)
                  17 + rnd.nextInt(norm.length - 17)
                else rnd.nextInt(math.min(16, norm.length))
              norm.updated(pos, if (norm(pos) == 'z') 'q' else 'z')
          })
        }
      }
      val corpus = rnd.shuffle(base ++ extras)
        .zipWithIndex.map { case ((_, t), i) =>
          (i.toLong, t, if (rnd.nextInt(8) == 0) "de" else "en") }
      val got = run(write(corpus))
      val want = reference(corpus)
      assert(got === want, s"iter=$iter corpus=${corpus.take(25)}")
      flagged += got.size
    }
    assert(flagged > 0) // the generator must actually produce pairs
  }
}
