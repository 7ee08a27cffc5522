package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** Pins q_dedup_substring's exact semantics: a document is flagged iff it
  * shares a verbatim run of >= 15 consecutive normalized tokens with an
  * earlier document, blamed on the earlier doc with the longest run
  * (ties -> smallest id). The hard DuckDB oracle checks the corpus
  * answer; this spec checks the SEMANTICS on crafted threshold/interrupt
  * cases the corpus cannot guarantee to contain, plus a from-scratch JVM
  * recomputation on real data as a third witness.
  */
class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(dir: String) =
    DedupQueries.queries("q_dedup_substring")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_of"), r.getAs[Long]("run_tokens"))).toMap

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("substring_fixture").toString
    rows.map { case (id, text) => (id, text, "en", s"src$id", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(r: Range, tag: String = "w"): String =
    r.map(i => s"$tag$i").mkString(" ")

  test("fires at exactly 15 shared tokens and not at 14") {
    // doc 0: w1..w40. doc 1 embeds w1..w15 (15 tokens) in foreign text;
    // doc 2 embeds w1..w14 (14 tokens) the same way.
    val dir = writeDocs(Seq(
      0L -> words(1 to 40),
      1L -> s"${words(1 to 10, "x")} ${words(1 to 15)} ${words(11 to 20, "x")}",
      2L -> s"${words(1 to 10, "y")} ${words(1 to 14)} ${words(11 to 20, "y")}"))
    val got = run(dir)
    assert(got(1L) === (0L, 15L))
    assert(!got.contains(2L))
  }

  test("an interrupted run splits: two 14-token halves do not fire") {
    // doc 1 copies w1..w29 of doc 0 but swaps the middle token w15:
    // the longest verbatim runs are w1..w14 and w16..w29, both 14 < 15
    val dir = writeDocs(Seq(
      0L -> words(1 to 40),
      1L -> (words(1 to 14) + " CHANGED " + words(16 to 29))))
    assert(run(dir).isEmpty)
  }

  test("identical docs share their full token length; normalization " +
      "ignores case and whitespace") {
    val dir = writeDocs(Seq(
      0L -> words(1 to 30),
      1L -> ("  " + words(1 to 30).toUpperCase.replace(" ", "   ") + " ")))
    assert(run(dir)(1L) === (0L, 30L))
  }

  test("blame picks the longest run, then the smallest earlier id") {
    // doc 2 shares 20 tokens with doc 0 and 25 with doc 1 -> blame 1;
    // doc 5 shares the same 16 tokens with docs 3 and 4 -> blame 3
    val dir = writeDocs(Seq(
      0L -> (words(1 to 20) + " " + words(1 to 10, "a")),
      1L -> (words(31 to 55) + " " + words(1 to 10, "b")),
      2L -> (words(1 to 20) + " " + words(1 to 5, "c") + " " + words(31 to 55)),
      3L -> (words(1 to 16, "p") + " " + words(1 to 10, "q")),
      4L -> (words(1 to 16, "p") + " " + words(1 to 10, "r")),
      5L -> (words(1 to 16, "p") + " " + words(1 to 10, "s"))))
    val got = run(dir)
    assert(got(2L) === (1L, 25L))
    assert(got(5L) === (3L, 16L))
    // 4 also shares p1..p16 with 3 (plus nothing longer)
    assert(got(4L) === (3L, 16L))
    // 1 shares nothing >= 15 with 0 (disjoint vocab)
    assert(!got.contains(1L) && !got.contains(0L))
  }

  test("shingles above the df cap are boilerplate and never pair") {
    // five docs share one 20-token run; with maxGramDf = 3 every shingle
    // of the run lives in 5 > 3 docs -> dropped, nothing flagged. At the
    // default cap (100) the same corpus flags docs 1..4 against doc 0.
    val shared = words(1 to 20, "boiler")
    val dir = writeDocs((0L to 4L).map(i =>
      i -> s"${words(1 to 6, s"u$i")} $shared ${words(1 to 6, s"v$i")}"))
    spark.conf.set("spark.graft.dedup.maxGramDf", "3")
    try assert(run(dir).isEmpty)
    finally spark.conf.unset("spark.graft.dedup.maxGramDf")
    val got = run(dir)
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_ === (0L, 20L)))
  }

  test("verbatim copies collapse: members inherit cross flags and " +
      "within-group pairs carry the full-text run") {
    // group {0, 3, 4}: verbatim copies (4 only differs by case, which
    // normalization folds); doc 1 shares w1..w18 with the group; doc 2
    // is unrelated. Uncollapsed truth the collapsed pipeline must
    // reproduce: 3 and 4 flagged against 0 with the full 24-token run,
    // 1 flagged against 0 with the 18-token embedded run.
    val base = words(1 to 18) + " " + words(1 to 6, "z") // 24 tokens
    val dir = writeDocs(Seq(
      0L -> base,
      1L -> (words(1 to 10, "m") + " " + words(1 to 18)),
      2L -> words(1 to 30, "q"),
      3L -> base,
      4L -> base.toUpperCase))
    val got = run(dir)
    assert(got(3L) === (0L, 24L))
    assert(got(4L) === (0L, 24L))
    assert(got(1L) === (0L, 18L))
    assert(!got.contains(2L) && !got.contains(0L))
  }

  test("df counts documents, not representatives: verbatim copies " +
      "still inflate a shingle over the boilerplate cap") {
    // one 20-token run shared by doc 0 (plus verbatim copies 2, 3, 4)
    // and doc 1: every shingle inside the run lives in 5 DISTINCT docs.
    // With maxGramDf = 4 the df filter must drop the run — a collapsed
    // pipeline that counted representatives would see df = 2 and
    // wrongly keep it. (The copies' kept prefix islands are then 5
    // positions -> 9-token runs < 15, so NOTHING fires.) At the default
    // cap the same corpus flags all of 1..4 against 0.
    val shared = words(1 to 20, "b")
    val d0 = words(1 to 5, "h") + " " + shared // 25 tokens
    val dir = writeDocs(Seq(
      0L -> d0,
      1L -> (words(1 to 5, "x") + " " + shared),
      2L -> d0,
      3L -> d0,
      4L -> d0))
    spark.conf.set("spark.graft.dedup.maxGramDf", "4")
    try assert(run(dir).isEmpty)
    finally spark.conf.unset("spark.graft.dedup.maxGramDf")
    val got = run(dir)
    assert(got(1L) === (0L, 20L))
    assert(got(2L) === (0L, 25L))
    assert(got(3L) === (0L, 25L))
    assert(got(4L) === (0L, 25L))
  }

  test("sf0.001 output matches a from-scratch JVM recomputation") {
    val k = 5
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        // mirror the query's toks() EXACTLY: SQL trim strips spaces only
        // (U+0020), then whitespace runs collapse to one space, then a
        // single-space split keeping empties. Java String.trim would also
        // strip tabs/newlines (chars <= U+0020), producing different
        // first tokens and shifted shingle positions on a doc with a
        // leading tab — a spurious failure of the query, which is right.
        id -> Option(t).map(s =>
            s.toLowerCase.replaceAll("^ +| +$", "")
              .replaceAll("\\s+", " ").split(" ", -1).toSeq)
          .getOrElse(Seq.empty) }
      .filter(_._2.size >= k)
    val shingles = docs.flatMap { case (id, t) =>
      t.sliding(k).zipWithIndex.map { case (sh, i) =>
        (id, i + 1, sh.mkString(" ")) } }
    val df = shingles.groupBy(_._3).view
      .mapValues(_.map(_._1).distinct.size).toMap
    val kept = shingles.filter(s => df(s._3) <= 100)
    val byShingle = kept.toSeq.groupBy(_._3)
    val matches = byShingle.values.toSeq.flatMap { occ =>
      for {
        a <- occ; b <- occ if a._1 < b._1
      } yield (a._1, b._1, b._2 - a._2, b._2)
    }
    val runs = matches.groupBy { case (a, b, d, _) => (a, b, d) }.flatMap {
      case ((a, b, _), ms) =>
        val ps = ms.map(_._4).sorted
        // gaps-and-islands: consecutive positions share (p - rank)
        ps.zipWithIndex.groupBy { case (p, i) => p - i }
          .map { case (_, run) => (a, b, run.size) }
    }
    val want = runs.groupBy { case (a, b, _) => (a, b) }.view
      .mapValues(_.map(_._3).max + k - 1).toSeq
      .map { case ((a, b), rt) => (a, b, rt.toLong) }
      .filter(_._3 >= 15)
      .groupBy(_._2).view.mapValues { cands =>
        val best = cands.minBy { case (a, _, rt) => (-rt, a) }
        (best._1, best._3)
      }.toMap
    val got = run(sf0001)
    assert(got === want)
    assert(got.nonEmpty) // the corpus contains real substring dups
  }
}
