package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Quality-aware survivor selection (q_dedup_quality_rep).
  *
  * The oracle replays the computation; this spec pins the POLICY on
  * corpora built to exercise it (higher-quality copy wins regardless of
  * id order; exact ties fall back to min-id; chain components stay
  * CLOSED — every dropped doc's keeper is itself a survivor, the
  * property a one-hop best-neighbor rule fails) and cross-checks the
  * sf0.001 output against a from-scratch union-find + per-component
  * argmax recomputation built from the oracle-backed jaccard pair set. */
class QualityRepSpec extends SparkTestBase {

  private def quality(text: String): Long = {
    val toks = text.replaceAll("^ +| +$", "").toLowerCase
      .split("\\s+").toSeq
    val dtr = math.floor(toks.distinct.size.toDouble /
      math.max(toks.size, 1) * 10000 + 0.5).toLong
    dtr * 1000000L + math.min(toks.size.toLong, 999999L)
  }

  private def runOn(dir: String) =
    SparkEntry.queries("q_dedup_quality_rep")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("q_doc"),
        r.getAs[Long]("keep_doc"), r.getAs[Long]("keep_q"),
        r.getAs[Long]("n_dups"), r.getAs[Long]("dropped"))).toSeq

  private def withFixture(rows: Seq[(Long, String)])(
      body: String => Unit): Unit = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qrep")
    try {
      rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      body(dir.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("the cleaner near-dup copy survives even when it has the larger id") {
    // doc 1 repeats tokens (low distinct ratio); doc 2 is the clean
    // variant; docs 3/4 are exact copies of each other (quality tie).
    withFixture(Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w1 w1"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9"),
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8 z9"))) { dir =>
      val got = runOn(dir).map(r => (r._1, r._3, r._5, r._6))
      assert(got === Seq(
        (1L, 2L, 1L, 1L), // clean copy wins though its id is larger
        (2L, 2L, 1L, 0L),
        (3L, 3L, 1L, 0L), // exact tie: min-id convention
        (4L, 3L, 1L, 1L)))
    }
  }

  test("chain components are CLOSED: the component-best survives and " +
      "every dropped doc keeps a SURVIVOR") {
    // 1~6 and 6~9 are jaccard pairs, 1~9 is not; quality rises along the
    // chain (all-distinct tokens, growing token count). A one-hop rule
    // would have doc 1 keep doc 6 — itself dropped; component closure
    // requires all three to keep doc 9.
    def span(r: Range) = r.map(i => s"t$i").mkString(" ")
    withFixture(Seq(
      (1L, span(1 to 20)), (6L, span(11 to 35)), (9L, span(21 to 50)))) {
      dir =>
        val got = runOn(dir)
        val q = Map(1L -> quality(span(1 to 20)),
          6L -> quality(span(11 to 35)), 9L -> quality(span(21 to 50)))
        assert(got === Seq(
          (1L, q(1L), 9L, q(9L), 2L, 1L),
          (6L, q(6L), 9L, q(9L), 2L, 1L),
          (9L, q(9L), 9L, q(9L), 2L, 0L)))
    }
  }

  test("sf0.001 output matches a from-scratch union-find + component " +
      "argmax over the oracle-backed pair set") {
    val pairs = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val q = graft.Tables.table(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), quality(r.getString(1)))).toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val comps = nodes.groupBy(find)
    val expected = comps.values.toSeq.flatMap { members =>
      val best = members.minBy(d => (-q(d), d))
      val n = members.size.toLong - 1
      members.map(d =>
        (d, q(d), best, q(best), n, if (d == best) 0L else 1L))
    }.sortBy(_._1)
    assert(runOn(sf0001) === expected)
    assert(expected.nonEmpty)
  }

  test("survivorship is globally consistent: keep_q never below own q, " +
      "survivors keep themselves, and every keeper IS a survivor") {
    val rows = runOn(sf0001)
    assert(rows.nonEmpty)
    val survivors = rows.filter(_._6 == 0L).map(_._1).toSet
    rows.foreach { r =>
      assert(r._4 >= r._2)
      assert((r._6 == 0L) == (r._3 == r._1))
      assert(survivors.contains(r._3), s"doc ${r._1} keeps dropped ${r._3}")
    }
  }
}
