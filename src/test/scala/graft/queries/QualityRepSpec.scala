package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Quality-aware survivor selection (q_dedup_quality_rep).
  *
  * The oracle replays the computation; this spec pins the POLICY on a
  * corpus built to exercise it (higher-quality copy wins regardless of
  * id order; exact ties fall back to min-id) and cross-checks the
  * sf0.001 output against a from-scratch JVM recomputation built from
  * the oracle-backed jaccard pair set. */
class QualityRepSpec extends SparkTestBase {

  private def quality(text: String): Long = {
    val toks = text.replaceAll("^ +| +$", "").toLowerCase
      .split("\\s+").toSeq
    val dtr = math.floor(toks.distinct.size.toDouble /
      math.max(toks.size, 1) * 10000 + 0.5).toLong
    dtr * 1000000L + math.min(toks.size.toLong, 999999L)
  }

  test("the cleaner near-dup copy survives even when it has the larger id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qrep")
    try {
      // doc 1 repeats tokens (low distinct ratio); doc 2 is the clean
      // variant; docs 3/4 are exact copies of each other (quality tie).
      // Same lang + length band keeps each pair jaccard-joinable.
      Seq(
        (1L, "w1 w2 w3 w4 w5 w6 w7 w1 w1", "en", "s", 27L),
        (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "en", "s", 27L),
        (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9", "en", "s", 27L),
        (4L, "z1 z2 z3 z4 z5 z6 z7 z8 z9", "en", "s", 27L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q_dedup_quality_rep")(
        spark, dir.toString).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("keep_doc"),
          r.getAs[Long]("n_dups"), r.getAs[Long]("dropped"))).toSeq
      assert(got === Seq(
        (1L, 2L, 1L, 1L), // clean copy wins though its id is larger
        (2L, 2L, 1L, 0L),
        (3L, 3L, 1L, 0L), // exact tie: min-id convention
        (4L, 3L, 1L, 1L)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("sf0.001 output matches a from-scratch JVM recomputation over " +
      "the oracle-backed pair set") {
    val pairs = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val q = graft.Tables.table(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), quality(r.getString(1)))).toMap
    val nbrs = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    val expected = nbrs.toSeq.sortBy(_._1).map { case (d, ns) =>
      val bestNbr = ns.map(n => (n, q(n))).minBy { case (n, qn) => (-qn, n) }
      val selfWins = q(d) > bestNbr._2 ||
        (q(d) == bestNbr._2 && d < bestNbr._1)
      val (keep, keepQ) = if (selfWins) (d, q(d)) else bestNbr
      (d, q(d), keep, keepQ, ns.size.toLong, if (selfWins) 0L else 1L)
    }
    val got = SparkEntry.queries("q_dedup_quality_rep")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("q_doc"),
        r.getAs[Long]("keep_doc"), r.getAs[Long]("keep_q"),
        r.getAs[Long]("n_dups"), r.getAs[Long]("dropped"))).toSeq
    assert(got === expected)
  }

  test("survivorship is locally consistent: keep_q never below own q, " +
      "and survivors keep themselves") {
    val rows = SparkEntry.queries("q_dedup_quality_rep")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("keep_q") >= r.getAs[Long]("q_doc"))
      assert((r.getAs[Long]("dropped") == 0L) ==
        (r.getAs[Long]("keep_doc") == r.getAs[Long]("doc_id")))
    }
  }
}
