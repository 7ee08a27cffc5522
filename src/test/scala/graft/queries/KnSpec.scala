package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Interpolated Kneser–Ney scoring (q_doc_kn_logprob).
  *
  * The oracle replays the arithmetic; this spec recomputes the whole
  * chain from scratch in plain Scala and pins the property KN exists
  * for: continuation probability demotes tokens that are frequent but
  * follow ONE context (the "Francisco" effect) — something no add-α or
  * raw-frequency model can express. */
class KnSpec extends SparkTestBase {

  private def knMeans(rows: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    val toks = rows.map { case (id, t) =>
      (id, t.replaceAll("^ +| +$", "").toLowerCase.split("\\s+").toSeq) }
    val docBg = toks.filter(_._2.size >= 2).map { case (id, ts) =>
      (id, ts.sliding(2).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (bg, o) => (bg, o.size.toLong) }) }
    val cbg = docBg.flatMap(_._2).groupBy(_._1)
      .map { case (bg, o) => (bg, o.map(_._2).sum) }
    val cw1 = cbg.groupBy(_._1.split(" ").head)
      .map { case (w1, m) => (w1, (m.values.sum, m.size.toLong)) }
    val cont = cbg.keys.groupBy(_.split(" ").last)
      .map { case (w2, o) => (w2, o.size.toLong) }
    val b = cbg.size.toLong
    val lp6 = cbg.map { case (bg, c) =>
      val Array(w1, w2) = bg.split(" ")
      val (cu, types1) = cw1(w1)
      val p = ((c - 0.75) / cu) + (((0.75 * types1) / cu) * (cont(w2).toDouble / b))
      (bg, math.floor(math.log(p) * 1e6 + 0.5).toLong)
    }
    docBg.map { case (id, m) =>
      val n = m.values.sum
      val s = m.map { case (bg, c) => c * lp6(bg) }.sum
      (id, (n, math.floor((s / 1e6) / n * 10000 + 0.5) / 10000))
    }.toMap
  }

  test("sf0.001 scores match a from-scratch JVM recomputation") {
    val docs = graft.Tables.table(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = knMeans(docs)
    val got = SparkEntry.queries("q_doc_kn_logprob")(spark, sf0001)
      .collect().filter(_.getAs[Long]("bigram_count") > 0)
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("bigram_count"),
          r.getAs[Double]("mean_kn_logprob")))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("continuation probability demotes single-context tokens " +
      "(the Francisco effect)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kn")
    try {
      // 'francisco' and 'cat' have the same raw counts after 'new'
      // (both bigrams occur once, same context count c(new) = 2), but
      // cat follows FOUR distinct contexts while francisco follows two
      // — so KN must score "new cat" strictly higher than
      // "new francisco", where any add-α model scores them equally.
      val rows = Seq(
        (1L, "san francisco"), (2L, "san francisco"),
        (3L, "san francisco"), (4L, "a cat"), (5L, "b cat"),
        (6L, "c cat"), (7L, "new francisco"), (8L, "new cat"))
      rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q_doc_kn_logprob")(
        spark, dir.toString).collect()
        .map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Double]("mean_kn_logprob"))).toMap
      assert(got(8L) > got(7L),
        s"KN failed to reward the multi-context continuation: $got")
      // and exact agreement with the independent recomputation
      val expected = knMeans(rows)
      assert(got(7L) === expected(7L)._2)
      assert(got(8L) === expected(8L)._2)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
