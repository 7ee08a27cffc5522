package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** From-scratch JVM recomputation of `q_corpus_kl` on a fixture with a
  * corpus-typical source, a heavily-drifted source (disjoint vocabulary),
  * a NULL-text-only source (no token rows — the left-join zero path), and
  * an empty-text doc (the "" token). Pins the Gibbs bound (KL >= 0 up to
  * tick rounding) and the ordering the metric exists for: the drifted
  * source scores strictly above the typical one. */
class KlSpec extends SparkTestBase {
  import spark.implicits._

  private val docs: Seq[(Long, String, String)] = Seq(
    (1L, "the cat sat on the mat", "srcA"),
    (2L, "the dog sat on the log", "srcA"),
    (3L, "the cat and the dog", "srcB"),
    (4L, "zzz1 zzz2 zzz3 zzz1 zzz1", "srcC"),
    (5L, null, "srcD"),
    (6L, "", "srcB"))

  private lazy val dir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_kl_fx")
    docs.map { case (id, t, src) =>
      (id, t, "en", src, Option(t).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def toks(t: String): Seq[String] =
    t.toLowerCase.replaceAll("^ +| +$", "").split("\\s+", -1).toSeq

  test("per-source KL matches an independent recomputation") {
    val bySrc: Map[String, Seq[String]] = docs
      .collect { case (_, t, s) if t != null => (s, toks(t)) }
      .groupBy(_._1).view.mapValues(_.flatMap(_._2)).toMap
    val corpus = bySrc.values.flatten.toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = corpus.values.sum.toDouble
    def snap6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val expect: Seq[(String, Long, Long, Option[Double])] = docs
      .map(_._3).distinct.sorted.map { src =>
      bySrc.get(src) match {
        case None => (src, 0L, 0L, None)
        case Some(ts) =>
          val cs = ts.groupBy(identity).view.mapValues(_.size.toLong).toMap
          val ns = cs.values.sum
          val skl6 = cs.map { case (t, c) =>
            c * (snap6(math.log(c.toDouble / ns)) -
              snap6(math.log(corpus(t) / n)))
          }.sum
          (src, ns, cs.size.toLong,
            Some(math.floor((skl6 / 1e6) / ns * 10000 + 0.5) / 10000))
      }
    }
    val got = SparkEntry.queries("q_corpus_kl")(spark, dir.toString)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got === expect)

    val byS = got.map(g => g._1 -> g).toMap
    // Gibbs up to tick rounding; the disjoint-vocabulary source drifts
    // strictly above the corpus-typical one; the token-less source
    // surfaces with zeros and a NULL metric
    assert(got.forall(_._4.forall(_ >= -0.0001)))
    assert(byS("srcC")._4.get > byS("srcA")._4.get)
    assert(byS("srcD") === (("srcD", 0L, 0L, None)))
  }
}
