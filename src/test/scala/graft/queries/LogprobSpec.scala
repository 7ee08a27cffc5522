package graft.queries

import org.scalatest.BeforeAndAfterAll

import graft.{SparkEntry, SparkTestBase}

/** From-scratch JVM recomputation of `q_doc_unigram_logprob` on a fixture
  * that hits every tokenizer and smoothing edge: repeated tokens within a
  * doc, a corpus-hot token ("the"), a singleton rare token, NULL text,
  * empty text (one "" token — the whitespace tokenizer's documented
  * shape), and mixed case/padding. The recomputation mirrors the query's
  * normalization EXACTLY — SQL trim strips spaces only, split keeps
  * leading/trailing empties (the SubstringDedupSpec r9 lesson) — and
  * re-derives the add-0.5 unigram LM with plain Scala Maps, so a drift in
  * either the tokenization or the smoothing arithmetic fails here even
  * though the DuckDB oracle (being a replay of the same SQL shapes) might
  * drift in lockstep. */
class LogprobSpec extends SparkTestBase with BeforeAndAfterAll {
  import spark.implicits._

  /** Split buckets ((id % 1000003) * 31 + 7) % 100: ids 1-5 land at
    * 38/69/0/31/62 (train side of the backoff query's 90/10 split);
    * ids 6/90/93 land at 93/97/90 (test side). Docs 90/93 exist to
    * exercise every backoff path: seen bigram, unseen bigram with seen
    * w2 (backoff + unigram), unseen bigram with unseen w2 (backoff +
    * floor). */
  private val docs: Seq[(Long, String)] = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the the the"),
    (3L, "zzzqqq"),
    (4L, null),
    (5L, ""),
    (6L, "  The CAT  "),
    (90L, "the cat mat zzunseen"),
    (93L, "sat on the"))

  private lazy val dir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_logprob_fx")
    docs.map { case (id, t) =>
      (id, t, "en", "fixture", Option(t).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** Spark's `split(trim(lower(text)), "\s+")`: SQL trim strips SPACES
    * only; Spark's split keeps empty leading/trailing fields (Java split
    * with limit -1). */
  private def toks(t: String): Seq[String] =
    t.toLowerCase.replaceAll("^ +| +$", "").split("\\s+", -1).toSeq

  private def round4(x: Double): Double =
    math.floor(x * 10000 + 0.5) / 10000

  test("the query matches an independent Scala recomputation") {
    val perDoc: Map[Long, Map[String, Long]] = docs.collect {
      case (id, t) if t != null =>
        id -> toks(t).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val corpus: Map[String, Long] =
      perDoc.values.flatten.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toMap
    val n = corpus.values.sum.toDouble
    val v = corpus.size.toDouble
    // the query's snap device: log-probs become 1e-6-tick longs BEFORE
    // the weighted sum, so the aggregate is exact integer arithmetic
    def lp6(w: String): Long =
      math.floor(math.log((corpus(w) + 0.5) / (n + 0.5 * v)) * 1e6 + 0.5)
        .toLong
    val expect: Seq[(Long, Long, Option[Double])] = docs.map { case (id, t) =>
      perDoc.get(id) match {
        case None => (id, 0L, None)
        case Some(cs) =>
          val tc = cs.values.sum
          val slp6 = cs.map { case (w, c) => c * lp6(w) }.sum
          (id, tc, Some(round4((slp6 / 1e6) / tc)))
      }
    }.sortBy(_._1)

    val got = SparkEntry.queries("q_doc_unigram_logprob")(spark, dir.toString)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got === expect)
    // spot-pin the shape: the singleton-rare-token doc scores strictly
    // below the all-stopword doc (the CCNet tail-drop signal), and "" IS
    // a counted token for the empty-text doc
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(3L)._3.get < byId(2L)._3.get)
    assert(byId(5L)._2 === 1L)
    assert(byId(4L)._2 === 0L && byId(4L)._3.isEmpty)
  }

  test("the bigram query matches an independent Scala recomputation") {
    // conditional p(w2|w1) with the context count as the smoothing N and
    // the corpus UNIGRAM vocabulary as V; docs with < 2 tokens (the
    // null-text doc, the empty-text doc whose single token is "", the
    // single-token doc) surface as bigram_count 0 / NULL score
    val perDoc: Map[Long, Seq[(String, String)]] = docs.collect {
      case (id, t) if t != null && toks(t).length >= 2 =>
        id -> toks(t).sliding(2).map(p => (p(0), p(1))).toSeq
    }.toMap
    val cbg: Map[(String, String), Long] =
      perDoc.values.flatten.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
    val cw1: Map[String, Long] =
      cbg.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = docs.collect { case (_, t) if t != null => toks(t) }
      .flatten.distinct.size.toDouble
    def lp6(b: (String, String)): Long =
      math.floor(math.log((cbg(b) + 0.5) / (cw1(b._1) + 0.5 * v)) * 1e6
        + 0.5).toLong
    val expect: Seq[(Long, Long, Option[Double])] = docs.map { case (id, t) =>
      perDoc.get(id) match {
        case None => (id, 0L, None)
        case Some(bs) =>
          val slp6 = bs.map(lp6).sum
          (id, bs.size.toLong, Some(round4((slp6 / 1e6) / bs.size)))
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_doc_bigram_logprob")(spark, dir.toString)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got === expect)
    // the pins must bite: word ORDER matters — "the cat" (doc 1/6) and
    // "the the" (doc 2) are distinct bigram contexts under the same
    // unigram multiset, and the <2-token shapes all emit no score
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(2L)._2 === 2L)           // "the the the" -> 2 bigrams
    assert(byId(3L)._2 === 0L && byId(3L)._3.isEmpty) // single token
    assert(byId(4L)._2 === 0L)           // null text
    assert(byId(5L)._2 === 0L)           // "" -> one "" token, no bigram
  }

  test("the held-out backoff query matches an independent Scala " +
      "recomputation on every backoff path") {
    def bucket(id: Long): Long = ((id % 1000003L) * 31 + 7) % 100
    val train = docs.filter { case (id, t) => bucket(id) < 90 && t != null }
    val test = docs.filter { case (id, _) => bucket(id) >= 90 }
    // train-side LMs, plain Scala
    val uniC: Map[String, Long] = train.flatMap(d => toks(d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = uniC.values.sum.toDouble
    val v = uniC.size.toDouble
    val bgC: Map[(String, String), Long] = train.map(_._2).filter(t =>
        toks(t).length >= 2)
      .flatMap(t => toks(t).sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cw1: Map[String, Long] =
      bgC.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def snap(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val backoff6 = snap(math.log(0.4))
    val floor6 = snap(math.log(0.5 / (n + 0.5 * v)))
    def lp6(b: (String, String)): Long = bgC.get(b) match {
      case Some(c) => snap(math.log((c + 0.5) / (cw1(b._1) + 0.5 * v)))
      case None => backoff6 + (uniC.get(b._2) match {
        case Some(cu) => snap(math.log((cu + 0.5) / (n + 0.5 * v)))
        case None => floor6
      })
    }
    val expect = test.map { case (id, t) =>
      val bs = Option(t).map(toks).filter(_.length >= 2)
        .map(_.sliding(2).map(p => (p(0), p(1))).toSeq).getOrElse(Nil)
      if (bs.isEmpty) (id, 0L, None)
      else {
        val slp6 = bs.map(lp6).sum
        (id, bs.size.toLong, Some(round4((slp6 / 1e6) / bs.size)))
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_doc_backoff_logprob")(spark, dir.toString)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got === expect)
    // the pins must bite: only test-split docs appear, and the three
    // backoff paths are all exercised by the fixture (doc 6 pure-seen,
    // doc 90 mixes unseen-bigram/seen-w2 AND unseen-w2, doc 93 seen)
    assert(got.map(_._1).toSet === Set(6L, 90L, 93L))
    assert(bgC.contains(("the", "cat")) && !bgC.contains(("cat", "mat")))
    assert(uniC.contains("mat") && !uniC.contains("zzunseen"))
  }

  override def afterAll(): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(dir)) {
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    super.afterAll()
  }
}
