package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** From-scratch JVM recomputation of `q_doc_dsir` on a 120-doc generated
  * fixture — larger than DsirTopK (100) so the deterministic top-K
  * SELECTION boundary is actually exercised, not just the scoring
  * arithmetic. The corpus interpolates between a "target-like" token
  * pool and an out-of-target pool across docs, both langs, so scores
  * spread smoothly across the cut line; the recomputation re-derives
  * both add-0.5 unigram LMs, the out-of-target-vocabulary floor, and
  * the (score DESC, doc_id) selection with plain Scala Maps. Degenerate
  * shapes ride along: NULL text (no token rows, never scored), empty
  * text (one "" token — the whitespace tokenizer's documented shape),
  * and a doc whose every token is outside the target vocabulary (pure
  * floor scoring). */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  // ids 1..118 generated; 119 NULL text; 120 all-out-of-target-vocab.
  // Target slice = lang 'en' (even ids); text mixes eng-pool tokens
  // with web-pool tokens at a ratio that varies with the id, so en-like
  // content appears on BOTH sides of the lang split (the DSIR point:
  // select target-LIKE docs from the raw pool regardless of label).
  private val engPool = Seq("the", "cat", "sat", "mat", "house", "tree")
  private val webPool = Seq("zz1", "qq2", "ww3", "kk4", "jj5", "xx6")
  private val docs: Seq[(Long, String, String)] =
    (1L to 118L).map { id =>
      val lang = if (id % 2 == 0) "en" else "de"
      val nTok = 5 + (id % 7).toInt
      val text = (0 until nTok).map { j =>
        val engShare = (id % 11).toInt // 0..10 of 11 — varies per doc
        if ((j + id.toInt) % 11 < engShare) engPool((j + id.toInt) % 6)
        else webPool((2 * j + id.toInt) % 6)
      }.mkString(" ")
      (id, text, lang)
    } ++ Seq((119L, null: String, "en"), (120L, "zzz9 zzz9 yyy8", "de"))

  private lazy val dir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_dsir_fx")
    docs.map { case (id, t, l) =>
      (id, t, l, "fixture", Option(t).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** The query's tokenizer exactly: SQL trim strips SPACES only, split
    * keeps empty fields (the SubstringDedupSpec r9 lesson). */
  private def toks(t: String): Seq[String] =
    t.toLowerCase.replaceAll("^ +| +$", "").split("\\s+", -1).toSeq

  test("scores, floor handling, and the top-K cut match a recomputation") {
    val perDoc: Map[Long, Map[String, Long]] = docs.collect {
      case (id, t, _) if t != null =>
        id -> toks(t).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val langOf = docs.map(d => d._1 -> d._3).toMap
    def lm(counts: Map[String, Long]): (Map[String, Long], Long) = {
      val n = counts.values.sum.toDouble
      val v = counts.size.toDouble
      val lp6 = counts.map { case (w, c) =>
        w -> math.floor(math.log((c + 0.5) / (n + 0.5 * v)) * 1e6 + 0.5)
          .toLong
      }
      val floor6 =
        math.floor(math.log(0.5 / (n + 0.5 * v)) * 1e6 + 0.5).toLong
      (lp6, floor6)
    }
    def corpusCounts(ids: Iterable[Long]): Map[String, Long] =
      // .toSeq first: ids arrives as a key SET, and flatMap/flatten on a
      // Set would deduplicate identical (token, count) pairs ACROSS docs,
      // silently undercounting the corpus
      ids.toSeq.flatMap(perDoc.get).flatten
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val (rlm, _) = lm(corpusCounts(perDoc.keys))
    val (tlm, tfloor) =
      lm(corpusCounts(perDoc.keys.filter(langOf(_) == "en")))

    val scored: Seq[(Long, String, Long, Double)] = perDoc.toSeq.map {
      case (id, cs) =>
        val tc = cs.values.sum
        val sr6 = cs.map { case (w, c) =>
          c * (tlm.getOrElse(w, tfloor) - rlm(w))
        }.sum
        (id, langOf(id), tc, (sr6.toDouble / 1e6) / tc)
    }
    val expect = scored
      .sortBy { case (id, _, _, sc) => (-sc, id) }
      .take(100)
      .sortBy(_._1)
      .map { case (id, l, tc, sc) =>
        (id, l, tc, math.floor(sc * 10000 + 0.5) / 10000)
      }

    val got = SparkEntry.queries("q_doc_dsir")(spark, dir.toString)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got === expect)

    // the pins must bite: the cut really dropped docs (119 scoreable
    // docs -> 100 kept), the NULL-text doc is never a candidate, the
    // pure-floor doc scores strictly below every pure-target-pool doc,
    // and non-'en' docs appear among the kept (selection is by content
    // likeness, not by the label that defined the target slice)
    assert(got.size === 100 && scored.size === 119)
    assert(!got.exists(_._1 == 119L))
    assert(got.exists(_._2 != "en"))
    val gotIds = got.map(_._1).toSet
    val dropped = scored.filterNot(s => gotIds(s._1))
    assert(dropped.size === 19)
    // every kept score >= every dropped score (with the doc_id tiebreak
    // only ever cutting WITHIN an equal-score band)
    val minKept = got.map(g => scored.find(_._1 == g._1).get._4).min
    assert(dropped.forall(_._4 <= minKept))
  }
}
