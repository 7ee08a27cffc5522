package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** From-scratch JVM recomputation of `q_doc_bpe_train`: an independent
  * BPE reference that counts adjacent pairs over symbol VECTORS (not the
  * query's paren-string encoding) and applies merges with an explicit
  * left-to-right non-overlapping scan (not string replace) — so a bug in
  * the paren encoding, the regex symbol extraction, or the replace
  * semantics cannot drift in lockstep with the query. The fixture forces
  * the interesting paths: case folding, a word whose merges NEST (rank-k
  * merge consuming a rank-j product), overlapping pair counting
  * ("aaaa" counts (a,a) three times per occurrence), the paren-word
  * exclusion, single-char and NULL-text exclusion, and a non-ASCII pair. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private val docs: Seq[(Long, String)] = Seq(
    (1L, "The cat cat sat"),
    (2L, "aaaa aaaa aaaa"),
    (3L, "(x)y paren paren"),
    (4L, null),
    (5L, "z aé aé aé"),
    (6L, "cat catapult sat"))

  private lazy val dir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_bpe_fx")
    docs.map { case (id, t) =>
      (id, t, "en", "fixture", Option(t).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** The query's tokenizer + training filter: lowercase, space-only trim,
    * \s+ split keeping empties, drop <2-char and paren-bearing words. */
  private def trainWords: Map[String, Long] = docs
    .collect { case (_, t) if t != null => t }
    .flatMap(t => t.toLowerCase.replaceAll("^ +| +$", "")
      .split("\\s+", -1).toSeq)
    .filter(w => w.length >= 2 && !w.exists(c => c == '(' || c == ')'))
    .groupBy(identity).view.mapValues(_.size.toLong).toMap

  /** Independent BPE: symbol vectors, overlapping pair counts, explicit
    * left-to-right non-overlapping merge scan. */
  private def refBpe(words: Map[String, Long],
                     j: Int): Seq[(Int, String, String, Long)] = {
    var segs: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var i = 1
    var exhausted = false
    while (i <= j && !exhausted) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      segs.foreach { case (s, c) =>
        s.iterator.zip(s.iterator.drop(1)).foreach(p => counts(p) += c)
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((i, l, r, c))
        def merge(s: Vector[String]): Vector[String] = {
          val b = Vector.newBuilder[String]
          var k = 0
          while (k < s.length) {
            if (k + 1 < s.length && s(k) == l && s(k + 1) == r) {
              b += (l + r); k += 2
            } else { b += s(k); k += 1 }
          }
          b.result()
        }
        segs = segs.map { case (s, c) => merge(s) -> c }
        i += 1
      }
    }
    out.toSeq
  }

  test("learned merges match the independent reference, nesting and all") {
    val expect = refBpe(trainWords, 12)
    val got = SparkEntry.queries("q_doc_bpe_train")(spark, dir.toString)
      .collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got === expect)

    // the pins must bite: contiguous ranks from 1; at least one NESTED
    // merge (an operand that is itself a merge product, length > 1);
    // "aa" learned from the overlap-counted (a,a) mass and then "aaaa"
    // via nesting; no learned symbol ever contains a paren or the
    // excluded single-char word; the unicode pair surfaces intact
    assert(got.map(_._1) === (1 to got.size))
    assert(got.exists(m => m._2.length > 1 || m._3.length > 1))
    assert(got.exists(m => m._2 == "a" && m._3 == "a"))
    assert(got.exists(m => m._2 == "aa" && m._3 == "aa"))
    assert(got.forall(m => !m._2.contains("(") && !m._3.contains(")")))
    assert(got.forall(m => m._2 + m._3 != "z"))
    assert(got.exists(m => (m._2 + m._3) == "aé"))
  }

  test("application matches per-word reference segmentation end to end") {
    val merges = refBpe(trainWords, 12)
    def applyMerges(w: String): Long =
      if (w.exists(c => c == '(' || c == ')')) w.length.toLong
      else merges.foldLeft(w.map(_.toString).toVector) {
        case (s, (_, l, r, _)) =>
          val b = Vector.newBuilder[String]
          var k = 0
          while (k < s.length) {
            if (k + 1 < s.length && s(k) == l && s(k + 1) == r) {
              b += (l + r); k += 2
            } else { b += s(k); k += 1 }
          }
          b.result()
      }.length.toLong
    def toks(t: String): Seq[String] =
      t.toLowerCase.replaceAll("^ +| +$", "").split("\\s+", -1).toSeq
    val expect: Seq[(Long, Long, Long, Option[Double])] =
      docs.map { case (id, t) =>
        if (t == null) (id, 0L, 0L, None)
        else {
          val ws = toks(t)
          val bpe = ws.map(applyMerges).sum
          (id, ws.size.toLong, bpe,
            Some(math.floor(bpe.toDouble / ws.size * 10000 + 0.5) / 10000))
        }
      }.sortBy(_._1)
    val got = SparkEntry.queries("q_doc_bpe_apply")(spark, dir.toString)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got === expect)
    // the pins must bite: compression < 1 nowhere (BPE can only merge,
    // never split, so bpe_tokens <= char count but >= 1 per non-empty
    // word — and ws_tokens <= bpe_tokens whenever no word fully merges
    // to one symbol is NOT guaranteed, so pin the exact interesting
    // cases instead): the all-"aaaa" doc fully merges (4 chars -> 1
    // symbol per word -> compression 1.0), and the paren word costs its
    // char count
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(2L)._4.contains(1.0))
    assert(byId(3L)._2 === 3L)
    val parenChars = "(x)y".length
    assert(byId(3L)._3 === parenChars + 2L * applyMerges("paren"))
  }
}
