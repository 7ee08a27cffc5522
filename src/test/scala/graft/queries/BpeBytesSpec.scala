package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** From-scratch JVM recomputation of the BYTE-level BPE family: an
  * independent reference that pretokenizes with `java.util.regex`
  * (Spark's engine, applied directly — so a Spark-side regex plumbing
  * bug can't hide), converts pretokens to UTF-8 byte VECTORS, counts
  * adjacent pairs and applies merges with an explicit left-to-right
  * non-overlapping scan — none of the query's hex-string/paren-replace
  * machinery, so encoding bugs cannot drift in lockstep.
  *
  * The fixture forces the byte-level contract the char-level family
  * cannot express: a NO-WHITESPACE CJK doc (every char 3 UTF-8 bytes,
  * one pretoken, merges inside it), case preservation (The ≠ the),
  * contraction splitting, paren-bearing pretokens that TRAIN AND APPLY
  * (the char family excludes them — here no-OOV is the contract),
  * multi-byte accents, null/empty texts, and multi-space runs.
  *
  * Separately, the PRETOKENIZER ENGINE-AGREEMENT pin: the same seven
  * fixture strings were split with DuckDB's RE2 `regexp_extract_all`
  * (leftmost-first alternation), and the expected lists below are
  * those verbatim — the Java splits must equal them, or the two
  * engines have diverged and every byte-BPE oracle is at risk. */
class BpeBytesSpec extends SparkTestBase {
  import spark.implicits._

  private val docs: Seq[(Long, String)] = Seq(
    (1L, "it's a test of the byte pair encoder, the test of tests"),
    (2L, "The test THE test the"),
    (3L, "日本語のテキストは空白なしで続く日本語テキスト"),
    (4L, null),
    (5L, "naïve café déjà vu naïve café"),
    (6L, ""),
    (7L, "don't we'll I'm (parens) [brackets] 12345 42"),
    (8L, "a  b\tc"))

  private lazy val dir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_bpebytes_fx")
    docs.map { case (id, t) =>
      (id, t, "en", "fixture", Option(t).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def pretok(t: String): Seq[String] = {
    val m = java.util.regex.Pattern
      .compile(TextQueries.BpeBytesPretokRegex).matcher(t)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  private def hexSyms(pt: String): Vector[String] =
    pt.getBytes("UTF-8").toVector.map(b => f"${b & 0xFF}%02X")

  /** Independent byte-BPE: byte vectors, overlapping pair counts,
    * explicit left-to-right non-overlapping merge scan. */
  private def refMerges(j: Int): Seq[(Int, String, String, Long)] = {
    val wcnt = docs.collect { case (_, t) if t != null => t }
      .flatMap(pretok)
      .filter(_.getBytes("UTF-8").length >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var segs: Map[Vector[String], Long] =
      wcnt.groupBy { case (w, _) => hexSyms(w) }
        .view.mapValues(_.values.sum).toMap
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
        segs = segs.groupBy { case (s, _) => mergeScan(s, l, r) }
          .view.mapValues(_.values.sum).toMap
        i += 1
      }
    }
    out.toSeq
  }

  private def mergeScan(s: Vector[String], l: String, r: String)
      : Vector[String] = {
    val b = Vector.newBuilder[String]
    var k = 0
    while (k < s.length) {
      if (k + 1 < s.length && s(k) == l && s(k + 1) == r) {
        b += (l + r); k += 2
      } else { b += s(k); k += 1 }
    }
    b.result()
  }

  test("pretokenizer engine agreement: Java splits equal the pinned " +
      "DuckDB RE2 splits verbatim") {
    val pinned: Seq[(String, Seq[String])] = Seq(
      "it's a test" -> Seq("it", "'s", " a", " test"),
      "Hello, World! 42" -> Seq("Hello", ",", " World", "!", " 42"),
      "日本語のテキスト" -> Seq("日本語のテキスト"),
      "naïve café" -> Seq("naïve", " café"),
      "a  b\tc" -> Seq("a", "  ", "b", "\t", "c"),
      "don't we'll I'm" -> Seq("don", "'t", " we", "'ll", " I", "'m"),
      "x(y)z" -> Seq("x", "(", "y", ")", "z"))
    pinned.foreach { case (t, expect) =>
      assert(pretok(t) === expect, s"on <$t>")
    }
  }

  test("learned byte merges match the independent reference") {
    val expect = refMerges(12)
    val got = SparkEntry.queries("q_doc_bpe_bytes_train")(
        spark, dir.toString)
      .collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got === expect)
    // the pins must bite: contiguous ranks; at least one NESTED merge
    // (a multi-byte operand, hex length > 2); at least one merge whose
    // operands are CJK continuation bytes (the no-whitespace doc's
    // interior — unreachable for the char-level trainer); every symbol
    // is pure hex (the encoding never leaks raw text)
    assert(got.map(_._1) === (1 to got.size))
    assert(got.exists(m => m._2.length > 2 || m._3.length > 2))
    val cjkBytes = "日本語のテキスト".getBytes("UTF-8")
      .map(b => f"${b & 0xFF}%02X").toSet
    assert(got.exists(m => cjkBytes.contains(m._2.take(2)) &&
      (m._2 + m._3).forall("0123456789ABCDEF".contains(_))))
    assert(got.forall(m =>
      (m._2 + m._3).forall("0123456789ABCDEF".contains(_))))
  }

  test("application matches per-pretoken reference segmentation, " +
      "no-OOV contract included") {
    val merges = refMerges(12)
    def ntok(pt: String): Long =
      merges.foldLeft(hexSyms(pt)) { case (s, (_, l, r, _)) =>
        mergeScan(s, l, r)
      }.length.toLong
    val expect: Seq[(Long, Long, Long, Long, Option[Double])] =
      docs.map { case (id, t) =>
        val pts = if (t == null) Seq.empty else pretok(t)
        if (pts.isEmpty) (id, 0L, 0L, 0L, None)
        else {
          val bytes = pts.map(_.getBytes("UTF-8").length.toLong).sum
          val bpe = pts.map(ntok).sum
          (id, pts.size.toLong, bytes, bpe,
            Some(math.floor(bytes.toDouble / bpe * 10000 + 0.5) / 10000))
        }
      }.sortBy(_._1)
    val got = SparkEntry.queries("q_doc_bpe_bytes_apply")(
        spark, dir.toString)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(got === expect)
    val byId = got.map(g => g._1 -> g).toMap
    // null and empty texts: zero rows with null compression
    assert(byId(4L) === ((4L, 0L, 0L, 0L, None)))
    assert(byId(6L) === ((6L, 0L, 0L, 0L, None)))
    // the CJK doc is ONE pretoken of 3 bytes per char, and it
    // compresses (merges fired inside it): bpe_tokens < bytes
    assert(byId(3L)._2 === 1L)
    assert(byId(3L)._3 === 3L * docs(2)._2.length)
    assert(byId(3L)._4 < byId(3L)._3)
    // no-OOV: the paren/bracket doc is fully accounted — bytes exactly,
    // bpe_tokens positive and <= bytes (parens TRAIN here, unlike the
    // char-level family's exclusion)
    assert(byId(7L)._3 ===
      pretok(docs(6)._2).map(_.getBytes("UTF-8").length.toLong).sum)
    assert(byId(7L)._4 > 0L && byId(7L)._4 <= byId(7L)._3)
    // case preservation: "The"/"THE"/"the" are distinct pretokens —
    // doc 2 has 5 pretokens (no lowercasing anywhere in the family)
    assert(byId(2L)._2 === 5L)
  }

  test("the budget sweep is prefix-consistent: rung 0 is the identity, " +
      "tokens never increase with budget, rung 12 equals the full apply") {
    val rungs = SparkEntry.queries("q_doc_bpe_bytes_tune")(
        spark, dir.toString)
      .collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rungs.map(_._1) === TextQueries.BpeBytesTuneBudgets)
    // rung 0: one token per byte (the identity), vocab = alphabet
    assert(rungs.head._5 === rungs.head._4)
    // bytes and pretokens constant; bpe_tokens monotone non-increasing;
    // vocab grows by at most k products per rung
    rungs.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3 === b._3 && a._4 === b._4)
      assert(b._5 <= a._5)
      assert(b._2 >= a._2 && b._2 <= a._2 + (b._1 - a._1))
    }
    // rung 12 IS the shipped apply: totals must match the apply query
    val apply = SparkEntry.queries("q_doc_bpe_bytes_apply")(
        spark, dir.toString)
      .agg(org.apache.spark.sql.functions.sum("bytes"),
        org.apache.spark.sql.functions.sum("bpe_tokens"))
      .collect()(0)
    assert(rungs.last._4 === apply.getLong(0))
    assert(rungs.last._5 === apply.getLong(1))
  }

  test("detokenization round-trips every pretoken on the multi-script " +
      "fixture — the losslessness the char families cannot claim") {
    val row = SparkEntry.queries("q_doc_bpe_bytes_detok")(
        spark, dir.toString)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val (nPretok, nOcc, nRoundtrip, nMismatch, vocabUsed, maxTokBytes) = row
    // CJK + accents + contractions + parens + digits all invert exactly
    assert(nMismatch === 0L, s"lossless inversion violated: $row")
    assert(nRoundtrip === nPretok)
    assert(nPretok > 0L && nOcc >= nPretok)
    assert(vocabUsed > 0L)
    // the CJK doc guarantees multi-byte tokens exist (3-byte chars; any
    // merge inside the doc widens past 3)
    assert(maxTokBytes >= 3L, s"no multi-byte token ever formed: $row")
  }
}
