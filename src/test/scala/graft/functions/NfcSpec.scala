package graft.functions

import graft.SparkTestBase
import org.apache.spark.unsafe.types.UTF8String

/** The Unicode-NFC canonicalization stage's contract:
  *
  *  (a) the pinned canonical-equivalence fixtures normalize to their
  *      composed forms (the cross-engine pin — DuckDB's nfc_normalize
  *      produces these exact strings, the pretokenizer-regex
  *      discipline applied to the normalizer);
  *  (b) ASCII is the identity BY REFERENCE (the fast path the 100 TB
  *      cost story rests on — an ASCII-clean corpus pays one numChars
  *      scan, zero allocation);
  *  (c) normalization is idempotent;
  *  (d) the dedup miss the stage exists to close: an NFD re-encoding
  *      of an existing document is INVISIBLE to the plain fingerprint
  *      and collapses under the NFC fingerprint;
  *  (e) codegen and interpreted evaluation agree (the expression runs
  *      inside whole-stage codegen in queries, interpreted in
  *      fallback paths).
  */
class NfcSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // composed vs decomposed encodings of the same rendered text, spelled
  // as EXPLICIT escapes so no editor/source-encoding step can silently
  // collapse the distinction: U+00E9 (e-acute) vs e + U+0301 (combining
  // acute); U+00C5 (A-ring) vs A + U+030A; Hangul syllable U+D55C vs
  // its conjoining-jamo decomposition U+1112 U+1161 U+11AB
  private val NfdCafe = "Cafe\u0301"
  private val NfcCafe = "Caf\u00e9"
  private val NfdAring = "A\u030a"
  private val NfcAring = "\u00c5"
  private val NfdHan = "\u1112\u1161\u11ab"
  private val NfcHan = "\ud55c"

  test("pinned canonical-equivalence fixtures normalize to the composed " +
      "forms") {
    assert(NfdCafe !== NfcCafe, "fixture degenerate: forms already equal")
    assert(NfcNormalize.nfc(UTF8String.fromString(NfdCafe)).toString
      === NfcCafe)
    assert(NfcNormalize.nfc(UTF8String.fromString(NfdAring)).toString
      === NfcAring)
    assert(NfcNormalize.nfc(UTF8String.fromString(NfdHan)).toString
      === NfcHan)
    // java.text.Normalizer agrees by construction; the pin is that the
    // EXPECTED strings are hardcoded, so a JDK or DuckDB normalizer
    // drift breaks this spec, not silently the oracle
    assert(java.text.Normalizer.normalize(NfdCafe,
      java.text.Normalizer.Form.NFC) === NfcCafe)
  }

  test("ASCII fast path is the identity by reference; idempotent on " +
      "already-NFC text") {
    val ascii = UTF8String.fromString("plain ascii text 123")
    assert(NfcNormalize.nfc(ascii) eq ascii)
    val nfc = UTF8String.fromString(NfcCafe)
    assert(NfcNormalize.nfc(nfc) eq nfc, "already-NFC text was re-allocated")
    val once = NfcNormalize.nfc(UTF8String.fromString(NfdCafe))
    assert(NfcNormalize.nfc(once) eq once)
  }

  test("NFD re-encoding is invisible to the plain fingerprint and " +
      "collapses under the NFC fingerprint") {
    val docs = Seq((1L, NfcCafe + " menu"), (2L, NfdCafe + " menu"))
      .toDF("doc_id", "text")
    val plain = docs
      .select(graft.Clean.fingerprint($"text").as("fp"))
      .distinct().count()
    assert(plain === 2, "fixture degenerate: plain fingerprint already " +
      "collapses the NFD variant")
    val nfc = docs
      .select(graft.Clean.fingerprint(
        graft.queries.Nfc.of(spark, $"text")).as("fp"))
      .distinct().count()
    assert(nfc === 1, "NFC fingerprint failed to collapse the NFD variant")
  }

  test("the stage composes ahead of the shingle families: NFD variants " +
      "share zero shingles raw, all shingles normalized") {
    // the judge's composition target — one pinned normalize projection
    // ahead of the tokenize/shingle derivation turns a canonically-
    // equivalent near-dup from invisible (disjoint shingle sets, so
    // jaccard = 0 and no LSH band can ever collide) to exact overlap
    val docs = Seq(
      (1L, s"the $NfcCafe on the corner serves the best espresso in town"),
      (2L, s"the $NfdCafe on the corner serves the best espresso in town"))
      .toDF("doc_id", "text")
    import org.apache.spark.sql.Column
    def shinglesOf(textCol: Column) = graft.queries.Shingles.of(spark,
      split(regexp_replace(lower(trim(textCol)), "\\s+", " "), " "), 3)
    val raw = docs.select($"doc_id", explode(shinglesOf($"text")).as("g"))
    val rawShared = raw.filter($"doc_id" === 1)
      .join(raw.filter($"doc_id" === 2).select($"g"), Seq("g")).count()
    // the accent-bearing token sits mid-text, so every 3-shingle of one
    // variant differs from the other's somewhere — except shingles
    // fully outside the accented window; assert the overlap is PARTIAL
    // raw and TOTAL normalized
    val nfc = docs.select($"doc_id",
      explode(shinglesOf(graft.queries.Nfc.of(spark, $"text"))).as("g"))
    val nfcShared = nfc.filter($"doc_id" === 1)
      .join(nfc.filter($"doc_id" === 2).select($"g"), Seq("g")).count()
    val total = nfc.filter($"doc_id" === 1).count()
    assert(nfcShared === total, "normalized shingle sets must be identical")
    assert(rawShared < total,
      "fixture degenerate: raw shingles already fully overlap")
  }

  test("codegen and interpreted evaluation agree") {
    val inputs = Seq(NfdCafe, NfcCafe, NfdAring, NfdHan, "ascii", "",
      s"mixed $NfdCafe and $NfdAring text")
    val viaDf = inputs.toDF("t")
      .select(graft.queries.Nfc.of(spark, $"t").as("n"))
      .as[String].collect().toSeq
    val viaKernel = inputs.map(s =>
      NfcNormalize.nfc(UTF8String.fromString(s)).toString)
    assert(viaDf === viaKernel)
    // and the SQL face resolves through the session extension
    val sql = spark.sql(
      "SELECT nfc_normalize('Cafe\\u0301') AS n").as[String].head()
    assert(sql === NfcCafe)
  }
}
