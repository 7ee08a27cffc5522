package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.{Clean, SparkTestBase}

/** The exact-duplicate collapse inside q_dedup_ngram_jaccard and
  * q_dedup_simhash claims ROW-FOR-ROW equivalence with the uncollapsed
  * all-pairs form (which the DuckDB oracles compute). This spec checks
  * that claim against brute-force uncollapsed references on a corpus
  * crafted to break it: whitespace-variant duplicates whose RAW lengths
  * straddle the 64-char length band (same fingerprint, different band —
  * the round-3 ADVICE bug class), verbatim copies, near-dups, multiple
  * languages, and a short doc. The driver's oracle corpus duplicates
  * texts verbatim only, so this is the coverage it can't give. */
class CollapseEquivalenceSpec extends SparkTestBase {
  import spark.implicits._

  /** base text of n tokens from a small vocabulary (deterministic). */
  private def text(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
  }

  lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("collapse_fixture").toString
    val base = (0 until 8).map(i => text(i, 30 + i * 5))
    val near = base(0).split(" ").zipWithIndex
      .map { case (w, i) => if (i % 11 == 5) "CHANGED" else w }.mkString(" ")
    val rows = Seq.newBuilder[(Long, String, String)]
    base.zipWithIndex.foreach { case (t, i) =>
      rows += ((i.toLong, t, if (i % 2 == 0) "en" else "fr"))
    }
    // verbatim copies of docs 0 and 3
    rows += ((100L, base(0), "en"))
    rows += ((101L, base(3), "fr"))
    // whitespace variants: same normalized text/fingerprint, raw length
    // pushed across a 64-char band boundary by 70+ extra spaces
    rows += ((110L, base(0).replace(" ", "   ") + "     ", "en"))
    rows += ((111L, "     " + base(3) + " " * 70, "fr"))
    // near-dup of doc 0, same band vicinity
    rows += ((120L, near, "en"))
    // short doc (exercises the <3-token shingle fallback)
    rows += ((130L, "tiny doc", "en"))
    val docs = rows.result().toDF("doc_id", "text", "lang")
      .withColumn("source", concat(lit("src"), $"doc_id"))
      .withColumn("n_chars", length($"text").cast("long"))
    docs.write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  private def docsWithGrams: DataFrame = {
    val toks = split(regexp_replace(lower(trim($"text")), "\\s+", " "), " ")
    spark.read.parquet(s"$fixtureDir/documents.parquet")
      .withColumn("__toks", toks)
      .select($"doc_id", $"lang",
        (length($"text") / 64).cast("int").as("len_band"),
        array_distinct(
          when(size($"__toks") >= 3,
            transform(sequence(lit(0), size($"__toks") - 3),
              i => concat_ws(" ", element_at($"__toks", i + 1),
                element_at($"__toks", i + 2), element_at($"__toks", i + 3))))
            .otherwise(array(concat_ws(" ", $"__toks")))).as("grams"))
  }

  test("ngram-jaccard collapse is row-for-row the uncollapsed all-pairs form") {
    // brute-force reference: every same-(lang, len_band) pair, distinct
    // grams intersected directly — no collapse, no inverted index
    val d = docsWithGrams
    val a = d.select($"doc_id".as("doc_a"), $"lang", $"len_band",
      $"grams".as("ga"))
    val b = d.select($"doc_id".as("doc_b"), $"lang", $"len_band",
      $"grams".as("gb"))
    val want = a.join(b, Seq("lang", "len_band"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        Clean.roundHalfUp(size(array_intersect($"ga", $"gb")).cast("double")
          / size(array_union($"ga", $"gb")), 4).as("jaccard"))
      .filter($"jaccard" >= 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val got = DedupQueries.queries("q_dedup_ngram_jaccard")(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(got === want)
    // the corpus must actually exercise the band-straddling variants:
    // doc 110 is a whitespace variant of 0 in a DIFFERENT band
    val bands = docsWithGrams.select($"doc_id", $"len_band")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(bands(110L) !== bands(0L), "fixture lost its band straddle")
    assert(bands(111L) !== bands(3L), "fixture lost its band straddle")
  }

  test("minhash-lsh collapse is row-for-row the uncollapsed all-pairs form") {
    // uncollapsed reference: 32 seeded-xxhash64 mins per doc (no
    // collapse), band hash, plain banded self-join
    val bands = 8
    val rows = 4
    val k = bands * rows
    val exploded = docsWithGrams
      .select($"doc_id", explode($"grams").as("shingle"))
    val sig = exploded.groupBy($"doc_id")
      .agg(min(xxhash64(lit(0), $"shingle")).as("m0"),
        (1 until k).map(i => min(xxhash64(lit(i), $"shingle")).as(s"m$i")): _*)
    val banded = sig.select($"doc_id", posexplode(array(
      (0 until bands).map(b =>
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"m$i")): _*)): _*)))
      .toDF("doc_id", "band_idx", "band_hash")
    val x = banded.select($"doc_id".as("doc_a"), $"band_idx", $"band_hash")
    val y = banded.select($"doc_id".as("doc_b"), $"band_idx", $"band_hash")
    val want = x.join(y, Seq("band_idx", "band_hash"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("shared_bands"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val got = DedupQueries.queries("q_dedup_minhash_lsh")(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(got === want)
    assert(want.exists { case (a, b, n) => a == 0L && b == 110L && n == 8L },
      "whitespace variant must share all bands with its original")
  }

  test("simhash collapse is row-for-row the uncollapsed all-pairs form") {
    // brute-force reference: per-doc 64-bit signature computed WITHOUT
    // collapse, banded self-join, distinct, hamming <= 3
    val bits = 64
    val toks = split(regexp_replace(lower(trim($"text")), "\\s+", " "), " ")
    val tok = spark.read.parquet(s"$fixtureDir/documents.parquet")
      .select($"doc_id", explode_outer(array_distinct(toks)).as("t"))
      .select($"doc_id", xxhash64($"t").as("h"))
    val bitSums = tok.groupBy($"doc_id")
      .agg(count(lit(1)).as("n"),
        (0 until bits).map(i =>
          sum(shiftright($"h", i).bitwiseAND(1L)).as(s"s$i")): _*)
    val sigs = bitSums.select($"doc_id",
      (0 until bits).map(i =>
        when(col(s"s$i") * 2L > $"n", lit(1L << i)).otherwise(0L))
        .reduce(_ + _).as("simhash"))
    val banded = sigs.select($"doc_id", $"simhash",
      posexplode(array((0 until 4).map(b =>
        shiftright($"simhash", b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("doc_id", "simhash", "band_idx", "band_val")
    val x = banded.select($"doc_id".as("doc_a"), $"simhash".as("sim_a"),
      $"band_idx", $"band_val")
    val y = banded.select($"doc_id".as("doc_b"), $"simhash".as("sim_b"),
      $"band_idx", $"band_val")
    val want = x.join(y, Seq("band_idx", "band_val"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        call_function("bit_count", $"sim_a".bitwiseXOR($"sim_b")).as("hamming"))
      .distinct()
      .filter($"hamming" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val got = DedupQueries.queries("q_dedup_simhash")(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(got === want)
    assert(want.exists { case (a, b, h) => a == 0L && b == 110L && h == 0 },
      "whitespace variant must pair with its original at hamming 0")
  }
}
