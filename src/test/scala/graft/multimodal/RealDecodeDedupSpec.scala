package graft.multimodal

import graft.SparkTestBase

/** Planted-fixture semantics for the REAL-DECODE near-dup queries: the
  * sf-corpus verdict rings are thin (1 wav pair / 16 bmp pairs at
  * sf0.01, none at sf0.001), so these fixtures pin what "near-dup
  * through a real parser" actually means — exact container duplicates
  * fan out at Hamming 0, a planted case-variant is recovered through a
  * shared band at its MEASURED distance (wav 1, bmp 4 — inside both
  * thresholds), and an unrelated payload (30+ bits away, no shared
  * band) never pairs. One fixture serves both modalities because both
  * signatures are deterministic functions of the text bytes the
  * containers encode. */
class RealDecodeDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 5
  // measured: wav Hamming 1 / bmp Hamming 4 from base, band shared in
  // both signatures (one word's case flips one energy step / one grid
  // cell's mean side)
  private val near = base.replaceFirst("lazy", "LAZY")
  private val far = "ZZZZ    aaaa    " * 14

  private def fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("realdecode_fixture")
    Seq((0L, base, "s1"), (1L, base, "s1"), (2L, base, "s2"),
        (3L, near, "s1"), (4L, far, "s2"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir.toString
  }

  private def check(query: String, maxHamming: Long): Unit = {
    val got = graft.SparkEntry.queries(query)(spark, fixtureDir)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    // byte-identical containers collapse and fan out at Hamming 0
    Seq((0L, 1L), (0L, 2L), (1L, 2L)).foreach { p =>
      assert(got.get(p).contains(0L), s"$query missing exact-dup pair $p")
    }
    // the planted variant pairs with every base copy, within threshold,
    // through the REAL decode
    Seq((0L, 3L), (1L, 3L), (2L, 3L)).foreach { p =>
      assert(got.contains(p), s"$query missing near-dup pair $p")
      assert(got(p) <= maxHamming, s"$query pair $p at ${got(p)}")
    }
    // the unrelated payload never pairs
    assert(!got.keys.exists { case (a, b) => a == 4L || b == 4L },
      s"$query paired the far payload")
  }

  test("q_media_wav_dedup recovers the planted variant through the " +
      "real RIFF parse (fixture)") {
    check("q_media_wav_dedup", graft.queries.MediaQueries.WavMaxHamming)
  }

  test("q_media_bmp_dedup recovers the planted variant through the " +
      "real BMP parse (fixture)") {
    check("q_media_bmp_dedup", graft.queries.MediaQueries.BmpMaxHamming)
  }

  test("q_media_avi_dedup recovers planted variants through the real " +
      "AVI parse, with temporal-sampling semantics pinned (fixture)") {
    // base: 220 chars -> 4 frames of 64 (tail zero-padded), sampled
    // frames fi = 0, 2. The variant flips one word INSIDE FRAME 1 —
    // invisible to every-2nd-frame sampling, so it must pair with the
    // base copies at matched = 2 (both sampled frames align exactly):
    // the pin is the temporal stride itself, through the real decode.
    val lazyAt = base.indexOf("lazy", 64)
    assert(lazyAt >= 64 && lazyAt + 4 <= 128, s"fixture drifted: $lazyAt")
    val frame1Variant =
      base.substring(0, lazyAt) + "LAZY" + base.substring(lazyAt + 4)
    val dir = java.nio.file.Files.createTempDirectory("avi_fixture")
    Seq((0L, base, "s1"), (1L, base, "s1"), (2L, base, "s2"),
        (3L, frame1Variant, "s1"), (4L, far, "s2"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_media_avi_dedup")(
        spark, dir.toString)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, m) => (a, b) -> m }.toMap
    val sampled = 2L // ceil(ceil(220/64)/2)
    Seq((0L, 1L), (0L, 2L), (1L, 2L)).foreach { p =>
      assert(got.get(p).contains(sampled), s"exact pair $p: ${got.get(p)}")
    }
    Seq((0L, 3L), (1L, 3L), (2L, 3L)).foreach { p =>
      assert(got.get(p).contains(sampled),
        s"frame-1 variant pair $p: ${got.get(p)} (sampling stride broken?)")
    }
    assert(!got.keys.exists { case (a, b) => a == 4L || b == 4L },
      "paired the far payload")
  }

  test("the decode queries carry the container truth: parsed dims and " +
      "sizes match the payloads (fixture)") {
    val wav = graft.SparkEntry.queries("q_media_wav_decode")(
        spark, fixtureDir)
      .select("item_id", "sample_rate", "n_samples", "byte_size")
      .distinct()
      .as[(Long, Int, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(wav(0L)._2 === Multimodal.WavSampleRate)
    assert(wav(0L)._3 === base.length.toLong)
    assert(wav(0L)._4 === 44L + 2 * base.length)
    val bmp = graft.SparkEntry.queries("q_media_bmp_decode")(
        spark, fixtureDir)
      .select("item_id", "width", "height", "byte_size")
      .distinct()
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    val h = (base.length + Multimodal.BmpWidth - 1) / Multimodal.BmpWidth
    assert(bmp(0L)._2 === Multimodal.BmpWidth)
    assert(bmp(0L)._3 === h)
    assert(bmp(0L)._4 === 54L + 3 * Multimodal.BmpWidth * h)
  }
}
