package graft.multimodal

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  test("binary payload plumbing + partition-local feature extraction") {
    val media = Multimodal.documentsAsMedia(spark, sf0001)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      assert(f.byteSize > 0)
      assert(f.histogram.length === 16)
      assert(f.histogram.sum === f.byteSize)       // every byte bucketed once
      assert(f.byteEntropyMilli > 0 && f.byteEntropyMilli <= 4000)
    }
  }

  test("feature extraction is deterministic") {
    val media = Multimodal.documentsAsMedia(spark, sf0001)
    val a = Multimodal.extractFeatures(media).collect()
      .map(f => f.item_id -> f.byteEntropyMilli).toMap
    val b = Multimodal.extractFeatures(
      Multimodal.repartitionForMedia(media, 50)).collect()
      .map(f => f.item_id -> f.byteEntropyMilli).toMap
    assert(a === b)                                 // partitioning-invariant
  }

  test("perceptual bands: shape, determinism, and near-dup tolerance") {
    val base = ("the quick brown fox jumps over the lazy dog " * 5).getBytes("UTF-8")
    val bands = Multimodal.FakeCodec.perceptualBands(base)
    assert(bands.length === 4)
    bands.foreach(b => assert(b >= 0 && b < (1L << 16)))
    assert(bands.toSeq === Multimodal.FakeCodec.perceptualBands(base).toSeq)
    // identical payloads → identical signature (hamming 0)
    val same = Multimodal.FakeCodec.perceptualBands(base.clone())
    assert(same.toSeq === bands.toSeq)
    // a single-byte edit moves few cells → small Hamming distance
    val edited = base.clone(); edited(10) = 'X'.toByte
    val eb = Multimodal.FakeCodec.perceptualBands(edited)
    val ham = bands.zip(eb)
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(ham <= 6, s"single-byte edit moved $ham bits")
    // a genuinely different payload is far away
    val other = Multimodal.FakeCodec.perceptualBands(
      ("ZZZZ    aaaa    " * 14).getBytes("UTF-8"))
    val far = bands.zip(other)
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(far > 6, s"unrelated payloads only $far bits apart")
  }

  test("q_media_phash_dedup: ordered pairs within threshold on the " +
      "real corpus") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q_media_phash_dedup")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    // the testdata's whitespace/case near-dup variants land at Hamming
    // 9–12 under the byte-grid aHash (measured; the threshold constant
    // is pinned to that ring) — the verdict set is small but non-empty
    assert(out.nonEmpty)
    out.foreach { case (a, b, h) =>
      assert(a < b)
      assert(h >= 0 && h <= graft.queries.MediaQueries.PhashMaxHamming)
    }
  }

  test("q_media_phash_dedup: exact-dup members all pair at hamming 0, " +
      "and banding recovers a planted near-dup (fixture)") {
    import spark.implicits._
    // the driver corpus contains no BYTE-identical payloads (its exact
    // dups are normalization-equivalent, not raw-equal), so the
    // md5-collapse fan-out contract needs planted raw dups
    val base = "the quick brown fox jumps over the lazy dog " * 5
    // one uppercased word: Hamming 3 from base, sharing band 3 — inside
    // the pigeonhole-guaranteed banding ring (h <= 3 with 4 bands)
    val near = base.replaceFirst("quick", "QUICK")
    val far = "ZZZZ    aaaa    " * 14 // Hamming 32, no shared band
    val dir = java.nio.file.Files.createTempDirectory("phash_fixture")
    Seq((0L, base, "s1"), (1L, base, "s1"), (2L, base, "s2"),
        (3L, near, "s1"), (4L, far, "s2"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_media_phash_dedup")(
        spark, dir.toString)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    // within-group fan-out: every pair among the three byte-identical
    // payloads at hamming 0
    Seq((0L, 1L), (0L, 2L), (1L, 2L)).foreach { p =>
      assert(got.get(p).contains(0L), s"missing within-group pair $p")
    }
    // the uppercased-word variant is a cross-signature near-dup of
    // EVERY group member (fan-out across groups)
    Seq((0L, 3L), (1L, 3L), (2L, 3L)).foreach { p =>
      assert(got.contains(p), s"missing near-dup pair $p")
      assert(got(p) > 0 && got(p) <= graft.queries.MediaQueries.PhashMaxHamming)
    }
    // the unrelated payload pairs with nobody
    assert(!got.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("video frame sampling is an explicit stub") {
    intercept[UnsupportedOperationException] {
      Multimodal.FakeCodec.sampleFrames(Array[Byte](1, 2, 3), 1000)
    }
  }
}
