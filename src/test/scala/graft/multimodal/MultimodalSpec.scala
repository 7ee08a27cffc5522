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

  test("audio fingerprint: shape, determinism, edit tolerance, and the " +
      "temporal-difference design actually differs from the aHash") {
    val base = ("the quick brown fox jumps over the lazy dog " * 5)
      .getBytes("UTF-8")
    val bands = Multimodal.FakeCodec.audioBands(base)
    assert(bands.length === 4)
    bands.foreach(b => assert(b >= 0 && b < (1L << 16)))
    assert(bands.toSeq === Multimodal.FakeCodec.audioBands(base.clone()).toSeq)
    // energies: every byte contributes its square to exactly one frame
    val e = Multimodal.FakeCodec.frameEnergies(base)
    assert(e.length === 65)
    assert(e.sum === base.map(b => { val x = (b & 0xFF).toLong; x * x }).sum)
    // a one-word case edit moves one frame's energy → few difference bits
    val near = new String(base, "UTF-8").replaceFirst("quick", "QUICK")
      .getBytes("UTF-8")
    val ham = bands.zip(Multimodal.FakeCodec.audioBands(near))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(ham > 0 && ham <= graft.queries.MediaQueries.AudioMaxHamming,
      s"case edit moved $ham bits")
    // the two fingerprints of the SAME payload disagree: temporal
    // differences are not global-mean bits (a shared-machinery relabel
    // would make the audio family vacuous)
    assert(bands.toSeq !==
      Multimodal.FakeCodec.perceptualBands(base).toSeq)
  }

  test("q_media_audio_dedup: ordered pairs within threshold on the " +
      "real corpus") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q_media_audio_dedup")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (a, b, h) =>
      assert(a < b)
      assert(h >= 0 && h <= graft.queries.MediaQueries.AudioMaxHamming)
    }
  }

  test("q_media_audio_dedup: exact dups fan out at hamming 0 and a " +
      "planted case-variant is recovered through its shared band (fixture)") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 5
    // measured: Hamming 2 from base WITH a shared band (one frame's
    // energy moves → two difference bits); the far payload is 31 bits
    // away and shares no band
    val near = base.replaceFirst("quick", "QUICK")
    val far = "ZZZZ    aaaa    " * 14
    val dir = java.nio.file.Files.createTempDirectory("audio_fixture")
    Seq((0L, base, "s1"), (1L, base, "s1"), (2L, base, "s2"),
        (3L, near, "s1"), (4L, far, "s2"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_media_audio_dedup")(
        spark, dir.toString)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    Seq((0L, 1L), (0L, 2L), (1L, 2L)).foreach { p =>
      assert(got.get(p).contains(0L), s"missing within-group pair $p")
    }
    Seq((0L, 3L), (1L, 3L), (2L, 3L)).foreach { p =>
      assert(got.contains(p), s"missing near-dup pair $p")
      assert(got(p) > 0 &&
        got(p) <= graft.queries.MediaQueries.AudioMaxHamming)
    }
    assert(!got.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("q_media_video_dedup: sampling blindness, verification bite, and " +
      "exact-dup fan-out (fixture)") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 5 // 220B: 4
    // frames, sampled fi 0 and 2
    val scramble = "Z Z Z Z  zz  Z Z  zzzz   Z" // high-contrast 26 bytes
    // edit confined to UNSAMPLED frame 1 → invisible to the sampler,
    // both sampled frames identical (the sampling trade-off, pinned)
    val unsampledEdit = base.substring(0, 70) + "XXXX" + base.substring(74)
    // frame 0 scrambled, frame 2 intact → candidate through frame 2 but
    // matched = 1 < minMatched: the verification cut must bite
    val oneFrame = scramble + base.substring(26)
    // both sampled frames scrambled → no candidate at all
    val bothFrames = scramble + base.substring(26, 130) +
      "  ZZZZ  zz   Z Z Zz z" + base.substring(151)
    val dir = java.nio.file.Files.createTempDirectory("video_fixture")
    Seq((0L, base, "s1"), (1L, base, "s2"), (2L, unsampledEdit, "s1"),
        (3L, oneFrame, "s1"), (4L, bothFrames, "s2"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_media_video_dedup")(
        spark, dir.toString)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, m) => (a, b) -> m }.toMap
    // byte-identical pair: within-group matched = its sampled-frame count
    assert(got.get((0L, 1L)).contains(2L))
    // unsampled-frame edit: both sampled frames agree exactly
    assert(got.get((0L, 2L)).contains(2L))
    assert(got.get((1L, 2L)).contains(2L))
    // the one-good-frame variant and the fully-scrambled variant pair
    // with nobody (candidate-but-cut vs no-candidate)
    assert(!got.keys.exists { case (a, b) => a == 3L || b == 3L })
    assert(!got.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("q_media_video_dedup: matched counts on the real corpus respect " +
      "the threshold and ordering") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q_media_video_dedup")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (a, b, m) =>
      assert(a < b)
      assert(m >= graft.queries.MediaQueries.VideoMinMatched)
    }
  }

  test("video frame sampling: indexed stride over fixed decoded frames, " +
      "short tail preserved") {
    // replaces the r8–r14 explicit-stub pin: the sampler is now real
    // (deterministic container stand-in, like every FakeCodec face)
    val fb = Multimodal.FakeCodec.VideoFrameBytes
    val payload = Array.tabulate[Byte](fb * 4 + 10)(i => (i % 251).toByte)
    val every2 = Multimodal.FakeCodec.sampleFrames(payload, 2)
    assert(every2.map(_._1).toSeq === Seq(0, 2, 4))
    assert(every2(0)._2.toSeq === payload.slice(0, fb).toSeq)
    assert(every2(1)._2.toSeq === payload.slice(2 * fb, 3 * fb).toSeq)
    assert(every2(2)._2.length === 10, "tail frame must keep its bytes")
    // stride 1 = every frame; empty payload = no frames
    assert(Multimodal.FakeCodec.sampleFrames(payload, 1).length === 5)
    assert(Multimodal.FakeCodec.sampleFrames(Array.empty[Byte], 2).isEmpty)
  }

  test("q_media_band_tune: layouts nest (wider-band agreement implies " +
      "narrower), and the 8x8 rung recovers the whole pool") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q_media_band_tune")(spark, sf0001)
      .as[(String, Int, Int, Long, Long, Long, Double, Double)]
      .collect().toSeq.sortBy(_._2)
    assert(got.map(_._1) === Seq("2x32", "4x16", "8x8"))
    // a pair agreeing on a 32-bit band agrees on both 16-bit halves,
    // and a 16-bit agreement on both 8-bit halves: candidate sets are
    // NESTED, so volume and verified counts are monotone in bands
    assert(got.map(_._4) === got.map(_._4).sorted, "candidates monotone")
    assert(got.map(_._5) === got.map(_._5).sorted, "verified monotone")
    val pool = got.head._6
    assert(got.forall(_._6 == pool), "one pooled denominator")
    // the nesting makes every pooled-truth pair an 8x8 candidate, so
    // the narrowest rung's recall is 1.0 by construction (cap aside)
    val widest = got.last
    assert(pool === 0L || widest._7 === 1.0,
      s"8x8 pooled recall ${widest._7} with pool $pool")
    got.foreach { r =>
      assert(r._5 <= r._4 && r._5 <= r._6, s"${r._1} bounds")
    }
  }
}
