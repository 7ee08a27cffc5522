package graft.multimodal

import graft.SparkTestBase

/** The MJPEG AVI face's anchor set — the lossy-codec adjudication at
  * the video grain (the PNG↔JPEG relationship one modality over):
  *
  *  1. the real round trip honors the certification contract on a
  *     committed fixture (geometry, movi-walk frame count, per-frame
  *     ≤1-luma bound), with the CONTAINER walk cross-checked
  *     independently of the frame codec by counting raw JPEG SOI
  *     markers (0xFFD8 can only appear as a marker — entropy data
  *     stuffs 0xFF with 0x00 — so the byte-scan count equals the frame
  *     count without trusting the RIFF parse) and by re-decoding raw
  *     chunk slices standalone;
  *  2. the PLANTED RE-ENCODE fixture: the same clip re-saved at
  *     quality 0.7 — the case an MJPEG dedup exists for — lands within
  *     [[graft.queries.MediaQueries.VideoFrameMaxHamming]] on at least
  *     [[graft.queries.MediaQueries.VideoMinMatched]] aligned sampled
  *     frames, i.e. the shared pairing device recovers it;
  *  3. TWIN-VERDICT agreement: on the planted fixture corpus the MJPEG
  *     face and its hash-matched lossless twin (q_media_avi_dedup)
  *     return the identical pair set with identical matched counts;
  *  4. fail-loud: chunk ids that contradict the declared compression
  *     are refused, not skipped (the quarantine-column rule).
  */
class AviMjpegSpec extends SparkTestBase {
  import spark.implicits._

  private val W = Multimodal.AviFrameWidth
  private val R = Multimodal.AviFrameRows
  private val base = "the quick brown fox jumps over the lazy dog " * 5
  private val far = "ZZZZ    aaaa    " * 14

  test("round trip: real MJPEG encode -> container walk + per-frame " +
      "IDCT honors geometry, frame count, and the certified <=2-luma " +
      "bound; SOI byte-scan cross-checks the walk") {
    val bytes = base.getBytes("UTF-8")
    val payload = AviCodec.encodeMjpeg(bytes, W, R)
    val v = AviCodec.decode(payload)
    val frameLen = W * R
    val nf = (bytes.length + frameLen - 1) / frameLen
    assert(v.width === W && v.height === R)
    assert(v.frames.length === nf)
    // per-frame error bound against the exact zero-filled grids — the
    // certified ≤2 (partial-MCU frames; the sf0.01 sweep's max is
    // exactly 2, see the AviMjpegCert scaladoc)
    for (f <- 0 until nf; i <- 0 until frameLen) {
      val j = f * frameLen + i
      val ref = if (j < bytes.length) bytes(j) & 0xFF else 0
      assert(math.abs(v.frames(f)(i) - ref) <= 2,
        s"frame $f pixel $i: ${v.frames(f)(i)} vs $ref")
    }
    // container-walk independence: JPEG SOI markers in the raw bytes
    // (0xFF 0xD8 appears ONLY as a marker; entropy data stuffs 0xFF)
    val sois = (0 until payload.length - 1).count(i =>
      (payload(i) & 0xFF) == 0xFF && (payload(i + 1) & 0xFF) == 0xD8)
    assert(sois === nf,
      s"raw SOI count $sois != parsed frame count $nf — the movi walk " +
        "and the payload disagree about where frames are")
    // and the certify device agrees end to end
    val cert = Multimodal.aviMjpegCertify(
        Seq((7L, base)).toDF("doc_id", "text"))
      .collect().head
    assert(cert === Multimodal.AviMjpegCert(7L, W, R, nf.toLong, true))
  }

  test("planted re-encode fixture: a q=0.8 re-save is recovered by the " +
      "shared ring; the q=0.7 boundary escape is pinned (measured)") {
    // the realistic re-save: decode the upload, re-encode ITS decoded
    // pixels at a lower quality — exactly what a second uploader's
    // pipeline does (the ImageIoCodecSpec fixture, at the video grain)
    import graft.queries.MediaQueries.{VideoEveryNth, VideoFrameMaxHamming,
      VideoMinMatched}
    val bytes = base.getBytes("UTF-8")
    val orig = AviCodec.decode(AviCodec.encodeMjpeg(bytes, W, R))
    def sampledSigs(frames: Array[Array[Int]]): Seq[Long] =
      (0 until frames.length by VideoEveryNth).map(fi =>
        Multimodal.FakeCodec.perceptualBandsOf(frames(fi),
          cells = 16, bandWidth = 16)(0))
    val origSigs = sampledSigs(orig.frames)
    def resavedMatched(quality: Float): Int = {
      val re = orig.frames.map(f => ImageIoCodec.decodeGray(
        ImageIoCodec.encodeGrayJpeg(f.map(_.toByte), W, quality)).luma)
      origSigs.zip(sampledSigs(re)).count { case (a, b) =>
        java.lang.Long.bitCount(a ^ b) <= VideoFrameMaxHamming }
    }
    // measured ladder on this fixture (per-frame Hamming on the 16-bit
    // frame sig): q=0.9 -> [2,0,2,0], q=0.8 -> [2,3,1,0] — sampled
    // frames 0,2 inside the ring, recovered; q=0.7 -> [4,3,4,0] —
    // outside. The 64-pixel frame grain is the limit (a 4-pixel cell
    // mean moves under ±43 luma error), not the pairing device: the
    // still-image face's 64-cell signature absorbs q=0.7 fine
    // (ImageIoCodecSpec), and the frame face recovers re-saves down to
    // q=0.8 with the device ring untouched.
    assert(resavedMatched(0.8f) >= VideoMinMatched,
      "the q=0.8 re-save escaped the ring — the recovery claim broke")
    assert(resavedMatched(0.7f) < VideoMinMatched,
      "the q=0.7 re-save is now INSIDE the ring — the measured boundary " +
        "moved (JDK codec change?); re-measure the ladder and update " +
        "the scaladoc on q_media_avi_mjpeg_dedup")
  }

  test("twin-verdict agreement: the MJPEG face and its lossless AVI " +
      "twin return the identical verdicts on the planted fixture corpus") {
    // the RealDecodeDedupSpec AVI fixture: exact copies, a frame-1
    // variant invisible to every-2nd-frame sampling, a far payload
    val lazyAt = base.indexOf("lazy", 64)
    val frame1Variant =
      base.substring(0, lazyAt) + "LAZY" + base.substring(lazyAt + 4)
    val dir = java.nio.file.Files.createTempDirectory("avi_mjpeg_fixture")
    Seq((0L, base, "s1"), (1L, base, "s1"), (2L, base, "s2"),
        (3L, frame1Variant, "s1"), (4L, far, "s2"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def verdicts(q: String) =
      graft.SparkEntry.queries(q)(spark, dir.toString)
        .as[(Long, Long, Long)].collect().toSet
    val lossless = verdicts("q_media_avi_dedup")
    val mjpeg = verdicts("q_media_avi_mjpeg_dedup")
    assert(lossless.nonEmpty, "fixture degenerate: the twin found nothing")
    assert(mjpeg === lossless,
      s"twin disagreement: onlyLossless=${lossless diff mjpeg} " +
        s"onlyMjpeg=${mjpeg diff lossless}")
  }

  test("chunk ids that contradict the declared compression are refused") {
    val bytes = base.getBytes("UTF-8")
    // a '..dc' chunk in a BI_RGB stream: corrupt the uncompressed
    // payload's first frame tag
    val rgb = AviCodec.encodeGray24(bytes, W, R)
    val dcInRgb = rgb.clone()
    patchTag(dcInRgb, "00db", "00dc")
    val e1 = intercept[IllegalArgumentException] { AviCodec.decode(dcInRgb) }
    assert(e1.getMessage.contains("compression"), e1.getMessage)
    // a '..db' chunk in an MJPG stream
    val mjpg = AviCodec.encodeMjpeg(bytes, W, R)
    val dbInMjpg = mjpg.clone()
    patchTag(dbInMjpg, "00dc", "00db")
    val e2 = intercept[IllegalArgumentException] { AviCodec.decode(dbInMjpg) }
    assert(e2.getMessage.contains("24-bpp") ||
      e2.getMessage.contains("compression"), e2.getMessage)
  }

  /** Rewrite the FIRST occurrence of chunk tag `from` to `to`. */
  private def patchTag(payload: Array[Byte], from: String, to: String): Unit = {
    val idx = (0 to payload.length - 4).find(i =>
      new String(payload, i, 4, "US-ASCII") == from)
    assert(idx.isDefined, s"no $from chunk found")
    to.getBytes("US-ASCII").copyToArray(payload, idx.get)
  }
}
