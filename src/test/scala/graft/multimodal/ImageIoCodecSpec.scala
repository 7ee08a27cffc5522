package graft.multimodal

import graft.SparkTestBase
import graft.multimodal.Multimodal.FakeCodec

/** The compressed-image codec wrapper's contract:
  *
  *  (a) PNG is LOSSLESS: decode∘encode returns the exact padded grid,
  *      and the decoded plane equals the BMP codec's for the same
  *      bytes — the fact that lets the PNG query family ride the BMP
  *      family's hard oracle CTEs verbatim;
  *  (b) JPEG at quality 1.0 honors the ≤1-per-pixel luma bound the
  *      q_media_jpeg_decode certification asserts per item;
  *  (c) the PLANTED RE-ENCODE FIXTURE: the same image re-saved at a
  *      lower quality — the case a JPEG near-dup exists for — is a
  *      byte-DISTINCT payload (md5 collapse cannot catch it) whose
  *      decoded-luma aHash lands within the measured
  *      [[graft.queries.MediaQueries]] JPEG ring, so the banded dedup
  *      catches what exact dedup cannot;
  *  (d) encoding is deterministic (same bytes in, same container out —
  *      the md5-collapse premise);
  *  (e) garbage payloads fail loudly (the quarantine-column rule).
  */
class ImageIoCodecSpec extends SparkTestBase {

  private val W = Multimodal.BmpWidth
  private val FixtureText =
    "the quick brown fox jumps over the lazy dog while the spark " +
    "engine shuffles a hundred terabytes of crawl data into shards. " +
    "tokens flow, fingerprints collapse, and the corpus grows clean."
  private val FixtureBytes =
    FixtureText.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def paddedGrid(bytes: Array[Byte]): Array[Int] = {
    val h = math.max(1, (bytes.length + W - 1) / W)
    Array.tabulate(W * h)(i => if (i < bytes.length) bytes(i) & 0xFF else 0)
  }

  test("PNG round-trips the padded grid bit-exactly and equals the BMP " +
      "plane") {
    val img = ImageIoCodec.decodeGray(
      ImageIoCodec.encodeGrayPng(FixtureBytes, W))
    assert(img.width === W)
    assert(img.height === (FixtureBytes.length + W - 1) / W)
    assert(img.luma.toSeq === paddedGrid(FixtureBytes).toSeq,
      "PNG decode∘encode is not the identity on the gray grid")
    val bmp = BmpCodec.decode(BmpCodec.encodeGray24(FixtureBytes, W))
    assert(img.luma.toSeq === bmp.luma.toSeq,
      "PNG and BMP planes diverge for the same bytes")
  }

  test("JPEG at quality 1.0 honors the <=1 luma error bound") {
    for (text <- Seq(FixtureText, "x", "short doc", FixtureText * 3)) {
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val img = ImageIoCodec.decodeGray(
        ImageIoCodec.encodeGrayJpeg(bytes, W))
      val ref = paddedGrid(bytes)
      assert(img.luma.length === ref.length)
      val maxErr = img.luma.zip(ref).map { case (a, b) =>
        math.abs(a - b) }.max
      assert(maxErr <= 1,
        s"JPEG q=1.0 luma error $maxErr exceeds the certified bound")
    }
  }

  test("planted re-encode variant: byte-distinct payload within the " +
      "measured dedup ring") {
    val original = ImageIoCodec.encodeGrayJpeg(FixtureBytes, W)
    val origImg = ImageIoCodec.decodeGray(original)
    // the re-save: decode the upload, re-encode ITS pixels at q=0.7 —
    // exactly what a second uploader's image pipeline does
    val resaved = ImageIoCodec.encodeGrayJpeg(
      origImg.luma.map(_.toByte), W, quality = 0.7f)
    assert(!java.util.Arrays.equals(original, resaved),
      "fixture degenerate: re-encode produced identical bytes")
    val reImg = ImageIoCodec.decodeGray(resaved)
    val b1 = FakeCodec.perceptualBandsOf(origImg.luma)
    val b2 = FakeCodec.perceptualBandsOf(reImg.luma)
    val hamming = b1.zip(b2).map { case (a, b) =>
      java.lang.Long.bitCount(a ^ b) }.sum
    // measured: the q=0.7 re-save lands at Hamming 0-3 on this fixture
    // (quantization noise grows but the cell means barely move); the
    // ring at JpegMaxHamming catches it with margin
    assert(hamming <= graft.queries.MediaQueries.JpegMaxHamming,
      s"re-encode variant at Hamming $hamming escapes the dedup ring")
  }

  test("COLOR containers decode through the shared luma kernel — a " +
      "color re-save of a gray image stays inside the dedup ring") {
    // a real crawl corpus is mostly color JPEG/PNG: promote the gray
    // fixture to 3-band RGB (every channel = the gray value), encode
    // through the real color pipelines, and the decoded (r+g+b)/3 luma
    // must be the gray plane (exact for PNG; within JPEG noise for
    // JPEG — chroma subsampling applies to constant chroma here)
    val gray = ImageIoCodec.decodeGray(
      ImageIoCodec.encodeGrayPng(FixtureBytes, W))
    val rgb = new java.awt.image.BufferedImage(gray.width, gray.height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until gray.height; x <- 0 until gray.width) {
      val v = gray.luma(y * gray.width + x)
      rgb.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(rgb, fmt, bos)
      bos.toByteArray
    }
    val pngColor = ImageIoCodec.decodeGray(enc("png"))
    assert(pngColor.luma.toSeq === gray.luma.toSeq,
      "color-PNG luma diverges from the gray plane")
    val jpgColor = ImageIoCodec.decodeGray(enc("jpg"))
    val b1 = FakeCodec.perceptualBandsOf(gray.luma)
    val b2 = FakeCodec.perceptualBandsOf(jpgColor.luma)
    val hamming = b1.zip(b2).map { case (a, b) =>
      java.lang.Long.bitCount(a ^ b) }.sum
    assert(hamming <= graft.queries.MediaQueries.JpegMaxHamming,
      s"color-JPEG re-save at Hamming $hamming escapes the dedup ring")
    // 4-band (alpha) still quarantines
    val argb = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_4BYTE_ABGR)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(argb, "png", bos)
    intercept[IllegalArgumentException] {
      ImageIoCodec.decodeGray(bos.toByteArray)
    }
  }

  test("encoding is deterministic; garbage fails loudly") {
    assert(java.util.Arrays.equals(
      ImageIoCodec.encodeGrayPng(FixtureBytes, W),
      ImageIoCodec.encodeGrayPng(FixtureBytes, W)))
    assert(java.util.Arrays.equals(
      ImageIoCodec.encodeGrayJpeg(FixtureBytes, W),
      ImageIoCodec.encodeGrayJpeg(FixtureBytes, W)))
    intercept[IllegalArgumentException] {
      ImageIoCodec.decodeGray("not an image at all".getBytes)
    }
  }
}
