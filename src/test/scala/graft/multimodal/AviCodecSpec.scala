package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The video decoder's honesty checks. The JDK has no AVI codec, so the
  * independent cross-checks differ from the wav/bmp pattern in shape
  * but not in substance: the CONTAINER structure is pinned by a
  * committed fixture written by a separate Python stdlib-struct
  * generator from the public spec (with an idx1 index, a JUNK chunk
  * inside hdrl, and a vendor INFO list — shapes the repo's own encoder
  * never emits, so a scanner that only handles its own output fails
  * here), and the PIXEL-WALK semantics are pinned by re-wrapping each
  * encoded '00db' frame as a standalone BMP and reading it back through
  * the JDK's independent javax.imageio codec. Plus the encode∘decode
  * round trip and loud failure on malformed payloads. */
class AviCodecSpec extends AnyFunSuite {

  /** The fixture pattern gray_16x4.avi encodes: byte i = (i·37) mod 256
    * over 160 bytes → three 16×4 frames, the last half zero-padded. */
  private def fixtureBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/fixtures/gray_16x4.avi")
    require(in != null, "fixture /fixtures/gray_16x4.avi missing")
    try in.readAllBytes() finally in.close()
  }

  private def fixtureLuma(frame: Int): Array[Int] =
    Array.tabulate(64) { q =>
      val i = frame * 64 + q
      if (i < 160) (i * 37) % 256 else 0
    }

  test("decodes the committed fixture (independent Python-written AVI " +
      "with idx1/JUNK/INFO chunks) pixel-exact") {
    val v = AviCodec.decode(fixtureBytes)
    assert(v.width === 16)
    assert(v.height === 4)
    assert(v.frames.length === 3)
    (0 until 3).foreach { f =>
      assert(v.frames(f).sameElements(fixtureLuma(f)), s"frame $f")
    }
  }

  test("encode∘decode round-trips every frame, zero-padded tail included") {
    val bytes = Array.tabulate(300)(i => ((i * 7 + 13) % 256).toByte)
    val v = AviCodec.decode(AviCodec.encodeGray24(bytes, 16, 4))
    assert(v.width === 16 && v.height === 4)
    assert(v.frames.length === 5) // ceil(300/64)
    v.frames.zipWithIndex.foreach { case (luma, f) =>
      val expect = Array.tabulate(64) { q =>
        val i = f * 64 + q
        if (i < bytes.length) bytes(i) & 0xFF else 0
      }
      assert(luma.sameElements(expect), s"frame $f")
    }
  }

  test("odd widths exercise the 4-byte row-padding path") {
    val bytes = Array.tabulate(45)(i => (i * 11 % 256).toByte)
    val v = AviCodec.decode(AviCodec.encodeGray24(bytes, 5, 3))
    assert(v.width === 5 && v.height === 3)
    assert(v.frames.length === 3) // ceil(45/15)
    assert(v.frames(0).sameElements(
      Array.tabulate(15)(i => bytes(i) & 0xFF)))
  }

  test("the JDK's javax.imageio codec agrees with the frame pixel walk " +
      "(DIB chunks re-wrapped as standalone BMPs)") {
    val bytes = Array.tabulate(130)(i => ((i * 31 + 5) % 256).toByte)
    val payload = AviCodec.encodeGray24(bytes, 16, 4)
    val ours = AviCodec.decode(payload)
    // locate the movi LIST and walk its 00db chunks
    def le32(o: Int): Int = (payload(o) & 0xFF) |
      ((payload(o + 1) & 0xFF) << 8) | ((payload(o + 2) & 0xFF) << 16) |
      ((payload(o + 3) & 0xFF) << 24)
    def tag(o: Int): String = new String(payload, o, 4, "US-ASCII")
    var pos = 12
    var moviAt = -1; var moviEnd = -1
    while (pos + 8 <= payload.length && moviAt < 0) {
      if (tag(pos) == "LIST" && tag(pos + 8) == "movi") {
        moviAt = pos + 12; moviEnd = pos + 8 + le32(pos + 4)
      }
      pos += 8 + le32(pos + 4) + (le32(pos + 4) & 1)
    }
    assert(moviAt > 0, "no movi list in encoder output")
    val rowSz = (16 * 3 + 3) & ~3
    val dibSz = rowSz * 4
    var f = 0
    pos = moviAt
    while (pos + 8 <= moviEnd) {
      assert(tag(pos) == "00db")
      assert(le32(pos + 4) === dibSz)
      // standalone BMP = 54-byte header + the raw frame chunk bytes
      val bmp = new java.io.ByteArrayOutputStream()
      val hdr = java.nio.ByteBuffer.allocate(54)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      hdr.put('B'.toByte).put('M'.toByte).putInt(54 + dibSz)
        .putInt(0).putInt(54)
        .putInt(40).putInt(16).putInt(4).putShort(1).putShort(24)
        .putInt(0).putInt(dibSz).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      bmp.write(hdr.array())
      bmp.write(payload, pos + 8, dibSz)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bmp.toByteArray))
      assert(img != null, s"javax.imageio rejected frame $f")
      assert(img.getWidth === 16 && img.getHeight === 4)
      val jdk = Array.tabulate(64) { q =>
        val rgb = img.getRGB(q % 16, q / 16)
        (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
      }
      assert(jdk.sameElements(ours.frames(f)), s"frame $f pixel walk")
      f += 1
      pos += 8 + dibSz
    }
    assert(f === ours.frames.length)
  }

  test("the ingest grid is the synthetic video path's byte-block grid " +
      "(one frame-signature arithmetic, two payload formats)") {
    assert(Multimodal.AviFrameWidth * Multimodal.AviFrameRows ===
      Multimodal.FakeCodec.VideoFrameBytes)
    // a FULL (untruncated) frame's decoded luma equals the raw block,
    // so its 16-cell aHash is identical under either codec
    val bytes = Array.tabulate(64)(i => ((i * 53 + 7) % 256).toByte)
    val v = AviCodec.decode(AviCodec.encodeGray24(bytes, 16, 4))
    val viaAvi = Multimodal.FakeCodec
      .perceptualBandsOf(v.frames(0), cells = 16, bandWidth = 16)(0)
    val viaFake = Multimodal.FakeCodec
      .perceptualBands(bytes, cells = 16, bandWidth = 16)(0)
    assert(viaAvi === viaFake)
  }

  test("malformed payloads fail loudly") {
    val good = AviCodec.encodeGray24(Array[Byte](1, 2, 3), 16, 4)
    intercept[IllegalArgumentException](AviCodec.decode(Array[Byte](1, 2)))
    val wav = good.clone(); wav(8) = 'W'.toByte // wrong form type
    intercept[IllegalArgumentException](AviCodec.decode(wav))
    intercept[IllegalArgumentException]( // truncated frame
      AviCodec.decode(good.dropRight(4)))
    val bpp8 = good.clone()
    // strf bpp field: find 'strf' and flip its biBitCount
    val strfAt = good.indices.find(i => i + 4 <= good.length &&
      new String(good, i, 4, "US-ASCII") == "strf").get
    bpp8(strfAt + 8 + 14) = 8
    intercept[IllegalArgumentException](AviCodec.decode(bpp8))
    val audio = good.clone()
    val strhAt = good.indices.find(i => i + 4 <= good.length &&
      new String(good, i, 4, "US-ASCII") == "strh").get
    audio(strhAt + 8) = 'a'.toByte // 'vids' -> 'aids'
    intercept[IllegalArgumentException](AviCodec.decode(audio))
  }
}
