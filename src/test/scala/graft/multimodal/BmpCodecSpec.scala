package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The image-side real decoder's honesty checks: [[BmpCodec]] must
  * agree with the JDK's independent `javax.imageio` BMP codec in both
  * directions, handle the format hazards a conformant 24-bpp reader
  * owes (bottom-up vs top-down rows, 4-byte row padding at non-aligned
  * widths, pixel-array offsets past the headers), and fail loudly on
  * malformed payloads. */
class BmpCodecSpec extends AnyFunSuite {

  private def gray(i: Int): Int = (i * 37) % 256

  test("the JDK's javax.imageio codec reads encodeGray24 output " +
      "pixel-exact") {
    val bytes = Array.tabulate(100)(i => gray(i).toByte)
    val bmp = BmpCodec.encodeGray24(bytes, 16)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bmp))
    assert(img != null, "ImageIO failed to parse the payload as BMP")
    assert(img.getWidth === 16)
    assert(img.getHeight === 7) // ceil(100/16)
    for (r <- 0 until img.getHeight; c <- 0 until img.getWidth) {
      val i = r * 16 + c
      val want = if (i < bytes.length) gray(i) else 0
      val rgb = img.getRGB(c, r)
      assert((rgb & 0xFF) === want, s"blue at ($r,$c)")
      assert(((rgb >> 8) & 0xFF) === want, s"green at ($r,$c)")
      assert(((rgb >> 16) & 0xFF) === want, s"red at ($r,$c)")
    }
  }

  test("decodes a BMP written by the JDK's javax.imageio codec " +
      "(independent writer), including a PADDED odd width") {
    // width 15: rows are 45 bytes, padded to 48 — the path the 16-px
    // query grid deliberately avoids, exercised here
    val w = 15; val h = 9
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until h; c <- 0 until w) {
      val v = gray(r * w + c)
      img.setRGB(c, r, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", out))
    val dec = BmpCodec.decode(out.toByteArray)
    assert(dec.width === w)
    assert(dec.height === h)
    val want = Array.tabulate(w * h)(gray)
    assert(dec.luma.sameElements(want))
  }

  test("encode∘decode round-trips the luma plane (bottom-up, zero tail)") {
    val bytes = Array.tabulate(37)(i => gray(i).toByte) // 37 = 2 rows + 5
    val dec = BmpCodec.decode(BmpCodec.encodeGray24(bytes, 16))
    assert(dec.width === 16 && dec.height === 3)
    val want = Array.tabulate(48)(i => if (i < 37) gray(i) else 0)
    assert(dec.luma.sameElements(want))
  }

  test("top-down BMPs (negative height) decode in the same row order") {
    val bytes = Array.tabulate(32)(i => gray(i).toByte)
    val up = BmpCodec.encodeGray24(bytes, 16)
    // flip to top-down: negate height and reverse the two rows
    val down = up.clone()
    def put32(o: Int, v: Int): Unit = (0 until 4).foreach(k =>
      down(o + k) = ((v >> (8 * k)) & 0xFF).toByte)
    put32(22, -2)
    val rowSz = 48
    System.arraycopy(up, 54, down, 54 + rowSz, rowSz)
    System.arraycopy(up, 54 + rowSz, down, 54, rowSz)
    assert(BmpCodec.decode(down).luma.sameElements(BmpCodec.decode(up).luma))
  }

  test("malformed payloads fail loudly") {
    val good = BmpCodec.encodeGray24(Array[Byte](1, 2, 3), 16)
    intercept[IllegalArgumentException](BmpCodec.decode(Array[Byte](1)))
    intercept[IllegalArgumentException]( // wrong magic
      BmpCodec.decode("XX".getBytes ++ good.drop(2)))
    intercept[IllegalArgumentException]( // truncated pixel array
      BmpCodec.decode(good.dropRight(4)))
    val bpp8 = good.clone(); bpp8(28) = 8
    intercept[IllegalArgumentException](BmpCodec.decode(bpp8))
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](BmpCodec.decode(rle))
  }

  test("adversarial giant-dimension headers hit the require path, not " +
      "Int overflow (w*3 and w*h computed in Long)") {
    val good = BmpCodec.encodeGray24(Array[Byte](1, 2, 3), 16)
    def put32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
      b(o + 2) = ((v >> 16) & 0xFF).toByte; b(o + 3) = ((v >> 24) & 0xFF).toByte
    }
    // w = 716M: w*3 overflows Int negative, so an Int rowSz would pass
    // the bounds check and blow up in the pixel walk / allocation
    val wide = good.clone(); put32(wide, 18, 716000000)
    intercept[IllegalArgumentException](BmpCodec.decode(wide))
    // w*h > Int.MaxValue with individually-sane fields: luma allocation
    // would be negative-size without the Long pixel-count require
    val big = good.clone(); put32(big, 18, 70000); put32(big, 22, 70000)
    intercept[IllegalArgumentException](BmpCodec.decode(big))
  }
}
