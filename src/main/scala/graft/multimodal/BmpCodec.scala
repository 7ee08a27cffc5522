package graft.multimodal

/** The IMAGE-side real decoder — [[WavCodec]]'s sibling, completing the
  * real-decode story for the second media modality: BMP (the Windows
  * device-independent bitmap) is the one mainstream IMAGE container
  * fully parseable in dependency-free JVM code, and the JDK's own
  * `javax.imageio` reads and writes it, giving the same independent
  * cross-check javax.sound gives the WAV parser (BmpCodecSpec).
  *
  * `decode` handles what any conformant 24-bpp reader must: the BM
  * magic, the pixel-array offset from the file header (palettes or
  * extended info headers may sit between), width/height from the info
  * header, BOTTOM-UP row order (positive height; negative = top-down),
  * 4-byte row padding, and BGR byte order. Anything else — compressed,
  * paletted, other depths — fails loudly (the quarantine-column rule,
  * WavCodec scaladoc).
  */
object BmpCodec {

  /** One decoded image: dimensions plus the row-major, TOP-DOWN luma
    * plane ((b+g+r)/3 integer mean per pixel) — the grid perceptual
    * hashing consumes. */
  case class BmpImage(width: Int, height: Int, luma: Array[Int])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** Canonical 24-bpp grayscale writer: each input byte becomes one
    * gray pixel ((v, v, v)) on a `width`-pixel row grid, rows stored
    * bottom-up with 4-byte padding, 54-byte BITMAPINFOHEADER layout —
    * the shape every stock BMP tool emits. The tail of the last row
    * zero-fills (decode returns width·height luma values; callers track
    * payload length separately). */
  def encodeGray24(bytes: Array[Byte], width: Int): Array[Byte] = {
    require(width > 0, s"width must be positive, got $width")
    val h = math.max(1, (bytes.length + width - 1) / width)
    val rowSz = (width * 3 + 3) & ~3
    val imgSz = rowSz * h
    val out = new Array[Byte](54 + imgSz)
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      put16(o, v & 0xFFFF); put16(o + 2, (v >> 16) & 0xFFFF)
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    put32(2, 54 + imgSz) // file size
    put32(10, 54) // pixel-array offset
    put32(14, 40) // BITMAPINFOHEADER size
    put32(18, width); put32(22, h) // positive height = bottom-up
    put16(26, 1) // planes
    put16(28, 24) // bpp
    put32(30, 0) // BI_RGB, uncompressed
    put32(34, imgSz)
    put32(38, 2835); put32(42, 2835) // 72 dpi in px/m
    var r = 0
    while (r < h) {
      val base = 54 + (h - 1 - r) * rowSz // bottom-up
      var c = 0
      while (c < width) {
        val i = r * width + c
        val v = if (i < bytes.length) bytes(i) else 0.toByte
        val o = base + 3 * c
        out(o) = v; out(o + 1) = v; out(o + 2) = v
        c += 1
      }
      r += 1
    }
    out
  }

  /** Decode a 24-bpp uncompressed BMP to its top-down luma plane. */
  def decode(payload: Array[Byte]): BmpImage = {
    require(payload.length >= 54 &&
      payload(0) == 'B'.toByte && payload(1) == 'M'.toByte,
      "not a BMP payload")
    val off = le32(payload, 10)
    val w = le32(payload, 18)
    val hRaw = le32(payload, 22)
    val planes = le16(payload, 26)
    val bpp = le16(payload, 28)
    val comp = le32(payload, 30)
    require(planes == 1, s"planes must be 1, got $planes")
    require(bpp == 24 && comp == 0,
      s"only uncompressed 24-bpp supported, got bpp=$bpp compression=$comp")
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    require(w > 0 && h > 0, s"bad dimensions ${w}x$hRaw")
    // Long arithmetic throughout: an adversarial header with w >= ~716M
    // would overflow Int in w*3 (negative rowSz sails through the bounds
    // check) and in w*h (negative-size luma allocation). Malformed
    // headers must hit the require path, never an ArrayIndexOutOfBounds.
    val rowSzL = (w.toLong * 3 + 3) & ~3L
    require(w.toLong * h <= Int.MaxValue,
      s"pixel count ${w.toLong * h} exceeds the supported maximum")
    require(off >= 54 && off.toLong + rowSzL * h <= payload.length,
      s"pixel array (offset $off, ${rowSzL * h} bytes) overruns " +
        s"the ${payload.length}-byte payload")
    val rowSz = rowSzL.toInt
    val luma = new Array[Int](w * h)
    var r = 0
    while (r < h) {
      val src = if (topDown) r else h - 1 - r
      val base = off + src * rowSz
      var c = 0
      while (c < w) {
        val o = base + 3 * c
        luma(r * w + c) = ((payload(o) & 0xFF) + (payload(o + 1) & 0xFF) +
          (payload(o + 2) & 0xFF)) / 3
        c += 1
      }
      r += 1
    }
    BmpImage(w, h, luma)
  }
}
