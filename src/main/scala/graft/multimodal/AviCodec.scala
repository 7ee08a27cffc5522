package graft.multimodal

/** The VIDEO-side real decoder — the third modality behind the codec
  * seam, composed from the two existing parsers' devices exactly as the
  * r18 verdict predicted: AVI is RIFF (the [[WavCodec]] chunk scan,
  * plus the one RIFF feature WAV never needed — nested LIST containers)
  * and its uncompressed 'DIB ' frames are BMP pixel arrays (the
  * [[BmpCodec]] bottom-up padded-row BGR walk, minus the file header).
  * So `decode` below performs a genuine container parse: RIFF/'AVI '
  * magic, hdrl LIST recursion for the avih main header and the strl
  * stream headers, strf BITMAPINFOHEADER validation, then a movi LIST
  * walk decoding every frame chunk to its top-down luma plane.
  *
  * TWO frame codecs behind the one container walk (the r16 verdict's
  * "compressed-frame video" item): uncompressed 24-bpp BI_RGB '00db'
  * DIB frames (the original face), and MJPEG '00dc' frames — each
  * chunk a complete JPEG image decoded through the JDK's real
  * entropy-decode + IDCT ([[ImageIoCodec.decodeGray]]), the codec real
  * crawl video actually ships. The strf compression fourcc selects
  * which chunk ids are legal; a '..dc' chunk in a BI_RGB stream, a
  * '..db' chunk in an MJPG stream, audio streams, palettes, or any
  * other fourcc fails loudly (the quarantine-column rule, WavCodec
  * scaladoc).
  *
  * Layout per the public Microsoft AVI RIFF specification. The JDK has
  * no AVI codec, so the independent cross-checks differ from the
  * wav/bmp pattern: the committed fixture is written by a separate
  * Python generator (container structure), and each decoded frame is
  * re-wrapped as a standalone BMP and read back through the JDK's
  * javax.imageio (pixel-walk semantics) — see AviCodecSpec. For the
  * MJPEG face the frame decode IS javax.imageio, so independence moves
  * to the container walk: AviMjpegSpec counts the payload's JPEG
  * SOI/EOI marker pairs against the parsed frame count and re-decodes
  * raw chunk slices standalone. */
object AviCodec {

  /** One decoded video: dimensions plus the top-down luma plane of
    * every frame, in stream order. */
  case class AviVideo(width: Int, height: Int, frames: Array[Array[Int]])

  /** The 'MJPG' biCompression fourcc, little-endian. */
  val MjpgFourcc: Int =
    'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Canonical uncompressed 24-bpp grayscale AVI writer: the input
    * bytes fill `width`×`rows` frame grids (one gray pixel per byte,
    * row-major top-down, the tail frame zero-filled), each frame
    * stored as a '00db' DIB chunk — bottom-up rows, 4-byte padding,
    * BGR — inside the spec's RIFF(AVI )/LIST(hdrl)/LIST(movi)
    * skeleton: avih main header, one 'vids'/'DIB ' stream with its
    * strh/strf pair, no index (AVIF_HASINDEX unset, per spec optional).
    * 10 fps nominal timing. */
  def encodeGray24(bytes: Array[Byte], width: Int, rows: Int): Array[Byte] = {
    require(width > 0 && rows > 0, s"bad frame geometry ${width}x$rows")
    val frameLen = width * rows
    val nf = math.max(1, (bytes.length + frameLen - 1) / frameLen)
    val rowSz = (width * 3 + 3) & ~3
    val dibSz = rowSz * rows
    val fps = 10
    val buf = java.nio.ByteBuffer
      .allocate(12 + 8 + 4 + 64 + 8 + 4 + 64 + 48 + 8 + 4 + nf * (8 + dibSz))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def putTag(s: String): Unit = { var i = 0
      while (i < 4) { buf.put(s.charAt(i).toByte); i += 1 } }
    putTag("RIFF"); buf.putInt(buf.capacity - 8); putTag("AVI ")
    // LIST hdrl: 'hdrl' + avih(8+56) + LIST strl(8+4+64+48)
    putTag("LIST"); buf.putInt(4 + 64 + 8 + 4 + 64 + 48); putTag("hdrl")
    putTag("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps) // dwMicroSecPerFrame
    buf.putInt(dibSz * fps) // dwMaxBytesPerSec
    buf.putInt(0) // dwPaddingGranularity
    buf.putInt(0) // dwFlags (no index)
    buf.putInt(nf) // dwTotalFrames
    buf.putInt(0) // dwInitialFrames
    buf.putInt(1) // dwStreams
    buf.putInt(dibSz) // dwSuggestedBufferSize
    buf.putInt(width); buf.putInt(rows)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0) // reserved
    putTag("LIST"); buf.putInt(4 + 64 + 48); putTag("strl")
    putTag("strh"); buf.putInt(56)
    putTag("vids"); putTag("DIB ")
    buf.putInt(0) // dwFlags
    buf.putShort(0); buf.putShort(0) // wPriority, wLanguage
    buf.putInt(0) // dwInitialFrames
    buf.putInt(1); buf.putInt(fps) // dwScale / dwRate = fps
    buf.putInt(0) // dwStart
    buf.putInt(nf) // dwLength
    buf.putInt(dibSz) // dwSuggestedBufferSize
    buf.putInt(-1) // dwQuality (default)
    buf.putInt(0) // dwSampleSize
    buf.putShort(0); buf.putShort(0) // rcFrame
    buf.putShort(width.toShort); buf.putShort(rows.toShort)
    putTag("strf"); buf.putInt(40) // BITMAPINFOHEADER
    buf.putInt(40); buf.putInt(width); buf.putInt(rows)
    buf.putShort(1); buf.putShort(24) // planes, bpp
    buf.putInt(0); buf.putInt(dibSz) // BI_RGB, biSizeImage
    buf.putInt(2835); buf.putInt(2835); buf.putInt(0); buf.putInt(0)
    // LIST movi with one 00db DIB per frame
    putTag("LIST"); buf.putInt(4 + nf * (8 + dibSz)); putTag("movi")
    var f = 0
    while (f < nf) {
      putTag("00db"); buf.putInt(dibSz)
      val base = buf.position()
      var r = 0
      while (r < rows) {
        val rowOff = base + (rows - 1 - r) * rowSz // bottom-up
        var c = 0
        while (c < width) {
          val i = f * frameLen + r * width + c
          val v = if (i < bytes.length) bytes(i) else 0.toByte
          val o = rowOff + 3 * c
          buf.put(o, v); buf.put(o + 1, v); buf.put(o + 2, v)
          c += 1
        }
        r += 1
      }
      buf.position(base + dibSz)
      f += 1
    }
    buf.array()
  }

  /** Canonical MJPEG AVI writer — [[encodeGray24]]'s compressed twin:
    * the same `width`×`rows` gray frame grids (tail frame zero-filled),
    * each frame encoded as a complete JPEG through the JDK's REAL lossy
    * pipeline ([[ImageIoCodec.encodeGrayJpeg]] — DCT + quantization +
    * entropy coding) and stored as a '00dc' chunk, inside the identical
    * RIFF(AVI )/LIST(hdrl)/LIST(movi) skeleton with fccHandler and
    * biCompression 'MJPG'. Frame chunks are variable-sized (RIFF pads
    * odd sizes to even); 10 fps nominal timing. */
  def encodeMjpeg(bytes: Array[Byte], width: Int, rows: Int,
                  quality: Float = 1.0f): Array[Byte] = {
    require(width > 0 && rows > 0, s"bad frame geometry ${width}x$rows")
    val frameLen = width * rows
    val nf = math.max(1, (bytes.length + frameLen - 1) / frameLen)
    val jpegs = (0 until nf).map { f =>
      // copyOfRange zero-fills past the input's end — the tail frame
      val frame = java.util.Arrays.copyOfRange(bytes, f * frameLen,
        (f + 1) * frameLen)
      ImageIoCodec.encodeGrayJpeg(frame, width, quality)
    }
    val maxJpeg = jpegs.map(_.length).max
    val moviBody = jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val fps = 10
    val buf = java.nio.ByteBuffer
      .allocate(12 + 8 + 4 + 64 + 8 + 4 + 64 + 48 + 8 + 4 + moviBody)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def putTag(s: String): Unit = { var i = 0
      while (i < 4) { buf.put(s.charAt(i).toByte); i += 1 } }
    putTag("RIFF"); buf.putInt(buf.capacity - 8); putTag("AVI ")
    putTag("LIST"); buf.putInt(4 + 64 + 8 + 4 + 64 + 48); putTag("hdrl")
    putTag("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps) // dwMicroSecPerFrame
    buf.putInt(maxJpeg * fps) // dwMaxBytesPerSec
    buf.putInt(0) // dwPaddingGranularity
    buf.putInt(0) // dwFlags (no index)
    buf.putInt(nf) // dwTotalFrames
    buf.putInt(0) // dwInitialFrames
    buf.putInt(1) // dwStreams
    buf.putInt(maxJpeg) // dwSuggestedBufferSize
    buf.putInt(width); buf.putInt(rows)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0) // reserved
    putTag("LIST"); buf.putInt(4 + 64 + 48); putTag("strl")
    putTag("strh"); buf.putInt(56)
    putTag("vids"); putTag("MJPG")
    buf.putInt(0) // dwFlags
    buf.putShort(0); buf.putShort(0) // wPriority, wLanguage
    buf.putInt(0) // dwInitialFrames
    buf.putInt(1); buf.putInt(fps) // dwScale / dwRate = fps
    buf.putInt(0) // dwStart
    buf.putInt(nf) // dwLength
    buf.putInt(maxJpeg) // dwSuggestedBufferSize
    buf.putInt(-1) // dwQuality (default)
    buf.putInt(0) // dwSampleSize
    buf.putShort(0); buf.putShort(0) // rcFrame
    buf.putShort(width.toShort); buf.putShort(rows.toShort)
    putTag("strf"); buf.putInt(40) // BITMAPINFOHEADER
    buf.putInt(40); buf.putInt(width); buf.putInt(rows)
    buf.putShort(1); buf.putShort(24) // planes, bpp
    buf.putInt(MjpgFourcc); buf.putInt(maxJpeg) // biCompression, biSizeImage
    buf.putInt(2835); buf.putInt(2835); buf.putInt(0); buf.putInt(0)
    putTag("LIST"); buf.putInt(4 + moviBody); putTag("movi")
    jpegs.foreach { j =>
      putTag("00dc"); buf.putInt(j.length)
      buf.put(j)
      if ((j.length & 1) == 1) buf.put(0.toByte) // RIFF even padding
    }
    buf.array()
  }

  /** Decode an AVI to per-frame top-down luma planes — uncompressed
    * 24-bpp '00db' DIB frames or MJPEG '00dc' JPEG frames, selected by
    * the strf compression fourcc. Fails loudly on anything malformed
    * or out of contract: wrong magics, duplicate/missing headers,
    * non-'vids' streams, unknown compression fourccs, chunk ids that
    * contradict the declared compression, frame chunks that disagree
    * with the declared geometry, trailing fragments. */
  def decode(payload: Array[Byte]): AviVideo = {
    require(payload.length >= 12 && tag(payload, 0) == "RIFF" &&
      tag(payload, 8) == "AVI ", "not a RIFF/AVI payload")
    var w = 0; var h = 0; var bpp = 0; var comp = -1
    var avihSeen = false; var strhSeen = false; var strfSeen = false
    var vids = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]

    // one chunk scan (the WavCodec loop), recursing into LIST bodies
    def scan(from: Int, to: Int, ctx: String): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = tag(payload, pos)
        val sz = le32(payload, pos + 4)
        require(sz >= 0 && pos + 8 + sz <= to,
          s"chunk '$id' size $sz overruns its $ctx container")
        if (id == "LIST") {
          require(sz >= 4, s"LIST too short: $sz")
          val listType = tag(payload, pos + 8)
          // hdrl/strl/movi recurse; unknown lists (INFO, odml) skip
          if (listType == "hdrl" || listType == "strl" ||
              listType == "movi")
            scan(pos + 12, pos + 8 + sz, listType)
        } else if (id == "avih") {
          require(!avihSeen, "duplicate avih header")
          require(sz >= 56, s"avih too short: $sz")
          avihSeen = true
        } else if (id == "strh") {
          require(!strhSeen, "second stream: only one 'vids' supported")
          require(sz >= 48, s"strh too short: $sz")
          vids = tag(payload, pos + 8) == "vids"
          require(vids, s"only 'vids' streams supported, " +
            s"got '${tag(payload, pos + 8)}'")
          strhSeen = true
        } else if (id == "strf") {
          require(strhSeen, "strf before strh")
          require(!strfSeen, "duplicate strf header")
          require(sz >= 40, s"strf too short: $sz")
          w = le32(payload, pos + 12)
          h = le32(payload, pos + 16)
          bpp = le16(payload, pos + 22)
          comp = le32(payload, pos + 24)
          strfSeen = true
        } else if (ctx == "movi" && id.endsWith("db")) {
          require(strfSeen, "frame chunk before the stream format header")
          frames += decodeDib(pos + 8, sz)
        } else if (ctx == "movi" && id.endsWith("dc")) {
          require(strfSeen, "frame chunk before the stream format header")
          frames += decodeMjpegFrame(pos + 8, sz)
        } else if (ctx == "movi") {
          require(false, s"unsupported movi chunk '$id' (only " +
            "uncompressed '..db' DIB or MJPEG '..dc' frames)")
        }
        pos += 8 + sz + (sz & 1) // RIFF pads odd-sized chunks to even
      }
      require(pos == to || pos == to + 1, // WavCodec's tolerated pad shape
        s"trailing ${to - pos} bytes in the $ctx container")
    }

    // an MJPEG frame: the chunk body is a complete JPEG; the JDK's
    // real entropy-decode + IDCT yields the luma plane, which must
    // match the stream header's declared geometry
    def decodeMjpegFrame(off: Int, sz: Int): Array[Int] = {
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      require(comp == MjpgFourcc,
        s"'..dc' compressed frame in a stream declaring compression=$comp")
      val img = ImageIoCodec.decodeGray(
        java.util.Arrays.copyOfRange(payload, off, off + sz))
      require(img.width == w && img.height == h,
        s"frame geometry ${img.width}x${img.height} disagrees with the " +
          s"declared ${w}x$h")
      img.luma
    }

    // the BmpCodec pixel walk over a header-less DIB frame at `off`
    def decodeDib(off: Int, sz: Int): Array[Int] = {
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      require(bpp == 24 && comp == 0,
        s"only uncompressed 24-bpp supported, got bpp=$bpp compression=$comp")
      val rowSzL = (w.toLong * 3 + 3) & ~3L // the BMP Long-overflow lesson
      require(w.toLong * h <= Int.MaxValue,
        s"pixel count ${w.toLong * h} exceeds the supported maximum")
      require(rowSzL * h == sz,
        s"frame chunk size $sz disagrees with the declared " +
          s"${w}x$h geometry (${rowSzL * h})")
      val rowSz = rowSzL.toInt
      val luma = new Array[Int](w * h)
      var r = 0
      while (r < h) {
        val base = off + (h - 1 - r) * rowSz // bottom-up
        var c = 0
        while (c < w) {
          val o = base + 3 * c
          luma(r * w + c) = ((payload(o) & 0xFF) + (payload(o + 1) & 0xFF) +
            (payload(o + 2) & 0xFF)) / 3
          c += 1
        }
        r += 1
      }
      luma
    }

    scan(12, payload.length, "riff")
    require(avihSeen, "no avih header")
    require(strfSeen, "no stream format header")
    require(frames.nonEmpty, "no frame chunks")
    AviVideo(w, h, frames.toArray)
  }
}
