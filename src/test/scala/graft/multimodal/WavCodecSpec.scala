package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The real decoder's honesty checks: [[WavCodec]] must agree with TWO
  * independent implementations of the WAV format — the committed fixture
  * written by Python's stdlib `wave` module, and the JDK's own
  * `javax.sound.sampled` codec in both directions — plus the chunk-scan
  * robustness cases a spec-conformant parser owes (chunk order, unknown
  * chunks, odd-size padding) and loud failure on malformed payloads. */
class WavCodecSpec extends AnyFunSuite {

  /** The deterministic fixture pattern pcm16_mono_8k.wav was generated
    * from (src/test/resources/fixtures, written by Python's independent
    * `wave` writer): sample i = ((i·37) mod 256 − 128) · 256. */
  private def fixtureSamples: Array[Int] =
    Array.tabulate(1000)(i => ((i * 37) % 256 - 128) * 256)

  private def fixtureBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/fixtures/pcm16_mono_8k.wav")
    require(in != null, "fixture /fixtures/pcm16_mono_8k.wav missing")
    try in.readAllBytes() finally in.close()
  }

  test("decodes the committed fixture (independent Python-written WAV) " +
      "sample-exact") {
    val a = WavCodec.decode(fixtureBytes)
    assert(a.sampleRate === 8000)
    assert(a.channels === 1)
    assert(a.samples.length === 1000)
    assert(a.samples.sameElements(fixtureSamples))
  }

  test("the JDK's javax.sound codec parses encodePcm16 output back " +
      "sample-exact") {
    val samples = Array.tabulate(300)(i => (math.sin(i * 0.1) * 12345).toInt)
    val bytes = WavCodec.encodePcm16(samples, 8000)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate === 8000f)
    assert(fmt.getChannels === 1)
    assert(fmt.getSampleSizeInBits === 16)
    assert(!fmt.isBigEndian)
    val data = ais.readAllBytes()
    assert(data.length === 2 * samples.length)
    val decoded = Array.tabulate(samples.length) { i =>
      (((data(2 * i) & 0xFF) | ((data(2 * i + 1) & 0xFF) << 8)) << 16) >> 16
    }
    assert(decoded.sameElements(samples))
  }

  test("decodes a WAV written by the JDK's javax.sound codec " +
      "(independent writer #2)") {
    val samples = Array.tabulate(257)(i => ((i * 101) % 65536) - 32768)
    val raw = new Array[Byte](2 * samples.length)
    samples.zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = (s & 0xFF).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      16000f, 16, 1, 2, 16000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val a = WavCodec.decode(out.toByteArray)
    assert(a.sampleRate === 16000)
    assert(a.samples.sameElements(samples))
  }

  test("chunk scan: unknown chunks are skipped, odd sizes padded, " +
      "order-independent") {
    val base = WavCodec.encodePcm16(Array(100, -200, 300), 8000)
    val fmtChunk = java.util.Arrays.copyOfRange(base, 12, 36)
    val dataChunk = java.util.Arrays.copyOfRange(base, 36, base.length)
    // RIFF [LIST(odd size 3 + pad)] [data] [junk] [fmt ] — a conformant
    // parser must find both mandatory chunks through the noise
    val list = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val junk = "junk".getBytes ++ Array[Byte](2, 0, 0, 0, 9, 9)
    val body = list ++ dataChunk ++ junk ++ fmtChunk
    val riff = "RIFF".getBytes ++
      Array[Byte]((body.length + 4).toByte, 0, 0, 0) ++
      "WAVE".getBytes ++ body
    val a = WavCodec.decode(riff)
    assert(a.sampleRate === 8000)
    assert(a.samples.sameElements(Array(100, -200, 300)))
  }

  test("negative samples round-trip (sign extension, little-endian)") {
    val edge = Array(-32768, -1, 0, 1, 32767, -256, 255)
    val a = WavCodec.decode(WavCodec.encodePcm16(edge, 44100))
    assert(a.sampleRate === 44100)
    assert(a.samples.sameElements(edge))
  }

  test("G.711 µ-law expansion agrees with javax.sound on all 256 codes " +
      "(independent decode table)") {
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val ulaw = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1,
      8000f, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(codes), ulaw, 256)
    val pcm = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1,
      2, 8000f, false)
    val out = javax.sound.sampled.AudioSystem
      .getAudioInputStream(pcm, in).readAllBytes()
    (0 until 256).foreach { c =>
      val jdk = (((out(2 * c) & 0xFF) | ((out(2 * c + 1) & 0xFF) << 8))
        << 16) >> 16
      assert(jdk === WavCodec.ulawDecode(c),
        s"µ-law code $c: jdk=$jdk ref=${WavCodec.ulawDecode(c)}")
    }
  }

  test("µ-law round trip: known vectors, the ingest-domain error bound, " +
      "and javax.sound parsing the format-7 container") {
    // the classic vectors: silence encodes to 0xFF and back to 0
    assert(WavCodec.ulawEncode(0) === 0xFF)
    assert(WavCodec.ulawDecode(0xFF) === 0)
    assert(WavCodec.ulawDecode(0x7F) === 0) // negative zero
    // the certified bound over the ingest domain (byte-centered PCM):
    // logarithmic companding — error largest at high magnitude, ≤ 644
    val maxErr = (0 until 256).map { b =>
      val s = (b - 128) * 256
      math.abs(WavCodec.ulawDecode(WavCodec.ulawEncode(s)) - s)
    }.max
    assert(maxErr <= 644, s"quantization error $maxErr exceeds the bound")
    // container round trip through OUR parser...
    val samples = Array.tabulate(333)(i => ((i * 37) % 256 - 128) * 256)
    val payload = WavCodec.encodeUlaw(samples, 8000)
    assert(payload.length === 58 + 333 + 1) // fmt18 + fact + padded data
    val a = WavCodec.decode(payload)
    assert(a.sampleRate === 8000)
    assert(a.samples.sameElements(
      samples.map(s => WavCodec.ulawDecode(WavCodec.ulawEncode(s)))))
    // ...and through the JDK's independent reader: same codes expand to
    // the same linear samples
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    assert(ais.getFormat.getEncoding
      === javax.sound.sampled.AudioFormat.Encoding.ULAW)
    val pcm = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1,
      2, 8000f, false)
    val raw = javax.sound.sampled.AudioSystem
      .getAudioInputStream(pcm, ais).readAllBytes()
    val jdkSamples = Array.tabulate(samples.length) { i =>
      (((raw(2 * i) & 0xFF) | ((raw(2 * i + 1) & 0xFF) << 8)) << 16) >> 16
    }
    assert(jdkSamples.sameElements(a.samples),
      "JDK µ-law expansion diverges from WavCodec.decode on the container")
  }

  test("malformed payloads fail loudly, never decode to garbage") {
    val good = WavCodec.encodePcm16(Array(1, 2, 3), 8000)
    intercept[IllegalArgumentException](WavCodec.decode(Array[Byte](1, 2)))
    intercept[IllegalArgumentException]( // wrong magic
      WavCodec.decode("RIFX".getBytes ++ good.drop(4)))
    intercept[IllegalArgumentException]( // chunk size overruns payload
      WavCodec.decode(good.dropRight(2)))
    val stereo = good.clone(); stereo(22) = 2 // channels field
    intercept[IllegalArgumentException](WavCodec.decode(stereo))
    val pcm8 = good.clone(); pcm8(34) = 8 // bits-per-sample field
    intercept[IllegalArgumentException](WavCodec.decode(pcm8))
  }

  test("duplicate fmt/data chunks and trailing fragments fail loudly " +
      "(quarantine contract covers container-structure abuse too)") {
    val good = WavCodec.encodePcm16(Array(1, 2, 3), 8000)
    val fmtChunk = java.util.Arrays.copyOfRange(good, 12, 36)
    val dataChunk = java.util.Arrays.copyOfRange(good, 36, good.length)
    def riff(body: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ Array[Byte]((body.length + 4).toByte, 0, 0, 0) ++
        "WAVE".getBytes ++ body
    intercept[IllegalArgumentException]( // second fmt (last-wins is silent corruption)
      WavCodec.decode(riff(fmtChunk ++ fmtChunk ++ dataChunk)))
    intercept[IllegalArgumentException]( // second data
      WavCodec.decode(riff(fmtChunk ++ dataChunk ++ dataChunk)))
    intercept[IllegalArgumentException]( // 5 trailing bytes < a chunk header
      WavCodec.decode(riff(fmtChunk ++ dataChunk) ++ Array[Byte](1, 2, 3, 4, 5)))
    // tolerated shape: final odd-sized chunk with the pad byte omitted
    val oddTail = "junk".getBytes ++ Array[Byte](3, 0, 0, 0, 7, 7, 7)
    val a = WavCodec.decode(riff(fmtChunk ++ dataChunk ++ oddTail))
    assert(a.samples.sameElements(Array(1, 2, 3)))
  }
}
