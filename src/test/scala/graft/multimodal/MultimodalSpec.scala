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

  test("q_media_phash_dedup: ordered pairs within threshold; exact-dup " +
      "members all pair at hamming 0") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q_media_phash_dedup")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (a, b, h) =>
      assert(a < b); assert(h >= 0 && h <= 6)
    }
    val got = out.map { case (a, b, h) => (a, b) -> h }.toMap
    // byte-identical payloads (the md5-collapse groups) must all pair
    // with hamming 0 — the fan-out's within-group contract
    val groups = graft.Tables.table(spark, sf0001, "documents")
      .filter($"text".isNotNull && org.apache.spark.sql.functions
        .length($"text") > 0)
      .groupBy(org.apache.spark.sql.functions.md5($"text"))
      .agg(org.apache.spark.sql.functions.collect_list($"doc_id").as("ids"))
      .as[(String, Seq[Long])].collect()
    val withinPairs = groups.flatMap { case (_, ids) =>
      val s = ids.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }
    assert(withinPairs.nonEmpty) // the corpus does contain exact dups
    withinPairs.foreach { p =>
      assert(got.get(p).contains(0L), s"missing within-group pair $p")
    }
  }

  test("video frame sampling is an explicit stub") {
    intercept[UnsupportedOperationException] {
      Multimodal.FakeCodec.sampleFrames(Array[Byte](1, 2, 3), 1000)
    }
  }
}
