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

  test("video frame sampling is an explicit stub") {
    intercept[UnsupportedOperationException] {
      Multimodal.FakeCodec.sampleFrames(Array[Byte](1, 2, 3), 1000)
    }
  }
}
