package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The hostile-band-skew guard: a bucket whose membership exceeds
  * `spark.graft.dedup.maxBucket` must be truncated to its cap's
  * min-doc_id members BEFORE the member-list collect (bounded memory,
  * bounded pair explosion), with the drop surfaced as an observed
  * metric — and a cap above every bucket size must change nothing. */
class BucketCapSpec extends SparkTestBase {
  import spark.implicits._

  private def withCap[A](cap: Int)(body: => A): A =
    try { spark.conf.set("spark.graft.dedup.maxBucket", cap.toString); body }
    finally spark.conf.unset("spark.graft.dedup.maxBucket")

  // one hot bucket: 40 docs all sharing (band_idx=0, band_val=7)
  private def hotBanded = (1L to 40L).toDF("doc_id")
    .select($"doc_id", lit(0).as("band_idx"), lit(7L).as("band_val"))

  test("hot bucket is truncated to the cap's min-doc_id members") {
    withCap(10) {
      val pairs = DedupQueries.bucketPairs(hotBanded, $"band_idx", $"band_val")
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // exactly C(10,2) pairs, all drawn from doc_ids 1..10
      assert(got.size == 45)
      assert(got.forall { case (a, b) => a < b && b <= 10L })
      val m = pairs.queryExecution.observedMetrics("hot_buckets_bucket")
      assert(m.getAs[Number]("dropped_members").longValue == 30L)
      assert(m.getAs[Number]("max_bucket").longValue == 40L)
    }
  }

  test("cap above the bucket size changes nothing and observes zero drops") {
    withCap(1000) {
      val pairs = DedupQueries.bucketPairs(hotBanded, $"band_idx", $"band_val")
      assert(pairs.count() == 40L * 39 / 2)
      assert(pairs.queryExecution.observedMetrics("hot_buckets_bucket")
        .getAs[Number]("dropped_members").longValue == 0L)
    }
  }

  test("failOnCapExceeded turns a cap engagement into a loud error (the Verify tripwire)") {
    // the capped queries carry exact oracles: under Verify's flag a hot
    // bucket must FAIL with a diagnostic naming the device, never be
    // silently truncated into an unexplained hash mismatch
    withCap(10) {
      spark.conf.set("spark.graft.dedup.failOnCapExceeded", "true")
      try {
        val e = intercept[Exception] {
          DedupQueries.bucketPairs(hotBanded, $"band_idx", $"band_val").count()
        }
        def messages(t: Throwable): Seq[String] =
          if (t == null) Nil
          else String.valueOf(t.getMessage) +: messages(t.getCause)
        assert(messages(e).exists(_.contains("bucket cap engaged in 'bucket'")),
          s"unexpected error chain: ${messages(e).mkString(" | ")}")
        // a corpus under the cap must still run clean with the flag on
        val under = (1L to 5L).toDF("doc_id")
          .select($"doc_id", lit(0).as("band_idx"), lit(7L).as("band_val"))
        assert(DedupQueries.bucketPairs(under, $"band_idx", $"band_val")
          .count() == 10L)
      } finally spark.conf.unset("spark.graft.dedup.failOnCapExceeded")
    }
  }

  test("a near-identical boilerplate corpus stays bounded through the full pipeline") {
    // defeats collapseExact (every text unique) and concentrates LSH
    // bands (95% shared shingles) — the corpus shape the cap exists for
    val docs = (1L to 60L)
      .map(i => (i, ("common boilerplate header text repeated many times " * 4)
        + s"unique trailer $i"))
      .toDF("doc_id", "text")
    withCap(8) {
      val out = SparkEntryTestHook.minhashPairsFor(docs)
      val rows = out.collect()
      // each bucket keeps only ITS 8 smallest doc_ids, so distinct pairs
      // are bounded by C(8,2) per band — far below C(60,2)=1770 — and the
      // cap must report having actually dropped members
      assert(rows.nonEmpty && rows.length <= 8 * 7 / 2 * 8)
      assert(out.queryExecution.observedMetrics("hot_buckets_bucket")
        .getAs[Number]("dropped_members").longValue > 0L)
    }
  }
}

/** Test-only access to the private pipeline pieces. */
private[queries] object SparkEntryTestHook {
  def minhashPairsFor(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    DedupQueries.minhashLshPairsForTest(docs)
}
