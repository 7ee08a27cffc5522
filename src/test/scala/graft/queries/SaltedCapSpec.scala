package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The two-phase salted cap (capPerKeySalted — the r11 verdict's
  * q_lsh_tune hostile-funnel fix) must be OUTPUT-IDENTICAL to the
  * single-phase capPerKey on every input: a row in a key's global
  * doc_id-order top-cap has local rank ≤ global rank in its salt slice,
  * so phase 1 never drops a global survivor. These specs pin that
  * equivalence where it matters — a hot bucket with the cap engaged —
  * plus the metric and fail-fast contracts. */
class SaltedCapSpec extends SparkTestBase {
  import spark.implicits._

  private def withCap[A](cap: Int)(body: => A): A =
    try { spark.conf.set("spark.graft.dedup.maxBucket", cap.toString); body }
    finally spark.conf.unset("spark.graft.dedup.maxBucket")

  // two hot buckets (60 + 25 members) and one cold one, ids interleaved
  // so salt slices are non-trivial
  private def banded = ((1L to 60L).map(i => (i, 0, 7L)) ++
    (101L to 125L).map(i => (i, 1, 9L)) ++
    Seq((201L, 2, 11L), (202L, 2, 11L)))
    .toDF("doc_id", "band_idx", "band_val")

  test("salted pairs equal unsalted pairs with the cap engaged") {
    withCap(10) {
      val plain = DedupQueries
        .bucketPairs(banded, $"band_idx", $"band_val")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val salted = DedupQueries
        .bucketPairsSaltedTagged(banded, "salted", $"band_idx", $"band_val")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(salted == plain)
      assert(plain.nonEmpty)
    }
  }

  test("salted pairs equal unsalted pairs with the cap disengaged") {
    withCap(1000) {
      val plain = DedupQueries
        .bucketPairs(banded, $"band_idx", $"band_val")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val salted = DedupQueries
        .bucketPairsSaltedTagged(banded, "salted", $"band_idx", $"band_val")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(salted == plain)
      assert(plain.size == 60L * 59 / 2 + 25L * 24 / 2 + 1)
    }
  }

  test("phase metrics: presalt + canonical drops account for every " +
      "member past the cap") {
    withCap(10) {
      val out = DedupQueries
        .bucketPairsSaltedTagged(banded, "salted", $"band_idx", $"band_val")
      // collect() (not count()) so the metrics come from THIS frame's
      // query execution — count() plans a separate execution whose
      // observed metrics the handle never sees
      out.collect(): Unit
      val pre = out.queryExecution.observedMetrics("hot_buckets_salted_presalt")
      val post = out.queryExecution.observedMetrics("hot_buckets_salted")
      val droppedTotal = pre.getAs[Number]("dropped_members").longValue +
        post.getAs[Number]("dropped_members").longValue
      // 60-member bucket drops 50, 25-member bucket drops 15, cold drops 0
      assert(droppedTotal == 50L + 15L)
      // phase 2 sees at most capSalt * cap rows per bucket
      assert(post.getAs[Number]("max_bucket").longValue <= 16L * 10L)
    }
  }

  test("failOnCapExceeded still fails loudly through the salted path") {
    withCap(10) {
      spark.conf.set("spark.graft.dedup.failOnCapExceeded", "true")
      try {
        val e = intercept[Exception] {
          DedupQueries
            .bucketPairsSaltedTagged(banded, "salted", $"band_idx", $"band_val")
            .count()
        }
        def messages(t: Throwable): Seq[String] =
          if (t == null) Nil
          else String.valueOf(t.getMessage) +: messages(t.getCause)
        assert(messages(e).exists(_.contains("bucket cap engaged")),
          s"unexpected error chain: ${messages(e).mkString(" | ")}")
      } finally spark.conf.unset("spark.graft.dedup.failOnCapExceeded")
    }
  }
}
