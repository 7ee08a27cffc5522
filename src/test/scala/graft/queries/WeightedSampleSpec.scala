package graft.queries

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** q_sample_weighted beyond the oracle hash: the priority-sampling
  * scheme itself (Duffield–Lund–Thorup) recomputed from scratch on
  * sf0.001 — md5-derived uniforms, exact floor-division priorities,
  * top-K selection with doc_id tiebreak — plus the estimator contract:
  * est_tokens = max(w, τ) ≥ w always, and τ = 0 (est = w exactly) when
  * the corpus fits inside the sample. */
class WeightedSampleSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 100
  private val U = 1048576L

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def uTicks(docId: Long): Long =
    java.lang.Long.parseLong(md5hex(s"sample|$docId").take(15), 16) % U + 1

  test("sf0.001 sample equals a from-scratch recomputation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .filter { case (_, t) => t != null && t.trim.nonEmpty }
      .map { case (id, t) => (id, t.trim.split("\\s+").length.toLong) }
    val pr = docs.map { case (id, w) =>
      (id, w, w * (U * 1000000L) / uTicks(id))
    }.sortBy { case (id, _, p) => (-p, id) }
    val top1 = pr.take(K + 1)
    val tau = if (top1.size > K) top1.map(_._3).min else 0L
    val want = top1.take(K).zipWithIndex.map { case ((id, w, p), i) =>
      (i + 1, id, w, p, math.floor(
        math.max(w * (U * 1000000L), tau).toDouble / (U * 1000000L).toDouble
          * 10000 + 0.5) / 10000)
    }
    val got = graft.SparkEntry.queries("q_sample_weighted")(spark, sf0001)
      .select($"rank", $"doc_id", $"tok_count", $"pr_ticks", $"est_tokens")
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.size == K)
  }

  test("the estimator never reports below the true weight") {
    val rows = graft.SparkEntry.queries("q_sample_weighted")(spark, sf0001)
      .select($"tok_count", $"est_tokens").as[(Long, Double)].collect()
    rows.foreach { case (w, est) =>
      assert(est >= w.toDouble, s"est $est < weight $w")
    }
    assert(rows.nonEmpty)
  }

  test("per-stratum sample equals a from-scratch per-language recomputation") {
    val gk = 20
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)]
      .collect().toSeq
      .filter { case (_, _, t) => t != null && t.trim.nonEmpty }
      .map { case (id, l, t) => (id, l, t.trim.split("\\s+").length.toLong) }
    val want = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val pr = ds.map { case (id, _, w) =>
        (id, w, w * (U * 1000000L) / uTicks(id))
      }.sortBy { case (id, _, p) => (-p, id) }
      val top1 = pr.take(gk + 1)
      val tau = if (top1.size > gk) top1.map(_._3).min else 0L
      top1.take(gk).zipWithIndex.map { case ((id, w, p), i) =>
        (lang, i + 1, id, w, p, math.floor(
          math.max(w * (U * 1000000L), tau).toDouble
            / (U * 1000000L).toDouble * 10000 + 0.5) / 10000)
      }
    }.sortBy { case (l, r, _, _, _, _) => (l, r) }
    val got = graft.SparkEntry.queries("q_sample_weighted_group")(
      spark, sf0001)
      .select($"lang", $"rank", $"doc_id", $"tok_count", $"pr_ticks",
        $"est_tokens")
      .as[(String, Int, Long, Long, Long, Double)].collect().toSeq
    assert(got === want)
    // every stratum is filled to min(K, stratum size) — the balance
    // property the global sampler cannot give
    val bySize = docs.groupBy(_._2).view.mapValues(_.size)
    got.groupBy(_._1).foreach { case (l, rows) =>
      assert(rows.size == math.min(gk, bySize(l)), s"stratum $l")
    }
  }

  test("corpus smaller than K: everything sampled, τ = 0, est = weight") {
    val dir = Files.createTempDirectory("wsample_small").toString
    (1 to 7).map(i => (i.toLong, (1 to i * 3).map(j => s"t$j").mkString(" "),
        "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_sample_weighted")(spark, dir)
      .select($"rank", $"tok_count", $"est_tokens")
      .as[(Int, Long, Double)].collect().toSeq
    assert(got.size == 7)
    assert(got.map(_._1) == (1 to 7))
    got.foreach { case (_, w, est) => assert(est == w.toDouble) }
  }
}
