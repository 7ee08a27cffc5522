package graft.queries

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** q_doc_cms beyond the oracle hash: the count-min guarantee (estimates
  * NEVER underestimate), and a from-scratch JVM recomputation of the
  * whole sketch — base hash, affine rows, counter sums, min-estimate —
  * on both the testdata corpus and a collision-heavy fixture whose
  * vocabulary exceeds the sketch width (so the sketch is actually
  * saturated, not trivially exact). */
class CmsSpec extends SparkTestBase {
  import spark.implicits._

  private val P = DedupQueries.MersenneP
  private val consts = DedupQueries.affineConsts.take(TextQueries.CmsDepth)
  private val W = TextQueries.CmsWidth

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def baseHash(t: String): Long =
    java.lang.Long.parseLong(md5hex(t).take(15), 16) % P

  /** Plain-Scala CMS over token counts; returns top-20 (token, exact,
    * est) by (count desc, token). */
  private def recompute(texts: Seq[String])
      : Seq[(String, Long, Long)] = {
    val counts = texts.filter(t => t != null && t.trim.nonEmpty)
      .flatMap(_.trim.toLowerCase.split("\\s+"))
      .groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val cms = Array.fill(consts.size, W)(0L)
    counts.foreach { case (t, c) =>
      val h = baseHash(t)
      consts.zipWithIndex.foreach { case ((a, b), i) =>
        cms(i)(((h * a + b) % P % W).toInt) += c
      }
    }
    counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
      .map { case (t, c) =>
        val h = baseHash(t)
        val est = consts.zipWithIndex.map { case ((a, b), i) =>
          cms(i)(((h * a + b) % P % W).toInt) }.min
        (t, c, est)
      }
  }

  private def run(dir: String) =
    graft.SparkEntry.queries("q_doc_cms")(spark, dir)
      .select($"token", $"exact_freq", $"est_freq")
      .as[(String, Long, Long)].collect().toSeq

  test("sf0.001 report equals a from-scratch JVM sketch") {
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"text").as[String].collect().toSeq
    assert(run(sf0001) === recompute(texts))
  }

  test("the count-min guarantee: estimates never underestimate") {
    run(sf0001).foreach { case (t, c, est) =>
      assert(est >= c, s"$t: est $est < exact $c")
    }
  }

  test("sketches MERGE by element-wise addition: sketch(A ∪ B) = " +
      "sketch(A) + sketch(B)") {
    // the property that makes the sketch distributable (partial
    // aggregation) and streamable (state updates) — checked on the
    // actual counter tables, split by doc_id parity
    import org.apache.spark.sql.functions.{col => c}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def counters(df: org.apache.spark.sql.DataFrame) =
      TextQueries.cmsCounters(df)
        .as[(Int, Long, Long)].collect()
        .map { case (i, b, n) => (i, b) -> n }.toMap
    val whole = counters(docs)
    val even = counters(docs.filter(c("doc_id") % 2 === 0))
    val odd = counters(docs.filter(c("doc_id") % 2 =!= 0))
    val merged = (even.keySet ++ odd.keySet).map { k =>
      k -> (even.getOrElse(k, 0L) + odd.getOrElse(k, 0L))
    }.toMap
    assert(merged === whole)
    assert(whole.nonEmpty)
  }

  test("a vocabulary wider than the sketch saturates it and the " +
      "estimates still match the recomputation") {
    // 5000 distinct rare tokens + hot tokens: every counter row holds
    // ~5 colliding tokens, so overestimates are live, not zero
    val dir = Files.createTempDirectory("cms_fixture").toString
    val texts = (0 until 100).map { d =>
      val rare = (0 until 50).map(j => s"rare_${d}_$j").mkString(" ")
      s"hot alpha beta $rare"
    }
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val got = run(dir)
    assert(got === recompute(texts))
    got.foreach { case (t, c, est) => assert(est >= c) }
    // the three hot tokens dominate the top-20
    assert(got.take(3).map(_._1).toSet == Set("hot", "alpha", "beta"))
  }
}
