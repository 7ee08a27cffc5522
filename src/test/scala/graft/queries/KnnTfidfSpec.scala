package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Sparse tf-idf retrieval (q_knn_tfidf).
  *
  * The DuckDB oracle replays the tick arithmetic; this spec adds what the
  * oracle cannot: a from-scratch JVM recomputation of exact tf-idf cosine
  * (independent tokenization and scoring paths), the self-retrieval
  * invariant, and — on a purpose-built corpus where the champion cap
  * actually engages (sf0.001 has fewer docs than ChampR, so the cap is
  * inert there) — the impact-ordered truncation semantics. */
class KnnTfidfSpec extends SparkTestBase {

  private lazy val result =
    SparkEntry.queries("q_knn_tfidf")(spark, sf0001).collect()

  test("every probe retrieves itself at rank 1 with cosine exactly 1") {
    val byProbe = result.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.size === 10)
    byProbe.foreach { case (p, rows) =>
      val r1 = rows.find(_.getAs[Int]("rank") == 1).get
      assert(r1.getAs[Long]("doc_id") === p, s"probe $p rank-1 not self")
      assert(r1.getAs[Long]("score6") === 1000000L)
    }
  }

  test("scores are non-increasing within each probe's ranking") {
    result.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Long]("score6"))
      assert(ordered.sliding(2).forall(p => p.head >= p.last))
    }
  }

  test("top-10 matches a from-scratch JVM tf-idf cosine recomputation") {
    // independent path: Scala string ops, Maps and sorts — nothing shared
    // with the DataFrame implementation. ChampR exceeds the corpus size
    // at sf0.001, so the truncation-free exact cosine is the right twin.
    val docs = graft.Tables.table(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
      .filter { case (_, t) => t.replaceAll("^ +| +$", "").nonEmpty }
    val toks = docs.map { case (id, t) =>
      (id, t.replaceAll("^ +| +$", "").toLowerCase.split("\\s+").toSeq)
    }.toMap
    val n = toks.size
    val tf = toks.map { case (id, ts) =>
      (id, ts.groupBy(identity).map { case (t, o) => (t, o.size.toLong) }) }
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, o) => (t, o.size.toLong) }
    val w = tf.map { case (id, m) =>
      (id, m.map { case (t, c) =>
        (t, math.floor(c * ((n - df(t) + 0.5) / (df(t) + 0.5)) * 100 + 0.5)
          .toLong)
      }.filter(_._2 > 0L))
    }.filter(_._2.nonEmpty)
    val norm = w.map { case (id, m) => (id, m.values.map(x => x * x).sum) }
    val expected = w.keys.filter(_ < 10).toSeq.sorted.flatMap { p =>
      val pw = w(p)
      val cands = w.toSeq.flatMap { case (d, m) =>
        val dot = pw.collect { case (t, x) if m.contains(t) => x * m(t) }.sum
        if (dot == 0L) None
        else Some((d, math.floor(dot.toDouble /
          (math.sqrt(norm(p).toDouble) * math.sqrt(norm(d).toDouble))
          * 1e6 + 0.5).toLong))
      }
      cands.sortBy { case (d, s) => (-s, d) }.take(10).zipWithIndex
        .map { case ((d, s), i) => (p, i + 1, d, s) }
    }
    val got = result.map(r => (r.getAs[Long]("probe_id"),
      r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("score6"))).toSeq
    assert(got === expected)
  }

  test("champion-list truncation bounds candidate generation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("knn_champ")
    try {
      // one shared term; impact order is tf order. With champR = 2 only
      // the two highest-tf docs survive the posting list — the probe can
      // no longer retrieve itself or the tf-1 doc through term "x".
      Seq((0L, "x"), (100L, "x x x x"), (101L, "x x x"), (102L, "x"))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      spark.conf.set("spark.graft.knn.champR", "2")
      val rows = try {
        SparkEntry.queries("q_knn_tfidf")(spark, dir.toString).collect()
      } finally spark.conf.unset("spark.graft.knn.champR")
      val got = rows.map(r => (r.getAs[Long]("probe_id"),
        r.getAs[Int]("rank"), r.getAs[Long]("doc_id")))
      // tf ties (docs 0 and 102) break toward the smaller doc_id, so the
      // champion list is {100, 101} and ONLY those two are retrievable
      assert(got.toSeq === Seq((0L, 1, 100L), (0L, 2, 101L)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("plan: consumers read the checkpointed postings, not the lineage") {
    val p = SparkEntry.queries("q_knn_tfidf")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the weighted postings are localCheckpoint'ed (four differently-
    // pruned consumers — probes, champion lists, two norm joins — defeat
    // exchange reuse, so without the checkpoint the token explode and
    // the tf/df aggregations execute once per consumer; measured 25.2s
    // -> ~7s on the hostile corpus at 8x). The final plan must therefore
    // contain NO trace of the build lineage: every consumer reads the
    // checkpointed RDD, and the 1-row n_docs attach ran exactly once,
    // inside the checkpoint.
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"postings lineage leaked past the checkpoint:\n$p")
    assert(p.contains("ExistingRDD"), p)
  }
}
