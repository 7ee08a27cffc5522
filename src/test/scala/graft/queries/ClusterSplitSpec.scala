package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Cluster-safe splitting (q_split_cluster_safe).
  *
  * The oracle replays the recursive closure; this spec pins the PROPERTY
  * the operator exists for — no near-dup pair may cross a split — plus a
  * from-scratch union-find recomputation and a transitivity fixture
  * where per-doc hashing would demonstrably leak. */
class ClusterSplitSpec extends SparkTestBase {

  private lazy val assigned =
    SparkEntry.queries("q_split_cluster_safe")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("rep"), r.getAs[String]("split")))).toMap

  private lazy val pairs =
    SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("no near-dup pair crosses a split boundary") {
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(assigned(a)._2 === assigned(b)._2,
        s"pair ($a, $b) split across ${assigned(a)._2}/${assigned(b)._2}")
      assert(assigned(a)._1 === assigned(b)._1)
    }
  }

  test("assignment matches a from-scratch union-find over the " +
      "oracle-backed pair set") {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val docs = graft.Tables.table(spark, sf0001, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    assert(docs.length === assigned.size)
    docs.foreach { d =>
      val rep = find(d)
      val bucket = ((rep % 1000003L) * 31L + 7L) % 100L
      val split = if (bucket < 80) "train"
        else if (bucket < 90) "val" else "test"
      assert(assigned(d) === ((rep, split)), s"doc $d")
    }
  }

  test("transitivity: a chain component inherits ONE split even when " +
      "member-level hashing would scatter it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("csplit")
    try {
      // docs 1-6-9 form a CHAIN (1~6 and 6~9 share 8 of 28 grams,
      // jaccard 0.2857; 1~9 share no token). Their OWN buckets are
      // 38/93/86 — train/test/val — so a per-doc hash split would put a
      // near-dup pair on both sides of eval. Cluster-safe assignment
      // must give all three the rep-1 bucket: train.
      def span(r: Range) = r.map(i => s"t$i").mkString(" ")
      Seq((1L, span(1 to 20)), (6L, span(11 to 30)), (9L, span(21 to 40)))
        .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q_split_cluster_safe")(
        spark, dir.toString).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep"),
          r.getAs[String]("split"))).toSeq
      assert(got === Seq((1L, 1L, "train"), (6L, 1L, "train"),
        (9L, 1L, "train")))
      // and the chain really is a chain: 1~9 must not be a direct pair
      val p = SparkEntry.queries("q_dedup_ngram_jaccard")(
        spark, dir.toString).select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p === Set((1L, 6L), (6L, 9L)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
