package graft.queries

import graft.SparkTestBase

/** Recall checks for the approximate similarity paths against the exact
  * brute-force baseline. Random synthetic embeddings have weak neighbor
  * structure, so floors are deliberately loose; the point is that the
  * index paths return *valid* scored pairs and a non-trivial fraction of
  * the true top-k. */
class AnnSpec extends SparkTestBase {

  private def topk(name: String): Map[(Long, Long), Double] =
    SimilarityQueries.queries(name)(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap

  lazy val brute: Map[(Long, Long), Double] = topk("q_knn_brute")

  private def check(name: String, floor: Double): Unit = {
    val approx = topk(name)
    assert(approx.nonEmpty)
    // scores must agree exactly wherever both paths scored a pair
    approx.keySet.intersect(brute.keySet)
      .foreach(k => assert(approx(k) === brute(k)))
    val recall = brute.keySet.count(approx.contains).toDouble / brute.size
    assert(recall >= floor, s"$name recall $recall < $floor")
  }

  test("IVF top-5 recalls a non-trivial fraction of brute-force top-5") {
    check("q_ann_ivf", 0.15)
  }

  test("LSH top-5 recalls a non-trivial fraction of brute-force top-5") {
    check("q_ann_lsh", 0.15)
  }

  test("LSH sql-oracle twin recalls a non-trivial fraction of brute top-5") {
    check("q_ann_lsh_sql", 0.15)
  }
}
