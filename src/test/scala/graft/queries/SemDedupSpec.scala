package graft.queries

import graft.SparkTestBase

/** Pins q_semdedup against a from-scratch JVM recomputation of the whole
  * pipeline (md5-parity centroids, argmax cell, within-cell pairing,
  * 4-dp threshold, blame window) on the sf0.001 corpus — the same
  * derivation the DuckDB oracle replays, implemented a third time here
  * so a regression in either engine's path has two independent witnesses.
  * Also pins the capPerKey contract: the cap bounds pair WORK, never the
  * one-row-per-vector output, and can only shrink the dup set. */
class SemDedupSpec extends SparkTestBase {

  private case class Out(vecId: Long, cell: Int, isDup: Int,
                         dupOf: Option[Long], dupCos: Option[Double])

  private def run(): Seq[Out] =
    SimilarityQueries.queries("q_semdedup")(spark, sf0001)
      .collect().toSeq.map { r =>
        Out(r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
          r.getAs[Int]("is_dup"),
          Option(r.getAs[java.lang.Long]("dup_of")).map(_.longValue),
          Option(r.getAs[java.lang.Double]("dup_cos")).map(_.doubleValue))
      }

  private def round4(x: Double): Double =
    math.floor(x * 10000 + 0.5) / 10000

  /** Independent reimplementation (no graft helpers on purpose). */
  private def expected(): Seq[Out] = {
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(c: Int, p: Int): Double = {
      val hex = md.digest(s"$c|$p".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0 else -1.0
    }
    val cents = Array.tabulate(16, 64)(sign)
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    def cellOf(v: Array[Double]): Int = {
      val scores = cents.map(cv =>
        (0 until 64).map(p => cv(p) * v(p)).sum / (norm(v) * 8.0))
      scores.indexOf(scores.max) // first max = smallest cell
    }
    val cells = rows.map { case (id, v) => (id, v, cellOf(v)) }
    def cos(a: Array[Double], b: Array[Double]): Double =
      round4((0 until 64).map(i => a(i) * b(i)).sum / (norm(a) * norm(b)))
    cells.map { case (bId, bv, bCell) =>
      val edges = cells
        .filter { case (aId, _, aCell) => aId < bId && aCell == bCell }
        .map { case (aId, av, _) => (aId, cos(av, bv)) }
        .filter(_._2 >= 0.3)
      // best cosine wins, ties to the smallest earlier id
      val blame = edges.sortBy { case (aId, c) => (-c, aId) }.headOption
      Out(bId, bCell, if (blame.isDefined) 1 else 0,
        blame.map(_._1), blame.map(_._2))
    }.toSeq
  }

  test("q_semdedup matches the from-scratch recomputation row for row") {
    val got = run().sortBy(_.vecId)
    val want = expected().sortBy(_.vecId)
    assert(got.size === want.size)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
    // the corpus must exercise both branches for the pin to mean anything
    assert(got.count(_.isDup == 1) > 0)
    assert(got.count(_.isDup == 0) > 0)
  }

  test("bucket cap bounds pair work, not output: every vector still " +
      "emits one row and the dup set only shrinks") {
    val full = run()
    spark.conf.set("spark.graft.dedup.maxBucket", "10")
    try {
      val capped = run()
      assert(capped.map(_.vecId).sorted === full.map(_.vecId).sorted)
      val fullDups = full.filter(_.isDup == 1).map(_.vecId).toSet
      capped.filter(_.isDup == 1)
        .foreach(c => assert(fullDups.contains(c.vecId)))
      assert(capped.count(_.isDup == 1) < fullDups.size)
    } finally spark.conf.unset("spark.graft.dedup.maxBucket")
  }
}
