package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** Real embedding tables contain failed-embedding-job rows — NULL
  * embeddings and all-zero vectors — and the driver testdata contains
  * none, so nothing in the oracle gate pins how the semantic dedup
  * family behaves on them. The contract (semDedupGuard, mirrored in
  * the oracle WHERE clauses): degenerate vectors are EXCLUDED — a null
  * embedding has no direction and a zero vector's cosine is 0/0 NaN,
  * whose cross-engine ordering is undefined — while real duplicates
  * around them still resolve. */
class NullVecSpec extends SparkTestBase {
  import spark.implicits._

  // A ⊥ B ⊥ C by construction, so cross-pairs score cosine 0 < tau
  private def vecA = Array.tabulate(64)(i => if (i % 2 == 0) 1f else 0f)
  private def vecB = Array.tabulate(64)(i => if (i % 2 == 1) 1f else 0f)
  private def vecC = Array.tabulate(64)(i =>
    if (i % 4 == 0) 1f else if (i % 4 == 2) -1f else 0f)

  lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("nullvec_fixture").toString
    Seq(
      (0L, vecA, 1),
      (1L, vecA, 1),                        // exact dup of 0
      (2L, null.asInstanceOf[Array[Float]], 0), // failed embedding
      (3L, Array.fill(64)(0f), 0),          // zero vector
      (4L, vecB, 2),
      (300L, vecA, 1),                      // increment-side dup of 0
      (301L, vecC, 3))                      // increment-side original
      .toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q_semdedup excludes degenerate vectors and still resolves the " +
      "real duplicates") {
    val rows = graft.SparkEntry.queries("q_semdedup")(spark, fixtureDir)
      .select($"vec_id", $"is_dup", $"dup_of").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("is_dup"), Option(r.getAs[java.lang.Long]("dup_of"))
          .map(_.longValue))).toMap
    assert(rows.keySet === Set(0L, 1L, 4L, 300L, 301L)) // 2, 3 excluded
    assert(rows(1L) === (1, Some(0L)))   // exact dup, blamed on 0
    assert(rows(300L) === (1, Some(0L))) // ties break to the smallest id
    assert(rows(0L)._1 === 0)
    assert(rows(4L)._1 === 0)
    assert(rows(301L)._1 === 0)
  }

  test("q_semdedup_incremental admits only the non-duplicate arrival") {
    val got = graft.SparkEntry.queries("q_semdedup_incremental")(
        spark, fixtureDir)
      .select($"vec_id").as[Long].collect().toSet
    assert(got === Set(301L)) // 300 duplicates history vec 0; 301 is new
  }

  test("the ANN family never crashes on degenerate vectors") {
    Seq("q_knn_brute", "q_ann_lsh", "q_ann_lsh_sql", "q_ann_ivf",
      "q_dedup_embedding").foreach { q =>
      val n = graft.SparkEntry.queries(q)(spark, fixtureDir).count()
      assert(n >= 0, s"$q failed")
    }
  }
}
