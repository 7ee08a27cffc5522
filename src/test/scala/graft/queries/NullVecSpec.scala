package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** Real embedding tables contain failed-embedding-job rows — NULL
  * embeddings, all-zero vectors, and vectors with SOME null elements —
  * and the driver testdata contains none, so nothing in the oracle
  * gate pins how the semantic dedup family behaves on them. The
  * contract (semDedupGuard, mirrored in the oracle WHERE clauses):
  * degenerate vectors are EXCLUDED — a null embedding has no
  * direction, a zero vector's cosine is 0/0 NaN, and a partial-null
  * vector scores differently per engine (pairwise null-skip vs
  * per-vector norms) — while real duplicates around them still
  * resolve. */
class NullVecSpec extends SparkTestBase {
  import spark.implicits._

  // A ⊥ B ⊥ C by construction, so cross-pairs score cosine 0 < tau
  private def vecA = Array.tabulate(64)(i => if (i % 2 == 0) 1f else 0f)
  private def vecB = Array.tabulate(64)(i => if (i % 2 == 1) 1f else 0f)
  private def vecC = Array.tabulate(64)(i =>
    if (i % 4 == 0) 1f else if (i % 4 == 2) -1f else 0f)
  // vecA with one nulled position: close enough to A that admitting it
  // would create a (cross-engine-divergent) near-dup pair
  private def vecPartial: Array[java.lang.Float] =
    vecA.map(Float.box).updated(0, null.asInstanceOf[java.lang.Float])

  lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("nullvec_fixture").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true)),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.IntegerType)))
    val rows = Seq(
      org.apache.spark.sql.Row(0L, vecA.toSeq, 1),
      org.apache.spark.sql.Row(1L, vecA.toSeq, 1), // exact dup of 0
      org.apache.spark.sql.Row(2L, null, 0),       // failed embedding
      org.apache.spark.sql.Row(3L, Seq.fill(64)(0f), 0), // zero vector
      org.apache.spark.sql.Row(4L, vecB.toSeq, 2),
      org.apache.spark.sql.Row(5L, vecPartial.toSeq, 0), // partial null
      org.apache.spark.sql.Row(300L, vecA.toSeq, 1), // increment dup of 0
      org.apache.spark.sql.Row(301L, vecC.toSeq, 3)) // increment original
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
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
    assert(rows.keySet === Set(0L, 1L, 4L, 300L, 301L)) // 2, 3, 5 excluded
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
      val n = graft.SparkEntry.allQueries(q)(spark, fixtureDir).count()
      assert(n >= 0, s"$q failed")
    }
  }
}
