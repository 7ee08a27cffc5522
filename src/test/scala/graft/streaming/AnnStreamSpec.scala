package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** The streaming ANN serving face ([[DocStream.annSearch]]) must agree
  * with the batch index row for row when the stream replays the batch
  * query's probe set: q_ann_ivf's probes (vec_id < 10) arrive as two
  * mtime-ordered micro-batches, the corpus index and the TRAINED
  * centroids are staged exactly as production stages them (the
  * centroids through a disk [[graft.sources.Artifacts]] round-trip),
  * and the served (query, rank, neighbor, cosine) rows must equal the
  * batch pipeline's — which the DuckDB oracle hash-matches — while the
  * face itself keeps ZERO state rows. */
class AnnStreamSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val trainedCents: Seq[(Int, Seq[Double])] = {
    import graft.queries.SimilarityQueries
    SimilarityQueries.ivfCentroids(
      SimilarityQueries.semDedupGuard(
        Tables.table(spark, sf0001, "embeddings")
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))),
      k = 16, iters = 2)
  }

  test("streamed top-5 equals the batch q_ann_ivf ranking on the " +
      "replayed probe set, under DISK-staged centroids, with zero state") {
    val artDir = Files.createTempDirectory("ann_artifacts").toString
    graft.sources.Artifacts.writeCentroids(trainedCents, spark, artDir)
    val staged = graft.sources.Artifacts.readCentroids(spark, artDir)
    assert(staged === trainedCents) // the handoff is lossless

    val dir = Files.createTempDirectory("vecs_stream_ann")
    val vecs = Tables.table(spark, sf0001, "embeddings")
    // the batch query's probe set, replayed as TWO micro-batches
    stageFile(vecs.filter($"vec_id" < 5), dir, "b0.parquet",
      1700000000000L)
    stageFile(vecs.filter($"vec_id" >= 5 && $"vec_id" < 10),
      dir, "b1.parquet", 1700000100000L)

    val index = DocStream.prepareAnnIndex(vecs, staged, assignTicks = true)
    try {
      val out = DocStream.annSearch(spark,
        DocStream.readEmbeddings(spark, dir.toString), index, staged,
        assignTicks = true).toDF()
      val q = EventStream.runToMemory(out, "ann_serve", OutputMode.Append())
      q.processAllAvailable()
      val stateRows = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsTotal).foldLeft(0L)(math.max)
      q.stop()
      assert(stateRows === 0L, "serving face must keep no state")

      val got = spark.table("ann_serve")
        .select($"query_id", $"rank", $"neighbor_id", $"cosine")
        .as[(Long, Int, Long, Double)].collect().toSet
      val want = graft.SparkEntry.queries("q_ann_ivf")(spark, sf0001)
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(got === want)
      // non-vacuous: every probe served a full top-5
      assert(got.size === 50)
      assert(got.map(_._1).size === 10)
      assert(got.groupBy(_._1).forall(_._2.map(_._2) === Set(1, 2, 3, 4, 5)))
    } finally index.unpersist()
  }

  test("a probe that is not a corpus member is still served (no " +
      "self-exclusion dependency)") {
    val dir = Files.createTempDirectory("vecs_stream_ann_ext")
    val vecs = Tables.table(spark, sf0001, "embeddings")
    // re-key probe 0 far outside the corpus id space
    stageFile(vecs.filter($"vec_id" === 0)
        .withColumn("vec_id", lit(100000L)),
      dir, "b0.parquet", 1700000000000L)
    val index = DocStream.prepareAnnIndex(vecs, trainedCents,
      assignTicks = true)
    try {
      val out = DocStream.annSearch(spark,
        DocStream.readEmbeddings(spark, dir.toString), index, trainedCents,
        assignTicks = true).toDF()
      val q = EventStream.runToMemory(out, "ann_serve_ext",
        OutputMode.Append())
      q.processAllAvailable(); q.stop()
      val got = spark.table("ann_serve_ext")
        .select($"query_id", $"rank", $"neighbor_id", $"cosine")
        .as[(Long, Int, Long, Double)].collect()
      assert(got.length === 5)
      assert(got.forall(_._1 == 100000L))
      // identical embedding to corpus vec 0, which is NOT excluded for
      // a foreign query id — it must surface as the top neighbor
      assert(got.find(_._2 == 1).map(_._3).contains(0L))
    } finally index.unpersist()
  }

  test("k = 0 is a valid 'no results' request, not a crash") {
    // the bounded-heap serve must preserve the old full-sort form's
    // take(0) semantics: zero hits per probe, no exception in the
    // flatMapGroupsWithState task
    val dir = Files.createTempDirectory("vecs_stream_ann_k0")
    val vecs = Tables.table(spark, sf0001, "embeddings")
    stageFile(vecs.filter($"vec_id" < 3), dir, "b0.parquet",
      1700000000000L)
    val index = DocStream.prepareAnnIndex(vecs, trainedCents,
      assignTicks = true)
    try {
      val out = DocStream.annSearch(spark,
        DocStream.readEmbeddings(spark, dir.toString), index, trainedCents,
        k = 0, assignTicks = true).toDF()
      val q = EventStream.runToMemory(out, "ann_serve_k0",
        OutputMode.Append())
      q.processAllAvailable(); q.stop()
      assert(spark.table("ann_serve_k0").count() === 0L)
    } finally index.unpersist()
  }
}
