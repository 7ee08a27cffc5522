package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** The streaming semantic dedup face must agree with its batch twin
  * when the stream is the replayed increment: every arriving embedding
  * is probed against the STATIC history index only (no within-increment
  * state), so replaying the q_semdedup_incremental increment split
  * through [[DocStream.semanticDedup]] must reproduce the batch
  * survivor set exactly — across micro-batch boundaries, which the
  * two-file mtime-ordered staging forces. */
class SemDedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming semantic dedup equals the batch anti-join on the " +
      "replayed increment, across micro-batches") {
    val dir = Files.createTempDirectory("vecs_stream_inc")
    val vecs = Tables.table(spark, sf0001, "embeddings")
    // the batch query's split: history < 250, increment >= 250; the
    // increment replays as TWO micro-batches
    stageFile(vecs.filter($"vec_id" >= 250 && $"vec_id" < 375),
      dir, "b0.parquet", 1700000000000L)
    stageFile(vecs.filter($"vec_id" >= 375),
      dir, "b1.parquet", 1700000100000L)

    val history = vecs.filter($"vec_id" < 250)
    val out = DocStream.semanticDedup(
      DocStream.readEmbeddings(spark, dir.toString), history)
    val q = EventStream.runToMemory(out, "sem_dedup", OutputMode.Append())
    q.processAllAvailable(); q.stop()

    val got = spark.table("sem_dedup")
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    val want = graft.SparkEntry.queries("q_semdedup_incremental")(
        spark, sf0001)
      .as[(Long, Int)].collect().toSet
    assert(got === want)
    // the split must exercise both outcomes for the pin to bite
    assert(got.nonEmpty)
    assert(got.size < 250)
  }

  // ---- online greedy face ----

  private def round4(x: Double): Double =
    math.floor(x * 10000 + 0.5) / 10000

  /** Exact greedy reference, computed independently: per cell in vec_id
    * order, reject iff an ADMITTED earlier member clears tau (best
    * rounded cosine, insertion order breaks ties to the smallest id).
    * Parameterized on the cell assignment so the corner-quantizer and
    * trained-quantizer replays share one reference. */
  private def greedyRef(cells: Map[Long, Int])
      : Set[(Long, Int, Boolean, Option[Long], Option[Double])] = {
    val vecs = Tables.table(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
      // degenerate embeddings never reach the online face (semDedupGuard)
      .filter { case (id, _) => cells.contains(id) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = (0 until 64).map(i => a(i) * b(i)).sum
      val n = (v: Array[Double]) => math.sqrt(v.map(x => x * x).sum)
      round4(dot / (n(a) * n(b)))
    }
    val admitted = scala.collection.mutable.Map[Int, List[(Long, Array[Double])]]()
      .withDefaultValue(Nil)
    vecs.keys.toSeq.sorted.map { id =>
      val cell = cells(id)
      val v = vecs(id)
      val hits = admitted(cell)
        .map { case (aid, av) => (aid, cos(av, v)) }
        .filter(_._2 >= 0.3)
      // admitted list is in admission (= vec_id) order; keep the first
      // occurrence of the max cosine = smallest id among ties
      val best = hits.foldLeft(Option.empty[(Long, Double)]) {
        case (acc, (aid, c)) =>
          if (acc.forall(_._2 < c)) Some((aid, c)) else acc
      }
      if (best.isDefined)
        (id, cell, false, best.map(_._1), best.map(_._2))
      else {
        admitted(cell) = admitted(cell) :+ (id -> v)
        (id, cell, true, None: Option[Long], None: Option[Double])
      }
    }.toSet
  }

  /** Corner-quantizer reference: cells from the oracle-verified batch
    * q_semdedup output. */
  private lazy val greedyWant: Set[(Long, Int, Boolean, Option[Long], Option[Double])] =
    greedyRef(graft.SparkEntry.queries("q_semdedup")(spark, sf0001)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap)

  test("online greedy face equals the independent greedy reference " +
      "across micro-batches, and greedy dups are a subset of the batch " +
      "monotone rule's") {
    val dir = Files.createTempDirectory("vecs_stream_online")
    val vecs = Tables.table(spark, sf0001, "embeddings")
    stageFile(vecs.filter($"vec_id" < 250), dir, "b0.parquet",
      1700000000000L)
    stageFile(vecs.filter($"vec_id" >= 250), dir, "b1.parquet",
      1700000100000L)

    val out = DocStream.semanticDedupOnline(spark,
      DocStream.readEmbeddings(spark, dir.toString)).toDF()
    val q = EventStream.runToMemory(out, "sem_online", OutputMode.Append())
    q.processAllAvailable(); q.stop()

    val got = spark.table("sem_online")
      .select($"vecId", $"cell", $"admitted", $"dupOf", $"dupCos")
      .collect()
      .map(r => (r.getAs[Long]("vecId"), r.getAs[Int]("cell"),
        r.getAs[Boolean]("admitted"),
        Option(r.getAs[java.lang.Long]("dupOf")).map(_.longValue),
        Option(r.getAs[java.lang.Double]("dupCos")).map(_.doubleValue)))
      .toSet
    assert(got === greedyWant)
    val greedyDups = got.filter(!_._3).map(_._1)
    assert(greedyDups.nonEmpty)
    // greedy rejects only on an ADMITTED earlier neighbor, the batch
    // monotone rule on ANY earlier neighbor — so greedy dups ⊂ monotone
    val monotoneDups = graft.SparkEntry.queries("q_semdedup")(spark, sf0001)
      .filter($"is_dup" === 1).select($"vec_id").as[Long].collect().toSet
    assert(greedyDups.subsetOf(monotoneDups))
    assert(greedyDups.size < monotoneDups.size)
  }

  test("online greedy admitted-index state survives a checkpointed restart") {
    val srcDir = Files.createTempDirectory("vecs_restart_src")
    val outDir = Files.createTempDirectory("vecs_restart_out").toString
    val ckptDir = Files.createTempDirectory("vecs_restart_ckpt").toString
    val vecs = Tables.table(spark, sf0001, "embeddings")

    def runOnce(): Unit = {
      val q = DocStream.semanticDedupOnline(spark,
          DocStream.readEmbeddings(spark, srcDir.toString)).toDF()
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // run 1: first half builds the admitted index; run 2 (restart) must
    // reject second-half vectors against the RESTORED index, not an
    // empty one — a loss would silently admit everything
    stageFile(vecs.filter($"vec_id" < 250), srcDir, "b0.parquet",
      1700000000000L)
    runOnce()
    stageFile(vecs.filter($"vec_id" >= 250), srcDir, "b1.parquet",
      1700000100000L)
    runOnce()

    val got = spark.read.parquet(outDir)
      .select($"vecId", $"cell", $"admitted", $"dupOf", $"dupCos")
      .collect()
      .map(r => (r.getAs[Long]("vecId"), r.getAs[Int]("cell"),
        r.getAs[Boolean]("admitted"),
        Option(r.getAs[java.lang.Long]("dupOf")).map(_.longValue),
        Option(r.getAs[java.lang.Double]("dupCos")).map(_.doubleValue)))
      .toSet
    assert(got === greedyWant)
    // the restart must actually exercise cross-run suppression: some
    // post-restart vector must blame a pre-restart admitted one
    assert(got.exists(r => r._1 >= 250 && !r._3 && r._4.exists(_ < 250)))
  }

  // ---- trained-quantizer replays: the same faces, centroids swapped ----

  /** The q_semdedup_incremental_trained quantizer: mini-Lloyd trained on
    * the HISTORY split only (the increment must probe the quantizer the
    * history was indexed under, not one that saw the future). */
  private lazy val trainedCents: Seq[(Int, Seq[Double])] = {
    import graft.queries.SimilarityQueries
    SimilarityQueries.ivfCentroids(
      SimilarityQueries.semDedupGuard(
        Tables.table(spark, sf0001, "embeddings")
          .select($"vec_id", $"embedding".cast("array<double>").as("v")))
        .filter($"vec_id" < 250),
      k = 16, iters = 2)
  }

  test("streaming semantic dedup under TRAINED centroids equals the " +
      "trained batch anti-join on the replayed increment") {
    val dir = Files.createTempDirectory("vecs_stream_inc_tr")
    val vecs = Tables.table(spark, sf0001, "embeddings")
    stageFile(vecs.filter($"vec_id" >= 250 && $"vec_id" < 375),
      dir, "b0.parquet", 1700000000000L)
    stageFile(vecs.filter($"vec_id" >= 375),
      dir, "b1.parquet", 1700000100000L)

    val out = DocStream.semanticDedup(
      DocStream.readEmbeddings(spark, dir.toString),
      vecs.filter($"vec_id" < 250), cents = trainedCents,
      assignTicks = true)
    val q = EventStream.runToMemory(out, "sem_dedup_tr", OutputMode.Append())
    q.processAllAvailable(); q.stop()

    val got = spark.table("sem_dedup_tr")
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    val want = graft.SparkEntry.queries("q_semdedup_incremental_trained")(
        spark, sf0001)
      .as[(Long, Int)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty && got.size < 250)
    // the swap must be REAL: the trained assignment disagrees with the
    // corner assignment somewhere, or this replay pins nothing new
    val corner = graft.SparkEntry.queries("q_semdedup_incremental")(
        spark, sf0001)
      .as[(Long, Int)].collect().toSet
    assert(got != corner)
  }

  test("online greedy face under TRAINED centroids equals the greedy " +
      "reference on the trained assignment") {
    import graft.queries.SimilarityQueries
    val dir = Files.createTempDirectory("vecs_stream_online_tr")
    val vecs = Tables.table(spark, sf0001, "embeddings")
    stageFile(vecs.filter($"vec_id" < 250), dir, "b0.parquet",
      1700000000000L)
    stageFile(vecs.filter($"vec_id" >= 250), dir, "b1.parquet",
      1700000100000L)

    val out = DocStream.semanticDedupOnline(spark,
      DocStream.readEmbeddings(spark, dir.toString),
      cents = trainedCents, assignTicks = true).toDF()
    val q = EventStream.runToMemory(out, "sem_online_tr", OutputMode.Append())
    q.processAllAvailable(); q.stop()

    val got = spark.table("sem_online_tr")
      .select($"vecId", $"cell", $"admitted", $"dupOf", $"dupCos")
      .collect()
      .map(r => (r.getAs[Long]("vecId"), r.getAs[Int]("cell"),
        r.getAs[Boolean]("admitted"),
        Option(r.getAs[java.lang.Long]("dupOf")).map(_.longValue),
        Option(r.getAs[java.lang.Double]("dupCos")).map(_.doubleValue)))
      .toSet
    val trainedCells = SimilarityQueries.semAssign(
        SimilarityQueries.withTicks(SimilarityQueries.semDedupGuard(
          vecs.select($"vec_id", $"embedding".cast("array<double>").as("v")))),
        trainedCents, on = "dv")
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(got === greedyRef(trainedCells))
    // the trained replay must differ from the corner replay somewhere
    assert(got != greedyWant)
  }
}
