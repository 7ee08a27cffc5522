package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** The streaming Kneser–Ney scorer must reproduce q_doc_kn_logprob
  * row-for-row on a replayed corpus (every bigram seen — the batch
  * scoring path), across micro-batch boundaries, under tables trained
  * by the offline helper on the same corpus. A synthetic batch then
  * pins the three OOV paths the batch twin can never take — unseen
  * bigram under a seen context (tick ADDITION of the context-backoff
  * and continuation terms), unseen context (pure continuation), and
  * unseen word (the floor) — against hand-recomputed ticks. Zero state
  * rows throughout. */
class KnStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming KN equals the batch scorer on a replayed corpus") {
    val dir = Files.createTempDirectory("docs_stream_kn")
    val docs = Tables.table(spark, sf0001, "documents")
    stageFile(docs.filter($"doc_id" % 2 === 0), dir, "b0.parquet",
      1700000000000L)
    stageFile(docs.filter($"doc_id" % 2 === 1), dir, "b1.parquet",
      1700000100000L)

    val (lmBg, ctxBk, contLm, floor6) = DocStream.trainKn(docs)
    val out = DocStream.scoreKn(DocStream.readDocs(spark, dir.toString),
      lmBg, ctxBk, contLm, floor6)
    val q = EventStream.runToMemory(out.toDF(), "kn_stream",
      OutputMode.Append())
    q.processAllAvailable()
    val peakState = q.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .map(_.numRowsTotal).foldLeft(0L)(math.max)
    assert(peakState === 0L)
    q.stop()

    val got = spark.table("kn_stream")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val batch = graft.SparkEntry.queries("q_doc_kn_logprob")(spark, sf0001)
      .collect().filter(_.getAs[Long]("bigram_count") > 0)
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("bigram_count"),
          r.getAs[Double]("mean_kn_logprob")))).toMap
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("the three OOV backoff paths score at their hand-derived ticks") {
    // training corpus: the KnSpec fixture — counts are small enough to
    // recompute every table by hand below
    val train = Seq(
      (1L, "san francisco"), (2L, "san francisco"), (3L, "san francisco"),
      (4L, "a cat"), (5L, "b cat"), (6L, "c cat"),
      (7L, "new francisco"), (8L, "new cat"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (lmBg, ctxBk, contLm, floor6) = DocStream.trainKn(train)

    val dir = Files.createTempDirectory("docs_stream_kn_oov")
    stageFile(Seq(
      (101L, "san cat"),      // unseen bigram, seen ctx + seen word
      (102L, "zzz cat"),      // unseen context -> pure continuation
      (103L, "san zzz"),      // seen context, unseen word -> cb6 + floor
      (104L, "zzz yyy"),      // both unseen -> floor alone
      (105L, "san francisco") // seen bigram -> the full KN tick
    ).map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars"),
      dir, "b0.parquet", 1700000000000L)

    val out = DocStream.scoreKn(DocStream.readDocs(spark, dir.toString),
      lmBg, ctxBk, contLm, floor6)
    val q = EventStream.runToMemory(out.toDF(), "kn_oov",
      OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val got = spark.table("kn_oov").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap

    // hand-derived model: B = 6 bigram types; ctx 'san': cw1=3, types=1;
    // cont(cat)=4, cont(francisco)=2
    def snap6(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    def mean(t6: Long) = math.floor((t6 / 1e6) / 1.0 * 10000 + 0.5) / 10000
    val b = 6.0
    val cb6san = snap6(math.log((0.75 * 1) / 3))
    val c6cat = snap6(math.log(4 / b))
    val c6fran = snap6(math.log(2 / b))
    val fullSanFran = snap6(math.log(
      ((3 - 0.75) / 3) + (((0.75 * 1) / 3) * (2 / b))))
    assert(got(101L) === mean(cb6san + c6cat))
    assert(got(102L) === mean(c6cat))
    assert(got(103L) === mean(cb6san + floor6))
    assert(got(104L) === mean(floor6))
    assert(got(105L) === mean(fullSanFran))
    // ordering sanity: backing off must cost probability mass — the
    // seen bigram outscores its own backoff estimate
    assert(got(105L) > mean(cb6san + c6fran))
  }
}
