package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** The streaming LM scorer must agree with an independent recomputation
  * of the batch scoring arithmetic on a replayed increment — across
  * micro-batch boundaries — and must hold ZERO state rows at any arrival
  * count (its flatMapGroupsWithState never writes state; a doc's tokens
  * all live in its own micro-batch). Also pins the two divergences from
  * the batch twin that the face documents: out-of-vocabulary tokens
  * score at the trained floor, and null-text docs emit no row. */
class LogprobStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def round4(x: Double): Double =
    math.floor(x * 10000 + 0.5) / 10000

  /** Spark's `split(trim(lower(text)), "\s+")` mirrored exactly: SQL trim
    * strips spaces only, split keeps empties (the LogprobSpec contract). */
  private def toks(t: String): Seq[String] =
    t.toLowerCase.replaceAll("^ +| +$", "").split("\\s+", -1).toSeq

  test("streaming scorer equals the batch arithmetic on the replayed " +
      "increment, with OOV floor, no state, no null-text rows") {
    val dir = Files.createTempDirectory("docs_stream_lp")
    val docs = Tables.table(spark, sf0001, "documents")
    // increment replays as THREE micro-batches; the third is synthetic:
    // a null-text doc (must emit nothing) and an all-OOV doc (must score
    // exactly at the floor)
    stageFile(docs.filter($"doc_id" >= 300 && $"doc_id" < 400),
      dir, "b0.parquet", 1700000000000L)
    stageFile(docs.filter($"doc_id" >= 400),
      dir, "b1.parquet", 1700000100000L)
    stageFile(
      Seq((9001L, null: String, "en", "fixture", 0L),
          (9002L, "zzzoov qqqoov", "en", "fixture", 13L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      dir, "b2.parquet", 1700000200000L)

    val history = docs.filter($"doc_id" < 300)
    val (lm, floorLp6) = DocStream.trainLm(history)
    val out = DocStream.scoreLogprob(
      DocStream.readDocs(spark, dir.toString), lm, floorLp6)
    val q = EventStream.runToMemory(out.toDF(), "lp_scored",
      OutputMode.Append())
    q.processAllAvailable(); q.stop()

    val got = spark.table("lp_scored")
      .as[(Long, Long, Double)].collect().toSet

    // independent recomputation: LM as a plain Map, scores in plain Scala
    val model: Map[String, Long] =
      lm.as[(String, Long)].collect().toMap
    val incr = docs.filter($"doc_id" >= 300)
        .select($"doc_id", $"text").as[(Long, String)].collect().toSeq :+
      (9002L, "zzzoov qqqoov")
    val want = incr.map { case (id, t) =>
      val ts = toks(t)
      val slp6 = ts.map(w => model.getOrElse(w, floorLp6)).sum
      (id, ts.size.toLong, round4((slp6 / 1e6) / ts.size))
    }.toSet
    assert(got === want)

    // the pins must bite: OOV engaged, the floor doc scores AT the floor,
    // the null-text doc emitted nothing, and the state store stayed empty
    assert(incr.flatMap(d => toks(d._2)).exists(w => !model.contains(w)),
      "increment must contain out-of-vocabulary tokens")
    assert(got.find(_._1 == 9002L).get._3 === round4(floorLp6 / 1e6))
    assert(!got.exists(_._1 == 9001L))
    val peakState = q.recentProgress
      .map(_.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max)
    assert(peakState === 0L,
      s"the scorer must never store state, saw $peakState rows")
    lm.unpersist()
  }

  test("trainLm refuses an empty or all-null-text history with a clear " +
      "message") {
    val empty = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e1 = intercept[IllegalArgumentException] {
      DocStream.trainLm(empty)
    }
    assert(e1.getMessage.contains("non-empty history"))
    val allNull = Seq((1L, null: String, "en", "fixture", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e2 = intercept[IllegalArgumentException] {
      DocStream.trainLm(allNull)
    }
    assert(e2.getMessage.contains("non-empty history"))
  }
}
