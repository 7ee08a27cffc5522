package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The staged-weights curation pipeline face: the production
  * composition [[CurationQueries.curationPipelineWith]] — the pipeline
  * downstream under GIVEN quality models — must be row-identical to the
  * self-training q_curation_pipeline when fed the artifacts that query
  * trains for itself. That is the 100 TB contract the scaladocs
  * promise: train once on a sample, materialize the LM table / floor
  * threshold / LR weights as tiny staged artifacts, and every later run
  * reads them back with no behavioral drift. The staged artifacts here
  * are deliberately round-tripped through collect + createDataFrame /
  * literals so the test exercises exactly the "read back from a staged
  * table" path, not a shared lineage. */
class CurationStagedSpec extends SparkTestBase {
  import spark.implicits._

  test("staged-weights pipeline is row-identical to the self-training " +
      "pipeline on the same corpus") {
    val dir = sf0001
    val survivors = CurationQueries.curationSurvivors(spark, dir)
    val lmTok = TextQueries.tokenCounts(
      survivors.select($"doc_id", $"text")).repartition($"t")

    // "stage" the three artifacts the way production would read them
    // back: tiny materialized tables / literal weights, detached from
    // the training lineage
    val stagedLm = {
      val rows = TextQueries.lmFromTokenCounts(lmTok)
        .select($"t", $"lp6").as[(String, Long)].collect().toSeq
      rows.toDF("t", "lp6")
    }
    val stagedThr = {
      val t = lmTok.groupBy($"t").agg(sum($"c").as("cw"))
        .agg(sum($"cw").as("n"), count(lit(1)).as("v"))
        .select((floor(log(lit(1.5) / ($"n" + lit(0.5) * $"v")) * 1e6 + 0.5)
          .cast("long") / lit(1e6) + lit(CurationQueries.LmFloorMargin))
          .as("thr"))
        .as[Double].head()
      Seq(t).toDF("thr")
    }
    val stagedQw = {
      val qfeat = TextQueries.qlrFeatures(
        survivors.select($"doc_id", $"text")).persist()
      try {
        val h = TextQueries.qlrTrain(qfeat)
        Seq(h.last._2, h.last._3, h.last._4, h.last._5)
      } finally { qfeat.unpersist(); () }
    }

    val staged = CurationQueries.curationPipelineWith(
      survivors, lmTok, stagedLm, stagedThr, stagedQw).collect().toSeq
    val selfTrained = graft.SparkEntry.queries("q_curation_pipeline")(
      spark, dir).collect().toSeq

    assert(staged.nonEmpty, "pipeline produced no manifest rows")
    assert(staged === selfTrained)
  }
}
