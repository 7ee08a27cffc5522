package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.queries.{CurationQueries, TextQueries}

/** The staged-artifact store must carry every trained model through a
  * real DISK round trip with zero behavioral drift:
  *  - the curation pipeline under disk-staged LM / threshold / LR
  *    weights is row-identical to the self-training pipeline
  *    (CurationStagedSpec proved the collect-and-recreate path; this
  *    proves the parquet path production actually takes);
  *  - BPE merges and quantizer centroids survive the round trip in
  *    rank/cell order, exactly the shapes the streaming faces take. */
class ArtifactsSpec extends SparkTestBase {
  import spark.implicits._

  test("curation pipeline under disk-staged artifacts is row-identical " +
      "to the self-training pipeline") {
    val dir = Files.createTempDirectory("artifacts").toString
    val survivors = CurationQueries.curationSurvivors(spark, sf0001)
    val lmTok = TextQueries.tokenCounts(
      survivors.select($"doc_id", $"text")).repartition($"t")

    // train and WRITE the three artifacts
    Artifacts.writeLm(TextQueries.lmFromTokenCounts(lmTok), dir)
    val thr = lmTok.groupBy($"t").agg(sum($"c").as("cw"))
      .agg(sum($"cw").as("n"), count(lit(1)).as("v"))
      .select((floor(log(lit(1.5) / ($"n" + lit(0.5) * $"v")) * 1e6 + 0.5)
        .cast("long") / lit(1e6) + lit(CurationQueries.LmFloorMargin))
        .as("thr"))
    Artifacts.writeThreshold(thr, dir)
    val qfeat = TextQueries.qlrFeatures(
      survivors.select($"doc_id", $"text")).persist()
    try {
      val h = TextQueries.qlrTrain(qfeat)
      Artifacts.writeQlrWeights(
        Seq(h.last._2, h.last._3, h.last._4, h.last._5), spark, dir)
    } finally { qfeat.unpersist(); () }

    // READ them back and run the staged pipeline
    val staged = CurationQueries.curationPipelineWith(
      survivors, lmTok,
      Artifacts.readLm(spark, dir),
      Artifacts.readThreshold(spark, dir),
      Artifacts.readQlrWeights(spark, dir)).collect().toSeq
    val selfTrained = graft.SparkEntry.queries("q_curation_pipeline")(
      spark, sf0001).collect().toSeq
    assert(staged.nonEmpty)
    assert(staged === selfTrained)
  }

  test("BPE merges and centroids survive the disk round trip in order") {
    val dir = Files.createTempDirectory("artifacts2").toString
    val words = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(TextQueries.tokens(lower($"text"))).as("w"))
      .filter(length($"w") >= 2 && !$"w".rlike("[()]"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .select(regexp_replace($"w", "(.)", "($1)").as("seg"), $"cnt")
    val merges = TextQueries.bpeMerges(words)
    assert(merges.nonEmpty)
    Artifacts.writeBpeMerges(merges, spark, dir)
    assert(Artifacts.readBpeMerges(spark, dir) ===
      merges.map(m => (m._2, m._3)))

    val cents = (0 until 8).map(i =>
      (i, Seq.tabulate(16)(j => ((i * 31 + j * 7) % 13).toDouble / 13)))
    Artifacts.writeCentroids(cents, spark, dir)
    assert(Artifacts.readCentroids(spark, dir) === cents)
  }
}
