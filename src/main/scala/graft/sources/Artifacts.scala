package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The staged-artifact store — the "train once on a sample, materialize
  * tiny artifacts, every later run reads them back" contract that the
  * scaladocs of the trained operators promise, made executable: every
  * trained model this engine produces is a TINY table (a unigram LM is
  * vocabulary-sized, LR weights are 4 longs, BPE merges are a dozen
  * rows, IVF centroids K rows), so the production handoff between the
  * nightly trainer and the streaming/batch scorers is a parquet
  * directory, not a shared lineage.
  *
  * Consumers:
  *  - [[graft.queries.CurationQueries.curationPipelineWith]] (staged
  *    LM + floor threshold + LR weights) — ArtifactsSpec proves the
  *    DISK round trip is row-identical to the self-training pipeline;
  *  - [[graft.streaming.DocStream.applyBpe]] / `scoreLogprob` /
  *    `scoreQuality` / `semanticDedup` — the streaming faces that take
  *    these artifacts as parameters.
  *
  * Layout: one parquet directory per artifact kind under `dir`,
  * coalesced to a single file (they are KBs — a single file keeps the
  * artifact atomic under overwrite and trivially cacheable). */
object Artifacts {

  /** Staged unigram LM: (t, lp6) in 1e-6-tick log-probs. */
  def writeLm(lm: DataFrame, dir: String): Unit =
    lm.select("t", "lp6").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lm")

  def readLm(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lm")

  /** Staged 1-row LM-floor threshold frame (column `thr`). */
  def writeThreshold(thr: DataFrame, dir: String): Unit =
    thr.select("thr").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/thr")

  def readThreshold(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/thr")

  /** Staged LR quality-classifier weights — the 1e-6-tick longs in
    * feature order (x_spam, x_stop, x_dtr, x_bias). */
  def writeQlrWeights(w: Seq[Long], spark: SparkSession,
                      dir: String): Unit = {
    import spark.implicits._
    require(w.length == 4, s"expected 4 weights, got ${w.length}")
    Seq((w(0), w(1), w(2), w(3)))
      .toDF("x_spam", "x_stop", "x_dtr", "x_bias").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/qlr")
  }

  def readQlrWeights(spark: SparkSession, dir: String): Seq[Long] = {
    import spark.implicits._
    val r = spark.read.parquet(s"$dir/qlr")
      .select("x_spam", "x_stop", "x_dtr", "x_bias")
      .as[(Long, Long, Long, Long)].head()
    Seq(r._1, r._2, r._3, r._4)
  }

  /** Staged BPE merge table in rank order. */
  def writeBpeMerges(merges: Seq[(Int, String, String, Long)],
                     spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    merges.toDF("rank", "lhs", "rhs", "pair_count").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/bpe")
  }

  /** Merges read back in rank order, in the (lhs, rhs) shape the
    * appliers take. */
  def readBpeMerges(spark: SparkSession, dir: String)
      : Seq[(String, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/bpe")
      .select("rank", "lhs", "rhs")
      .as[(Int, String, String)].collect().sortBy(_._1)
      .map(m => (m._2, m._3)).toSeq
  }

  /** Staged WordPiece vocabulary — one piece per row, sorted. Strings
    * only, so the round-trip is lossless by construction. */
  def writeWpVocab(vocab: graft.functions.WpVocab,
                   spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    vocab.pieces.toDF("piece").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/wpvocab")
  }

  def readWpVocab(spark: SparkSession, dir: String)
      : graft.functions.WpVocab = {
    import spark.implicits._
    graft.functions.WpVocab(
      spark.read.parquet(s"$dir/wpvocab")
        .select("piece").as[String].collect().sorted.toSeq)
  }

  /** Staged unigram tokenizer vocabulary — (piece, lp6) rows; strings
    * and longs only, lossless by construction. */
  def writeUgVocab(vocab: graft.functions.UgVocab,
                   spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    vocab.pieces.toDF("piece", "lp6").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/ugvocab")
  }

  def readUgVocab(spark: SparkSession, dir: String)
      : graft.functions.UgVocab = {
    import spark.implicits._
    graft.functions.UgVocab(
      spark.read.parquet(s"$dir/ugvocab")
        .select("piece", "lp6").as[(String, Long)].collect()
        .sortBy(_._1).toSeq)
  }

  /** Staged quantizer centroids (cell, vector). */
  def writeCentroids(cents: Seq[(Int, Seq[Double])],
                     spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    cents.toDF("cell", "cv").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
  }

  def readCentroids(spark: SparkSession, dir: String)
      : Seq[(Int, Seq[Double])] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/centroids")
      .select("cell", "cv").as[(Int, Seq[Double])]
      .collect().sortBy(_._1).toSeq
  }

  /** Staged PQ codebook (sub, cell, centroid ticks) — the
    * [[graft.queries.PqQueries.pqCodebooks]] output, M·k rows of
    * exact longs, so the round-trip is bit-lossless by construction
    * (no float serialization anywhere). At 100 TB this is the
    * nightly-trainer → serving handoff for the code-only ANN index:
    * the corpus stores M small ints per vector, the codebook rides
    * along as this tiny table. */
  def writeCodebook(books: Seq[(Int, Int, Seq[Long])],
                    spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    books.toDF("sub", "cell", "ct").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/codebook")
  }

  def readCodebook(spark: SparkSession, dir: String)
      : Seq[(Int, Int, Seq[Long])] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/codebook")
      .select("sub", "cell", "ct").as[(Int, Int, Seq[Long])]
      .collect().sortBy(b => (b._1, b._2)).toSeq
  }
}
