package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Post-training data operators (PostTrainQueries).
  *
  * The oracles replay each computation; this spec pins the POLICIES on
  * corpora built to exercise them: preference pairs orient toward the
  * quality survivor and respect the margin floor, the split audit stays
  * diagonal, contrastive triplets band hard/semi-hard/easy around the
  * positive, and curriculum stages follow the NTILE contract. */
class PostTrainSpec extends SparkTestBase {

  private def withDocs(rows: Seq[(Long, String)])(body: String => Unit): Unit = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("posttrain")
    try {
      rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      body(dir.toString)
    } finally cleanup(dir)
  }

  private def withVecs(rows: Seq[(Long, Array[Float], Int)])(
      body: String => Unit): Unit = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("posttrain_vecs")
    try {
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      body(dir.toString)
    } finally cleanup(dir)
  }

  private def cleanup(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  // QualityRepSpec's fixture shape: docs 1/2 are near-dups where the
  // CLEAN variant has the LARGER id (doc 1 repeats tokens); docs 3/4
  // are exact copies (quality tie — margin 0).
  private val pairFixture = Seq(
    (1L, "w1 w2 w3 w4 w5 w6 w7 w1 w1"),
    (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
    (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9"),
    (4L, "z1 z2 z3 z4 z5 z6 z7 z8 z9"))

  test("pref pairs orient toward the quality survivor; ties below the " +
      "margin floor emit nothing") {
    withDocs(pairFixture) { dir =>
      val got = SparkEntry.queries("q_pref_pairs")(spark, dir).collect()
        .map(r => (r.getAs[Long]("chosen_doc"), r.getAs[Long]("rejected_doc"),
          r.getAs[Long]("margin")))
      // exactly one pair: chosen = the CLEAN doc 2 (larger id), rejected
      // = dirty doc 1; the 3/4 exact-copy component has margin 0 < floor
      assert(got.length === 1)
      assert(got.head._1 === 2L && got.head._2 === 1L)
      assert(got.head._3 >= PostTrainQueries.PrefMinMargin)
    }
  }

  test("every chosen doc is a q_dedup_quality_rep survivor and every " +
      "rejected doc is dropped there (sf0.001)") {
    val pairs = SparkEntry.queries("q_pref_pairs")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("chosen_doc"), r.getAs[Long]("rejected_doc")))
    val rep = SparkEntry.queries("q_dedup_quality_rep")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dropped"))).toMap
    assert(pairs.nonEmpty) // the sf0.001 corpus has clustered near-dups
    pairs.foreach { case (chosen, rejected) =>
      assert(rep(chosen) === 0L, s"chosen $chosen not a survivor")
      assert(rep(rejected) === 1L, s"rejected $rejected not dropped")
    }
  }

  test("the split audit is diagonal: no pair straddles a split") {
    withDocs(pairFixture) { dir =>
      val got = SparkEntry.queries("q_pref_split_check")(spark, dir)
        .collect()
        .map(r => (r.getAs[String]("chosen_split"),
          r.getAs[String]("rejected_split"), r.getAs[Long]("n_pairs")))
      assert(got.nonEmpty)
      got.foreach { case (cs, rs, _) => assert(cs === rs) }
      assert(got.map(_._3).sum === 1L) // the fixture's single pair
    }
    val sf = SparkEntry.queries("q_pref_split_check")(spark, sf0001)
      .collect()
    sf.foreach { r =>
      assert(r.getAs[String]("chosen_split")
        === r.getAs[String]("rejected_split"))
    }
  }

  test("best-of-n picks each cell's learned-reward argmax with an exact " +
      "margin (sf0.001)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = SparkEntry.queries("q_pref_bon")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // the winner's score equals the cell max of the shipped scorer's
    // q_doc_quality_lr output (the literal shared lineage), and the
    // margin is best - runner_up exactly
    val scores = SparkEntry.queries("q_doc_quality_lr")(spark, sf0001)
      .select($"doc_id", $"score6").as[(Long, Long)].collect().toMap
    val docs = graft.Tables.table(spark, sf0001, "documents")
      .select($"doc_id", $"source", $"lang")
      .as[(Long, String, String)].collect()
      .filter(d => scores.contains(d._1))
      .groupBy(d => (d._2, d._3))
    rows.foreach { r =>
      val cell = docs((r.getAs[String]("source"), r.getAs[String]("lang")))
      val ranked = cell.map(d => (scores(d._1), d._1))
        .sortBy { case (s, id) => (-s, id) }
      assert(r.getAs[Long]("n") === cell.length.toLong)
      assert(r.getAs[Long]("best_doc") === ranked.head._2)
      assert(r.getAs[Long]("best_score6") === ranked.head._1)
      if (cell.length > 1) {
        assert(r.getAs[Long]("runner_up6") === ranked(1)._1)
        assert(r.getAs[Long]("margin6") === ranked.head._1 - ranked(1)._1)
      } else {
        assert(r.isNullAt(r.fieldIndex("margin6")))
      }
    }
  }

  test("contrastive triplets band hard / semi-hard / easy around the " +
      "positive") {
    val d = 64
    def vec(cos: Double): Array[Float] = {
      val v = new Array[Float](d)
      v(0) = cos.toFloat
      v(1) = math.sqrt(1.0 - cos * cos).toFloat
      v
    }
    val anchor = { val v = new Array[Float](d); v(0) = 1f; v }
    withVecs(Seq(
      (0L, anchor, 1),       // the single probe anchor (vec_id < 10)
      (10L, vec(0.99), 1),   // positive: nearest same-label
      (11L, vec(1.00), 2),   // negative above the positive -> hard
      (12L, vec(0.98), 2),   // within alpha below it -> semi_hard
      (13L, vec(0.50), 2)    // below the band -> easy
    )) { dir =>
      val got = SparkEntry.queries("q_contrastive_negatives")(spark, dir)
        .collect()
        .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neg_id"),
          r.getAs[Long]("pos_id"), r.getAs[String]("difficulty")))
      assert(got.toSeq === Seq(
        (1, 11L, 10L, "hard"),
        (2, 12L, 10L, "semi_hard"),
        (3, 13L, 10L, "easy")))
    }
  }

  test("an anchor with no same-label candidate mines no triplets") {
    val anchor = { val v = new Array[Float](64); v(0) = 1f; v }
    withVecs(Seq((0L, anchor, 1), (10L, anchor, 2))) { dir =>
      assert(SparkEntry.queries("q_contrastive_negatives")(spark, dir)
        .count() === 0L)
    }
  }

  test("curriculum stages follow the NTILE contract per language " +
      "(sf0.001)") {
    val rows = SparkEntry.queries("q_curriculum")(spark, sf0001).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("difficulty"),
        r.getAs[Long]("stage"), r.getAs[Long]("stage_pos")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val byStage = docs.groupBy(_._3).view.mapValues(_.length).toMap
      val sizes = byStage.values.toSeq
      // contiguous stages 1..k, sizes within 1 of each other, first
      // stages take the extra row
      assert(byStage.keySet === (1L to byStage.keySet.max).toSet, lang)
      assert(sizes.max - sizes.min <= 1, lang)
      assert(byStage.toSeq.sortBy(_._1).map(_._2).sliding(2).forall(
        s => s.length < 2 || s.head >= s.last), lang)
      // stage boundaries respect difficulty order
      val stageMax = docs.groupBy(_._3).view
        .mapValues(_.map(_._2).max).toMap
      val stageMin = docs.groupBy(_._3).view
        .mapValues(_.map(_._2).min).toMap
      (1L until byStage.keySet.max).foreach { s =>
        assert(stageMax(s) <= stageMin(s + 1), s"$lang stage $s")
      }
      // stage_pos is 1..size within each stage
      docs.groupBy(_._3).foreach { case (s, members) =>
        assert(members.map(_._4).sorted.toSeq
          === (1L to members.length.toLong).toSeq, s"$lang stage $s")
      }
    }
  }

  test("curriculum on a 6-doc language splits 2/2/1/1") {
    // six docs, difficulty strictly increasing with doc id (longer
    // average tokens), so the ntile split is deterministic
    val docs = (1L to 6L).map(i => (i, Seq.fill(4)("a" * i.toInt).mkString(" ")))
    withDocs(docs) { dir =>
      val got = SparkEntry.queries("q_curriculum")(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("stage"),
          r.getAs[Long]("stage_pos"))).toSeq
      assert(got === Seq(
        (1L, 1L, 1L), (2L, 1L, 2L),
        (3L, 2L, 1L), (4L, 2L, 2L),
        (5L, 3L, 1L), (6L, 4L, 1L)))
    }
  }
}
