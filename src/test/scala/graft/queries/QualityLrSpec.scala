package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** The learned quality classifier (q_doc_quality_lr_train / _lr).
  *
  * The DuckDB oracle already replays every iteration's integer
  * arithmetic; what it cannot check is that the arithmetic implements
  * full-batch hard-sigmoid logistic descent AT ALL — an oracle generated
  * from the same constants would bless a shared bug. So this spec
  * recomputes the whole trajectory FROM SCRATCH in plain Scala (naive
  * per-row loops over the collected feature frame, no Spark expressions
  * shared with the implementation) and pins the learning behavior the
  * synthetic signal was designed to produce. */
class QualityLrSpec extends SparkTestBase {

  private lazy val hist =
    SparkEntry.queries("q_doc_quality_lr_train")(spark, sf0001)
      .orderBy("iter").collect()

  private lazy val feat = TextQueries.qlrFeatures(
    graft.Tables.table(spark, sf0001, "documents"))
    .select("doc_id", "y", "x_spam", "x_stop", "x_dtr", "x_bias")
    .collect()
    .map(r => (r.getLong(1),
      Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))

  test("trajectory matches a from-scratch JVM recomputation") {
    var w = Seq(0L, 0L, 0L, 0L)
    val n = feat.length
    val expected = (1 to TextQueries.QlrIters).map { it =>
      var correct = 0L
      val g = Array(0L, 0L, 0L, 0L)
      feat.foreach { case (y, x) =>
        val z10 = w.zip(x).map { case (a, b) => a * b }.sum
        val p6 = math.min(math.max(
          500000L + math.floor(z10.toDouble / 40000.0).toLong, 0L), 1000000L)
        if ((p6 >= 500000L) == (y == 1L)) correct += 1
        val e = p6 - y * 1000000L
        x.indices.foreach(j => g(j) += e * x(j))
      }
      w = w.zip(g).map { case (wi, gi) =>
        wi - math.floor((TextQueries.QlrLr * gi).toDouble /
          (n * 10000.0)).toLong }
      (it, w(0), w(1), w(2), w(3), correct)
    }
    val got = hist.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
  }

  test("descent learns: accuracy non-decreasing after the first step, " +
      "perfect separation by the final iteration") {
    val accs = hist.map(_.getAs[Long]("n_correct")).toSeq
    assert(accs.length === TextQueries.QlrIters)
    // iter 1 scores with w = 0 (p = 0.5 everywhere -> all-positive); from
    // the first real update on, full-batch descent on this separable
    // signal must never lose accuracy
    assert(accs.drop(1).sliding(2).forall(p => p.head <= p.last),
      s"accuracy regressed: $accs")
    assert(accs.last === feat.length.toLong,
      s"did not separate: ${accs.last} of ${feat.length}")
  }

  test("weights carry the designed sign structure") {
    val last = hist.last
    assert(last.getAs[Long]("w_spam") > 0L,
      "spam-lexicon weight must be positive (it IS the label signal)")
    assert(last.getAs[Long]("w_bias") < 0L,
      "bias must be negative (70% of docs are negative)")
  }

  test("scoring agrees with the labels and with the training trajectory") {
    val scored = SparkEntry.queries("q_doc_quality_lr")(spark, sf0001)
      .collect()
    assert(scored.length === feat.length)
    // final weights separate perfectly, so pred == y row for row
    assert(scored.forall(r =>
      r.getAs[Long]("pred") == r.getAs[Long]("y")))
    // decision rule is the documented threshold
    assert(scored.forall(r =>
      (r.getAs[Long]("score6") >= 500000L) ==
        (r.getAs[Long]("pred") == 1L)))
  }

  test("the eval report is a coherent threshold sweep") {
    val rows = SparkEntry.queries("q_doc_quality_lr_eval")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_pos"), r.getAs[Long]("cum_docs"),
        r.getAs[Long]("cum_pos"), r.getAs[Long]("recall4"))).toSeq
    // rows are ordered bucket DESC; cumulative totals must end at the
    // corpus, and recall must be non-decreasing down the sweep
    assert(rows.last._4 === feat.length.toLong)
    assert(rows.map(_._6).sliding(2).forall(p => p.head <= p.last))
    // the decision threshold (score6 >= 500000) is the bucket-5 edge:
    // perfect final separation means buckets >= 5 hold ONLY positives
    // and buckets < 5 only negatives
    rows.foreach { case (b, n, pos, _, _, _) =>
      if (b >= 5) assert(pos === n, s"bucket $b impure")
      else assert(pos === 0L, s"bucket $b holds positives")
    }
    // and the sweep's positive mass is the training set's
    assert(rows.map(_._3).sum === feat.count(_._1 == 1L).toLong)
  }

  test("training is deterministic across runs") {
    val again = SparkEntry.queries("q_doc_quality_lr_train")(spark, sf0001)
      .orderBy("iter").collect()
    assert(again.map(_.toSeq).toSeq === hist.map(_.toSeq).toSeq)
  }

  test("scoring is a pure projection: no join anywhere in the plan") {
    val p = SparkEntry.queries("q_doc_quality_lr")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
  }
}
