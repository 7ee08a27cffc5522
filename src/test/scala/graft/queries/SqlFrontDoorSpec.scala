package graft.queries

import graft.SparkTestBase

/** The SQL front door's twin contract: each q_sql_* entry must collect
  * row-identical to the DataFrame query it re-expresses, in one session
  * on the same corpus. The DuckDB gate already checks both against ONE
  * oracle; this pins the surfaces against each other directly, so a
  * divergence localizes to the surface (SQL text vs DataFrame lineage)
  * instead of appearing as two independent oracle mismatches. */
class SqlFrontDoorSpec extends SparkTestBase {

  private val twins = Seq(
    "q_sql_filter_status" -> "q_filter_status",
    "q_sql_topk" -> "q_topk",
    "q_sql_dedup_exact" -> "q_dedup_exact",
    "q_sql_events_hourly" -> "q_events_hourly",
    "q_sql_events_sessions" -> "q_events_sessions",
    "q_sql_events_attrib" -> "q_events_attrib",
    "q_sql_knn_brute" -> "q_knn_brute",
    "q_sql_dedup_span" -> "q_dedup_span",
    "q_sql_curation_lite" -> "q_curation_lite",
    "q_sql_ann_pq" -> "q_ann_pq")

  test("the SQL surface optimizes to the same canonical plan as the " +
      "DataFrame surface (the Views scaladoc's claim, checked)") {
    // one twin suffices as the witness — the rest differ only in
    // operator mix; canonicalized normalizes expression ids
    val a = graft.SparkEntry.queries("q_sql_filter_status")(spark, sf0001)
      .queryExecution.optimizedPlan.canonicalized
    val b = graft.SparkEntry.queries("q_filter_status")(spark, sf0001)
      .queryExecution.optimizedPlan.canonicalized
    assert(a == b, s"SQL plan:\n$a\nDataFrame plan:\n$b")
  }

  test("the WINDOW twin optimizes to the same canonical plan from both " +
      "surfaces (lag + running-sum + rollup — window territory)") {
    // the projection/aggregate witnesses above don't cover window
    // functions; sessionization stacks two window specs and a grouped
    // rollup, so plan identity here extends the one-operator-set claim
    // into the window frame machinery
    val a = graft.SparkEntry.queries("q_sql_events_sessions")(spark, sf0001)
      .queryExecution.optimizedPlan.canonicalized
    val b = graft.SparkEntry.queries("q_events_sessions")(spark, sf0001)
      .queryExecution.optimizedPlan.canonicalized
    assert(a == b, s"SQL plan:\n$a\nDataFrame plan:\n$b")
  }

  test("the COMPOSED flagship optimizes to the same canonical plan " +
      "from both surfaces (filters + group + join + window stacked)") {
    // the single-operator witness above doesn't cover composition; the
    // 3-stage curation slice does — one spark.sql statement vs four
    // stacked DataFrame transformations must reach ONE optimized plan
    val a = graft.SparkEntry.queries("q_sql_curation_lite")(spark, sf0001)
      .queryExecution.optimizedPlan.canonicalized
    val b = graft.SparkEntry.queries("q_curation_lite")(spark, sf0001)
      .queryExecution.optimizedPlan.canonicalized
    assert(a == b, s"SQL plan:\n$a\nDataFrame plan:\n$b")
  }

  test("the KERNEL twin optimizes to the same canonical plan from both " +
      "surfaces (codebook-bound codegen expressions called by SQL name)") {
    // the witnesses above cover built-in operators; the ADC scan is
    // custom-Expression territory — plan identity here proves a SQL
    // user gets the same pq_encode/pq_dtabs/pq_adist kernels and the
    // same broadcast ADC shape the DataFrame surface plans
    val a = graft.SparkEntry.queries("q_sql_ann_pq")(spark, sf0001)
      .queryExecution.optimizedPlan.canonicalized
    val b = graft.SparkEntry.queries("q_ann_pq")(spark, sf0001)
      .queryExecution.optimizedPlan.canonicalized
    assert(a == b, s"SQL plan:\n$a\nDataFrame plan:\n$b")
  }

  twins.foreach { case (sqlName, dfName) =>
    test(s"$sqlName collects row-identical to $dfName") {
      val viaSql = graft.SparkEntry.queries(sqlName)(spark, sf0001)
      val viaDf = graft.SparkEntry.queries(dfName)(spark, sf0001)
      assert(viaSql.columns.toSeq === viaDf.columns.toSeq)
      val (a, b) = (viaSql.collect().toSeq, viaDf.collect().toSeq)
      assert(a.nonEmpty, s"$sqlName returned no rows")
      assert(a === b)
    }
  }
}
