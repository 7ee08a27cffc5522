package graft.sources

import graft.{SparkEntry, SparkTestBase, Tables}

/** The SQL surface must agree with the DataFrame API: ANSI-dialect oracle
  * statements run through spark.sql over registered views and produce the
  * same rows as the corresponding DataFrame queries. */
class SqlSurfaceSpec extends SparkTestBase {

  // Oracle statements that are ANSI enough for both DuckDB and Spark SQL.
  private val portable = Seq("q_dedup_full", "q_filter_status",
    "q_join_left_enrich", "q_topk", "q_join_agg_enrich", "q_dq_accuracy")

  test("spark.sql over views matches the DataFrame results") {
    Views.registerTestdata(spark, sf0001)
    portable.foreach { name =>
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
        .collect().map(_.toString).sorted
      val viaDf = SparkEntry.queries(name)(spark, sf0001)
        .collect().map(_.toString).sorted
      assert(viaSql.toSeq === viaDf.toSeq, s"SQL/DataFrame mismatch for $name")
    }
  }

  test("preflight reports missing tables") {
    assert(Tables.preflight(sf0001).isEmpty)
    assert(Tables.preflight("/nonexistent") === Tables.testdataTables)
  }
}
