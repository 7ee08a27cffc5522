package graft

import org.apache.spark.sql.functions._

/** [[Tables.spread]] must repartition exactly when it helps: a
  * single-split scan fans out, a pre-split input or an already-shuffled
  * lineage passes through untouched (no extra Exchange — on a real lake
  * the unconditional form was a full-text shuffle for nothing). */
class SpreadSpec extends SparkTestBase {
  import spark.implicits._

  test("single-split scan gets repartitioned across the session's cores") {
    val docs = Tables.table(spark, sf0001, "documents")
    assert(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val out = Tables.spread(docs, $"doc_id")
    assert(out ne docs)
    // AQE may coalesce the tiny test shuffle at runtime; the pinned
    // property is that the plan fans out through a hash exchange at all
    assert(out.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning(doc_id"), out.queryExecution)
  }

  test("pre-split scan-only input passes through with no Exchange") {
    val pre = spark.range(0, 1000, 1,
      numPartitions = spark.sparkContext.defaultParallelism * 2)
      .select($"id".as("doc_id"), ($"id" % 7).cast("string").as("text"))
    val out = Tables.spread(pre, $"doc_id")
    assert(out eq pre)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("wide lineage passes through (spread happens below the widening)") {
    val agged = Tables.table(spark, sf0001, "documents")
      .groupBy($"lang").agg(count(lit(1)).as("n"))
    assert(Tables.spread(agged, $"lang") eq agged)
    // join off a pre-spread scan: the collapseExact shape — spread must
    // not stack a second exchange on top
    val docs = Tables.spread(Tables.table(spark, sf0001, "documents"), $"doc_id")
    val dim = docs.select($"doc_id").limit(10)
    val joined = docs.join(dim, Seq("doc_id"))
    assert(Tables.spread(joined, $"doc_id") eq joined)
  }
}
