package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** The binned range join must equal the naive inequality join (which Spark
  * can still execute at test scale via nested loop) and never plan a
  * cartesian shuffle itself. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("binned range join == naive inequality join") {
    val ev = Tables.table(spark, sf0001, "events")
      .withColumn("sec", unix_timestamp(date_trunc("second", $"ts")))
    val l = ev.filter($"event_type" === "error")
      .select($"event_id".as("lid"), $"sec".as("lsec"))
    val r = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("rid"), $"sec".as("rsec"))

    val binned = RangeJoin.withinTolerance(l, r, $"lsec", $"rsec", 1800L)
      .select($"lid", $"rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.join(r, abs($"lsec" - $"rsec") <= 1800L)
      .select($"lid", $"rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(binned === naive)
    assert(binned.nonEmpty)
  }

  test("binned == naive on seeded random data including negatives") {
    val rnd = new scala.util.Random(7)
    val l = (1L to 300L).map(i => (i, rnd.nextLong() % 500L)).toDF("lid", "lt")
    val r = (1L to 300L).map(i => (i, rnd.nextLong() % 500L)).toDF("rid", "rt")
    val binned = RangeJoin.withinTolerance(l, r, $"lt", $"rt", 37L)
      .select($"lid", $"rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.join(r, abs($"lt" - $"rt") <= 37L)
      .select($"lid", $"rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(binned === naive)
    assert(naive.nonEmpty)
  }

  test("binned range join plans as an equi hash join, not nested loop") {
    val l = spark.range(100).select($"id".as("lid"), ($"id" * 7).as("lt"))
    val r = spark.range(100).select($"id".as("rid"), ($"id" * 11).as("rt"))
    val plan = RangeJoin.withinTolerance(l, r, $"lt", $"rt", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
