package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Salted two-phase aggregates must equal their plain one-phase twins on
  * real data (lineitem, including its skew toward repeated keys). */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  lazy val li = Tables.table(spark, sf0001, "lineitem")

  test("saltedCountSum == plain groupBy count/sum") {
    val salted = Skew.saltedCountSum(li, $"l_partkey", $"l_orderkey",
      $"l_quantity", buckets = 8)
      .select($"key", $"cnt", round($"total", 6).as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = li.groupBy($"l_partkey")
      .agg(count(lit(1)).as("cnt"), round(sum($"l_quantity"), 6).as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === plain)
  }

  test("salting stays exact when every row shares ONE hot key") {
    val hot = spark.range(20000)
      .select(lit(42L).as("k"), ($"id" % 97).as("v"), $"id".as("rid"))
    val salted = Skew.saltedCountSum(hot, $"k", $"rid", $"v", buckets = 16)
      .collect()(0)
    assert(salted.getAs[Long]("cnt") === 20000L)
    assert(salted.getAs[Long]("total") ===
      hot.agg(sum($"v")).collect()(0).getLong(0))
    val d = Skew.saltedCountDistinct(hot, $"k", $"v", buckets = 16).collect()(0)
    assert(d.getAs[Long]("distinct_count") === 97L)
  }

  test("saltedCountDistinct == plain countDistinct") {
    val salted = Skew.saltedCountDistinct(li, $"l_partkey", $"l_suppkey",
      buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = li.groupBy($"l_partkey")
      .agg(countDistinct($"l_suppkey").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted === plain)
  }
}
