package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Source/sink format coverage beyond parquet: ORC, JSON, and CSV must
  * roundtrip the same rows (CSV loses types, so it reads back with the
  * written schema). */
class FormatsSpec extends SparkTestBase {
  import spark.implicits._

  lazy val sample = Tables.table(spark, sf0001, "customer")
    .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal")

  private def checksum(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
    val r = df.agg(count(lit(1)), sum($"c_acctbal")).collect()(0)
    (r.getLong(0), math.round(r.getDouble(1) * 100) / 100.0)
  }

  test("orc roundtrip") {
    val dir = Files.createTempDirectory("fmt_orc").toString
    sample.write.mode("overwrite").orc(dir)
    assert(checksum(spark.read.orc(dir)) === checksum(sample))
  }

  test("json roundtrip") {
    val dir = Files.createTempDirectory("fmt_json").toString
    sample.write.mode("overwrite").json(dir)
    assert(checksum(spark.read.schema(sample.schema).json(dir))
      === checksum(sample))
  }

  test("csv roundtrip with explicit schema") {
    val dir = Files.createTempDirectory("fmt_csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    assert(checksum(spark.read.option("header", "true")
      .schema(sample.schema).csv(dir)) === checksum(sample))
  }
}
