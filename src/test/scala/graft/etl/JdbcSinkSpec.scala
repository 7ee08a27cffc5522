package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Drives the JDBC truncate-then-insert sink against embedded Derby (the
  * only database available offline): a rewrite must replace, not append —
  * the reference's idempotent-load property (load.py:29-47). */
class JdbcSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("jdbc sink writes, truncate-rewrites idempotently, and reads back") {
    val dbDir = Files.createTempDirectory("derby").toString
    val url = s"jdbc:derby:$dbDir/hrdb;create=true"
    val sample = Tables.table(spark, sf0001, "customer")
      .select($"c_custkey", $"c_name", $"c_acctbal")

    HrPipeline.writeJdbcTable(sample, "customer_mirror", url)
    val first = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "customer_mirror").load()
    assert(first.count() === sample.count())

    // rewrite: truncate + insert, NOT append — count must not double
    HrPipeline.writeJdbcTable(sample, "customer_mirror", url)
    val second = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "customer_mirror").load()
    assert(second.count() === sample.count())
    assert(second.agg(sum($"c_acctbal")).collect()(0).getDouble(0)
      === sample.agg(sum($"c_acctbal")).collect()(0).getDouble(0))
  }
}
