package graft.operators

import java.nio.file.Files

import graft.{SparkTestBase, Tables}

class MetricsSpec extends SparkTestBase {
  import spark.implicits._

  test("observe piggybacks volume stats onto the sink job") {
    val listener = Metrics.attach(spark)
    val dir = Files.createTempDirectory("obs").toString
    val df = Tables.table(spark, sf0001, "customer")
    Metrics.observeVolume(df, "customer_sink", nullCountCols = Seq("c_name"))
      .write.mode("overwrite").parquet(dir)
    // listener callbacks are async; poll briefly
    val deadline = System.currentTimeMillis() + 10000
    while (listener.rows("customer_sink").isEmpty &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(listener.rows("customer_sink") === Some(df.count()))
    assert(listener.metric("customer_sink").get.getAs[Long]("null_c_name") === 0L)
  }
}
