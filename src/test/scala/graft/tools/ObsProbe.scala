package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: which write paths deliver observe() metrics. */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "pt")
    graft.sources.Layout.resetTable(spark, "obs_probe_t")
    df.write.partitionBy("pt").format("parquet").saveAsTable("obs_probe_t")

    def tryOne(label: String)(body: => Long): Unit =
      try println(s"$label -> " + body)
      catch { case e: Throwable => println(s"$label -> FAIL ${e.getClass.getSimpleName}: ${e.getMessage}") }

    tryOne("observe below repartition + insertInto") {
      val obs = new org.apache.spark.sql.Observation()
      df.observe(obs, count(lit(1)).as("rows"))
        .repartition(col("pt"))
        .write.mode("append").insertInto("obs_probe_t")
      obs.getAsJava.getOrDefault("rows", -1L).asInstanceOf[Long]
    }
    tryOne("observe on top + insertInto") {
      val obs = new org.apache.spark.sql.Observation()
      df.repartition(col("pt"))
        .observe(obs, count(lit(1)).as("rows"))
        .write.mode("append").insertInto("obs_probe_t")
      obs.getAsJava.getOrDefault("rows", -1L).asInstanceOf[Long]
    }
    tryOne("observe + parquet path write") {
      val obs = new org.apache.spark.sql.Observation()
      df.observe(obs, count(lit(1)).as("rows"))
        .write.mode("overwrite").parquet("/tmp/obs_probe_p")
      obs.getAsJava.getOrDefault("rows", -1L).asInstanceOf[Long]
    }
    spark.stop()
  }
}
