package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: one wordpiece-trainer iteration's physical plan —
  * does the sentinel-fused pair exchange get reused across the two
  * symbol-count broadcast subtrees, or is seg computed three times? */
object WpPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val words = Seq(("(h)(e)(l)(l)(o)", 10L), ("(w)(o)(r)(l)(d)", 7L),
      ("(h)(e)(y)", 3L)).toDF("seg", "cnt")
    val seg = words.localCheckpoint(eager = false)
    val WpScoreScale = 10000000000L
    val syms = regexp_extract_all($"seg", lit("\\(([^()]*)\\)"), lit(1))
    val pairs = seg
      .select($"cnt", explode(arrays_zip(
        syms.as("l"),
        concat(slice(syms, lit(2), size(syms) - 1),
          array(lit(null).cast("string"))).as("r"))).as("pr"))
      .groupBy($"pr.l".as("l"), $"pr.r".as("r"))
      .agg(sum($"cnt").as("c"))
    val symCnt = pairs.groupBy($"l")
      .agg(sum($"c").as("u")).select($"l".as("sym"), $"u")
    val top = pairs.filter($"r".isNotNull)
      .join(broadcast(symCnt.select($"sym".as("l"), $"u".as("ul"))), Seq("l"))
      .join(broadcast(symCnt.select($"sym".as("r"), $"u".as("ur"))), Seq("r"))
      .select($"l", $"r", $"c",
        expr(s"(c * $WpScoreScale) div (ul * ur)").as("st"))
      .orderBy($"st".desc, $"l", $"r")
      .limit(1)
    val rows = top.collect()
    println("TOP = " + rows.mkString(","))
    val plan = top.queryExecution.executedPlan.toString
    println("Exchange nodes: " + "(?<!Reused)Exchange".r.findAllIn(plan).size)
    println("ReusedExchange nodes: " + "ReusedExchange".r.findAllIn(plan).size)
    println("LocalTableScan/checkpoint scans: " +
      "Scan ExistingRDD".r.findAllIn(plan).size)
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Scan") || l.contains("Subquery"))
      .mkString("\n"))
    spark.stop()
  }
}
