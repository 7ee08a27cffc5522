import org.apache.spark.sql.SparkSession
val spark = SparkSession.builder().master("local[8]")
  .config("spark.sql.shuffle.partitions","8")
  .config("spark.sql.extensions","graft.plans.GraftExtensions")
  .config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
val dir = "/root/testdata/sf0.001"
graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
  try {
    val p = fn(spark, dir).queryExecution.executedPlan.toString
    val lines = p.split("\n").filter(_.contains("FileScan parquet"))
    val per = lines.flatMap { l =>
      val tbl = "/([a-z]+)\\.parquet".r.findFirstMatchIn(l).map(_.group(1))
      tbl.map(t => (t, l.contains("text:string") || l.contains("embedding:")))
    }.toSeq
    per.groupBy(_._1).foreach { case (t, ss) =>
      val heavy = ss.count(_._2)
      if (heavy >= 2 || ss.size >= 4)
        println(s"AUDIT $name | $t | scans=${ss.size} | heavy=$heavy")
    }
  } catch { case e: Throwable => println(s"SKIP $name: ${e.getClass.getSimpleName}") }
}
spark.stop()
