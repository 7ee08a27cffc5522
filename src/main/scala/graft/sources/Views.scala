package graft.sources

import org.apache.spark.sql.SparkSession
import graft.Tables

/** SQL frontend for free (SURVEY.md §3): registering each testdata table
  * as a temp view makes the whole engine queryable through `spark.sql`,
  * with identical plans to the DataFrame API — Catalyst sees the same
  * logical operators either way.
  */
object Views {

  /** Register every testdata table under its name for `dir`. */
  def registerTestdata(spark: SparkSession, dir: String): Unit =
    Tables.testdataTables.foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
}
