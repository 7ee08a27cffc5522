package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}

/** Every query must run (to an empty or small result, never a throw) when
  * its input tables are EMPTY. On a 1000-executor cluster empty inputs
  * are routine — an empty partition after a pushed filter, a new tenant's
  * empty table, a backfill window with no data — and an operator that
  * NPEs or divides by zero on them fails the whole job. */
class EmptyInputSpec extends SparkTestBase {

  /** 0-row copies of every testdata table, schemas intact. */
  lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("empty_sf").toString
    Tables.testdataTables.foreach { t =>
      Tables.table(spark, sf0001, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name survives empty inputs") {
      val n = fn(spark, emptyDir).count()
      assert(n >= 0)
    }
  }
}
