package graft.queries

import org.scalatest.BeforeAndAfterAll
import graft.{SparkEntry, SparkTestBase, Tables}

/** Every query must run (never throw) when its input tables are EMPTY.
  * On a 1000-executor cluster empty inputs are routine — an empty
  * partition after a pushed filter, a new tenant's empty table, a
  * backfill window with no data — and an operator that NPEs or divides
  * by zero on them fails the whole job.
  *
  * This is deliberately a NO-THROW smoke contract: `count()` forces full
  * execution of each plan, and an exception anywhere in it fails the
  * test. What each query returns on empty input (usually zero rows, a
  * zero-count summary row for the global aggregates) is the per-query
  * oracle's business at real scale factors, not this suite's. */
class EmptyInputSpec extends SparkTestBase with BeforeAndAfterAll {

  /** 0-row copies of every testdata table, schemas intact. */
  lazy val emptyDir: java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("empty_sf")
    Tables.testdataTables.foreach { t =>
      Tables.table(spark, sf0001, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name survives empty inputs") {
      fn(spark, emptyDir.toString).count() // throws = fail; result shape is the oracle's job
    }
  }

  override def afterAll(): Unit = {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    if (Files.exists(emptyDir)) {
      Files.walk(emptyDir).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
    super.afterAll()
  }
}
