package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.queries.Shingles

/** The codegen'd WordShingles must agree element-for-element with the
  * interpreted HOF formulation it replaced, across the real corpus and
  * the degenerate edges the `when()` wrapper guards. */
class WordShinglesSpec extends SparkTestBase {
  import spark.implicits._

  private def hofShingles(t: org.apache.spark.sql.Column, w: Int) =
    when(size(t) >= w,
      transform(sequence(lit(0), size(t) - w),
        i => concat_ws(" ", (0 until w).map(o => element_at(t, i + o + 1)): _*)))
      .otherwise(array(concat_ws(" ", t)))

  test("WordShingles == HOF transform formulation on the corpus") {
    for (w <- Seq(2, 3, 5)) {
      val docs = Tables.table(spark, sf0001, "documents")
        .select(split(trim($"text"), "\\s+").as("t"))
      val rows = docs.select(
        Shingles.of(spark, $"t", w, distinct = false).as("native"),
        hofShingles($"t", w).as("hof"))
        .as[(Seq[String], Seq[String])].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (n, h) => assert(n === h, s"w=$w") }
      // and the distinct variant agrees with array_distinct over the HOF
      val distinctRows = docs.select(
        Shingles.of(spark, $"t", w).as("native"),
        array_distinct(hofShingles($"t", w)).as("hof"))
        .as[(Seq[String], Seq[String])].collect()
      distinctRows.foreach { case (n, h) => assert(n === h, s"w=$w distinct") }
    }
  }

  test("WordShingles edges: short, exact-width, null-element arrays") {
    val df = Seq(
      (1L, Seq("a")),                  // shorter than w -> whole-text fallback
      (2L, Seq("a", "b", "c")),        // exactly w -> one shingle
      (3L, Seq("a", "b", "c", "d")))   // w+1 -> two shingles
      .toDF("id", "t")
    val out = df.select($"id", Shingles.of(spark, $"t", 3, distinct = false).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) === Seq("a"))
    assert(out(2L) === Seq("a b c"))
    assert(out(3L) === Seq("a b c", "b c d"))
    // null elements are skipped inside a window like concat_ws
    val withNull = Seq((4L, Seq(Some("a"), None, Some("c"), Some("d"))))
      .toDF("id", "t")
      .select($"id", Shingles.of(spark, $"t", 3, distinct = false).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(withNull(4L) === Seq("a c", "c d"))
  }
}
