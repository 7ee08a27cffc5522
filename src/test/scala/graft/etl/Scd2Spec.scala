package graft.etl

import java.sql.Date

import graft.SparkTestBase

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  def d(s: String): Date = Date.valueOf(s)

  test("scd2: close changed, append new, keep unchanged, point-in-time reads") {
    val v1 = Seq((1L, "Alice", 40000.0), (2L, "Bob", 70000.0))
      .toDF("employee_id", "name", "salary")
    val hist1 = Scd2.init(v1, d("2026-01-01"))

    val updates = Seq(
      (1L, "Alice", 45000.0),    // salary changed -> new version
      (2L, "Bob", 70000.0),      // unchanged -> untouched
      (3L, "Carol", 90000.0))    // new key -> appended
      .toDF("employee_id", "name", "salary")
    val hist2 = Scd2.applyChanges(hist1, updates, "employee_id",
      d("2026-06-01"), trackedCols = Seq("name", "salary"))

    val rows = hist2.collect().map(r => (
      r.getAs[Long]("employee_id"), r.getAs[Double]("salary"),
      Option(r.getAs[Date]("valid_to")).map(_.toString),
      r.getAs[Boolean]("is_current"))).toSet
    assert(rows === Set(
      (1L, 40000.0, Some("2026-06-01"), false),
      (1L, 45000.0, None, true),
      (2L, 70000.0, None, true),
      (3L, 90000.0, None, true)))

    // point-in-time: before the change Alice earns 40k; after, 45k
    val before = Scd2.asOf(hist2, d("2026-03-01"))
      .filter($"employee_id" === 1L).collect()(0).getAs[Double]("salary")
    val after = Scd2.asOf(hist2, d("2026-07-01"))
      .filter($"employee_id" === 1L).collect()(0).getAs[Double]("salary")
    assert(before === 40000.0 && after === 45000.0)

    // idempotence: re-applying the same updates changes nothing
    val hist3 = Scd2.applyChanges(hist2, updates, "employee_id",
      d("2026-07-15"), trackedCols = Seq("name", "salary"))
    assert(hist3.count() === hist2.count())
  }
}
