package graft.operators

import graft.SparkTestBase

/** Hand-computed as-of join cases: backward lookup, <= visibility at equal
  * timestamps, no-match nulls, and per-key isolation. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("asofLeft picks the latest right value at-or-before each left ts") {
    val left = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L),   // before any right row
      (4L, "b", 100L))
      .toDF("id", "key", "t")
    val right = Seq(
      ("a", 10L, 1.0),   // equal-ts row IS visible (<=)
      ("a", 15L, 2.0),
      ("b", 90L, 3.0), ("b", 99L, 4.0), ("b", 101L, 5.0))
      .toDF("key", "t", "v")
    val out = AsOfJoin.asofLeft(left, right, "key", "t", "v", "asof_v")
      .collect().map(r => r.getAs[Long]("id") -> Option(r.get(r.fieldIndex("asof_v")))).toMap
    assert(out(1L) === Some(1.0))   // t=10: right@10 visible
    assert(out(2L) === Some(2.0))   // t=20: latest is right@15
    assert(out(3L) === None)        // t=5: nothing at-or-before
    assert(out(4L) === Some(4.0))   // t=100: right@99, not the future @101
  }

  test("a matched right row with a NULL value yields null, not an older value") {
    val left = Seq((1L, "a", 30L)).toDF("id", "key", "t")
    val right = Seq(("a", 10L, Option(1.0)), ("a", 20L, None: Option[Double]))
      .toDF("key", "t", "v")
    val out = AsOfJoin.asofLeft(left, right, "key", "t", "v", "asof_v")
      .collect()(0)
    // true ASOF semantics (and DuckDB's ASOF JOIN): the ts=20 row matches,
    // and its value is null — NOT the older 1.0
    assert(out.isNullAt(out.fieldIndex("asof_v")))
  }

  test("latestPerKeyTs keeps the greatest tiebreaker per (key, ts)") {
    val right = Seq(("a", 10L, 1.0, 1L), ("a", 10L, 9.0, 2L), ("a", 11L, 3.0, 3L))
      .toDF("key", "t", "v", "seq")
    val dedup = AsOfJoin.latestPerKeyTs(right, "key", "t", "seq")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(dedup(("a", 10L)) === 9.0)
    assert(dedup(("a", 11L)) === 3.0)
  }
}
