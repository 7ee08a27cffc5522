package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (backward) join: for every left row, attach the value
  * of the latest right row with `rightTs <= leftTs` for the same key —
  * the temporal lookup at the heart of feature pipelines (price as of
  * trade time, latest signup before purchase, ...).
  *
  * Spark has no native as-of join, and the naive formulation
  * (`l JOIN r ON key AND r.ts <= l.ts` + max per left row) explodes into
  * O(|l| x |r|) per key. This is the scalable composition (builder
  * preference (a) — no custom plan node needed): tag both inputs, union,
  * and take `last(value, ignoreNulls)` over a (key, ts, tag) window —
  * ONE shuffle on the key, linear work, no pair blow-up.
  */
object AsOfJoin {

  /** Left as-of join. `right` must have one row per (key, ts) — pre-dedup
    * if it doesn't (see [[latestPerKeyTs]]). Right rows at exactly
    * `leftTs` are visible (<= semantics, like DuckDB ASOF). */
  def asofLeft(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCol: String, outCol: String): DataFrame = {
    val leftCols = left.columns
    // the value travels inside a presence struct: ignoreNulls must skip
    // LEFT rows (no struct) but still match a RIGHT row whose value is
    // null — a bare nullable value column would skip those too
    val l = left
      .withColumn("__tag", lit(1))
      .withColumn("__v",
        lit(null).cast(s"struct<v:${right.schema(valueCol).dataType.sql}>"))
    val r = right.select(col(key), col(ts),
      struct(col(valueCol).as("v")).as("__v"))
      .withColumn("__tag", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows (tag 0) sort before left rows at the same ts, so an
    // equal-timestamp right value is already visible to the left row
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__last", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) :+ col("__last.v").as(outCol): _*)
  }

  /** Collapse `right` to one row per (key, ts), keeping the row with the
    * greatest tiebreaker — makes the as-of lookup deterministic when the
    * source has same-timestamp updates. */
  def latestPerKeyTs(right: DataFrame, key: String, ts: String,
                     tiebreaker: String): DataFrame = {
    val w = Window.partitionBy(col(key), col(ts))
      .orderBy(col(tiebreaker).desc)
    right.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
