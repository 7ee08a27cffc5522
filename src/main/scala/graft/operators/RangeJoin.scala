package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (binned) range join: pair rows whose numeric keys lie within a
  * tolerance of each other.
  *
  * Spark plans a bare `|l.t - r.t| <= tol` join as BroadcastNestedLoopJoin
  * — O(|l| x |r|) and a driver OOM once neither side broadcasts. Binning
  * by `ceil(t / tol)` and exploding each left row into its bin and the two
  * neighbor bins turns it into an equi-join (hash-partitionable, AQE-
  * optimizable) followed by the exact residual predicate: every true pair
  * is within one bin of each other, so recall is exact; the residual
  * filter removes the false positives.
  */
object RangeJoin {

  /** Inner range join on |leftOn - rightOn| <= tolerance (both numeric,
    * same unit). Returns left.* ++ right.* (caller projects). Bin width =
    * tolerance; left explodes to 3 bins, right stays at 1 — the exchange
    * keys are `__bin` so the shuffle is a plain hash partition. */
  def withinTolerance(left: DataFrame, right: DataFrame,
                      leftOn: Column, rightOn: Column,
                      tolerance: Long): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    val l = left.withColumn("__bin",
      explode(array(Seq(-1, 0, 1).map(o =>
        floor(leftOn / tolerance).cast("long") + o): _*)))
    val r = right.withColumn("__bin", floor(rightOn / tolerance).cast("long"))
    l.join(r, Seq("__bin"))
      .filter(abs(leftOn - rightOn) <= tolerance)
      .drop("__bin")
  }
}
