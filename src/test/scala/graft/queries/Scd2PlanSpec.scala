package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Plan shape of the SCD2 merge query: the explode-based single-pass
  * merge (etl/Scd2.applyChanges) must plan exactly ONE join — the
  * classic three-filtered-branch union re-executed the full-outer join
  * once per branch (12 parquet scans before the rewrite, 4 after). A
  * regression back to per-branch lineage shows up here as extra joins
  * and scans. */
class Scd2PlanSpec extends SparkTestBase {
  test("q_scd2_history merges in one pass: one join, no branch re-execution") {
    val p = SparkEntry.queries("q_scd2_history")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val joins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"
      .r.findAllIn(p).length
    assert(joins === 1, s"expected exactly 1 join, got $joins:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 4, s"expected <= 4 scans (history + update branches), got $scans:\n$p")
  }
}
