package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Every declared query must run at sf0.001; row-returning queries must
  * return rows (the driver's t1 smoke does the same for `entry`). */
class QuerySmokeSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      // near-dup candidate queries may legitimately return zero pairs
      val mayBeEmpty = Set("q_dedup_ngram_jaccard", "q_dedup_minhash_lsh",
        "q_dedup_simhash", "q_dedup_embedding", "q_anti_fk",
        "q_dedup_containment")
      if (!mayBeEmpty.contains(name)) assert(df.count() > 0, s"$name empty")
      else assert(df.count() >= 0)
    }
  }
}
