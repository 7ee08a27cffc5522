package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation combinators for user-controlled keys (SURVEY.md §7.5:
  * at 100 TB a hostile or Zipfian key distribution concentrates a
  * shuffle partition; AQE's skew-join handling covers joins, but a
  * skewed *aggregation* key needs salting).
  *
  * Pattern: two-phase aggregate. Phase 1 groups on (key, salt) so one hot
  * key spreads over `saltBuckets` reducers; phase 2 merges the partials.
  * Works for any algebraic aggregate (count / sum / min / max; avg as
  * sum+count).
  */
object Skew {

  /** Deterministic per-row salt in [0, buckets): hash of the whole row's
    * unique id column if provided, else a stable pmod of xxhash64 over the
    * grouping key plus spark_partition_id (cheap, no extra columns). */
  def salt(buckets: Int, id: Column): Column =
    pmod(xxhash64(id), lit(buckets))

  /** count + sum per key, salted. Equivalent to
    * `df.groupBy(key).agg(count, sum(valueCol))` under any distribution. */
  def saltedCountSum(df: DataFrame, key: Column, id: Column, valueCol: Column,
                     buckets: Int = 16): DataFrame =
    df.groupBy(key.as("key"), salt(buckets, id).as("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(valueCol).as("__sum"))
      .groupBy(col("key"))
      .agg(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as("total"))

  /** countDistinct per key, salted on the *distinct* column so one hot key
    * fans its distinct-set across buckets (exact, two-phase). */
  def saltedCountDistinct(df: DataFrame, key: Column, distinctCol: Column,
                          buckets: Int = 16): DataFrame =
    df.groupBy(key.as("key"), pmod(xxhash64(distinctCol), lit(buckets)).as("__salt"))
      .agg(count_distinct(distinctCol).as("__d"))
      .groupBy(col("key"))
      .agg(sum(col("__d")).as("distinct_count"))
}
