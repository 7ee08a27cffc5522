package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The single source of the word w-shingle definition shared by the
  * dedup family (distinct shingles for Jaccard/MinHash) and the text
  * quality metrics (non-distinct for repetition rates) — one place to fix
  * means both consumers stay in sync with each other and with the DuckDB
  * oracles' `list_transform(range(...))` replay.
  *
  * `t` MUST be a bound column (not an expression tree): `element_at`
  * inside the lambda repeats its argument per element, so passing the
  * tokenizer expression directly would re-run regexp+split per shingle
  * (~10x query cost, measured). Documents with fewer than `w` tokens
  * fall back to one whole-text shingle, so the output is never empty. */
object Shingles {
  def of(t: Column, w: Int, distinct: Boolean = true): Column = {
    val grams = when(size(t) >= w,
      transform(sequence(lit(0), size(t) - w),
        i => concat_ws(" ", (0 until w).map(o => element_at(t, i + o + 1)): _*)))
      .otherwise(array(concat_ws(" ", t)))
    if (distinct) array_distinct(grams) else grams
  }
}
