package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure expression layer: every scalar expression / predicate of the
  * reference (SURVEY.md §2.2, §2.4) as a codegen-friendly `Column`
  * combinator. All built-in `functions._` — no UDFs, so each stays inside
  * whole-stage codegen at any scale.
  *
  * All date logic takes an explicit `asOf` parameter, replacing the
  * reference's `pd.Timestamp.today()` (reference transform.py:25,67,122),
  * so every query is deterministic and oracle-comparable.
  */
object Clean {

  // --- Predicates (§2.2) -------------------------------------------------

  /** F1/F2: pandas `!=` keeps NaN rows; Spark three-valued logic would drop
    * them. Null-keeping not-equal preserves reference semantics
    * (reference transform.py:12-15). */
  def neqKeepNull(c: Column, v: Any): Column = c.isNull || c =!= lit(v)

  /** F3/F5: range predicate; pandas drops NaN on `>=`/`<=`, Spark matches. */
  def between(c: Column, lo: Any, hi: Any): Column = c.between(lo, hi)

  /** F6/F7/F11: null-OR-predicate (e.g. open-ended end_date = "active").
    * Reference transform.py:87-89, :122-124; validation.py:130-133. */
  def nullOr(c: Column, pred: Column => Column): Column = c.isNull || pred(c)

  // --- Scalar expressions (§2.4) ----------------------------------------

  /** E1: nullable-FK sentinel `fillna(-1)` (reference transform.py:16-17). */
  def fkSentinel(c: Column): Column = coalesce(c.cast("long"), lit(-1L))

  /** E3: 'Y'/'N' -> 1/0, anything else (incl. null) -> null, matching
    * pandas `Series.map` (reference transform.py:20-21). */
  def ynFlag(c: Column): Column = when(c === "Y", 1).when(c === "N", 0)

  /** Deterministic cross-engine half-up rounding:
    * `floor(x*10^s + 0.5)/10^s` is the same IEEE op sequence in any engine,
    * unlike `round`, whose half-way tie-breaking differs between Spark
    * (exact-decimal HALF_UP) and scaled-multiply implementations — money
    * amounts divided by integers hit exact `.xx5` quotients routinely.
    * On NEGATIVE values (cosine/dot scores, log-probs) the formula rounds
    * halves toward +∞, not away from zero — fine for the cross-engine
    * contract, which only needs both engines to replay the identical
    * formula, but not a drop-in for BigDecimal HALF_UP below zero. */
  def roundHalfUp(c: Column, scale: Int): Column = {
    val p = math.pow(10.0, scale)
    floor(c * p + 0.5) / p
  }

  /** THE normalized-text content fingerprint — the one definition every
    * batch collapse/exact-dedup site, the streaming first-arrival dedup,
    * and every oracle's
    * `md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))` replay
    * share. A normalization tweak applied to one consumer but not
    * another would silently desynchronize their fingerprint groups and
    * surface only as an oracle hash mismatch (or a batch/stream dedup
    * disagreement). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Snap a 2-decimal money/metric double to exact e2 fixed-point LONG —
    * the one definition of the cross-engine contract the event queries
    * (z-score anomaly, moving average) and their oracle SQL share as
    * `CAST(floor(value * 100 + 0.5) AS BIGINT)`. Group sums over the
    * snapped longs are exact integers in any engine. */
  def snapE2(c: Column): Column =
    floor(c * 100d + 0.5d).cast("long")

  /** E4: tenure in years vs an injected as-of date (reference
    * transform.py:24-26). */
  def tenureYears(hireDate: Column, asOf: Column): Column =
    roundHalfUp(datediff(asOf, hireDate) / 365.25, 1)

  /** E5: three-way bucket CASE; null falls through to the top bucket like
    * the pandas apply-lambda (reference transform.py:27-30). */
  def bucket3(c: Column, loEdge: Double, hiEdge: Double,
              lo: String = "Low", mid: String = "Medium",
              hi: String = "High"): Column =
    when(c < loEdge, lo).when(c <= hiEdge, mid).otherwise(hi)

  /** E6: self-review flag; pandas `==` gives False on NaN, so normalize
    * null -> false (reference transform.py:43-44). */
  def eqFlag(a: Column, b: Column): Column = coalesce(a === b, lit(false))

  /** E7: descending-threshold category (reference transform.py:47-50). */
  def category3(c: Column, hiEdge: Double, midEdge: Double,
                hi: String = "Excellent", mid: String = "Good",
                lo: String = "Needs Improvement"): Column =
    when(c >= hiEdge, hi).when(c >= midEdge, mid).otherwise(lo)

  /** E8: duration in days with open end coalesced to as-of (reference
    * transform.py:66-69). */
  def durationDays(start: Column, end: Column, asOf: Column): Column =
    datediff(coalesce(end, asOf), start)

  /** E9: guarded divide — CASE keeps ANSI mode from throwing on zero and
    * matches the reference's `if duration > 0` lambda
    * (reference transform.py:71-75). */
  def guardedDiv(num: Column, den: Column, scale: Int): Column =
    when(den > 0, roundHalfUp(num / den, scale)).otherwise(lit(0.0))

  /** E11/E12: post-left-join null repair (reference transform.py:139-142,
    * :165-167). */
  def fillNull(c: Column, default: Any): Column = coalesce(c, lit(default))
}
