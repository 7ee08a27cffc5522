package graft.etl

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Clean

/** Per-table cleaners of the reference pipeline (reference transform.py),
  * as lazy `DataFrame => DataFrame` lineages. Null-handling mirrors pandas
  * semantics exactly (SURVEY.md §7.4): `!=` keeps nulls, `==` coerces null
  * to false, range predicates drop nulls.
  *
  * All "today" logic takes an explicit `asOf` date (reference used
  * `pd.Timestamp.today()` at transform.py:25,67,122 — nondeterministic; its
  * own committed golden outputs went stale because of it, SURVEY.md §5).
  *
  * Schema-defensiveness (reference guards every step with
  * `if 'col' in df.columns`) is preserved via [[withColumnIfPresent]], so
  * partial schemas flow through cleaners unchanged rather than failing.
  */
object HrTransform {

  /** Apply `f` only if `column` exists — the reference's
    * `if 'col' in df.columns` guard (transform.py:12-87 passim). */
  def withColumnIfPresent(df: DataFrame, column: String)(
      f: DataFrame => DataFrame): DataFrame =
    if (df.columns.contains(column)) f(df) else df

  /** Select the wanted columns that exist, in order — the reference's final
    * column alignment (main.py:98-105, load.py:129-138). */
  def alignColumns(df: DataFrame, wanted: Seq[String]): DataFrame =
    df.select(wanted.filter(df.columns.contains).map(col): _*)

  /** reference transform.py:9-33 (clean_employees). */
  def cleanEmployees(employees: DataFrame, asOf: Date): DataFrame = {
    var df = employees
    df = withColumnIfPresent(df, "status")(
      _.filter(Clean.neqKeepNull(col("status"), "inactive")))
    df = withColumnIfPresent(df, "salary")(
      _.filter(Clean.neqKeepNull(col("salary"), 0)))
    df = withColumnIfPresent(df, "department_id")(
      _.withColumn("department_id", Clean.fkSentinel(col("department_id"))))
    df = withColumnIfPresent(df, "hire_date")(
      _.withColumn("hire_date", to_date(col("hire_date")))
        .withColumn("tenure_years",
          Clean.tenureYears(col("hire_date"), lit(asOf))))
    df = withColumnIfPresent(df, "bonus_eligible")(
      _.withColumn("bonus_eligible", Clean.ynFlag(col("bonus_eligible"))))
    df = withColumnIfPresent(df, "salary")(
      _.withColumn("salary_bucket",
        Clean.bucket3(col("salary"), 50000, 80000)))
    df
  }

  /** reference transform.py:35-55 (clean_reviews): parse, keyed dedup
    * keep-first (D2, transform.py:38-40), THEN range-filter
    * (transform.py:41-42) — the order matters: a duplicate whose survivor
    * is out of range removes the whole (employee, date) group, exactly as
    * in the reference. Then self-review flag, category, and the
    * grouped-transform `last` as an unbounded window (A6). */
  def cleanReviews(reviews: DataFrame): DataFrame = {
    var df = reviews
    df = withColumnIfPresent(df, "review_date")(
      _.withColumn("review_date", to_date(col("review_date"))))
    if (df.columns.contains("employee_id") && df.columns.contains("review_date")) {
      // pandas sorts by (employee_id, review_date) then keeps the first of
      // each key; file order within ties = review_id order here (fall back
      // to the remaining columns if the frame has no review_id).
      val tiebreak =
        if (df.columns.contains("review_id")) Seq(col("review_id"))
        else df.columns.filterNot(Set("employee_id", "review_date")).map(col).toSeq
      val w = Window.partitionBy(col("employee_id"), col("review_date"))
        .orderBy(tiebreak: _*)
      df = df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    df = withColumnIfPresent(df, "rating")(
      _.filter(col("rating").between(1.0, 5.0)))
    df = withColumnIfPresent(df, "reviewer_id")(
      _.withColumn("is_self_review",
        Clean.eqFlag(col("reviewer_id"), col("employee_id"))))
    df = withColumnIfPresent(df, "rating")(
      _.withColumn("performance_category",
        Clean.category3(col("rating"), 4.5, 3.5)))
    if (df.columns.contains("employee_id") && df.columns.contains("rating")) {
      val order = Seq("review_date", "review_id")
        .filter(df.columns.contains).map(col)
      val base = Window.partitionBy(col("employee_id"))
      val w = if (order.nonEmpty)
        base.orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      else base // no order columns: whole-partition frame, like pandas file order
      df = df.withColumn("latest_rating", last(col("rating")).over(w))
    }
    df
  }

  /** reference transform.py:57-78 (clean_projects). */
  def cleanProjects(projects: DataFrame, asOf: Date): DataFrame = {
    var df = projects
    df = withColumnIfPresent(df, "budget")(
      _.filter(col("budget").isNotNull && col("budget") > 0))
    df = withColumnIfPresent(df, "start_date")(
      _.withColumn("start_date", to_date(col("start_date"))))
    df = withColumnIfPresent(df, "end_date")(
      _.withColumn("end_date", to_date(col("end_date"))))
    if (df.columns.contains("start_date") && df.columns.contains("end_date")) {
      df = df.filter(Clean.nullOr(col("end_date"), _ >= col("start_date")))
        .withColumn("project_duration_days",
          Clean.durationDays(col("start_date"), col("end_date"), lit(asOf)))
      df = withColumnIfPresent(df, "budget")(
        _.withColumn("daily_budget_allocation",
          Clean.guardedDiv(col("budget"), col("project_duration_days"), 2)))
    }
    df
  }

  /** reference transform.py:80-93 (clean_assignments). */
  def cleanAssignments(assignments: DataFrame): DataFrame = {
    var df = assignments
    df = withColumnIfPresent(df, "allocation_percentage")(
      _.filter(col("allocation_percentage") <= 100))
    df = withColumnIfPresent(df, "start_date")(
      _.withColumn("start_date", to_date(col("start_date"))))
    df = withColumnIfPresent(df, "end_date")(
      _.withColumn("end_date", to_date(col("end_date"))))
    if (df.columns.contains("start_date") && df.columns.contains("end_date"))
      df = df.filter(Clean.nullOr(col("end_date"), _ >= col("start_date")))
    df
  }

  /** Department-name normalization + title-case + full-row dedup
    * (reference transform.py:100-112, main.py:77-79, load.py:114-116). */
  def normalizeDepartments(departments: DataFrame): DataFrame = {
    val named =
      if (departments.columns.contains("department_name")) departments
      else if (departments.columns.contains("name"))
        departments.withColumnRenamed("name", "department_name")
      else departments.withColumn("department_name", lit("Unknown"))
    named
      .withColumn("department_name", initcap(col("department_name")))
      .dropDuplicates()
  }
}
