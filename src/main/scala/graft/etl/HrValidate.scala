package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's data-quality suite (reference validation.py) as
  * DataFrame queries returning violation counts — one row per check —
  * instead of side-effecting issue strings, so checks compose and stay
  * distributed (each is a single aggregation or anti-join; no collect of
  * data rows).
  */
object HrValidate {

  /** One check result: (table, check, detail, violations). */
  private def result(spark: SparkSession, table: String, check: String,
                     detail: String, violations: Long): DataFrame = {
    import spark.implicits._
    Seq((table, check, detail, violations))
      .toDF("table_name", "check_name", "detail", "violations")
  }

  /** reference validation.py:7-26 (check_completeness): null PK, duplicate
    * PK, per-required-column nulls, missing columns. */
  def checkCompleteness(spark: SparkSession, df: DataFrame, table: String,
                        pk: String, required: Seq[String]): DataFrame = {
    val missing = (pk +: required).filterNot(df.columns.contains)
    val missingDf = missing.map(c =>
      result(spark, table, "missing_column", c, 1L))
    if (!df.columns.contains(pk))
      return missingDf.reduce(_ union _)
    val presentReq = required.filter(df.columns.contains)
    val aggs =
      sum(when(col(pk).isNull, 1L).otherwise(0L)).as("null_pk") +:
        (count(col(pk)) - countDistinct(col(pk))).as("dup_pk") +:
        presentReq.map(c =>
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val checks =
      result(spark, table, "null_pk", pk, row.getAs[Long]("null_pk")) +:
        result(spark, table, "duplicate_pk", pk, row.getAs[Long]("dup_pk")) +:
        presentReq.map(c =>
          result(spark, table, "null_required", c, row.getAs[Long](s"null_$c")))
    (checks ++ missingDf).reduce(_ union _)
  }

  /** reference validation.py:28-45 (check_consistency): FK values (minus
    * the -1 sentinel) not present in the parent — a distributed anti-join,
    * never a collected key set. */
  def checkConsistency(spark: SparkSession, child: DataFrame, childFk: String,
                       parent: DataFrame, parentPk: String,
                       childTable: String): DataFrame = {
    val bad =
      if (!child.columns.contains(childFk) || !parent.columns.contains(parentPk)) 0L
      else child
        .filter(col(childFk).isNotNull && col(childFk) =!= -1)
        .select(col(childFk).as("__fk")).distinct()
        .join(parent.select(col(parentPk).as("__pk")),
          col("__fk") === col("__pk"), "left_anti")
        .count()
    result(spark, childTable, "fk_consistency", s"$childFk->$parentPk", bad)
  }

  /** reference validation.py:47-57 (check_accuracy): violations are rows
    * where `~condition` holds; pandas boolean masks coerce NaN comparisons
    * to False, so a null-valued condition IS a violation here — matching
    * `df[~condition]` exactly. Call sites that need pandas' positive-mask
    * semantics instead (nulls NOT violations, reference validation.py:85-87)
    * pre-coalesce their condition. */
  def checkAccuracy(spark: SparkSession, df: DataFrame, table: String,
                    validCond: org.apache.spark.sql.Column,
                    label: String): DataFrame = {
    val bad = df.filter(!coalesce(validCond, lit(false))).count()
    result(spark, table, "accuracy", label, bad)
  }

  /** reference validation.py:63-88 (validate_employees). */
  def validateEmployees(spark: SparkSession, employees: DataFrame,
                        departments: DataFrame): DataFrame =
    checkCompleteness(spark, employees, "employees", "employee_id",
      Seq("name", "salary", "hire_date"))
      .union(checkConsistency(spark, employees, "department_id",
        departments, "department_id", "employees"))
      // pandas `~status.isin(...)` counts a NaN status as invalid
      // (validation.py:74-78) — so no isNull escape here.
      .union(checkAccuracy(spark, employees, "employees",
        col("status").isin("active", "inactive", "terminated", "leave"),
        "status_enum"))
      // positive-mask check (validation.py:85-87): `(status=='active') &
      // (salary<=0)` is False for NaN in pandas, so nulls are NOT
      // violations — coalesce the bad-mask before negating.
      .union(checkAccuracy(spark, employees, "employees",
        !coalesce(col("status") === "active" && col("salary") <= 0, lit(false)),
        "active_salary_positive"))

  /** reference validation.py:90-105 (validate_reviews). */
  def validateReviews(spark: SparkSession, reviews: DataFrame,
                      employees: DataFrame): DataFrame =
    checkCompleteness(spark, reviews, "performance_reviews", "review_id",
      Seq("employee_id", "rating", "review_date"))
      .union(checkConsistency(spark, reviews, "employee_id",
        employees, "employee_id", "performance_reviews"))
      .union(checkAccuracy(spark, reviews, "performance_reviews",
        col("rating").between(1.0, 5.0), "rating_range"))

  /** reference validation.py:107-120 (validate_assignments). */
  def validateAssignments(spark: SparkSession, assignments: DataFrame,
                          projects: DataFrame, employees: DataFrame): DataFrame =
    checkConsistency(spark, assignments, "project_id",
      projects, "project_id", "project_assignments")
      .union(checkConsistency(spark, assignments, "employee_id",
        employees, "employee_id", "project_assignments"))
      .union(checkAccuracy(spark, assignments, "project_assignments",
        col("allocation_percentage").between(0, 100), "allocation_range"))

  /** reference validation.py:122-135 (validate_projects). */
  def validateProjects(spark: SparkSession, projects: DataFrame): DataFrame =
    checkCompleteness(spark, projects, "projects", "project_id",
      Seq("project_name", "start_date"))
      .union(checkAccuracy(spark, projects, "projects",
        col("budget").isNull || col("budget") > 0, "budget_null_or_positive"))

  /** reference main.py:135-140: aggregate pass/fail stats over a unioned
    * check DataFrame. */
  def dqStats(checks: DataFrame): DataFrame =
    checks.agg(
      count(lit(1)).as("total_checks"),
      sum(when(col("violations") === 0, 1L).otherwise(0L)).as("passed"),
      sum(when(col("violations") > 0, 1L).otherwise(0L)).as("failed"))
}
