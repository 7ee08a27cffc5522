package graft.etl

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Clean

/** The reference's three summary marts (reference transform.py:96-209) as
  * lazy aggregation lineages.
  *
  * Scale notes: every stat side is aggregated BEFORE joining (partial
  * aggregation happens map-side automatically), and the joins are left
  * joins onto a dimension; at production scale the dim side is the small
  * one, so these become broadcast joins under AQE — no hand-scheduling.
  *
  * Rounding uses `bround` (half-even) to match the reference's
  * numpy rounding (SURVEY.md §2.4 E13).
  */
object HrAggregates {

  /** reference transform.py:96-147 (create_dept_summary): per-department
    * employee stats (A1) + active-project stats (A2), left-joined onto the
    * normalized departments dim, null-filled (E12), rounded. */
  def deptSummary(departments: DataFrame, employees: DataFrame,
                  projects: DataFrame, asOf: Date): DataFrame = {
    val empStats = employees.groupBy(col("department_id"))
      .agg(count(col("employee_id")).as("total_employees"),
        avg(col("salary")).as("avg_salary"))
    val projStats = projects
      .filter(Clean.nullOr(col("end_date"), _ > lit(asOf)))
      .groupBy(col("department_id"))
      .agg(count(col("project_id")).as("active_projects"),
        sum(col("budget")).as("total_budget"))
    departments
      .select(col("department_id"), col("department_name"))
      .join(broadcast(empStats), Seq("department_id"), "left")
      .join(broadcast(projStats), Seq("department_id"), "left")
      .select(col("department_id"), col("department_name"),
        Clean.fillNull(col("total_employees"), 0L).cast("long").as("total_employees"),
        // the reference fills counts and budget but leaves avg_salary NaN
        // for employee-less departments (transform.py:139-145) — keep null
        bround(col("avg_salary"), 2).as("avg_salary"),
        Clean.fillNull(col("active_projects"), 0L).cast("long").as("active_projects"),
        Clean.fillNull(col("total_budget"), 0.0).as("total_budget"))
  }

  /** reference transform.py:149-186 (create_emp_performance): review stats
    * per employee (A3 — order-dependent `last` as max_by on the unique
    * (review_date, review_id) pair), left-joined onto employees, enriched
    * with the department name (J3 + E11 ghost-department fill). */
  def empPerformance(employees: DataFrame, reviews: DataFrame,
                     departments: DataFrame): DataFrame = {
    val reviewStats = reviews.groupBy(col("employee_id"))
      .agg(bround(avg(col("rating")), 2).as("avg_rating"),
        count(col("review_id")).as("review_count"),
        max_by(col("rating"), struct(col("review_date"), col("review_id")))
          .as("latest_rating"),
        max(col("review_date")).as("latest_review_date"))
    employees
      .select(col("employee_id"), col("name"), col("department_id"),
        col("salary"), col("salary_bucket"), col("tenure_years"))
      .join(reviewStats, Seq("employee_id"), "left")
      .join(broadcast(departments.select(col("department_id"),
        col("department_name"))), Seq("department_id"), "left")
      .withColumn("department_name",
        Clean.fillNull(col("department_name"), "Unknown"))
      .withColumn("review_count",
        Clean.fillNull(col("review_count"), 0L).cast("long"))
  }

  /** reference transform.py:188-209 (create_project_workload): assignment
    * stats per project (A4), left-joined onto projects, null-filled. */
  def projectWorkload(projects: DataFrame, assignments: DataFrame): DataFrame = {
    val assignStats = assignments.groupBy(col("project_id"))
      .agg(countDistinct(col("employee_id")).as("total_team_size"),
        sum(col("allocation_percentage")).as("total_allocation"),
        bround(avg(col("allocation_percentage")), 1).as("avg_allocation"))
    projects
      .select(col("project_id"), col("project_name"), col("department_id"),
        col("budget"), col("project_duration_days"))
      .join(broadcast(assignStats), Seq("project_id"), "left")
      .select(col("project_id"), col("project_name"), col("department_id"),
        col("budget"), col("project_duration_days"),
        Clean.fillNull(col("total_team_size"), 0L).cast("long").as("total_team_size"),
        Clean.fillNull(col("total_allocation"), 0.0).as("total_allocation"),
        Clean.fillNull(col("avg_allocation"), 0.0).as("avg_allocation"))
  }
}
