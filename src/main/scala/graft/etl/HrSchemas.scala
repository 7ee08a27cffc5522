package graft.etl

import org.apache.spark.sql.types._

/** Explicit StructTypes for the HR star schema (FIXTURES.md §A.1; reference
  * data/raw/import_csv.py:5-103). CSV inference is slow and
  * non-deterministic at scale, so every reader takes one of these.
  */
object HrSchemas {

  val employees: StructType = StructType(Seq(
    StructField("employee_id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("department_id", LongType),
    StructField("salary", DoubleType),
    StructField("hire_date", DateType),
    StructField("manager_id", LongType),
    StructField("bonus_eligible", StringType),
    StructField("status", StringType)))

  val departments: StructType = StructType(Seq(
    StructField("department_id", LongType, nullable = false),
    StructField("department_name", StringType),
    StructField("location", StringType),
    StructField("budget", DoubleType),
    StructField("manager_id", LongType)))

  val performanceReviews: StructType = StructType(Seq(
    StructField("review_id", LongType, nullable = false),
    StructField("employee_id", LongType),
    StructField("review_date", DateType),
    StructField("rating", DoubleType),
    StructField("reviewer_id", LongType)))

  val projects: StructType = StructType(Seq(
    StructField("project_id", LongType, nullable = false),
    StructField("project_name", StringType),
    StructField("department_id", LongType),
    StructField("start_date", DateType),
    StructField("end_date", DateType),
    StructField("budget", DoubleType),
    StructField("status", StringType)))

  val projectAssignments: StructType = StructType(Seq(
    StructField("assignment_id", LongType, nullable = false),
    StructField("employee_id", LongType),
    StructField("project_id", LongType),
    StructField("role", StringType),
    StructField("allocation_percentage", DoubleType),
    StructField("start_date", DateType),
    StructField("end_date", DateType)))

  val all: Map[String, StructType] = Map(
    "employees" -> employees,
    "departments" -> departments,
    "performance_reviews" -> performanceReviews,
    "projects" -> projects,
    "project_assignments" -> projectAssignments)
}
