package graft.etl

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** Exercises the CSV source (S1) and CSV sink (S4) around the full
  * pipeline: write raw HR CSVs, read them back with explicit schemas, run
  * build(), write the star schema as CSV, re-read and check shape — the
  * reference's end-to-end path minus MySQL (reference main.py:184-222).
  */
class HrCsvRoundtripSpec extends SparkTestBase {
  import spark.implicits._

  test("staging hop re-exports raw CSVs verbatim (extract.py __main__)") {
    val raw = Files.createTempDirectory("hr_raw_stage").toString
    val staging = Files.createTempDirectory("hr_staging").toString
    def d(s: String) = Date.valueOf(s)
    Seq(
      (1L, "Alice", Option(101L), 40000.0, d("2020-01-01"), None: Option[Long], "Y", "active"),
      (2L, "Bob", Option(101L), 70000.0, d("2021-01-01"), Option(1L), "N", "inactive"))
      .toDF("employee_id", "name", "department_id", "salary", "hire_date",
        "manager_id", "bonus_eligible", "status")
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .option("dateFormat", "yyyy-MM-dd").csv(s"$raw/employees.csv")
    Seq((101L, "hr", "NYC", 100000.0, Option(1L)))
      .toDF("department_id", "department_name", "location", "budget", "manager_id")
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .csv(s"$raw/departments.csv")

    // only the two present tables stage; the other three are skipped
    val staged = HrPipeline.stage(spark, raw, staging)
    assert(staged === Seq("departments", "employees"))

    // verbatim: re-reading staging with the same schema gives identical rows
    // (incl. the nullable-int manager_id staying integral, not "1.0")
    val before = HrPipeline.readCsv(spark, raw, "employees").collect().toSet
    val after = HrPipeline.readCsv(spark, staging, "employees").collect().toSet
    assert(after === before)
    val rawLine = spark.read.text(s"$staging/employees.csv")
      .filter($"value".contains("Bob")).collect()(0).getString(0)
    assert(rawLine.contains(",1,") && !rawLine.contains("1.0"))
  }

  test("csv in -> pipeline -> csv out roundtrip") {
    val raw = Files.createTempDirectory("hr_raw").toString
    val outDir = Files.createTempDirectory("hr_out").toString
    val asOf = Date.valueOf("2026-01-01")
    def d(s: String) = Date.valueOf(s)

    Seq(
      (1L, "Alice", Option(101L), 40000.0, d("2020-01-01"), None: Option[Long], "Y", "active"),
      (2L, "Bob", Option(101L), 70000.0, d("2021-01-01"), Option(1L), "N", "inactive"),
      (3L, "Charlie", Option(102L), 100000.0, d("2019-01-01"), Option(1L), "Y", "active"))
      .toDF("employee_id", "name", "department_id", "salary", "hire_date",
        "manager_id", "bonus_eligible", "status")
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .option("dateFormat", "yyyy-MM-dd").csv(s"$raw/employees.csv")
    Seq((101L, "hr", "NYC", 100000.0, Option(1L)),
      (102L, "tech", "SF", 200000.0, Option(3L)))
      .toDF("department_id", "department_name", "location", "budget", "manager_id")
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .csv(s"$raw/departments.csv")
    Seq((1L, 1L, d("2025-01-01"), 4.5, Option(3L)))
      .toDF("review_id", "employee_id", "review_date", "rating", "reviewer_id")
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .option("dateFormat", "yyyy-MM-dd").csv(s"$raw/performance_reviews.csv")
    Seq((1L, "Apollo", 101L, d("2025-01-01"), None: Option[Date], Option(36500.0), "in_progress"))
      .toDF("project_id", "project_name", "department_id", "start_date",
        "end_date", "budget", "status")
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .option("dateFormat", "yyyy-MM-dd").csv(s"$raw/projects.csv")
    Seq((1L, 1L, 1L, "dev", 60.0, d("2025-01-01"), None: Option[Date]))
      .toDF("assignment_id", "employee_id", "project_id", "role",
        "allocation_percentage", "start_date", "end_date")
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .option("dateFormat", "yyyy-MM-dd").csv(s"$raw/project_assignments.csv")

    val out = HrPipeline.build(spark,
      HrPipeline.readCsv(spark, raw, "employees"),
      HrPipeline.readCsv(spark, raw, "departments"),
      HrPipeline.readCsv(spark, raw, "performance_reviews"),
      HrPipeline.readCsv(spark, raw, "projects"),
      HrPipeline.readCsv(spark, raw, "project_assignments"), asOf)
    HrPipeline.writeCsv(out, outDir)

    val summary = spark.read.option("header", "true")
      .csv(s"$outDir/summary_dept_metrics")
    assert(summary.count() === 2)
    val hr = summary.filter($"department_name" === "Hr").collect()(0)
    assert(hr.getAs[String]("total_employees") === "1")
    assert(hr.getAs[String]("active_projects") === "1")
    val dim = spark.read.option("header", "true").csv(s"$outDir/dim_employees")
    assert(dim.count() === 2)                  // Bob dropped
    assert(HrValidate.dqStats(out.dqChecks).collect()(0)
      .getAs[Long]("failed") === 0L)
  }
}
