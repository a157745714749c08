package graft.catalog

import org.apache.spark.sql.SparkSession

/** Dry-run query validation (SURVEY §2.1 S2) — the reference's
  * `validate_query` dry-run (bqhelpers.py:801-811): parse + typecheck
  * without executing. Spark form: force analysis of the logical plan;
  * no job is submitted. */
object QueryValidation {

  /** Returns None when the query parses and analyzes; Some(error)
    * otherwise. Never runs the query. */
  def validate(spark: SparkSession, sql: String): Option[String] =
    try {
      spark.sql(sql).queryExecution.analyzed
      None
    } catch {
      case e: Exception => Some(e.getMessage)
    }
}
