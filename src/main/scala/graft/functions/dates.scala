package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date handling (reference: bronze_to_silver.py:80-92).
  *
  * Multi-format parsing is a coalesce of per-format parsers — pure built-in
  * expressions, no UDF, so it stays inside whole-stage codegen. Format
  * order matters for ambiguous dates (`03/04/2022` resolves day-first
  * because dd/MM/yyyy is tried before MM/dd/yyyy — reference order,
  * bronze_to_silver.py:86-87).
  *
  * Spark 4 runs in ANSI mode where `to_date` *throws* on malformed input, so
  * each candidate goes through `try_to_timestamp` (null on mismatch) — the
  * Spark-4-safe spelling of the reference's PERMISSIVE parse.
  */
object dates {

  val referenceFormats: Seq[String] =
    Seq("dd-MMM-yy", "yyyy-MM-dd", "dd/MM/yyyy", "MM/dd/yyyy")

  def parseDateMulti(c: Column, formats: Seq[String] = referenceFormats): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f)).cast("date")): _*)

  /** yyyyMM partition key (reference: bronze_to_silver.py:90-92). */
  def ym(dateCol: Column): Column = date_format(dateCol, "yyyyMM")

  /** Open-interval sentinel for SCD2 (reference: gold_sql_to_postgres.py:123). */
  val HighDate: Column = to_date(lit("9999-12-31"))
}
