package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers that make Spark results bit-identical to the DuckDB oracle.
  *
  * Floating-point aggregation order differs between engines, so any
  * `sum(double)` is hash-unstable. We instead sum in exact decimal
  * arithmetic (deterministic in both engines regardless of add order) and
  * cast the final value back to double — both engines then produce the
  * same 64-bit value. This is also the right call at 100 TB: decimal sums
  * are exact under any partial-aggregation tree Catalyst picks.
  */
object QueryUtil {
  /** Exact decimal sum of a double column, surfaced as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Oracle-side mirror of [[dsum]]. */
  def dsumSql(col: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Deterministic average = exact decimal sum / count, divided as double. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1)).cast("double")

  def davgSql(col: String, scale: Int = 2): String =
    s"(CAST(SUM(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))"
}
