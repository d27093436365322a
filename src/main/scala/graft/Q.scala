package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** One registered engine query: a Spark plan over the testdata tables plus
  * (when SQL-expressible) an equivalent DuckDB oracle statement. Queries with
  * `oracle = None` get the driver's weaker rows-only check.
  */
final case class Q(name: String, run: Tables => DataFrame,
                   oracle: Option[String] = None)

/** Cross-engine determinism helpers.
  *
  * Double sums are order-dependent, so both engines sum exact decimals and
  * convert once at the end (bit-identical doubles). Transcendental functions
  * may differ in the last ulp between the JVM and DuckDB's libm, so those
  * results are rounded to 6 decimals on both sides.
  */
object Qh {
  /** Exact money-sum: per-value decimal cast (deterministic), exact decimal
    * accumulation, one final double conversion. SQL twin: [[sqlDsum]]. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  def sqlDsum(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"

  /** Higher-precision variant for unit-scale values (ratios, weights). */
  def dsum6(c: Column): Column = sum(c.cast("decimal(28,6)")).cast("double")
  def sqlDsum6(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(28,6))) AS DOUBLE)"

  def r6(c: Column): Column = round(c, 6)
}
