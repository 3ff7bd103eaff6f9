package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for float aggregates (SURVEY.md §7.4 risk #1).
  *
  * Double summation is order-dependent, and Spark's partial-agg order
  * differs run to run and engine to engine — so a naive `sum(double)`
  * can never hash-match a DuckDB oracle. The fix: cast the 2-decimal
  * monetary doubles to DECIMAL first, sum exactly (order-independent
  * integer arithmetic), and only then convert back to double. Both
  * engines then produce bit-identical float64. Mirror the same casts
  * in the oracle SQL.
  *
  * At 100 TB this is also the *faster* choice: decimal sums stay in
  * Tungsten's hash aggregate with partial (map-side) aggregation, and
  * an order-independent aggregate never forces a sort.
  */
object Num {
  private val dec = DecimalType(18, 2)
  /** Exact 2-dp value: cast(x as decimal(18,2)). */
  def d2(c: Column): Column = c.cast(dec)
  /** Order-independent sum of a 2-dp double, returned as double. */
  def dsum(c: Column): Column = round(sum(d2(c)), 2).cast("double")
  /** Sum of a decimal-valued expression (already exact), as double. */
  def dsumExact(c: Column, scale: Int = 2): Column = round(sum(c), scale).cast("double")
  /** Deterministic average: exact decimal sum, double division. */
  def davg(c: Column, outScale: Int = 6): Column =
    round(sum(d2(c)).cast("double") / count(lit(1)), outScale)

  // Oracle-SQL (DuckDB) mirrors of the above, for building oracleSql.
  def sqlDsum(x: String): String =
    s"CAST(ROUND(SUM(CAST($x AS DECIMAL(18,2))), 2) AS DOUBLE)"
  def sqlDavg(x: String, outScale: Int = 6): String =
    s"ROUND(CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), $outScale)"
}
