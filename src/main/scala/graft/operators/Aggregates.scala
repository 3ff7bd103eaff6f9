package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}

/** Aggregation operators (SURVEY.md §2.D).
  *
  * CQL's native aggregates are COUNT/MIN/MAX/SUM/AVG plus GROUP BY on
  * a partition-key/clustering prefix; the engine supports arbitrary
  * grouping columns as a superset. All aggregates here are hash
  * aggregates with map-side partial aggregation — the shuffle carries
  * one row per (group × partition), not per input row, so group-by
  * cardinality (≤ a few thousand here) bounds shuffle volume no matter
  * how large the fact table gets.
  */
object Aggregates extends QueryGroup {

  /** Flagship: TPC-H-Q1-shaped pricing summary over lineitem
    * (SURVEY.md §7.1). Scan → filter (pushed to parquet) → hash agg →
    * sort. Decimal-exact sums per graft.core.Num.
    */
  def q1Pricing(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_base_price"),
        Num.dsumExact(Num.d2(col("l_extendedprice")) * (one - Num.d2(col("l_discount"))))
          .as("sum_disc_price"),
        Num.dsumExact(
          Num.d2(col("l_extendedprice")) * (one - Num.d2(col("l_discount"))) *
            (one + Num.d2(col("l_tax")))).as("sum_charge"),
        Num.davg(col("l_quantity")).as("avg_qty"),
        Num.davg(col("l_extendedprice")).as("avg_price"),
        Num.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1PricingSql: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${Num.sqlDsum("l_quantity")} AS sum_qty,
      ${Num.sqlDsum("l_extendedprice")} AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
        AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) *
        (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE)
        AS sum_charge,
      ${Num.sqlDavg("l_quantity")} AS avg_qty,
      ${Num.sqlDavg("l_extendedprice")} AS avg_price,
      ${Num.sqlDavg("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> (q1Pricing _)
  )
  val oracles: Map[String, String] = Map(
    "q1_pricing" -> q1PricingSql
  )
}
