package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}

/** Headline multi-join analytics (TPC-H Q3/Q5 shapes) — the
  * compound plans a user of the engine actually runs: broadcast dims,
  * sort-merge facts, decimal-exact revenue aggregation, ordered top-k.
  *
  * Plan shape at 100 TB: nation/region broadcast (zero fact shuffle),
  * lineitem⋈orders shuffles once on orderkey, the groupBy reuses the
  * aggregation key's partial aggregation, and the top-k is
  * TakeOrderedAndProject — no global sort.
  */
object Headline extends QueryGroup {

  /** Q3-shaped: unshipped-revenue top-10 by order. */
  def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    val cutoff = lit("1998-01-01").cast("timestamp")
    Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < cutoff)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > cutoff)
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Num.dsumExact(
        Num.d2(col("l_extendedprice")) * (one - Num.d2(col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Q5-shaped: revenue by nation for one region/date window. */
  def q5Supplier(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(Num.dsumExact(
        Num.d2(col("l_extendedprice")) * (one - Num.d2(col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** Q10-shaped: top-20 customers by returned-item revenue — 4-way
    * join (two broadcast), decimal-exact revenue, top-k. */
  def q10Returns(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_returnflag") === "R")
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(Num.dsumExact(
        Num.d2(col("l_extendedprice")) * (one - Num.d2(col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** Q18-shaped: large-volume orders — aggregate-then-filter (HAVING)
    * feeding a join back to the order header. The qualifying-key set
    * is data-dependent and grows roughly linearly with orders, so it
    * must NOT carry a forced broadcast hint (a hinted broadcast of an
    * unbounded aggregate is a driver OOM at 100 TB — VERDICT r2 #4).
    * Unhinted, AQE broadcasts it at runtime when its measured size is
    * small and falls back to a shuffled hash join when it isn't —
    * both plans shuffle lineitem exactly once, on l_orderkey. */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(Num.dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 150.0)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey").asc)
      .limit(50)
  }

  /** Q6-shaped: one-table revenue-forecast aggregate. The whole query
    * is a pushed scan — every predicate (date range, discount band,
    * quantity cap) reaches the parquet reader, so at 100 TB this reads
    * only the row groups the date range touches and decodes three
    * columns. The degenerate-agg benchmark classic. */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(Num.dsumExact(Num.d2(col("l_extendedprice")) * Num.d2(col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))

  /** Q4-shaped: order-priority checking via EXISTS — the correlated
    * semi-join headline shape (here: orders in a quarter with at least
    * one line shipped after the order date). The semi-join shuffles
    * each side once on orderkey and emits each order AT MOST once —
    * no fan-out, no distinct repair afterwards. */
  def q4Priority(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Q14-shaped: promo-revenue share for one month — broadcast dim
    * join + conditional decimal-exact aggregation; the ratio is one
    * driver-free double division of the two exact sums. */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    val rev = Num.d2(col("l_extendedprice")) * (one - Num.d2(col("l_discount")))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .agg(
        Num.dsumExact(when(col("p_type").startsWith("PROMO"), rev)
          .otherwise(lit(0).cast("decimal(18,2)"))).as("promo_rev"),
        Num.dsumExact(rev).as("total_rev"))
      .select(
        round(lit(100.0) * col("promo_rev").cast("double") /
          col("total_rev").cast("double"), 6).as("promo_pct"),
        col("promo_rev"), col("total_rev"))
  }

  /** Q7-shaped: bilateral trade volume — revenue by (supplier nation,
    * customer nation, ship year) for one nation pair, both directions.
    * The two-dimension-alias join classic: nation joins twice
    * (broadcast both), the pair predicate prunes BEFORE the
    * fact-to-fact shuffles, and the aggregate output is bounded by
    * 2 directions × years. */
  def q7Volume(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(
        (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(Num.dsumExact(
        Num.d2(col("l_extendedprice")) * (one - Num.d2(col("l_discount")))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q19-shaped: bracketed discounted revenue — the OR-of-ANDs
    * predicate classic (three (brand, size, quantity) brackets), all
    * row-local after one broadcast part join; one degenerate
    * decimal-exact aggregate. */
  def q19Brackets(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    val br =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#8" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .filter(br)
      .agg(Num.dsumExact(
        Num.d2(col("l_extendedprice")) * (one - Num.d2(col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q6_forecast" -> (q6Forecast _),
    "q4_priority" -> (q4Priority _),
    "q14_promo" -> (q14Promo _),
    "q3_shipping" -> (q3Shipping _),
    "q5_supplier" -> (q5Supplier _),
    "q7_volume" -> (q7Volume _),
    "q19_brackets" -> (q19Brackets _),
    "q10_returns" -> (q10Returns _),
    "q18_large_orders" -> (q18LargeOrders _)
  )

  val oracles: Map[String, String] = Map(
    "q7_volume" -> """
      WITH j AS (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')))
      SELECT supp_nation, cust_nation, l_year,
             CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS revenue
      FROM j GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q19_brackets" -> """
      SELECT
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
          AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#8' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)""",
    "q6_forecast" -> """
      SELECT
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
          CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24""",
    "q4_priority" -> """
      SELECT o_orderpriority, COUNT(*) AS n_orders
      FROM orders o
      WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        AND o_orderdate < TIMESTAMP '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q14_promo" -> """
      WITH j AS (
        SELECT CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 AS rev,
               p_type
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'),
      s AS (
        SELECT
          CAST(ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN rev
                              ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
            AS promo_rev,
          CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS total_rev
        FROM j)
      SELECT ROUND(100.0 * promo_rev / total_rev, 6) AS promo_pct,
             promo_rev, total_rev
      FROM s""",
    "q3_shipping" -> """
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
          AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey ASC
      LIMIT 10""",
    "q5_supplier" -> """
      SELECT n_name,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
          AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name ASC""",
    "q10_returns" -> """
      SELECT c_custkey, c_name, n_name,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
          AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey ASC
      LIMIT 20""",
    "q18_large_orders" -> """
      SELECT o_orderkey, o_custkey, o_orderdate, sum_qty FROM orders
      JOIN (SELECT l_orderkey,
              CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) > 150.0) b
        ON o_orderkey = b.l_orderkey
      ORDER BY sum_qty DESC, o_orderkey ASC
      LIMIT 50"""
  )
}
