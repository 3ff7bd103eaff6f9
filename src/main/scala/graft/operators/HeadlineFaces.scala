package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}

/** The remaining TPC-H plan faces (Q2/8/9/11/12/13/15/16/17/20/21/22),
  * adapted to the fixture schema — the fixtures carry no `partsupp`
  * table and no shipmode/commitdate/phone/comment columns, so each
  * query keeps its CANONICAL PLAN SHAPE (argmin join-back, scalar
  * subquery vs global aggregate, double aggregation, nested
  * semi/anti-join chains, left-join null counting) over the columns
  * that exist. Together with `Headline` this completes all 22 faces.
  *
  * Scale notes are per-query; the shared discipline: dimension joins
  * broadcast, fact-to-fact joins shuffle once on their natural key,
  * every monetary aggregate is decimal-exact (order-independent ⇒
  * deterministic hash vs the DuckDB oracle — see graft.core.Num),
  * and every "scalar subquery" is a 1-row aggregate that AQE
  * broadcasts, never a driver collect.
  */
object HeadlineFaces extends QueryGroup {

  private val one = lit(1).cast("decimal(18,2)")
  private def rev: Column =
    Num.d2(col("l_extendedprice")) * (one - Num.d2(col("l_discount")))
  private val sqlRev =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  /** Q2-shaped: min-cost supplier per part — the argmin join-back
    * classic. Offers = lineitem lines for EUROPE suppliers of the
    * scoped parts; per-part min cost is a keyed aggregate, the
    * join-back on (partkey, cost == min) recovers the offering rows,
    * and ties break on min suppkey (second keyed aggregate) so the
    * result is deterministic. No window over the full offer set, no
    * global sort before the top-k.
    *
    * 100 TB: part/supplier/nation/region broadcast; the only big
    * shuffle is offers on l_partkey, reused by both aggregates. */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir)
      .filter(col("p_type") === "LARGE" && col("p_size").between(10, 20))
      .select("p_partkey", "p_name")
    val eurSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val offers = Tables.lineitem(s, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
        Num.d2(col("l_extendedprice")).as("cost"))
    val minCost = offers.groupBy(col("p_partkey").as("m_partkey"))
      .agg(min(col("cost")).as("min_cost"))
    val winner = offers
      .join(minCost, col("p_partkey") === col("m_partkey") && col("cost") === col("min_cost"))
      .groupBy(col("p_partkey"), col("p_name"), col("min_cost"))
      .agg(min(col("s_suppkey")).as("w_suppkey"))
    winner
      .join(broadcast(eurSupp), col("w_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("min_cost").cast("double").as("min_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  /** Q8-shaped: national market share — one nation's revenue share of
    * a region's market for one part type, by order year. Both the
    * numerator and denominator are conditional decimal sums in the
    * SAME aggregate (no second scan, no join of two aggregates); the
    * share is one double division on the bounded per-year output. */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val suppNat = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("sn_nk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_nk"))
      .select("s_suppkey", "supp_nation")
    val zero = lit(0).cast("decimal(18,2)")
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "AMERICA")
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_5", rev).otherwise(zero)).as("nat_rev"),
        sum(rev).as("all_rev"))
      .select(col("o_year"),
        round(col("nat_rev").cast("double") / col("all_rev").cast("double"), 6)
          .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q9-shaped: product-type profit by nation and year. The fixtures
    * have no ps_supplycost, so cost = p_retailprice × quantity — the
    * same per-line decimal arithmetic, keeping the 5-way join +
    * two-key aggregate shape. */
  def q9Profit(s: SparkSession, dir: String): DataFrame = {
    val amount =
      rev - Num.d2(col("p_retailprice")) * Num.d2(col("l_quantity"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(Num.dsumExact(amount).as("sum_profit"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  /** Q11-shaped: important part values — per-part value for one
    * nation's suppliers, kept when above a fraction of the total.
    * The total is a 1-row aggregate OVER THE PER-PART RELATION
    * (bounded by the part domain, not line volume), cross-joined
    * back as a broadcast — the scalar-subquery-in-HAVING shape with
    * no driver collect. */
  def q11ImportantValues(s: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables.supplier(s, dir)
      .filter(col("s_nationkey") === 1).select("s_suppkey")
    val perPart = Tables.lineitem(s, dir)
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(Num.d2(col("l_extendedprice"))).as("value"))
    val total = perPart.agg(sum(col("value")).as("total"))
    perPart.crossJoin(total)
      .filter(col("value") > col("total") * lit(0.001))
      .select(col("l_partkey"), col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey").asc)
  }

  /** Q12-shaped: late-shipment priority split — the two-bucket
    * conditional count over a fact-to-fact join (shipmode column is
    * absent; l_returnflag plays the mode class). One shuffle on
    * orderkey, aggregate output bounded by the flag domain. */
  def q12PrioritySplit(s: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** Q13-shaped: customer order-count distribution — LEFT join so
    * order-less customers count as 0, then the double aggregation
    * (per-customer count → histogram of counts). Two shuffles:
    * custkey, then the bounded count domain. */
  def q13CustDist(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select("o_orderkey", "o_custkey")
    Tables.customer(s, dir).select("c_custkey")
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q15-shaped: top supplier — quarterly revenue per supplier, the
    * max as a 1-row aggregate over that relation, equality join-back
    * (exact decimal revenue ⇒ the equality is safe), supplier attrs
    * by broadcast. The per-supplier relation is computed once and
    * reused by both branches. */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev).as("total_rev"))
    val top = perSupp.agg(max(col("total_rev")).as("max_rev"))
    perSupp.join(top, col("total_rev") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("total_rev"), 2).cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** Q16-shaped: supplier count by part attribute — the
    * distinct-pair + NOT-IN-exclusion + count-distinct shape. The
    * supplier-part pairs come from lineitem (no partsupp table);
    * negative-balance suppliers play the complaints exclusion,
    * applied as a broadcast anti-join BEFORE the wide aggregate. */
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val parts = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 9, 14, 23, 36, 45))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
  }

  /** Q17-shaped: small-quantity-order revenue — the correlated
    * per-part average subquery, decorrelated as a keyed aggregate
    * joined back on partkey. avg(l_quantity) is exact (integral
    * doubles sum exactly in any order), so the `<` comparison is
    * deterministic across engines. */
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#23" && col("p_size") < 10)
      .select("p_partkey")
    val scoped = Tables.lineitem(s, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val avgQty = scoped.groupBy(col("l_partkey").as("a_partkey"))
      .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    scoped.join(avgQty, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((round(sum(Num.d2(col("l_extendedprice"))), 2).cast("double") / 7.0)
        .as("avg_yearly"))
      .select(round(col("avg_yearly"), 2).as("avg_yearly"))
  }

  /** Q20-shaped: excess shippers — the nested semi-join chain.
    * Suppliers who moved > 100 units of red parts in 1996: part
    * filter broadcast into lineitem, keyed HAVING aggregate, then a
    * SEMI join into supplier (each supplier emitted at most once),
    * nation filter broadcast last. */
  def q20ExcessShippers(s: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(s, dir)
      .filter(col("p_name").like("red%")).select("p_partkey")
    val movers = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > 100.0)
    Tables.supplier(s, dir)
      .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_name"))
  }

  /** Q21-shaped: suppliers who kept orders waiting — the
    * EXISTS + NOT-EXISTS double-correlation classic. No
    * commit/receipt dates in the fixture, so "failed" =
    * l_returnflag = 'R' on a finished order: count, per supplier,
    * R-lines on F-orders where ANOTHER supplier has a line on the
    * same order (EXISTS) and NO other supplier's line is R
    * (NOT EXISTS).
    *
    * Both correlations key on l_orderkey, so they collapse into ONE
    * per-order aggregate instead of the literal semi + anti joins
    * (three full lineitem shuffles, 168.7 s at ×100). And because the
    * predicates only ask "≥ 2 distinct suppliers" and "exactly 1
    * distinct failing supplier", the distincts reduce to min/max
    * tests — `min(sk) ≠ max(sk)` and `min(R-sk) = max(R-sk)` — so the
    * whole qualification is ONE codegen hash aggregate with five
    * flat buffers (the q18 shape: 60 M rows → order-domain groups,
    * map-side combined; measured 15.3 s at ×100 vs 149.9 s for the
    * two-phase distinct form and 168.7 s for literal semi + anti).
    * The failing supplier itself is min(R-sk) (= max when unique).
    * One lineitem shuffle, an orders semi join on the same key,
    * supplier names broadcast. */
  def q21WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    val rSk = when(col("l_returnflag") === "R", col("l_suppkey"))
    val perOrder = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        min(col("l_suppkey")).as("min_sk"),
        max(col("l_suppkey")).as("max_sk"),
        min(rSk).as("min_r_sk"),
        max(rSk).as("max_r_sk"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_r_lines"))
      .filter(col("min_sk") =!= col("max_sk") && // EXISTS another supplier
        col("min_r_sk").isNotNull &&
        col("min_r_sk") === col("max_r_sk")) // NOT EXISTS another failure
      .withColumn("r_sk", col("min_r_sk"))
    perOrder
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(broadcast(Tables.supplier(s, dir)), col("r_sk") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("n_r_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(100)
  }

  /** Q22-shaped: global sales opportunity — rich idle customers who
    * never placed an urgent order (no phone column; the nationkey
    * set plays the country-code substring). The average is a 1-row
    * decimal-exact aggregate broadcast into the filter; the "no
    * urgent order" correlation is an orderkey-side anti-join. */
  def q22GlobalSales(s: SparkSession, dir: String): DataFrame = {
    val nk = Seq(1, 3, 5, 7, 9, 11, 13)
    val scoped = Tables.customer(s, dir).filter(col("c_nationkey").isin(nk: _*))
    val avgBal = scoped.filter(col("c_acctbal") > 0)
      .agg((sum(Num.d2(col("c_acctbal"))).cast("double") / count(lit(1)))
        .as("avg_bal"))
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    scoped.crossJoin(avgBal)
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), Num.dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q8_market_share" -> (q8MarketShare _),
    "q9_profit" -> (q9Profit _),
    "q11_important_values" -> (q11ImportantValues _),
    "q12_priority_split" -> (q12PrioritySplit _),
    "q13_custdist" -> (q13CustDist _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q16_supplier_cnt" -> (q16SupplierCnt _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q20_excess_shippers" -> (q20ExcessShippers _),
    "q21_waiting_supplier" -> (q21WaitingSupplier _),
    "q22_global_sales" -> (q22GlobalSales _)
  )

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" -> """
      WITH eur AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
      offers AS (
        SELECT p_partkey, p_name, s_suppkey,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS cost
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN eur ON l_suppkey = s_suppkey
        WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20),
      m AS (SELECT p_partkey AS mk, min(cost) AS min_cost FROM offers GROUP BY 1),
      w AS (SELECT p_partkey, p_name, min_cost, min(s_suppkey) AS w_suppkey
            FROM offers JOIN m ON p_partkey = mk AND cost = min_cost
            GROUP BY 1, 2, 3)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
             CAST(min_cost AS DOUBLE) AS min_cost
      FROM w JOIN eur ON w_suppkey = s_suppkey
      ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
      LIMIT 100""",
    "q8_market_share" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_5' THEN {REV}
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
              CAST(SUM({REV}) AS DOUBLE), 6) AS mkt_share
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1 ORDER BY 1""",
    "q9_profit" -> """
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) -
            CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))), 2)
          AS DOUBLE) AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
      GROUP BY 1, 2 ORDER BY nation ASC, o_year DESC""",
    "q11_important_values" -> """
      WITH v AS (
        SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey = 1 GROUP BY 1)
      SELECT l_partkey, CAST(value AS DOUBLE) AS value
      FROM v WHERE value > (SELECT SUM(value) FROM v) * 0.001
      ORDER BY value DESC, l_partkey ASC""",
    "q12_priority_split" -> """
      SELECT l_returnflag,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
          AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
          AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q13_custdist" -> """
      SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey) c
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "q15_top_supplier" -> """
      WITH r AS (
        SELECT l_suppkey, SUM({REV}) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name, CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_rev
      FROM r JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_rev = (SELECT MAX(total_rev) FROM r)
      ORDER BY s_suppkey""",
    "q16_supplier_cnt" -> """
      SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        AND p_size IN (1, 5, 9, 14, 23, 36, 45)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""",
    "q17_small_quantity" -> """
      WITH scoped AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#23' AND p_size < 10),
      a AS (SELECT l_partkey AS ak, SUM(l_quantity) / COUNT(*) AS avg_qty
            FROM scoped GROUP BY 1)
      SELECT ROUND(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
               AS DOUBLE) / 7.0, 2) AS avg_yearly
      FROM scoped JOIN a ON l_partkey = ak
      WHERE l_quantity < 0.2 * avg_qty""",
    "q20_excess_shippers" -> """
      SELECT s_suppkey, s_name, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
        AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'red%'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey HAVING SUM(l_quantity) > 100)
      ORDER BY s_name""",
    "q21_waiting_supplier" -> """
      SELECT s_name, COUNT(*) AS numwait
      FROM lineitem l1
      JOIN orders ON l1.l_orderkey = o_orderkey
      JOIN supplier ON l1.l_suppkey = s_suppkey
      WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name ASC
      LIMIT 100""",
    "q22_global_sales" -> """
      WITH scoped AS (
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
      a AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
              AS avg_bal
            FROM scoped WHERE c_acctbal > 0)
      SELECT c_nationkey, COUNT(*) AS numcust,
        CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
      FROM scoped, a
      WHERE c_acctbal > avg_bal
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      GROUP BY c_nationkey ORDER BY c_nationkey"""
  ).map { case (k, v) => (k, v.replace("{REV}", sqlRev)) }
}
