package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Num, Tables}

/** Window functions (SURVEY.md §2.E).
  *
  * Windows implement the wide-column read semantics the engine must
  * reproduce: last-write-wins (newest cell per key), per-partition
  * limits, and clustering-order analytics. A window partitioned by the
  * Cassandra partition key is exactly one shuffle on that key; rank
  * filters (rn <= k) are rewritten by Spark into a per-group top-k
  * physical op (WindowGroupLimit), so `win_pplimit` never materializes
  * full partitions at scale.
  */
object Windows extends QueryGroup {

  /** row_number / rank / dense_rank per partition key. */
  def winRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Last-write-wins read repair: newest version per key — THE core
    * Cassandra read semantic (SURVEY.md §1.1). Key = user_id,
    * writetime = ts, tiebreak = event_id. */
  def winLww(s: SparkSession, dir: String): DataFrame =
    graft.core.Lww.latest(
      Tables.events(s, dir), Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")

  /** lag/lead analytics: per-user session deltas over events. */
  def winAnalytic(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .select(
        col("event_id"), col("user_id"),
        lag("event_id", 1).over(w).as("prev_event"),
        lead("event_id", 1).over(w).as("next_event"),
        (Tables.epochMs(col("ts")) - Tables.epochMs(lag("ts", 1).over(w))).as("gap_ms"))
      .orderBy("event_id")
  }

  /** Running sum + moving window with explicit frames; decimal-exact
    * accumulation so the prefix sums hash-match the oracle. */
  def winFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov3 = w.rowsBetween(-2, 0)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(Num.d2(col("o_totalprice"))).over(running), 2).cast("double").as("running_total"),
        round(sum(Num.d2(col("o_totalprice"))).over(mov3), 2).cast("double").as("mov3_total"),
        count(lit(1)).over(mov3).as("mov3_n"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** CQL `PER PARTITION LIMIT n`: newest 3 orders per customer.
    * Spark rewrites the rn<=k filter to WindowGroupLimit (top-k per
    * group before the full window), verified in WindowSpec. */
  def winPpLimit(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_orderdate", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Cassandra STATIC columns: one value per partition shared by all
    * rows (SURVEY.md §1.1) — emulated as first-in-clustering-order
    * broadcast over the partition window. */
  def winStatic(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_orderdate")).over(w).as("first_order_date"),
        first(col("o_orderpriority")).over(w).as("static_priority"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Distribution window functions (percent_rank / cume_dist /
    * ntile): the per-partition rank statistics an analytics surface
    * needs for percentile bucketing. One sorted window per customer —
    * the same single-shuffle shape as every other window here. The
    * two ratio outputs are exact k/n quotients of small integers, so
    * they hash-match the oracle without decimal staging. */
  def winDistribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        ntile(4).over(w).as("quartile"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_distribution" -> (winDistribution _),
    "win_static" -> (winStatic _),
    "win_rank" -> (winRank _),
    "win_lww" -> (winLww _),
    "win_analytic" -> (winAnalytic _),
    "win_frame" -> (winFrame _),
    "win_pplimit" -> (winPpLimit _)
  )

  val oracles: Map[String, String] = Map(
    "win_distribution" -> """
      SELECT o_custkey, o_orderkey,
        PERCENT_RANK() OVER w AS pct_rank,
        CUME_DIST() OVER w AS cume,
        CAST(NTILE(4) OVER w AS INTEGER) AS quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
      ORDER BY o_custkey, o_orderkey""",
    "win_static" -> """
      SELECT o_custkey, o_orderkey,
        FIRST_VALUE(o_orderdate) OVER w AS first_order_date,
        FIRST_VALUE(o_orderpriority) OVER w AS static_priority
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""",
    "win_rank" -> """
      SELECT o_custkey, o_orderkey,
        ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      ORDER BY o_custkey, o_orderkey""",
    "win_lww" -> """
      SELECT user_id, event_id, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1 ORDER BY user_id""",
    "win_analytic" -> """
      SELECT event_id, user_id,
        LAG(event_id, 1) OVER w AS prev_event,
        LEAD(event_id, 1) OVER w AS next_event,
        epoch_ms(ts) - epoch_ms(LAG(ts, 1) OVER w) AS gap_ms
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      ORDER BY event_id""",
    "win_frame" -> """
      SELECT o_custkey, o_orderkey,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS mov3_total,
        COUNT(*) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov3_n
      FROM orders
      ORDER BY o_custkey, o_orderkey""",
    "win_pplimit" -> """
      SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn"""
  )
}
