package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Num, Tables}

/** Event-sequence analytics over `events` — the funnel / cohort
  * queries a product-analytics workload runs against the same
  * wide-column event store the streaming operators consume
  * (ClickHouse's windowFunnel / retention family, re-expressed as
  * plain relational plans).
  *
  * Scale shape: both operators reduce to aggregates and joins KEYED ON
  * user_id — the natural partition key of the event store — so every
  * shuffle carries user-domain rows (bounded by the user population,
  * not the event volume), map-side partial aggregation compacts each
  * scan to one row per (user, stage/day) before anything moves, and no
  * step is all-pairs or driver-side. At 100 TB of events the working
  * set after the first aggregate is users × stages — the same shape a
  * 1000-executor cluster handles as a routine hash aggregate.
  */
object Analytics extends QueryGroup {

  /** Ordered conversion funnel signup → click → purchase within a
    * 24-hour per-stage window: a user reaches stage 2 only with a
    * click strictly AFTER their first signup and within 24 h of it,
    * stage 3 only with a purchase in the same relation to that click —
    * the ORDER + deadline constraints are what distinguish a funnel
    * (ClickHouse windowFunnel semantics) from three independent
    * counts. Three filtered per-user min-aggregates chained by
    * (user_id)-keyed joins; each stage relation is one row per
    * qualifying user. Output: funnel depth (1–3) → user count. */
  def aggFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select("user_id", "event_type", "ts")
    // each stage relation is pinned (≤ one row per user): t1 feeds
    // both t2 and the final join, t2 feeds t3 and the final join —
    // unpinned, the event-wide stage aggregates re-derive per consumer.
    // persist (NOT localCheckpoint): these are user-population-sized
    // relations, and localCheckpoint drops lineage — a lost executor
    // would make the blocks unrecoverable at cluster scale. persist
    // keeps the reuse AND the recompute path.
    import org.apache.spark.storage.StorageLevel
    val t1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, "user_id")
      .filter(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
      .groupBy("user_id").agg(min("ts").as("t2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, "user_id")
      .filter(col("ts") > col("t2") &&
        col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    t1.join(t2.select(col("user_id"), lit(true).as("s2")), Seq("user_id"), "left")
      .join(t3.select(col("user_id"), lit(true).as("s3")), Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1L) + coalesce(col("s2").cast("long"), lit(0L)) +
          coalesce(col("s3").cast("long"), lit(0L))).as("depth"))
      .groupBy("depth").agg(count(lit(1)).cast("long").as("n_users"))
      .orderBy("depth")
  }

  /** Day-0 cohort retention: users cohort by their FIRST active day;
    * for each cohort, how many were active again exactly 1 / 3 / 7
    * days later. One distinct (user, day) pass, one per-user min for
    * the cohort day, then TWO plain hash aggregates: per-(user, d0)
    * offset flags (max of a 0/1 indicator — valid because the (user,
    * day) relation is distinct, so "user was active on d0+k" is a flag,
    * not a distinct-count), then per-d0 sums of the flags. The naive
    * form — four countDistincts in one aggregate — compiles to Spark's
    * multi-distinct Expand, replicating every input row 5× through the
    * shuffle (the exact shape stats_analyze was rewritten to avoid);
    * this form shuffles each (user, day) row once and each user row
    * once, and PlanSpec pins the no-Expand plan. */
  def aggRetention(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val d0 = a.groupBy("user_id").agg(min("d").as("d0"))
    val flags = a.join(d0, "user_id")
      .groupBy("user_id", "d0")
      .agg(
        max(when(col("d") === date_add(col("d0"), 1), 1).otherwise(0)).as("f1"),
        max(when(col("d") === date_add(col("d0"), 3), 1).otherwise(0)).as("f3"),
        max(when(col("d") === date_add(col("d0"), 7), 1).otherwise(0)).as("f7"))
    flags.groupBy("d0")
      .agg(
        count(lit(1)).cast("long").as("n_cohort"),
        sum("f1").cast("long").as("n_d1"),
        sum("f3").cast("long").as("n_d3"),
        sum("f7").cast("long").as("n_d7"))
      .orderBy("d0")
  }

  /** Time-series downsampling — the metrics-rollup read every
    * wide-column time-series store serves (a Cassandra
    * (metric, day)-partitioned table rolled up from raw points): per
    * (event_type, day) bucket emit count, exact-decimal sum/avg
    * ([[graft.core.Num]] discipline — order-independent, so the hash
    * matches DuckDB), min/max, and the FIRST and LAST point value by
    * (ts, event_id) — the OHLC shape. first/last ride `min_by`/
    * `max_by` with a struct ordering key (event_id breaks ts ties
    * deterministically), which keeps the whole query ONE hash
    * aggregate: map-side partial min_by/max_by compacts every
    * partition to one row per (metric, day) before the shuffle — no
    * window, no sort, no per-key row transfer. At 100 TB of points the
    * shuffle carries only the bucket domain (metrics × days), the
    * exact shape a 1000-executor rollup job wants. */
  def aggDownsample(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        col("ts"), col("event_id"), col("value"))
    e.groupBy("event_type", "d")
      .agg(
        count(lit(1)).cast("long").as("n_points"),
        Num.dsum(col("value")).as("sum_v"),
        Num.davg(col("value")).as("avg_v"),
        min("value").as("min_v"),
        max("value").as("max_v"),
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("first_v"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("last_v"))
      .orderBy("event_type", "d")
  }

  /** Gap-filled daily series — the serving-layer read over
    * [[aggDownsample]]'s rollup (a dashboard cannot skip empty days;
    * the KairosDB/metrics-on-Cassandra gap-fill): a dense
    * (metric, day) spine generated from the global date bounds, daily
    * count zero-filled, daily exact-decimal average carried FORWARD
    * over gaps (last observation carried forward; null before a
    * metric's first observation). Scale shape: the only corpus-sized
    * stage is the daily aggregate (map-side combined onto the
    * (metric, day) domain); the spine, join and carry-forward window
    * all run on domain-sized relations, and the 1-row date bounds
    * broadcast into the spine — no collect. */
  def aggGapfill(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("value"))
    val daily = e.groupBy("event_type", "d").agg(
      count(lit(1)).as("n"), Num.davg(col("value")).as("avg_v"))
    val bounds = e.agg(min("d").as("d0"), max("d").as("d1"))
    val spine = e.select("event_type").distinct()
      .crossJoin(bounds)
      .select(col("event_type"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
    val w = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).cast("long").as("n_events"),
        col("avg_v"),
        last(col("avg_v"), ignoreNulls = true).over(w).as("avg_v_filled"))
      .orderBy("event_type", "d")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_funnel" -> (aggFunnel _),
    "agg_retention" -> (aggRetention _),
    "agg_downsample" -> (aggDownsample _),
    "agg_gapfill" -> (aggGapfill _)
  )

  val oracles: Map[String, String] = Map(
    // same stage chain: each stage's min is constrained by the prior's
    "agg_funnel" -> """
      WITH t1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
      t2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN t1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > t1.t1
          AND e.ts <= t1.t1 + INTERVAL 24 HOUR
        GROUP BY e.user_id),
      t3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN t2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > t2.t2
          AND e.ts <= t2.t2 + INTERVAL 24 HOUR
        GROUP BY e.user_id),
      depth AS (
        SELECT t1.user_id,
               1 + (t2.user_id IS NOT NULL)::BIGINT
                 + (t3.user_id IS NOT NULL)::BIGINT AS depth
        FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id))
      SELECT depth, CAST(count(*) AS BIGINT) AS n_users
      FROM depth GROUP BY depth ORDER BY depth""",
    "agg_retention" -> """
      WITH a AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      d0 AS (SELECT user_id, min(d) AS d0 FROM a GROUP BY user_id)
      SELECT d0,
        CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_cohort,
        CAST(count(DISTINCT CASE WHEN d = d0 + 1 THEN a.user_id END)
             AS BIGINT) AS n_d1,
        CAST(count(DISTINCT CASE WHEN d = d0 + 3 THEN a.user_id END)
             AS BIGINT) AS n_d3,
        CAST(count(DISTINCT CASE WHEN d = d0 + 7 THEN a.user_id END)
             AS BIGINT) AS n_d7
      FROM a JOIN d0 USING (user_id)
      GROUP BY d0 ORDER BY d0""",
    // first/last via row_number (duckdb 1.0's arg_min cannot take a
    // struct ordering key); the engine side is the one-aggregate
    // min_by/max_by form — same (ts, event_id) total order.
    "agg_downsample" -> s"""
      WITH b AS (
        SELECT event_type, CAST(ts AS DATE) AS d, ts, event_id, value
        FROM events),
      r AS (
        SELECT event_type, d, value,
          row_number() OVER (PARTITION BY event_type, d
                             ORDER BY ts, event_id) AS rn_a,
          row_number() OVER (PARTITION BY event_type, d
                             ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM b),
      agg AS (
        SELECT event_type, d,
          CAST(count(*) AS BIGINT) AS n_points,
          ${Num.sqlDsum("value")} AS sum_v,
          ${Num.sqlDavg("value")} AS avg_v,
          min(value) AS min_v, max(value) AS max_v
        FROM b GROUP BY event_type, d)
      SELECT agg.event_type, agg.d, n_points, sum_v, avg_v, min_v, max_v,
             f.value AS first_v, l.value AS last_v
      FROM agg
      JOIN r f ON f.event_type = agg.event_type AND f.d = agg.d AND f.rn_a = 1
      JOIN r l ON l.event_type = agg.event_type AND l.d = agg.d AND l.rn_d = 1
      ORDER BY agg.event_type, agg.d""",
    // dense spine from the global bounds, LOCF via IGNORE NULLS
    "agg_gapfill" -> s"""
      WITH e AS (
        SELECT event_type, CAST(ts AS DATE) AS d, value FROM events),
      daily AS (
        SELECT event_type, d, CAST(count(*) AS BIGINT) AS n,
          ${Num.sqlDavg("value")} AS avg_v
        FROM e GROUP BY event_type, d),
      b AS (SELECT min(d) AS d0, max(d) AS d1 FROM e),
      spine AS (
        SELECT event_type,
          CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                      CAST(d1 AS TIMESTAMP),
                                      INTERVAL 1 DAY)) AS DATE) AS d
        FROM (SELECT DISTINCT event_type FROM e) CROSS JOIN b)
      SELECT s.event_type, s.d,
        COALESCE(daily.n, 0) AS n_events,
        daily.avg_v,
        last_value(daily.avg_v IGNORE NULLS) OVER (
          PARTITION BY s.event_type ORDER BY s.d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_v_filled
      FROM spine s LEFT JOIN daily
        ON s.event_type = daily.event_type AND s.d = daily.d
      ORDER BY s.event_type, s.d"""
  )
}
