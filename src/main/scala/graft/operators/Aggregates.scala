package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Window
import graft.core.{Num, Tables}
import graft.functions.WeightedAvg

/** Aggregation operators (SURVEY.md §2.D).
  *
  * CQL's native aggregates are COUNT/MIN/MAX/SUM/AVG plus GROUP BY on
  * a partition-key/clustering prefix; the engine supports arbitrary
  * grouping columns, rollup/cube/grouping-sets, and UDAs as supersets.
  * All aggregates are hash aggregates with map-side partial
  * aggregation — the shuffle carries one row per (group × partition),
  * so group cardinality, not fact-table size, bounds shuffle volume.
  * Counter-column semantics (commutative increments) are exactly a
  * groupBy-sum merge at read time.
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

  /** CQL whole-table aggregates: COUNT/MIN/MAX/SUM/AVG (+ exact
    * COUNT DISTINCT, an engine superset). */
  def aggGlobal(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_suppkey")).as("n_supp"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      Num.dsum(col("l_extendedprice")).as("sum_price"),
      Num.davg(col("l_discount")).as("avg_disc"),
      min(col("l_shipdate")).as("min_ship"),
      max(col("l_shipdate")).as("max_ship"))

  /** GROUP BY arbitrary column (CQL allows key prefixes only). */
  def aggGroupBy(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_cust"),
        Num.dsum(col("c_acctbal")).as("sum_bal"),
        Num.davg(col("c_acctbal")).as("avg_bal"))
      .orderBy("c_mktsegment")

  /** SELECT DISTINCT on a column pair. */
  def aggDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select("o_orderstatus", "o_orderpriority")
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  /** HLL++ approximate distinct — the 100 TB path where exact
    * countDistinct's shuffle is unaffordable. Deterministic for fixed
    * input but engine-specific ⇒ no oracle (rows-only check). */
  def aggApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))

  /** Cassandra counter-column semantics: merge commutative increments
    * into the current value at read time. */
  def aggCounter(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_increments"),
        Num.dsum(col("value")).as("counter_value"))
      .orderBy("user_id")

  /** ROLLUP over (returnflag, linestatus). */
  def aggRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(Num.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** CUBE over (returnflag, linestatus). */
  def aggCube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(Num.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Explicit GROUPING SETS ((flag), (status), ()). */
  def aggGsets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(Num.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** CQL CREATE AGGREGATE equivalent: weighted avg via a typed
    * Aggregator (graft.functions.WeightedAvg). */
  def aggUdaf(s: SparkSession, dir: String): DataFrame = {
    val wavg = udaf(WeightedAvg, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 6).as("wavg_price"))
      .orderBy("l_returnflag")
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

  /** Exact continuous quantiles (median / p90) — both engines use
    * linear interpolation over the sorted values, so the doubles agree
    * after round(6). The scale path is approx_percentile (see
    * aggApproxDistinct for the same exact-vs-sketch tradeoff). */
  def aggQuantile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Nested-result aggregation: per-group sorted value lists
    * (collect_set/sort_array ↔ DuckDB list + list_sort). */
  def aggCollect(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        // collect_set under test; joined to a scalar so the driver's
        // pandas compare can hash the column (arrays are unhashable there)
        array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** Two-phase skew-safe aggregation: salt the hot grouping key
    * (l_returnflag has 3 values — the classic skew shape), partially
    * aggregate per (key, salt), then merge the partials. Decimal-exact
    * sums are associative, so the result is bit-identical to the
    * direct groupBy — which IS the oracle. At 100 TB this caps any
    * single reducer's input at 1/16 of the hottest key. */
  def aggSkewTwophase(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("_salt", pmod(xxhash64(col("l_orderkey")), lit(16)))
      .groupBy(col("l_returnflag"), col("_salt"))
      .agg(
        count(lit(1)).as("pn"),
        sum(Num.d2(col("l_quantity"))).as("pq"),
        sum(Num.d2(col("l_extendedprice"))).as("pp"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("pn")).as("n"),
        round(sum(col("pq")), 2).cast("double").as("sum_qty"),
        round(sum(col("pp")), 2).cast("double").as("sum_price"))
      .orderBy("l_returnflag")

  /** Approximate percentiles (GK sketch) — the 100 TB path where the
    * exact sort-based percentile is unaffordable. Deterministic for a
    * fixed input but engine-specific ⇒ rows-only; tolerance vs the
    * exact quantiles asserted in KernelSpec. */
  def aggQuantileApprox(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p50_approx"),
        percentile_approx(col("l_quantity"), lit(0.9), lit(1000)).as("p90_approx"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Heavy hitters (one-pass frequent-items sketch): a SUPERSET of
    * every value with frequency above the support threshold — the
    * 100 TB alternative to an exact count-sort when only the hot keys
    * matter. Result set is encounter-order dependent (sketch) ⇒
    * rows-only; the superset guarantee is asserted in KernelSpec. */
  def aggFreqItems(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).stat
      .freqItems(Seq("l_returnflag", "l_linestatus"), 0.3)
      .select(
        array_join(array_sort(col("l_returnflag_freqItems")), ",").as("flag_heavy"),
        array_join(array_sort(col("l_linestatus_freqItems")), ",").as("status_heavy"))

  private val sketchBuilt =
    new graft.core.BuildOnce[String, String]

  /** Mergeable-sketch rollup — the 100 TB incremental-aggregation
    * pattern: per-day HLL sketches of distinct users are built ONCE
    * and persisted (a nightly job appends one day's sketch row, never
    * rescans history), then any rollup window — here per-week — is
    * answered by MERGING the tiny sketch rows, not by re-reading the
    * events. Sketch estimates are register-maxima based: insertion
    * and merge order don't change them, so the output is
    * deterministic and partitioning-insensitive (DeterminismSpec),
    * but engine-specific (DataSketches HLL) ⇒ rows-only; accuracy vs
    * exact distinct counts is asserted in KernelSpec. */
  def aggSketchMerge(s: SparkSession, dir: String): DataFrame = {
    val path = sketchBuilt.getOrElseUpdate(dir, {
      val p = graft.core.RunId.scratch(
        "daily_sketches/" + dir.replaceAll("[^A-Za-z0-9]", "_"))
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          count(lit(1)).as("n_events"))
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
      .groupBy(weekofyear(col("day")).as("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_uniques"),
        sum("n_events").as("n_events"))
      .orderBy("week")
  }

  private val typedSketchBuilt =
    new graft.core.BuildOnce[String, String]

  /** Sketch set-operation — audience OVERLAP from persisted sketches
    * ([[aggSketchMerge]]'s sibling): "how many users both clicked and
    * purchased this week" answered WITHOUT re-reading events, via
    * inclusion–exclusion over the per-(day, event_type) HLL sketches:
    * |A∩B| ≈ est(A) + est(B) − est(A∪B). HLL unions are exact over
    * the sketch lattice (register maxima), so the only approximation
    * is HLL's own; intersection via inclusion–exclusion inherits both
    * arms' error — acceptable for audience sizing, and the KernelSpec
    * gate asserts the estimate lands within tolerance of the exact
    * overlap. Deterministic (order-free register maxima) but
    * engine-specific ⇒ rows-only. The sketch table is (days × types)
    * rows at ANY event volume — the rollup never touches the corpus.
    */
  def aggSketchIntersect(s: SparkSession, dir: String): DataFrame = {
    val path = typedSketchBuilt.getOrElseUpdate(dir, {
      val p = graft.core.RunId.scratchKeyed("daily_type_sketches", dir)
      Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .write.mode("overwrite").parquet(p)
      p
    })
    val sk = s.read.parquet(path)
      .withColumn("week", weekofyear(col("day")))
    val per = sk.groupBy("week", "event_type")
      .agg(hll_union_agg(col("sk")).as("sk"))
    val arms = per.groupBy("week")
      .pivot("event_type", Seq("click", "purchase"))
      .agg(first(col("sk")))
    val both = sk.groupBy("week").agg(hll_union_agg(col("sk")).as("sk_union"))
    // a week may lack one arm entirely (boundary weeks): its pivot
    // cell is a NULL sketch ⇒ estimate 0, and inclusion–exclusion is
    // clamped at 0 (it can dip below zero by sketch error even when
    // both arms exist)
    def est(c: Column): Column =
      coalesce(floor(hll_sketch_estimate(c)).cast("long"), lit(0L))
    arms.join(both, "week")
      .select(col("week"),
        est(col("click")).as("est_click"),
        est(col("purchase")).as("est_purchase"),
        est(col("sk_union")).as("est_union"))
      .withColumn("est_overlap",
        greatest(lit(0L),
          col("est_click") + col("est_purchase") - col("est_union")))
      .orderBy("week")
  }

  /** Join-key skew diagnostic — the planning input behind every
    * salting/AQE-skew decision ([[graft.operators.Joins.joinSalted]]
    * acts on exactly this report): per-key row counts for a join key,
    * the top-10 heavy hitters, and the global skew ratio
    * (max·n_keys/total — 1.0 ⇒ perfectly uniform). One map-side-
    * combining aggregate to the key domain, one 1-row stats aggregate
    * broadcast back, rank rides TakeOrderedAndProject via the
    * orderBy+limit — nothing key-domain-sized ever sorts globally.
    * All-integer surfaces except the two declared exact divisions. */
  def statsSkew(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey").as("key"))
      .agg(count(lit(1)).as("key_rows"))
    val tot = per.agg(
      count(lit(1)).as("n_keys"),
      sum("key_rows").cast("long").as("total_rows"),
      max("key_rows").as("max_rows"))
    per.crossJoin(tot)
      .select(col("key"), col("key_rows"), col("n_keys"), col("total_rows"),
        round(col("total_rows").cast("double") / col("n_keys"), 6).as("avg_rows"),
        round(col("max_rows").cast("double") * col("n_keys") / col("total_rows"), 6)
          .as("skew_ratio"))
      .orderBy(col("key_rows").desc, col("key").asc)
      .limit(10)
  }

  /** Partition-size histogram — the `nodetool tablehistograms` face:
    * Cassandra operators read partition-size percentiles (p50/p75/
    * p95/p98/p99 over rows-per-partition and bytes-per-partition) to
    * spot the wide-partition pathology before it melts a replica. The
    * engine's partition domain is the LWW fixture's: `user_id` over
    * events. Byte size is the deterministic serialized-cell estimate
    * (string lengths + 8 bytes per fixed-width cell — an estimate by
    * contract, same as Cassandra's own mean-partition-size estimate).
    * Shape: ONE map-side-combining aggregate to the partition domain,
    * then exact `percentile` over the (small-relative-to-corpus)
    * per-partition relation — the same exact-vs-approx_percentile
    * declared tradeoff as [[aggQuantile]]; at billions of partitions
    * the scale path swaps in approx_percentile, identical plan
    * otherwise. Output is percentile-domain (5 rows). */
  def statsPartitionHist(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("p_rows"),
        sum(length(col("event_type")) + length(col("props")) + lit(24))
          .as("p_bytes"))
    val pcts = Seq(0.50, 0.75, 0.95, 0.98, 0.99)
    val agg0 = per.agg(
      count(lit(1)).as("n_partitions"),
      (pcts.zipWithIndex.flatMap { case (q, i) => Seq(
        round(expr(s"percentile(p_rows, $q)"), 6).as(s"r$i"),
        round(expr(s"percentile(p_bytes, $q)"), 6).as(s"b$i"))
      }): _*)
    agg0.select(col("n_partitions"), expr(
      "stack(5, " + pcts.zipWithIndex.map { case (q, i) =>
        s"${(q * 100).round}, r$i, b$i"
      }.mkString(", ") + ") as (pct, rows_p, bytes_p)"))
      .select(col("pct"), col("rows_p"), col("bytes_p"), col("n_partitions"))
      .orderBy("pct")
  }

  /** Per-group mode (most frequent value): count per (group, value),
    * then an argmax aggregation — two hash aggregates, both
    * partial-aggregable, no sort/window. Tie-break: highest count,
    * then alphabetically first value, so the result is deterministic. */
  def aggMode(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(
        min_by(col("event_type"),
          struct((-col("cnt")).as("nc"), col("event_type"))).as("mode_type"),
        max(col("cnt")).as("mode_n"))
      .orderBy("user_id")

  /** Incremental materialized-view maintenance — the engine-side MV
    * story at 100 TB: the standing per-user aggregate is NOT
    * recomputed when a change batch lands; the batch's own partial
    * aggregate merges into the view by key (counts add, decimal sums
    * add exactly). Work is |batch| + |touched keys| — a keyed
    * outer-join of two aggregates — independent of base history size.
    * The oracle recomputes the view from ALL events, proving the
    * incremental merge ≡ full refresh. */
  def mvIncremental(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-12 00:00:00").cast("timestamp_ntz")
    val e = Tables.events(s, dir).select("user_id", "value", "ts")
    val mv = e.filter(col("ts") <= cutoff)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(Num.d2(col("value"))).as("sv"))
    val delta = e.filter(col("ts") > cutoff)
      .groupBy("user_id")
      .agg(count(lit(1)).as("dn"), sum(Num.d2(col("value"))).as("dsv"))
    mv.join(delta, Seq("user_id"), "full")
      .select(
        col("user_id"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_events"),
        round(coalesce(col("sv"), lit(0).cast("decimal(28,2)")) +
          coalesce(col("dsv"), lit(0).cast("decimal(28,2)")), 2)
          .cast("double").as("sum_value"))
      .orderBy("user_id")
  }

  /** Incremental maintenance of a JOIN view — the delta-rule case
    * [[mvIncremental]] (aggregate deltas) does not cover: the MV is
    * the denormalized orders⋈customer view, and a change batch
    * (updates to existing orders + new orders) refreshes it WITHOUT
    * re-joining the base — only Δ joins the dimension (ΔO ⋈ C), and
    * stale MV rows retire via an anti-join on Δ's keys. At 100 TB
    * the base MV is petabyte-scale but the refresh cost is
    * |Δ| · broadcast(C-slice) + one anti-join keyed on the MV's own
    * partition key; Δ is batch-bounded by construction (a CDC window,
    * the hint_replay discipline). Refreshed state ≡ joining the
    * upserted base directly — the oracle states exactly that. */
  def mvIncrementalJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir).select("c_custkey", "c_name", "c_nationkey")
    def joined(orders: DataFrame): DataFrame =
      orders.join(c, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("c_name"), col("c_nationkey"))
    // base snapshot materialized before the batch; the change batch
    // carries price corrections for keys %10=5 and inserts for %10=0
    val base = o.filter(pmod(col("o_orderkey"), lit(10)) =!= 0)
    val delta = o.filter(pmod(col("o_orderkey"), lit(10)) === 5)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
      .unionByName(o.filter(pmod(col("o_orderkey"), lit(10)) === 0))
    val mv = joined(base)
    mv.join(broadcast(delta.select("o_orderkey")), Seq("o_orderkey"), "left_anti")
      .unionByName(joined(delta))
      .orderBy("o_orderkey")
  }

  /** The event-type domain for the pivot pair — passing it explicitly
    * matters at scale: `pivot(col)` without values runs an EXTRA
    * distinct scan over the fact table just to learn the columns, and
    * makes the output schema data-dependent (a new type appearing in
    * one partition would change the relation's shape). A fixed, declared
    * domain keeps the pivot a single pass with a static schema. */
  private[graft] val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** PIVOT: one row per user, one count column per event type — the
    * wide activity profile a feature store materializes. Single hash
    * aggregate (map-side partial combine on user_id); the pivot is just
    * a conditional-aggregation rewrite, no extra shuffle. */
  def aggPivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .select(col("user_id") +: EventTypes.map(t => col(t).as(s"n_$t")): _*)
      .orderBy("user_id")

  /** UNPIVOT: the inverse — melt the wide profile back to long
    * (user_id, event_type, n) form, dropping the zero cells the wide
    * form padded in. Row-local `stack`, no shuffle beyond the pivot's
    * own aggregate; the pair round-trips to the plain groupBy count
    * the oracle states. */
  def aggUnpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = aggPivot(s, dir)
    val stackArgs = EventTypes.map(t => s"'$t', n_$t").mkString(", ")
    wide.select(col("user_id"),
        expr(s"stack(${EventTypes.size}, $stackArgs) AS (event_type, n)"))
      .filter(col("n") > 0)
      .orderBy("user_id", "event_type")
  }

  /** ANALYZE-style column statistics — the CBO-stats surface (`nodetool
    * tablestats` / ANALYZE TABLE): n_rows, exact NDV, null count and
    * min/max per analyzed column, emitted one row per column.
    *
    * Shape, measured not assumed: the tempting single-pass form (all
    * four exact NDVs fused into one aggregate) compiles to Spark's
    * multi-distinct EXPAND — every input row is replicated once per
    * distinct column, so ×100 lineitem pushed 300 M rows through one
    * shuffle: 155 s. One aggregate PER COLUMN instead keeps each NDV a
    * two-phase partial-distinct (map-side dedup, shuffle carries only
    * surviving distinct values): four cheap scans beat one 5×-inflated
    * shuffle ~7× (≈22 s materialized at ×100, 14.7 M-NDV orderkey
    * column included). At 100 TB exact NDV is still the
    * heavy stat — the HLL path (agg_approx_distinct) is the documented
    * downgrade when approximate is acceptable. Values normalize to
    * strings so one relation carries mixed types (dates at date
    * granularity — the cross-engine-stable cast). */
  def statsAnalyze(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val cols = Seq(
      "l_orderkey" -> col("l_orderkey"),
      "l_quantity" -> col("l_quantity"),
      "l_returnflag" -> col("l_returnflag"),
      "l_shipdate" -> to_date(col("l_shipdate")))
    // NOTE (r16): a fused single-pass variant (all four countDistincts
    // in one aggregate, stack() reshape) was tried and MEASURED 6.0 s
    // steady vs ~1.0 s for this union at sf0.1 — Spark plans the four
    // distincts as a ×5 Expand, and the expanded row volume costs more
    // than the three extra column-pruned scans save. Reverted; the
    // per-column union stands.
    cols.map { case (n, v) =>
      li.agg(
        count(lit(1)).cast("long").as("n_rows"),
        countDistinct(col(n)).cast("long").as("ndv"),
        sum(col(n).isNull.cast("long")).cast("long").as("n_null"),
        min(v).cast("string").as("min_v"),
        max(v).cast("string").as("max_v"))
        .select(lit(n).as("col_name"), col("n_rows"), col("ndv"),
          col("n_null"), col("min_v"), col("max_v"))
    }.reduce(_ unionByName _)
      .orderBy("col_name")
  }

  /** Equi-width histogram of a monetary column — the ANALYZE sibling
    * (Cassandra's nodetool tablehistograms / the optimizer histogram
    * a CBO keeps per column). Exact integer-cent arithmetic
    * throughout: the 2-dp price becomes BIGINT cents, bucket ids are
    * integer division against the min/max span — no float rounding
    * anywhere, so the DuckDB hash matches bit-for-bit. Two passes over
    * the data (inherent to exact equi-width): a 1-row min/max bounds
    * aggregate broadcast into the second scan, then ONE hash aggregate
    * onto the 20-bucket domain — map-side combine compacts every
    * partition to ≤20 rows before the shuffle. At 100 TB both passes
    * are embarrassingly parallel scans; nothing data-sized moves. */
  def statsHistogram(s: SparkSession, dir: String): DataFrame = {
    val cents = Tables.lineitem(s, dir)
      .select((Num.d2(col("l_extendedprice")) * 100).cast("long").as("xc"))
    // no broadcast hint: the bounds side is a GLOBAL aggregate (exactly
    // 1 row) and Spark's post-aggregate size estimate already picks
    // BroadcastNestedLoopJoin for the cross join — the repo-wide
    // no-hint-over-aggregate guard (PlanSpec) stays intact.
    val bounds = cents.agg(min("xc").as("minc"), max("xc").as("maxc"))
    cents.crossJoin(bounds)
      .select(col("xc"),
        expr("((xc - minc) * 20) div (maxc - minc + 1)").cast("int").as("bucket"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).cast("long").as("n"),
        (min("xc").cast("double") / 100).as("lo_v"),
        (max("xc").cast("double") / 100).as("hi_v"))
      .orderBy("bucket")
  }

  /** Pearson correlation between column pairs per group — the
    * cross-column statistic a cost-based optimizer keeps alongside
    * the [[statsAnalyze]] per-column stats (and the sanity check a
    * feature-engineering pass runs before training). Hash-exact by
    * the [[graft.core.Num]] discipline extended to second moments:
    * every Σx, Σx², Σxy is an ORDER-INDEPENDENT exact decimal sum
    * (2-dp inputs ⇒ 4-dp products, exact in decimal(38,4)); only the
    * final scalar formula runs in float64, written with identical
    * association in both engines, so the result is bit-identical.
    * ONE map-side-combining hash aggregate onto the flag domain —
    * nothing data-sized shuffles at any scale. */
  def statsCorr(s: SparkSession, dir: String): DataFrame = {
    val q = Num.d2(col("l_quantity"))
    val p = Num.d2(col("l_extendedprice"))
    val d = Num.d2(col("l_discount"))
    // zero-variance guard (NULLIF mirror): double ÷ 0 diverges between
    // engines (Spark → NULL, DuckDB IEEE → ±inf), so a degenerate
    // constant-column group must be NULL on BOTH surfaces.
    def corr(sx: Column, sy: Column, sxx: Column, syy: Column, sxy: Column,
        n: Column): Column = {
      val den = (n * sxx - sx * sx) * (n * syy - sy * sy)
      when(den =!= 0, round((n * sxy - sx * sy) / sqrt(den), 6))
    }
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("nf"),
        sum(q).cast("double").as("sq"), sum(p).cast("double").as("sp"),
        sum(d).cast("double").as("sd"),
        sum(q * q).cast("double").as("sqq"), sum(p * p).cast("double").as("spp"),
        sum(d * d).cast("double").as("sdd"),
        sum(q * p).cast("double").as("sqp"), sum(q * d).cast("double").as("sqd"))
      .select(col("l_returnflag"),
        col("nf").cast("long").as("n"),
        corr(col("sq"), col("sp"), col("sqq"), col("spp"), col("sqp"),
          col("nf")).as("corr_qty_price"),
        corr(col("sq"), col("sd"), col("sqq"), col("sdd"), col("sqd"),
          col("nf")).as("corr_qty_disc"))
      .orderBy("l_returnflag")
  }

  /** Per-group least-squares regression — the SQL:2003 REGR_* family
    * (REGR_SLOPE / REGR_INTERCEPT / REGR_R2) on [[statsCorr]]'s
    * decimal-exact-moment discipline: Spark's and DuckDB's own
    * regr_slope aggregate doubles in partial-aggregation order, so
    * both engines instead compute the identical scalar formula from
    * order-independent DECIMAL Σx/Σy/Σx²/Σxy. Same one-aggregate
    * shape, zero-variance NULLIF guard included. */
  def statsRegression(s: SparkSession, dir: String): DataFrame = {
    val x = Num.d2(col("l_quantity"))
    val y = Num.d2(col("l_extendedprice"))
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("nf"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"),
        sum(x * y).cast("double").as("sxy"))
      .select(col("l_returnflag"),
        col("nf").cast("long").as("n"),
        when(col("nf") * col("sxx") - col("sx") * col("sx") =!= 0,
          round((col("nf") * col("sxy") - col("sx") * col("sy")) /
            (col("nf") * col("sxx") - col("sx") * col("sx")), 6)).as("slope"),
        when(col("nf") * col("sxx") - col("sx") * col("sx") =!= 0,
          round((col("sy") - (col("nf") * col("sxy") - col("sx") * col("sy")) /
            (col("nf") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
            col("nf"), 6)).as("intercept"),
        when((col("nf") * col("sxx") - col("sx") * col("sx")) *
            (col("nf") * col("syy") - col("sy") * col("sy")) =!= 0,
          round((col("nf") * col("sxy") - col("sx") * col("sy")) *
            (col("nf") * col("sxy") - col("sx") * col("sy")) /
            ((col("nf") * col("sxx") - col("sx") * col("sx")) *
             (col("nf") * col("syy") - col("sy") * col("sy"))), 6)).as("r2"))
      .orderBy("l_returnflag")
  }

  /** Welch's two-sample t-test between every pair of l_returnflag
    * populations on l_extendedprice — the hypothesis-test face of the
    * stats family (is the mean price of returned lineitems actually
    * different?): ONE decimal-moment aggregate to the 3-row flag
    * domain (map-side-combining, corpus-linear — the
    * [[statsRegression]] discipline), then the t statistic and the
    * Welch–Satterthwaite df assembled on the bounded pair self-join
    * (flag-domain², never row data). Same-structured IEEE double
    * arithmetic over exact decimal moments is bit-identical in
    * DuckDB, so the whole face is hash-exact — including sqrt, per
    * the stats_corr precedent. */
  def statsTtest(s: SparkSession, dir: String): DataFrame = {
    val x = Num.d2(col("l_extendedprice"))
    val m = Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("nf"),
        sum(x).cast("double").as("sx"),
        sum(x * x).cast("double").as("sxx"))
    val a = m.select(col("l_returnflag").as("g1"), col("nf").as("n1"),
      col("sx").as("sx1"), col("sxx").as("sxx1"))
    val b = m.select(col("l_returnflag").as("g2"), col("nf").as("n2"),
      col("sx").as("sx2"), col("sxx").as("sxx2"))
    val mean1 = col("sx1") / col("n1")
    val mean2 = col("sx2") / col("n2")
    // se_i = sample variance / n_i, spelled left-associatively so the
    // oracle's identical text computes the identical float
    val se1 = (col("sxx1") - col("sx1") * col("sx1") / col("n1")) /
      (col("n1") - 1) / col("n1")
    val se2 = (col("sxx2") - col("sx2") * col("sx2") / col("n2")) /
      (col("n2") - 1) / col("n2")
    a.join(b, col("g1") < col("g2")) // 3-row × 3-row pair domain
      .select(
        col("g1"), col("g2"),
        col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
        round(mean1, 6).as("mean1"), round(mean2, 6).as("mean2"),
        round((mean1 - mean2) / sqrt(se1 + se2), 6).as("t_stat"),
        round((se1 + se2) * (se1 + se2) /
          (se1 * se1 / (col("n1") - 1) + se2 * se2 / (col("n2") - 1)), 6)
          .as("df_welch"))
      .orderBy("g1", "g2")
  }

  /** One-way ANOVA across ALL l_returnflag populations on
    * l_extendedprice — [[statsTtest]] answers pairwise, this answers
    * "does the factor matter at all": between/within sums of squares
    * from the same ONE decimal-moment aggregate, F = (SSB/df_b) /
    * (SSW/df_w). Group moments stay DECIMAL (order-free) until the
    * bounded flag domain; the 3 per-group float terms are quantized to
    * 6 dp and summed as DECIMAL(38,6) — the sample_temperature
    * discipline — so the cross-group sums are order-free too and the
    * whole face hash-matches DuckDB. Grand totals ride an unhinted
    * 1-row cross join (the stats_histogram bounds pattern — AQE
    * broadcasts on measured size), never a second corpus pass. */
  def statsAnova(s: SparkSession, dir: String): DataFrame = {
    val x = Num.d2(col("l_extendedprice"))
    val m = Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("nf"),
        sum(x).as("sxd"),
        sum(x * x).as("sxxd"))
    val g = m.agg(
      count(lit(1)).cast("double").as("k"),
      sum(col("nf")).as("nn"),
      sum(col("sxd")).as("sxg")) // decimal: exact, order-free
    val mi = col("sxd").cast("double") / col("nf")
    val mg = col("sxg").cast("double") / col("nn")
    val termB = col("nf") * ((mi - mg) * (mi - mg))
    val termW = col("sxxd").cast("double") -
      col("sxd").cast("double") * col("sxd").cast("double") / col("nf")
    // no broadcast hint: the grand-total side is a GLOBAL aggregate
    // (the stats_histogram bounds pattern) — a hinted broadcast over an
    // aggregate is the guarded scale-killer; unhinted, AQE broadcasts
    // the 1-row side on its measured size
    val agg = m.crossJoin(g)
      .agg(
        max(col("k")).as("kf"), max(col("nn")).as("nn"),
        sum(round(termB, 6).cast("decimal(38,6)")).cast("double").as("ssb"),
        sum(round(termW, 6).cast("decimal(38,6)")).cast("double").as("ssw"))
    agg.select(
      col("kf").cast("long").as("k"),
      col("nn").cast("long").as("n"),
      round(col("ssb"), 6).as("ssb"),
      round(col("ssw"), 6).as("ssw"),
      (col("kf") - 1).cast("long").as("df_between"),
      (col("nn") - col("kf")).cast("long").as("df_within"),
      round((col("ssb") / (col("kf") - 1)) /
        (col("ssw") / (col("nn") - col("kf"))), 6).as("f_stat"),
      round(col("ssb") / (col("ssb") + col("ssw")), 6).as("eta_sq"))
  }

  /** Pearson chi-square test of independence between the two
    * categorical lineitem dimensions (returnflag × linestatus) —
    * completes the hypothesis-test trio next to [[statsTtest]]
    * (means) and [[statsAnova]] (factor): ONE contingency aggregate
    * to the ≤(3×2)-cell domain (map-side-combining, corpus-linear),
    * marginals/grand totals as domain-sized aggregates joined back on
    * the cell domain (no global window — a single-partition exchange,
    * however small, is the banned shape),
    * per-cell (o−e)²/e terms quantized to 6 dp and summed as
    * DECIMAL(38,6) so the cross-cell sum is order-free — hash-exact.
    * Cramér's V rides along as the effect size. Counts are exact
    * integers, so o, e, and the marginals are bit-identical in both
    * engines before any float enters. */
  def statsChi2(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("o")) // the ONE corpus aggregate, ≤ 6 rows
    // marginals/grand totals as domain-sized aggregates joined back in
    // (no global window — a single-partition exchange, however small,
    // is the shape the plan discipline bans); all joins are on the
    // ≤6-row cell domain
    val rt = cells.groupBy("l_returnflag").agg(sum("o").as("r_tot"))
    val ct = cells.groupBy("l_linestatus").agg(sum("o").as("c_tot"))
    val g = cells.agg(sum("o").as("n"),
      countDistinct("l_returnflag").as("n_r"),
      countDistinct("l_linestatus").as("n_c"))
    val t = cells.join(rt, "l_returnflag").join(ct, "l_linestatus")
      .crossJoin(g)
      .withColumn("e", col("r_tot").cast("double") * col("c_tot").cast("double")
        / col("n").cast("double"))
      .withColumn("term",
        (col("o").cast("double") - col("e")) * (col("o").cast("double") - col("e"))
          / col("e"))
    t.agg(
        max(col("n")).as("nl"),
        max(col("n_r")).as("nr"), max(col("n_c")).as("nc"),
        sum(round(col("term"), 6).cast("decimal(38,6)")).cast("double")
          .as("chi2d"))
      .select(
        col("nl").as("n"),
        ((col("nr") - 1) * (col("nc") - 1)).cast("long").as("df"),
        round(col("chi2d"), 6).as("chi2"),
        round(sqrt(col("chi2d") / (col("nl").cast("double") *
          least(col("nr") - 1, col("nc") - 1).cast("double"))), 6)
          .as("cramers_v"))
  }

  /** Two-sample Kolmogorov–Smirnov test — the distribution-shape
    * member of the stats family ([[statsTtest]] compares means, this
    * compares the WHOLE empirical CDF): D = sup over values of
    * |F_A(v) − F_N(v)| between the 'A' and 'N' l_returnflag
    * populations on l_extendedprice, plus the scaled statistic
    * λ = D·√(n₁n₂/(n₁+n₂)) and the α=0.05 decision against the
    * asymptotic critical value 1.358·√((n₁+n₂)/n₁n₂).
    *
    * Shape at scale: ONE corpus aggregate to the (distinct value)
    * relation with per-population counts; the running CDFs come from
    * the two-phase bucketed rank ([[Shards.orderedFrom]] discipline) —
    * values bucket by the FIXED price domain (v div 1000, ≤ ~115
    * buckets at any SF), per-bucket totals collect driver-side
    * (bounded planning state, the gated-collect class), scanLeft
    * offsets broadcast back, and the within-bucket cumulative runs
    * under `Window.partitionBy(bucket)` — no single-partition
    * exchange anywhere. The sup and its location reduce the
    * distinct-value relation twice (max, then min value attaining
    * it); CDF ratios are integer-over-integer doubles, so the whole
    * face is hash-exact against DuckDB's plain windowed mirror. */
  def statsKs(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    val pv = Tables.lineitem(s, dir)
      .filter(col("l_returnflag").isin("A", "N"))
      .select(col("l_returnflag").as("g"), Num.d2(col("l_extendedprice")).as("v"))
      .groupBy("v").agg(
        sum(when(col("g") === "A", 1L).otherwise(0L)).as("c1"),
        sum(when(col("g") === "N", 1L).otherwise(0L)).as("c2"))
      .withColumn("b", floor(col("v") / 1000).cast("int"))
      .cache() // two consumers: the offsets collect and the CDF pass
    val counts = pv.groupBy("b")
      .agg(sum("c1").as("t1"), sum("c2").as("t2"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .lazyZip(counts.map(_._2).scanLeft(0L)(_ + _))
      .lazyZip(counts.map(_._3).scanLeft(0L)(_ + _))
      .toSeq
    val n1 = counts.map(_._2).sum.toDouble
    val n2 = counts.map(_._3).sum.toDouble
    val byB = Window.partitionBy("b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = pv
      .join(broadcast(offsets.toDF("b", "off1", "off2")), "b")
      .withColumn("k1", col("off1") + sum("c1").over(byB))
      .withColumn("k2", col("off2") + sum("c2").over(byB))
      .withColumn("dv", abs(col("k1").cast("double") / n1 -
        col("k2").cast("double") / n2))
    // argmax in ONE aggregate pass (r16, guide §2.2): the old
    // max-then-self-join evaluated the window relation `d` twice (once
    // for dmax, once for the equality join) plus a join stage.
    // max(struct(dv, -v)) is lexicographic: max dv, and among dv ties
    // max(-v) = min v — exactly the old (dv = dmax, min v) row. dv is
    // abs(...), so the double never carries a -0.0 that could order
    // differently than the old `===` tie.
    d.agg(max(struct(col("dv"), (-col("v")).as("nv"))).as("m"))
      .select(
        lit(n1.toLong).as("n1"), lit(n2.toLong).as("n2"),
        round(col("m.dv"), 6).as("d_stat"),
        (-col("m.nv")).as("at_value"),
        round(col("m.dv") * sqrt(lit(n1) * n2 / (n1 + n2)), 6).as("ks_lambda"),
        round(lit(1.358) * sqrt(lit(n1 + n2) / (n1 * n2)), 6).as("crit_05"),
        (col("m.dv") > lit(1.358) * sqrt(lit(n1 + n2) / (n1 * n2))).as("reject_05"))
  }

  /** Mergeable DETERMINISTIC quantile summaries — the quantile face
    * of the [[aggSketchMerge]] incremental-aggregation pattern (HLL
    * answers distinct counts; this answers percentiles) with a
    * provable rank-error bound instead of a probabilistic one: each
    * data-defined shard (ship month) keeps every k-th value of its
    * sorted population plus its max, each sample carrying its EXACT
    * in-shard rank (a GK-style ε-summary with ε = k/n_s — public
    * knowledge, Greenwald–Khanna 2001). A quantile query touches only
    * the merged summaries, never the corpus: the per-sample rank
    * increments accumulate across shards in value order, giving every
    * sample a lower bound L on its global rank that undercounts by
    * < k per shard, so answering rank target t with the first sample
    * at L ≥ t is within (k−1)·shards ranks of exact — the err_bound
    * column, asserted tight-side in KernelSpec against the exact
    * ranks.
    *
    * Shape at scale: summaries build under shard-partitioned windows
    * (corpus-linear, no global sort); the merge runs entirely on the
    * sketch-sized sample relation — its cross-shard cumulative uses
    * the same two-phase bucketed rank as [[statsKs]] (fixed price
    * buckets, driver-collected offsets), no single-partition
    * exchange. The summaries are persisted parquet (one build per
    * (JVM, dir), prewarm-charged like every other ingest-time layout);
    * the timed face merges the sketch-sized summary table only — in
    * production k scales with n_s so the artifact is fixed-size per
    * shard and the nightly job appends one summary row-group per
    * shard. Every step is rank-arithmetic on exact integers ⇒
    * hash-exact. */
  private val quantileSummariesBuilt =
    new graft.core.BuildOnce[String, String]

  /** Sample stride of the quantile summaries — part of the artifact
    * KEY (a k change is a format change; a stale k=50 artifact under
    * a k=25 build would silently halve the error bound). */
  private val QuantileSummaryK = 50

  /** Bump when the summary-build arithmetic changes in a way k does
    * not capture (oracle reads the same artifact; ADVICE r15). */
  private val QsumKernelVer = 1

  /** The persisted per-shard summary table behind [[aggQuantileMerge]]
    * — published via [[graft.core.StableStore]] (write-once, atomic
    * rename, cross-JVM) so (a) no concurrently-alive JVM can rewrite
    * the path mid-read (the r13/r14 driver-only hash flake was
    * consistent with exactly that: `RunId.scratchKeyed` +
    * `mode("overwrite")` has a delete-then-write window any warm sbt
    * or bench JVM touching the same sfDir could expose) and (b) the
    * DuckDB oracle can `read_parquet` the SAME bytes instead of
    * recomputing the corpus window chain — removing engine-vs-oracle
    * tie-order as a failure class entirely. */
  private[graft] def quantileSummariesPath(s: SparkSession, dir: String): String =
    quantileSummariesBuilt.getOrElseUpdate(dir, {
      val k = QuantileSummaryK
      val key = s"k=$k|" + graft.core.StableStore.inputKey(s, dir, "lineitem.parquet")
      graft.core.StableStore.getOrBuild("qsum_v1", key,
          QsumKernelVer) { tmp =>
        val base = Tables.lineitem(s, dir).select(
          date_format(col("l_shipdate"), "yyyy-MM").as("shard"),
          Num.d2(col("l_extendedprice")).as("v"))
        // rn and the last-row marker share ONE window spec, so the
        // planner evaluates both in a single Window operator over a
        // single (shard, v) sort — a count() window (different spec)
        // or a per-shard count join would each add a full extra pass
        // of the corpus for what is just "is this the shard's final
        // row". lead(lit(1)) is value-independent: lead("v") would
        // also mark interior rows of a trailing NULL value block
        // (ADVICE r13) — safe on this non-null fixture column but
        // wrong in general.
        val byShard = Window.partitionBy("shard").orderBy("v")
        val ranked = base
          .withColumn("rn", row_number().over(byShard).cast("long"))
          .withColumn("is_last", lead(lit(1), 1).over(byShard).isNull)
        ranked
          .filter(col("rn") % k === 0 || col("is_last"))
          .withColumn("incr", col("rn") - coalesce(lag("rn", 1).over(
            Window.partitionBy("shard").orderBy("rn")), lit(0L)))
          .withColumn("b", floor(col("v") / 1000).cast("int"))
          .select("shard", "rn", "v", "incr", "b")
          .write.mode("overwrite").parquet(tmp)
      }
    })

  def aggQuantileMerge(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    val k = QuantileSummaryK
    val samples = s.read.parquet(quantileSummariesPath(s, dir))
    val counts = samples.groupBy("b").agg(sum("incr").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toSeq
    val n = counts.map(_._2).sum
    val nShards = samples.select("shard").distinct().count()
    val byB = Window.partitionBy("b").orderBy("v", "shard", "rn")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = samples
      .join(broadcast(offsets.toDF("b", "off")), "b")
      .withColumn("lrank", col("off") + sum("incr").over(byB))
    // Float-free face (r16): after three rounds of rows ✓/schema ✓/
    // hash ✗ with SHARED artifact bytes, the last standing suspect was
    // the output's own float surface — `ceil(0.1 · n)` computed in
    // IEEE double can land one rank apart across DuckDB versions
    // (0.1·120000 = 12000.000000000002 → ceil 12001), shifting est by
    // one sample. So: q as integer PERMILLE, target_rank as exact
    // integer ceil ⌈p·n/1000⌉ = (p·n + 999) div 1000, est as integer
    // CENTS — nothing in the row is float/decimal-rendered at all.
    val qt = Seq(100L, 250L, 500L, 750L, 900L, 990L)
      .map(p => (p, (p * n + 999L) / 1000L)).toDF("q_permille", "target_rank")
    merged.join(broadcast(qt), col("lrank") >= col("target_rank"))
      .groupBy("q_permille", "target_rank").agg(min("v").as("est"))
      .select(col("q_permille"), col("target_rank"),
        (col("est") * 100).cast("long").as("est_cents"),
        lit(n).as("n"), lit(nShards).as("n_shards"),
        lit((k - 1) * nShards).as("err_bound"))
      .orderBy("q_permille")
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) — the NONPARAMETRIC location
    * test next to [[statsTtest]]'s parametric one and [[statsKs]]'s
    * shape test: ranks replace values, so outliers and non-normality
    * cannot distort the decision. Average ranks over the pooled 'A' ∪
    * 'N' populations come from the SAME two-phase bucketed rank
    * statsKs runs (per-value counts, driver-collected bucket offsets,
    * within-bucket windows only); the rank-sum R₁ accumulates as
    * DECIMAL(38,1) — every term c₁·avgrank is an exact multiple of
    * 0.5, so the cross-value sum is order-free and exact — and the
    * tie-corrected normal approximation (σ² with the Σ(t³−t) tie
    * term) assembles from exact ingredients in identically-associated
    * IEEE doubles ⇒ hash-exact, sqrt included. */
  def statsMannWhitney(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    val pv = Tables.lineitem(s, dir)
      .filter(col("l_returnflag").isin("A", "N"))
      .select(col("l_returnflag").as("g"), Num.d2(col("l_extendedprice")).as("v"))
      .groupBy("v").agg(
        sum(when(col("g") === "A", 1L).otherwise(0L)).as("c1"),
        sum(when(col("g") === "N", 1L).otherwise(0L)).as("c2"))
      .withColumn("c", col("c1") + col("c2"))
      .withColumn("b", floor(col("v") / 1000).cast("int"))
      .cache() // two consumers: the offsets collect and the rank pass
    val counts = pv.groupBy("b")
      .agg(sum("c").as("t"), sum("c1").as("t1"), sum("c2").as("t2"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toSeq
    val n1 = counts.map(_._3).sum.toDouble
    val n2 = counts.map(_._4).sum.toDouble
    val n = n1 + n2
    val byB = Window.partitionBy("b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = pv.join(broadcast(offsets.toDF("b", "off")), "b")
      .withColumn("prev", col("off") + sum("c").over(byB) - col("c"))
      .withColumn("avgrank", col("prev") + (col("c") + 1L) / lit(2.0))
      .agg(
        sum((col("c1").cast("double") * col("avgrank")).cast("decimal(38,1)"))
          .cast("double").as("r1"),
        sum(col("c") * col("c") * col("c") - col("c")).as("tie"))
    val u = col("r1") - lit(n1 * (n1 + 1) / 2.0)
    val z = (u - lit(n1 * n2 / 2.0)) /
      sqrt(lit(n1 * n2 / 12.0) *
        (lit(n + 1.0) - col("tie").cast("double") / lit(n * (n - 1.0))))
    d.select(
      lit(n1.toLong).as("n1"), lit(n2.toLong).as("n2"),
      col("r1"), u.as("u_stat"),
      round(z, 6).as("z_stat"),
      (abs(z) > 1.96).as("reject_05"))
  }

  /** Exponentially-decayed event counts per type — the trending /
    * freshness aggregate a serving layer keeps next to raw counts
    * (half-life 7 days: last week's click counts as half of this
    * week's). Weights are EXACT powers of two from a driver-built
    * halving table ((k, 0.5ᵏ), k ≤ 1200 weeks ≈ 23 years — a fixed
    * bounded domain joined broadcast, never computed through `pow`,
    * whose libm rounding is not pinned across engines); each term
    * cnt·2⁻ᵏ is an exact double, quantized to 6 dp and summed as
    * DECIMAL(38,6) (order-free — the stats_anova discipline) ⇒
    * hash-exact. Shape: one corpus aggregate to (type, day), the
    * 1-row reference-day cross join (unhinted — AQE broadcasts on
    * measured size), the broadcast weight join, one aggregate per
    * type. */
  def aggDecay(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    val byDay = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val g = byDay.agg(max("day").as("ref_day"))
    val wts = Iterator.iterate(1.0)(_ * 0.5).take(1201).toSeq
      .zipWithIndex.map { case (w, k) => (k, w) }
    byDay.crossJoin(g)
      .withColumn("k", expr("datediff(ref_day, day) div 7").cast("int"))
      .join(broadcast(wts.toDF("k", "wt")), "k")
      .withColumn("term", round(col("cnt") * col("wt"), 6).cast("decimal(38,6)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("cnt").as("raw_count"),
        sum("term").cast("double").as("dsum"), max("k").as("max_halflives"))
      .select(col("event_type"), col("n_days"), col("raw_count"),
        round(col("dsum"), 6).as("decayed"), col("max_halflives"))
      .orderBy("event_type")
  }

  /** Error-bounded sampled aggregation — the online-aggregation /
    * BlinkDB-style face (public knowledge: Hellerstein et al. 1997,
    * Agarwal et al. 2013): answer "what is the average order line
    * worth, roughly, NOW" from a deterministic 5% content-hash sample
    * with a CLT 95% confidence interval, instead of scanning 100 TB
    * for the exact mean. The sample predicate is the engine's stable
    * md5-bucket discipline (first 16 md5 bits of the row key, mod
    * 20 = 0 — reproducible across runs and re-shards, the
    * sample_stratified convention; at scale the sample is a
    * MATERIALIZED 5% table this query reads instead of filtering the
    * corpus). Moments ride the decimal discipline ([[statsTtest]]),
    * the interval assembles in identically-associated doubles ⇒
    * hash-exact; KernelSpec asserts the exact mean actually falls
    * inside the interval and the expansion total's relative error is
    * within the interval's relative width. */
  def aggSampleEstimate(s: SparkSession, dir: String): DataFrame = {
    val x = Num.d2(col("l_extendedprice"))
    val m = Tables.lineitem(s, dir)
      .filter(conv(substring(md5(concat_ws(":",
        col("l_orderkey"), col("l_linenumber"))), 1, 4), 16, 10)
        .cast("int") % 20 === 0)
      .agg(
        count(lit(1)).as("n_sample"),
        sum(x).cast("double").as("sx"),
        sum(x * x).cast("double").as("sxx"))
    val nf = col("n_sample").cast("double")
    val mean = col("sx") / nf
    val s2 = (col("sxx") - col("sx") * col("sx") / nf) / (nf - 1)
    val half = lit(1.96) * sqrt(s2 / nf)
    m.select(
      col("n_sample"),
      round(mean, 6).as("mean_est"),
      round(mean - half, 6).as("ci95_lo"),
      round(mean + half, 6).as("ci95_hi"),
      round(col("sx") * 20, 2).as("est_total"))
  }

  /** Spearman rank correlation (tie-corrected: Pearson on average
    * ranks) between l_quantity↔l_discount and l_quantity↔l_tax per
    * return flag — the monotone-association statistic the Pearson
    * [[statsCorr]] face can't see (rank-based, outlier-robust; the
    * feature-screening statistic a curation pass runs on quality
    * signals before training a filter model). Ranking normally costs
    * a per-group SORT of the corpus; these columns have BOUNDED VALUE
    * DOMAINS (50 quantities × 11 discounts × 9 taxes), so the engine
    * ranks VALUES, not rows ([[statsKs]]'s bucketed-rank discipline):
    * ONE map-side-combining aggregate to the ≤4 950-cell joint
    * histogram per flag, marginal average ranks from cumulative
    * counts over that bounded relation, moments assembled back on the
    * histogram. Doubled ranks (2·avgRank = 2·below + ties + 1) keep
    * every rank an INTEGER, so all Σ moments are exact decimal sums
    * (HUGEINT in the mirror) and only the final Pearson formula runs
    * in float64 with identical association — hash-exact. Nothing
    * data-sized shuffles at any scale; Spearman's ρ is
    * scale-invariant, so doubling cancels. */
  def statsSpearman(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("g"),
        Num.d2(col("l_quantity")).as("x"),
        Num.d2(col("l_discount")).as("y"),
        Num.d2(col("l_tax")).as("z"))
      .agg(count(lit(1)).as("c"))
      .cache() // three marginal-rank consumers + the moment join
    // 2× average rank of a value = 2·(rows strictly below) + ties + 1
    // — integer by construction; the window runs over the bounded
    // value domain (≤50 rows per flag), never row data.
    def rank2(v: String) = {
      val byV = Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.groupBy(col("g"), col(v).as("v")).agg(sum("c").as("cv"))
        .withColumn("cum", sum("cv").over(byV))
        .select(col("g"), col("v").as(v),
          (lit(2L) * (col("cum") - col("cv")) + col("cv") + 1L).as(s"r$v"))
    }
    val dec = (c: Column) => c.cast("decimal(19,0)")
    def rho(srr: Column, sa: Column, sb: Column, saa: Column, sbb: Column,
        n: Column): Column = {
      val den = (n * saa - sa * sa) * (n * sbb - sb * sb)
      when(den =!= 0, round((n * srr - sa * sb) / sqrt(den), 6))
    }
    val m = hist
      .join(rank2("x"), Seq("g", "x"))
      .join(rank2("y"), Seq("g", "y"))
      .join(rank2("z"), Seq("g", "z"))
      .groupBy("g")
      .agg(
        sum("c").cast("double").as("n"),
        sum(dec(col("c")) * dec(col("rx"))).cast("double").as("sx"),
        sum(dec(col("c")) * dec(col("ry"))).cast("double").as("sy"),
        sum(dec(col("c")) * dec(col("rz"))).cast("double").as("sz"),
        sum(dec(col("c")) * (dec(col("rx")) * dec(col("rx")))).cast("double").as("sxx"),
        sum(dec(col("c")) * (dec(col("ry")) * dec(col("ry")))).cast("double").as("syy"),
        sum(dec(col("c")) * (dec(col("rz")) * dec(col("rz")))).cast("double").as("szz"),
        sum(dec(col("c")) * (dec(col("rx")) * dec(col("ry")))).cast("double").as("sxy"),
        sum(dec(col("c")) * (dec(col("rx")) * dec(col("rz")))).cast("double").as("sxz"))
    m.select(col("g").as("l_returnflag"),
        col("n").cast("long").as("n"),
        rho(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"),
          col("n")).as("rho_qty_disc"),
        rho(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"),
          col("n")).as("rho_qty_tax"))
      .orderBy("l_returnflag")
  }

  /** The CM sketch's 4-row affine family — seeds (j+17) start past
    * the MinHash family's 1..16, so the two families are disjoint in
    * fact, not just in name (seeds 3..6 would REPRODUCE MinHash
    * components 2..5 — review-caught); interpolated verbatim into the
    * oracle's `aff` VALUES (precomputed: the raw products overflow
    * DuckDB's INT32 literals). */
  private val CmP = 2147483647L // 2^31 − 1, the MinHash family's prime
  private[graft] val CmAffine: IndexedSeq[(Long, Long)] =
    (0 until 4).map(j =>
      ((2654435761L * (j + 17)) % CmP, (1013904223L * (j + 17)) % CmP))
      .toIndexedSeq

  /** Count–Min sketch (Cormode & Muthukrishnan 2005, public): the
    * fixed-size mergeable frequency summary a streaming/telemetry
    * layer keeps where exact per-key counts won't fit — d=4 hash rows
    * × w=256 buckets = 1 024 counters at ANY corpus size, merged by
    * cell-wise addition (the commutative counter-column discipline).
    * Hashes are the engine's md5-anchored universal affine family
    * (the [[Dedup]] MinHash constants' construction), so the sketch
    * is deterministic and the DuckDB mirror states the SAME cells —
    * hash-exact, estimate column included. The probe face estimates
    * the 40-key user_id head and reports est − exact: the CM
    * guarantee est ≥ exact makes the error column a per-row oracle
    * (KernelSpec asserts it non-negative and bounded). Scale: the
    * build is one map-side-combining aggregate onto 1 024 cells; the
    * probe reads the sketch through AQE's runtime broadcast. */
  def aggCountMin(s: SparkSession, dir: String): DataFrame = {
    val p = CmP
    val h = pmod(conv(substring(md5(concat_ws(":", lit("cm"),
      col("user_id"))), 1, 15), 16, 10).cast("long"), lit(p))
    def bucket(j: Int): Column = {
      val (a, b) = CmAffine(j)
      pmod(lit(a) * col("h") + lit(b), lit(p)) % 256
    }
    val cells = (0 until 4).map(j =>
      struct(lit(j).as("row_id"), bucket(j).as("bkt")))
    val sketch = Tables.events(s, dir)
      .select(h.as("h"))
      .select(explode(array(cells: _*)).as("cell"))
      .groupBy(col("cell.row_id").as("row_id"), col("cell.bkt").as("bkt"))
      .agg(count(lit(1)).as("cnt"))
    val probe = Tables.events(s, dir)
      .filter(col("user_id") < 40)
      .groupBy("user_id").agg(count(lit(1)).as("exact_n"))
      .withColumn("h", h)
      .select(col("user_id"), col("exact_n"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("row_id"), bucket(j).as("bkt"))): _*)).as("cell"))
      .select(col("user_id"), col("exact_n"),
        col("cell.row_id").as("row_id"), col("cell.bkt").as("bkt"))
    // no broadcast hint over the aggregated sketch (the repo-wide
    // PlanSpec guard): the 1 024-cell relation is broadcast-sized by
    // construction and AQE's runtime size check picks the broadcast
    // join on its own — a forced hint over an aggregate is the
    // driver-OOM anti-pattern when the estimate is ever wrong
    probe.join(sketch, Seq("row_id", "bkt"))
      .groupBy("user_id")
      .agg(max("exact_n").as("exact_n"), min("cnt").as("cm_est"))
      .select(col("user_id"), col("exact_n"), col("cm_est"),
        (col("cm_est") - col("exact_n")).as("overcount"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_spearman" -> (statsSpearman _),
    "agg_count_min" -> (aggCountMin _),
    "stats_regression" -> (statsRegression _),
    "stats_ks" -> (statsKs _),
    "stats_mannwhitney" -> (statsMannWhitney _),
    "agg_sample_estimate" -> (aggSampleEstimate _),
    "agg_decay" -> (aggDecay _),
    "agg_quantile_merge" -> (aggQuantileMerge _),
    "stats_ttest" -> (statsTtest _),
    "stats_anova" -> (statsAnova _),
    "stats_chi2" -> (statsChi2 _),
    "stats_corr" -> (statsCorr _),
    "stats_histogram" -> (statsHistogram _),
    "stats_analyze" -> (statsAnalyze _),
    "agg_pivot" -> (aggPivot _),
    "agg_unpivot" -> (aggUnpivot _),
    "agg_mode" -> (aggMode _),
    "mv_incremental" -> (mvIncremental _),
    "mv_incremental_join" -> (mvIncrementalJoin _),
    "agg_sketch_merge" -> (aggSketchMerge _),
    "agg_sketch_intersect" -> (aggSketchIntersect _),
    "stats_skew" -> (statsSkew _),
    "stats_partition_hist" -> (statsPartitionHist _),
    "agg_freq_items" -> (aggFreqItems _),
    "agg_skew_twophase" -> (aggSkewTwophase _),
    "agg_quantile_approx" -> (aggQuantileApprox _),
    "agg_quantile" -> (aggQuantile _),
    "agg_collect" -> (aggCollect _),
    "q1_pricing" -> (q1Pricing _),
    "agg_global" -> (aggGlobal _),
    "agg_groupby" -> (aggGroupBy _),
    "agg_distinct" -> (aggDistinct _),
    "agg_approx_distinct" -> (aggApproxDistinct _),
    "agg_counter" -> (aggCounter _),
    "agg_rollup" -> (aggRollup _),
    "agg_cube" -> (aggCube _),
    "agg_gsets" -> (aggGsets _),
    "agg_udaf" -> (aggUdaf _)
  )

  /** Concrete artifact paths for this group's `__..._PATH__` oracle
    * tokens (same contract as Similarity.oracleArtifactSubs; merged
    * by [[graft.Verify]] at dump time). Calling the path function
    * also guarantees the artifact is published before the SQL
    * referencing it is dumped. */
  private[graft] def oracleArtifactSubs(
      s: SparkSession, dir: String): Map[String, String] = Map(
    "__QSUM_PATH__" -> quantileSummariesPath(s, dir))

  private def statsOracleRow(c: String, v: String): String = s"""
      SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
        CAST(count(*) - count($c) AS BIGINT) AS n_null,
        CAST(min($v) AS VARCHAR) AS min_v,
        CAST(max($v) AS VARCHAR) AS max_v
      FROM lineitem"""

  val oracles: Map[String, String] = Map(
    // bounded joint value histogram → integer doubled ranks (2·below
    // + ties + 1) → HUGEINT-exact moments; the final Pearson formula
    // is the only float step, identically associated in both engines
    "stats_spearman" -> """
      WITH h AS (
        SELECT l_returnflag AS g,
          CAST(l_quantity AS DECIMAL(18,2)) AS x,
          CAST(l_discount AS DECIMAL(18,2)) AS y,
          CAST(l_tax AS DECIMAL(18,2)) AS z,
          CAST(count(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2, 3, 4),
      rx AS (
        SELECT g, x, 2 * (SUM(cv) OVER (PARTITION BY g ORDER BY x) - cv)
          + cv + 1 AS rx
        FROM (SELECT g, x, SUM(c) AS cv FROM h GROUP BY 1, 2)),
      ry AS (
        SELECT g, y, 2 * (SUM(cv) OVER (PARTITION BY g ORDER BY y) - cv)
          + cv + 1 AS ry
        FROM (SELECT g, y, SUM(c) AS cv FROM h GROUP BY 1, 2)),
      rz AS (
        SELECT g, z, 2 * (SUM(cv) OVER (PARTITION BY g ORDER BY z) - cv)
          + cv + 1 AS rz
        FROM (SELECT g, z, SUM(c) AS cv FROM h GROUP BY 1, 2)),
      m AS (
        SELECT g,
          CAST(SUM(c) AS DOUBLE) AS n,
          CAST(SUM(CAST(c AS HUGEINT) * rx) AS DOUBLE) AS sx,
          CAST(SUM(CAST(c AS HUGEINT) * ry) AS DOUBLE) AS sy,
          CAST(SUM(CAST(c AS HUGEINT) * rz) AS DOUBLE) AS sz,
          CAST(SUM(CAST(c AS HUGEINT) * (CAST(rx AS HUGEINT) * rx)) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(c AS HUGEINT) * (CAST(ry AS HUGEINT) * ry)) AS DOUBLE) AS syy,
          CAST(SUM(CAST(c AS HUGEINT) * (CAST(rz AS HUGEINT) * rz)) AS DOUBLE) AS szz,
          CAST(SUM(CAST(c AS HUGEINT) * (CAST(rx AS HUGEINT) * ry)) AS DOUBLE) AS sxy,
          CAST(SUM(CAST(c AS HUGEINT) * (CAST(rx AS HUGEINT) * rz)) AS DOUBLE) AS sxz
        FROM h
        JOIN rx USING (g, x) JOIN ry USING (g, y) JOIN rz USING (g, z)
        GROUP BY g)
      SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <> 0
          THEN ROUND((n * sxy - sx * sy) /
            sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        END AS rho_qty_disc,
        CASE WHEN (n * sxx - sx * sx) * (n * szz - sz * sz) <> 0
          THEN ROUND((n * sxz - sx * sz) /
            sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)), 6)
        END AS rho_qty_tax
      FROM m ORDER BY l_returnflag""",
    // the same 4×256 deterministic cells stated relationally: CM
    // estimate = MIN over rows of the probed bucket's total
    "agg_count_min" -> s"""
      WITH aff(row_id, a, b) AS (VALUES ${CmAffine.zipWithIndex
        .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")}),
      e AS (
        SELECT user_id,
          CAST(concat('0x', substring(md5('cm:' ||
            CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
            % 2147483647 AS h
        FROM events),
      sketch AS (
        SELECT row_id, (a * h + b) % 2147483647 % 256 AS bkt,
          CAST(count(*) AS BIGINT) AS cnt
        FROM e, aff GROUP BY 1, 2),
      probe AS (
        SELECT user_id, h, CAST(count(*) AS BIGINT) AS exact_n
        FROM e WHERE user_id < 40 GROUP BY 1, 2)
      SELECT p.user_id, p.exact_n, MIN(s.cnt) AS cm_est,
        MIN(s.cnt) - p.exact_n AS overcount
      FROM probe p
      JOIN aff ON true
      JOIN sketch s ON s.row_id = aff.row_id
        AND s.bkt = (aff.a * p.h + aff.b) % 2147483647 % 256
      GROUP BY p.user_id, p.exact_n
      ORDER BY p.user_id""",
    // same key aggregate + 1-row stats cross join; the two divisions
    // are identically-associated exact doubles in both engines
    "stats_skew" -> """
      WITH per AS (
        SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS key_rows
        FROM lineitem GROUP BY l_suppkey),
      tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
          CAST(SUM(key_rows) AS BIGINT) AS total_rows,
          CAST(MAX(key_rows) AS BIGINT) AS max_rows
        FROM per)
      SELECT key, key_rows, n_keys, total_rows,
        ROUND(CAST(total_rows AS DOUBLE) / n_keys, 6) AS avg_rows,
        ROUND(CAST(max_rows AS DOUBLE) * n_keys / total_rows, 6) AS skew_ratio
      FROM per CROSS JOIN tot
      ORDER BY key_rows DESC, key ASC LIMIT 10""",
    // percentile ↔ quantile_cont: both engines linear-interpolate
    // over the sorted values, round(6) — the aggQuantile discipline
    "stats_partition_hist" -> """
      WITH per AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS p_rows,
          CAST(SUM(len(event_type) + len(props) + 24) AS BIGINT) AS p_bytes
        FROM events GROUP BY user_id),
      a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_partitions,
          ROUND(quantile_cont(p_rows, 0.50), 6) AS r0, ROUND(quantile_cont(p_bytes, 0.50), 6) AS b0,
          ROUND(quantile_cont(p_rows, 0.75), 6) AS r1, ROUND(quantile_cont(p_bytes, 0.75), 6) AS b1,
          ROUND(quantile_cont(p_rows, 0.95), 6) AS r2, ROUND(quantile_cont(p_bytes, 0.95), 6) AS b2,
          ROUND(quantile_cont(p_rows, 0.98), 6) AS r3, ROUND(quantile_cont(p_bytes, 0.98), 6) AS b3,
          ROUND(quantile_cont(p_rows, 0.99), 6) AS r4, ROUND(quantile_cont(p_bytes, 0.99), 6) AS b4
        FROM per)
      SELECT pct, rows_p, bytes_p, n_partitions FROM (
        SELECT 50 AS pct, r0 AS rows_p, b0 AS bytes_p, n_partitions FROM a
        UNION ALL SELECT 75, r1, b1, n_partitions FROM a
        UNION ALL SELECT 95, r2, b2, n_partitions FROM a
        UNION ALL SELECT 98, r3, b3, n_partitions FROM a
        UNION ALL SELECT 99, r4, b4, n_partitions FROM a)
      ORDER BY pct""",
    // exact decimal first/second moments, float64 only in the final
    // identically-associated scalar formula
    // the REGR_* formulas from the same decimal moments, identically
    // associated; NULLIF mirrors the zero-variance when() guard
    "stats_regression" -> """
      WITH a AS (
        SELECT l_returnflag,
          CAST(count(*) AS DOUBLE) AS nf,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, CAST(nf AS BIGINT) AS n,
        ROUND((nf * sxy - sx * sy) / NULLIF(nf * sxx - sx * sx, 0), 6)
          AS slope,
        ROUND((sy - (nf * sxy - sx * sy) / NULLIF(nf * sxx - sx * sx, 0)
          * sx) / nf, 6) AS intercept,
        ROUND((nf * sxy - sx * sy) * (nf * sxy - sx * sy)
          / NULLIF((nf * sxx - sx * sx) * (nf * syy - sy * sy), 0), 6)
          AS r2
      FROM a ORDER BY l_returnflag""",
    // identical decimal moments, identical left-associated double
    // arithmetic — bit-exact on both engines
    // same md5-bucket sample predicate, same decimal moments, same
    // identically-associated CLT interval
    "agg_sample_estimate" -> """
      WITH sm AS (
        SELECT CAST(count(*) AS BIGINT) AS n_sample,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        FROM lineitem
        WHERE CAST(concat('0x', substring(md5(concat_ws(':',
            CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))),
            1, 4)) AS INTEGER) % 20 = 0),
      q AS (
        SELECT n_sample, sx,
          sx / CAST(n_sample AS DOUBLE) AS mean,
          (sxx - sx * sx / CAST(n_sample AS DOUBLE))
            / (CAST(n_sample AS DOUBLE) - 1) AS s2,
          CAST(n_sample AS DOUBLE) AS nf
        FROM sm)
      SELECT n_sample,
        ROUND(mean, 6) AS mean_est,
        ROUND(mean - 1.96 * sqrt(s2 / nf), 6) AS ci95_lo,
        ROUND(mean + 1.96 * sqrt(s2 / nf), 6) AS ci95_hi,
        ROUND(sx * 20, 2) AS est_total
      FROM q""",
    // pooled average ranks on the plain windowed mirror; R1 as
    // DECIMAL(38,1) (every term an exact multiple of 0.5 — order-free),
    // tie term exact integers, z assembled in identical association
    "stats_mannwhitney" -> """
      WITH li AS (
        SELECT l_returnflag AS g, CAST(l_extendedprice AS DECIMAL(18,2)) AS v
        FROM lineitem WHERE l_returnflag IN ('A', 'N')),
      pv AS (
        SELECT v,
          SUM(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS c1,
          SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS c2
        FROM li GROUP BY v),
      cc AS (SELECT v, c1, c2, c1 + c2 AS c FROM pv),
      n AS (
        SELECT CAST(SUM(c1) AS DOUBLE) AS n1, CAST(SUM(c2) AS DOUBLE) AS n2,
          CAST(SUM(c1 + c2) AS DOUBLE) AS n FROM pv),
      r AS (
        SELECT v, c1, c2, c,
          SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) - c AS prev
        FROM cc),
      a AS (
        SELECT
          CAST(SUM(CAST(CAST(c1 AS DOUBLE) * (prev + (c + 1) / 2.0)
            AS DECIMAL(38,1))) AS DOUBLE) AS r1,
          CAST(SUM(c * c * c - c) AS BIGINT) AS tie
        FROM r)
      SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
        a.r1,
        a.r1 - n.n1 * (n.n1 + 1) / 2.0 AS u_stat,
        ROUND((a.r1 - n.n1 * (n.n1 + 1) / 2.0 - n.n1 * n.n2 / 2.0)
          / sqrt(n.n1 * n.n2 / 12.0
            * (n.n + 1.0 - CAST(a.tie AS DOUBLE) / (n.n * (n.n - 1.0)))), 6)
          AS z_stat,
        ABS((a.r1 - n.n1 * (n.n1 + 1) / 2.0 - n.n1 * n.n2 / 2.0)
          / sqrt(n.n1 * n.n2 / 12.0
            * (n.n + 1.0 - CAST(a.tie AS DOUBLE) / (n.n * (n.n - 1.0)))))
          > 1.96 AS reject_05
      FROM n, a""",
    // the halving table restated as a RECURSIVE iterated-halving CTE
    // (never pow — libm rounding is not pinned across engines); terms
    // quantized + DECIMAL-summed order-free
    "agg_decay" -> """
      WITH RECURSIVE bd AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2),
      g AS (SELECT MAX(day) AS ref_day FROM bd),
      t(k, wt) AS (
        SELECT 0, CAST(1.0 AS DOUBLE)
        UNION ALL SELECT k + 1, wt * 0.5 FROM t WHERE k < 1200),
      d AS (
        SELECT bd.event_type, bd.cnt, t.k,
          CAST(ROUND(bd.cnt * t.wt, 6) AS DECIMAL(38,6)) AS term
        FROM bd, g, t
        WHERE t.k = datediff('day', bd.day, g.ref_day) // 7)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        CAST(SUM(cnt) AS BIGINT) AS raw_count,
        ROUND(CAST(SUM(term) AS DOUBLE), 6) AS decayed,
        CAST(MAX(k) AS INTEGER) AS max_halflives
      FROM d GROUP BY event_type ORDER BY event_type""",
    // merge restated over the SAME published StableStore summary
    // artifact the engine serves from (read_parquet of the identical
    // bytes — no recompute of the corpus window chain, so engine-vs-
    // oracle tie-order cannot diverge): n telescopes out of the incr
    // column (per-shard increments sum to the shard population), the
    // global cumulative over (v, shard, rn) equals the engine's
    // bucketed off(b)+within-b form because b = floor(v/1000) is
    // monotone in v. r16: the face is FLOAT-FREE end to end — q as
    // integer permille, target_rank as (p·n + 999) // 1000 (exact
    // integer ceil, no IEEE anywhere), est as integer cents — so no
    // DuckDB version can render any value differently.
    "agg_quantile_merge" -> """
      WITH samples AS (
        SELECT shard, rn, v, incr
        FROM read_parquet('__QSUM_PATH__/*.parquet')),
      lw AS (
        SELECT shard, rn, v,
          SUM(incr) OVER (ORDER BY v, shard, rn ROWS BETWEEN UNBOUNDED
            PRECEDING AND CURRENT ROW) AS lrank
        FROM samples),
      n AS (SELECT CAST(SUM(incr) AS BIGINT) AS n FROM samples),
      sh AS (SELECT CAST(COUNT(DISTINCT shard) AS BIGINT) AS ns
        FROM samples),
      qs AS (SELECT CAST(unnest([100, 250, 500, 750, 900, 990])
        AS BIGINT) AS q_permille),
      qt AS (SELECT q_permille,
        CAST((q_permille * n.n + 999) // 1000 AS BIGINT) AS target_rank
        FROM qs, n)
      SELECT qt.q_permille, qt.target_rank,
        CAST(MIN(lw.v) * 100 AS BIGINT) AS est_cents,
        n.n AS n, sh.ns AS n_shards,
        CAST(49 * sh.ns AS BIGINT) AS err_bound
      FROM qt, lw, n, sh WHERE lw.lrank >= qt.target_rank
      GROUP BY qt.q_permille, qt.target_rank, n.n, sh.ns
      ORDER BY qt.q_permille""",
    // plain windowed CDF mirror of the two-phase bucketed rank: the
    // cumulative counts are identical integers, the ratios
    // integer-over-integer doubles, the sup location tie-broken to
    // the smallest value in both engines
    "stats_ks" -> """
      WITH li AS (
        SELECT l_returnflag AS g, CAST(l_extendedprice AS DECIMAL(18,2)) AS v
        FROM lineitem WHERE l_returnflag IN ('A', 'N')),
      pv AS (
        SELECT v,
          SUM(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS c1,
          SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS c2
        FROM li GROUP BY v),
      n AS (
        SELECT CAST(SUM(c1) AS DOUBLE) AS n1,
               CAST(SUM(c2) AS DOUBLE) AS n2 FROM pv),
      c AS (
        SELECT v,
          SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS k1,
          SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS k2
        FROM pv),
      d AS (
        SELECT v, ABS(CAST(k1 AS DOUBLE) / n.n1
                    - CAST(k2 AS DOUBLE) / n.n2) AS dv
        FROM c, n),
      m AS (SELECT MAX(dv) AS dm FROM d),
      a AS (SELECT MIN(v) AS at_value FROM d, m WHERE d.dv = m.dm)
      SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
        ROUND(m.dm, 6) AS d_stat, a.at_value,
        ROUND(m.dm * sqrt(n.n1 * n.n2 / (n.n1 + n.n2)), 6) AS ks_lambda,
        ROUND(1.358 * sqrt((n.n1 + n.n2) / (n.n1 * n.n2)), 6) AS crit_05,
        m.dm > 1.358 * sqrt((n.n1 + n.n2) / (n.n1 * n.n2)) AS reject_05
      FROM n, m, a""",
    "stats_ttest" -> """
      WITH m AS (
        SELECT l_returnflag AS g,
          CAST(count(*) AS DOUBLE) AS nf,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        FROM lineitem GROUP BY l_returnflag),
      p AS (
        SELECT a.g AS g1, b.g AS g2, a.nf AS n1, b.nf AS n2,
          a.sx AS sx1, b.sx AS sx2, a.sxx AS sxx1, b.sxx AS sxx2
        FROM m a JOIN m b ON a.g < b.g),
      q AS (
        SELECT g1, g2, n1, n2,
          sx1 / n1 AS mean1, sx2 / n2 AS mean2,
          (sxx1 - sx1 * sx1 / n1) / (n1 - 1) / n1 AS se1,
          (sxx2 - sx2 * sx2 / n2) / (n2 - 1) / n2 AS se2
        FROM p)
      SELECT g1, g2,
        CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        ROUND(mean1, 6) AS mean1, ROUND(mean2, 6) AS mean2,
        ROUND((mean1 - mean2) / sqrt(se1 + se2), 6) AS t_stat,
        ROUND((se1 + se2) * (se1 + se2)
          / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)), 6) AS df_welch
      FROM q ORDER BY g1, g2""",
    // exact integer contingency counts; quantized per-cell terms
    // summed as DECIMAL (order-free); identical double assembly
    "stats_chi2" -> """
      WITH cells AS (
        SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS o
        FROM lineitem GROUP BY l_returnflag, l_linestatus),
      rt AS (SELECT l_returnflag, SUM(o) AS r_tot FROM cells
             GROUP BY l_returnflag),
      ct AS (SELECT l_linestatus, SUM(o) AS c_tot FROM cells
             GROUP BY l_linestatus),
      g AS (SELECT SUM(o) AS n,
              COUNT(DISTINCT l_returnflag) AS n_r,
              COUNT(DISTINCT l_linestatus) AS n_c FROM cells),
      t AS (
        SELECT cells.o,
          CAST(rt.r_tot AS DOUBLE) * CAST(ct.c_tot AS DOUBLE)
            / CAST(g.n AS DOUBLE) AS e,
          g.n, g.n_r, g.n_c
        FROM cells
        JOIN rt USING (l_returnflag)
        JOIN ct USING (l_linestatus), g),
      a AS (
        SELECT MAX(n) AS nl, MAX(n_r) AS nr, MAX(n_c) AS nc,
          CAST(SUM(CAST(ROUND(
            (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e, 6)
            AS DECIMAL(38,6))) AS DOUBLE) AS chi2d
        FROM t)
      SELECT CAST(nl AS BIGINT) AS n,
        CAST((nr - 1) * (nc - 1) AS BIGINT) AS df,
        ROUND(chi2d, 6) AS chi2,
        ROUND(sqrt(chi2d / (CAST(nl AS DOUBLE)
          * CAST(LEAST(nr - 1, nc - 1) AS DOUBLE))), 6) AS cramers_v
      FROM a""",
    // decimal moments, quantized per-group terms summed as DECIMAL
    // (order-free), identical double assembly
    "stats_anova" -> """
      WITH m AS (
        SELECT l_returnflag,
          CAST(count(*) AS DOUBLE) AS nf,
          SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sxd,
          SUM(CAST(l_extendedprice AS DECIMAL(18,2))
            * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxxd
        FROM lineitem GROUP BY l_returnflag),
      g AS (
        SELECT CAST(count(*) AS DOUBLE) AS k,
          SUM(nf) AS nn, SUM(sxd) AS sxg FROM m),
      t AS (
        SELECT m.nf,
          m.nf * ((CAST(m.sxd AS DOUBLE) / m.nf - CAST(g.sxg AS DOUBLE) / g.nn)
                * (CAST(m.sxd AS DOUBLE) / m.nf - CAST(g.sxg AS DOUBLE) / g.nn))
            AS term_b,
          CAST(m.sxxd AS DOUBLE)
            - CAST(m.sxd AS DOUBLE) * CAST(m.sxd AS DOUBLE) / m.nf AS term_w,
          g.k AS k, g.nn AS nn
        FROM m, g),
      a AS (
        SELECT MAX(k) AS kf, MAX(nn) AS nn,
          CAST(SUM(CAST(ROUND(term_b, 6) AS DECIMAL(38,6))) AS DOUBLE) AS ssb,
          CAST(SUM(CAST(ROUND(term_w, 6) AS DECIMAL(38,6))) AS DOUBLE) AS ssw
        FROM t)
      SELECT CAST(kf AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
        ROUND(ssb, 6) AS ssb, ROUND(ssw, 6) AS ssw,
        CAST(kf - 1 AS BIGINT) AS df_between,
        CAST(nn - kf AS BIGINT) AS df_within,
        ROUND((ssb / (kf - 1)) / (ssw / (nn - kf)), 6) AS f_stat,
        ROUND(ssb / (ssb + ssw), 6) AS eta_sq
      FROM a""",
    "stats_corr" -> """
      WITH a AS (
        SELECT l_returnflag,
          CAST(count(*) AS DOUBLE) AS nf,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
          CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sd,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
          CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sdd,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sqd
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, CAST(nf AS BIGINT) AS n,
        ROUND((nf * sqp - sq * sp)
          / sqrt(NULLIF((nf * sqq - sq * sq) * (nf * spp - sp * sp), 0)), 6)
          AS corr_qty_price,
        ROUND((nf * sqd - sq * sd)
          / sqrt(NULLIF((nf * sqq - sq * sq) * (nf * sdd - sd * sd), 0)), 6)
          AS corr_qty_disc
      FROM a ORDER BY l_returnflag""",
    // same integer-cent bucket formula, verbatim
    "stats_histogram" -> """
      WITH c AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
        FROM lineitem),
      b AS (SELECT min(xc) AS minc, max(xc) AS maxc FROM c)
      SELECT CAST(((xc - minc) * 20) // (maxc - minc + 1) AS INTEGER) AS bucket,
        CAST(count(*) AS BIGINT) AS n,
        CAST(min(xc) AS DOUBLE) / 100 AS lo_v,
        CAST(max(xc) AS DOUBLE) / 100 AS hi_v
      FROM c, b GROUP BY 1 ORDER BY 1""",
    "stats_analyze" -> (Seq(
      statsOracleRow("l_orderkey", "l_orderkey"),
      statsOracleRow("l_quantity", "l_quantity"),
      statsOracleRow("l_returnflag", "l_returnflag"),
      statsOracleRow("l_shipdate", "CAST(l_shipdate AS DATE)"))
      .mkString(" UNION ALL ") + " ORDER BY col_name"),
    // conditional-aggregation mirror of the fixed-domain pivot
    "agg_pivot" -> s"""
      SELECT user_id,
        ${EventTypes.map(t =>
          s"COUNT(*) FILTER (WHERE event_type = '$t') AS n_$t").mkString(",\n        ")}
      FROM events GROUP BY user_id ORDER BY user_id""",
    // pivot∘unpivot round-trips to the plain long-form count
    "agg_unpivot" -> """
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id, event_type""",
    "agg_mode" -> """
      WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id, event_type)
      SELECT user_id,
        (ARRAY_AGG(event_type ORDER BY cnt DESC, event_type ASC))[1] AS mode_type,
        MAX(cnt) AS mode_n
      FROM c GROUP BY user_id ORDER BY user_id""",
    // the oracle is the FULL refresh the incremental merge must equal
    "mv_incremental" -> s"""
      SELECT user_id, COUNT(*) AS n_events,
        ${Num.sqlDsum("value")} AS sum_value
      FROM events GROUP BY user_id ORDER BY user_id""",
    // Refreshed MV state == joining the upserted base directly.
    "mv_incremental_join" -> """
      SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
        CASE WHEN o.o_orderkey % 10 = 5 THEN o.o_totalprice + 1000.0
             ELSE o.o_totalprice END AS o_totalprice,
        o.o_orderdate, c.c_name, c.c_nationkey
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      ORDER BY o.o_orderkey""",
    // agg_quantile_approx: no oracle (GK sketch is engine-specific;
    // tolerance vs exact asserted in KernelSpec)
    "agg_skew_twophase" -> s"""
      SELECT l_returnflag, COUNT(*) AS n,
        ${Num.sqlDsum("l_quantity")} AS sum_qty,
        ${Num.sqlDsum("l_extendedprice")} AS sum_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_quantile" -> """
      SELECT l_returnflag,
        ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_collect" -> """
      SELECT o_orderpriority,
        array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q1_pricing" -> q1PricingSql,
    "agg_global" -> s"""
      SELECT COUNT(*) AS n_rows,
        COUNT(DISTINCT l_suppkey) AS n_supp,
        MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        ${Num.sqlDsum("l_extendedprice")} AS sum_price,
        ${Num.sqlDavg("l_discount")} AS avg_disc,
        MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
      FROM lineitem""",
    "agg_groupby" -> s"""
      SELECT c_mktsegment, COUNT(*) AS n_cust,
        ${Num.sqlDsum("c_acctbal")} AS sum_bal,
        ${Num.sqlDavg("c_acctbal")} AS avg_bal
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "agg_distinct" -> """
      SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      ORDER BY o_orderstatus, o_orderpriority""",
    "agg_counter" -> s"""
      SELECT user_id, COUNT(*) AS n_increments,
        ${Num.sqlDsum("value")} AS counter_value
      FROM events GROUP BY user_id ORDER BY user_id""",
    "agg_rollup" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${Num.sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "agg_cube" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${Num.sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "agg_gsets" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${Num.sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "agg_udaf" -> """
      SELECT l_returnflag,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) /
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE), 6) AS wavg_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
    // agg_approx_distinct: no oracle (HLL++ is engine-specific)
  )
}
