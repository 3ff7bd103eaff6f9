package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Joins (SURVEY.md §2.C).
  *
  * CQL has no joins; in the reference's ecosystem joins are exactly
  * what Spark-on-Cassandra adds (the connector's
  * `joinWithCassandraTable` point-lookup join in particular). Strategy
  * notes per operator:
  *  - dims (nation 25, region 5, bounded key sets) are broadcast —
  *    zero shuffle of the fact side;
  *  - large-large joins shuffle on the join key (sort-merge), which
  *    scales linearly with data per key and spills instead of OOM;
  *  - the as-of join uses the union+window pattern, ONE shuffle of
  *    (orders ∪ events) by key — never a per-pair blowup, which is the
  *    100 TB-safe formulation.
  */
object Joins extends QueryGroup {

  /** Large-large equi-join; Catalyst picks shuffled hash / sort-merge. */
  def joinInnerHash(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")

  /** Small-dim broadcast join: customer ⋈ nation ⋈ region with both
    * dims broadcast — no shuffle of the probe side at any scale. */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "n_name", "r_name")
      .orderBy("c_custkey")

  /** Explicit sort-merge (MERGE hint): the spill-safe large-large path. */
  def joinSortMerge(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).hint("MERGE")
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_custkey", "o_orderdate", "l_quantity")
      // (l_orderkey, l_linenumber) is non-unique in the fixture —
      // l_quantity completes a total order (see Scans.lineitemOrder)
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  /** Left outer: every customer, order key nullable. */
  def joinLeft(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .select("c_custkey", "o_orderkey")
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)

  /** Right outer (mirror of left; exercises the other build side). */
  def joinRight(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"), "right_outer")
      .select("c_custkey", "o_orderkey")
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)

  /** Full outer over two per-customer aggregates (F-order vs O-order
    * counts) — exercises both-null sides deterministically. */
  def joinFull(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val f = o.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("fk")).agg(count(lit(1)).as("f_cnt"))
    val p = o.filter(col("o_orderstatus") === "P")
      .groupBy(col("o_custkey").as("pk")).agg(count(lit(1)).as("p_cnt"))
    f.join(p, col("fk") === col("pk"), "full_outer")
      .select(
        coalesce(col("fk"), col("pk")).as("custkey"),
        col("f_cnt"), col("p_cnt"))
      .orderBy("custkey")
  }

  /** Left semi — EXISTS shape (customers having a big order). */
  def joinSemi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Left anti — NOT EXISTS shape (customers with no pending order). */
  def joinAnti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** `joinWithCassandraTable` equivalent: a bounded key set drives
    * point reads — broadcast the keys, inner-join the big table. */
  def joinLookup(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.customer(s, dir)
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      .limit(20)
      .select("c_custkey")
    Tables.orders(s, dir)
      .join(broadcast(keys), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Non-equi (theta) join: nation pairs within a region. Tiny inputs
    * here; at scale a band/range join is bucketized first (see
    * scaladoc on Similarity for the same pattern). */
  def joinTheta(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(s, dir).select(
      col("n_nationkey").as("k1"), col("n_name").as("name1"), col("n_regionkey").as("r1"))
    val n2 = Tables.nation(s, dir).select(
      col("n_nationkey").as("k2"), col("n_name").as("name2"), col("n_regionkey").as("r2"))
    n1.join(n2, col("r1") === col("r2") && col("k1") < col("k2"))
      .select("r1", "k1", "k2", "name1", "name2")
      .orderBy("r1", "k1", "k2")
  }

  /** Bloom-prefiltered join — the explicit runtime-filter pattern: a
    * compact Bloom filter built on the (selective) build side's join
    * keys is applied to the probe side BEFORE its shuffle, so at
    * 100 TB the fact-table rows that cannot match (here ~80% of
    * orders) never enter the exchange at all; the exact join then
    * removes the filter's false positives, so the OUTPUT is exactly
    * the plain join's — the oracle proves it. Spark injects this
    * rewrite itself in some shapes (runtime row-level filtering);
    * declaring it as an operator makes the contract testable and the
    * plan explicit. The filter costs ~1.2 bytes/key at 1% fpp —
    * broadcastable at any realistic dimension cardinality — and
    * evaluation reuses Catalyst's codegen'd BloomFilterMightContain. */
  def joinBloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name")
    val bf = cust.stat.bloomFilter("c_custkey", 20000, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val might = ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(lit(bos.toByteArray)),
      ColumnBridge.expression(col("o_custkey").cast("long"))))
    Tables.orders(s, dir)
      .filter(might)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "c_name")
      .orderBy("o_orderkey")
  }

  /** Interval join — events against time windows they fall inside —
    * via bucketing: each window is exploded onto the hour buckets it
    * covers, each event carries its own hour bucket, and the
    * containment predicate runs only on bucket-equal pairs. That turns
    * the O(|events|·|windows|) theta join into ONE equi-join whose
    * candidate count is (events per bucket × windows per bucket) —
    * linear in both inputs for bounded window length. An event has
    * exactly one bucket, so no pair is produced twice. Windows here
    * derive deterministically from the data (first event of each
    * user < 20, 90 minutes long); the un-bucketed theta join is the
    * oracle. At 100 TB neither side is broadcast-sized and the hinted
    * broadcast is deliberately absent — the equi-join shuffles on the
    * bucket key like any other keyed join (AQE may still broadcast the
    * window side when it measures small). */
  def joinInterval(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select("event_id", "user_id", "ts")
    val w = e.filter(col("user_id") < 20)
      .groupBy(col("user_id").as("window_id"))
      .agg(min(col("ts")).as("w_start"))
      .withColumn("w_end", col("w_start") + expr("INTERVAL 90 MINUTES"))
    val wb = w.withColumn("bucket",
      explode(sequence(date_trunc("hour", col("w_start")),
        date_trunc("hour", col("w_end")), expr("INTERVAL 1 HOUR"))))
    e.withColumn("bucket", date_trunc("hour", col("ts")))
      .join(wb, Seq("bucket"))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("window_id", "event_id", "user_id")
      .orderBy("window_id", "event_id")
  }

  /** As-of join: each event matched to the newest order of the same
    * customer with o_orderdate <= ts (tiebreak: max o_orderkey).
    *
    * Union+window formulation: tag orders pri=0 and events pri=1,
    * union, ONE shuffle partitioned by customer key ordered by
    * (t, pri, key), then `last(okey, ignoreNulls)` over the preceding
    * frame. No per-pair join blowup — at 100 TB this is a single
    * sort-shuffle of both inputs, the canonical time-series layout.
    */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(0).as("pri"), col("o_orderkey").as("okey"),
      lit(null).cast("long").as("event_id"))
    val e = Tables.events(s, dir).select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(1).as("pri"), lit(null).cast("long").as("okey"),
      col("event_id"))
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("pri").asc, col("okey").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("asof_orderkey", last("okey", ignoreNulls = true).over(w))
      .filter(col("pri") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("asof_orderkey"))
      .orderBy("event_id")
  }

  /** Skew-mitigated join via key salting: the fact side gets a salt
    * from a row-unique hash, the dim side is replicated once per salt
    * value, and the join key becomes (key, salt) — a hot key's rows
    * spread over `Salt` reducers instead of one. Result ≡ the plain
    * join (oracle-checked). At 100 TB this (or AQE skew-split, which
    * handles the same problem adaptively) is mandatory for power-law
    * keys. */
  def joinSalted(s: SparkSession, dir: String): DataFrame = {
    val salt = 8
    val fact = Tables.events(s, dir)
      .withColumn("salt_f", pmod(xxhash64(col("event_id")), lit(salt)).cast("int"))
    val dim = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"))
      .withColumn("salt_d", explode(sequence(lit(0), lit(salt - 1))))
    fact.join(dim,
        col("user_id") === col("c_custkey") && col("salt_f") === col("salt_d"))
      .select("event_id", "user_id", "c_name")
      .orderBy("event_id")
  }

  /** Co-located join via bucketing: both sides written bucketed by the
    * join key (8 buckets), then joined bucket-to-bucket — no shuffle
    * of either side at read time (asserted in PlanSpec). This is the
    * materialized-partitioning pattern: pay one shuffle at write time,
    * join shuffle-free forever after. */
  /** Write-once-per-(JVM, source dir) bucketed copy of a table. Table
    * name AND path are keyed by the source dir: a per-JVM-only key
    * would let a multi-scale run (Bench times sf0.1 then the ×10
    * fixture in one JVM) silently reuse the first dir's layout and
    * aggregate the wrong data. Shared by every bucketed-layout
    * operator so the write policy lives in one place. */
  private def bucketedTable(s: SparkSession, dir: String, df: DataFrame,
      table: String, key: String): DataFrame = {
    // hashCode suffix: the sanitized name alone would collide for dirs
    // differing only in non-alphanumerics ("/sf0.1" vs "/sf0_1")
    val dirKey = dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + Integer.toHexString(dir.hashCode)
    val tbl = s"graft_${table}_${graft.core.RunId.id}_$dirKey"
    if (!s.catalog.tableExists(tbl))
      df.write.bucketBy(8, key).sortBy(key)
        .option("path", graft.core.RunId.scratch(s"bucketed/$dirKey/$table"))
        .mode("overwrite").saveAsTable(tbl)
    s.table(tbl)
  }

  def joinBucketed(s: SparkSession, dir: String): DataFrame =
    bucketedTable(s, dir, Tables.orders(s, dir), "orders_bucketed", "o_custkey")
      .hint("MERGE")
      .join(
        bucketedTable(s, dir, Tables.customer(s, dir), "customer_bucketed", "c_custkey"),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "c_name")
      .orderBy("o_orderkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_salted" -> (joinSalted _),
    "join_bucketed" -> (joinBucketed _),
    "join_inner_hash" -> (joinInnerHash _),
    "join_broadcast" -> (joinBroadcast _),
    "join_sortmerge" -> (joinSortMerge _),
    "join_left" -> (joinLeft _),
    "join_right" -> (joinRight _),
    "join_full" -> (joinFull _),
    "join_semi" -> (joinSemi _),
    "join_anti" -> (joinAnti _),
    "join_lookup" -> (joinLookup _),
    "join_theta" -> (joinTheta _),
    "join_interval" -> (joinInterval _),
    "join_bloom_prefilter" -> (joinBloomPrefilter _),
    "join_asof" -> (joinAsof _),
    "join_asof_fwd" -> (joinAsofForward _),
    "join_asof_nearest" -> (joinAsofNearest _),
    "join_asof_tolerance" -> (joinAsofTolerance _),
    "scan_bucket_pruned" -> (scanBucketPruned _)
  )

  /** Backward as-of join with a STALENESS TOLERANCE — the fourth
    * as-of face (backward / forward / nearest / bounded-backward):
    * each event takes the most recent order of its customer, but a
    * match older than 30 days is DISCARDED (null), because a
    * month-stale "most recent state" is not state — the
    * merge_asof(tolerance=…) semantics every feature-store
    * point-in-time join needs. Same union+window shape as
    * [[joinAsof]] (one shuffle keyed on the customer, no per-pair
    * blowup) carrying the as-of TIMESTAMP alongside the key so the
    * tolerance test is one row-local comparison; equivalently the
    * bounded lateral lookup — a stale latest order implies every
    * earlier order is staler, so null-if-stale ≡ latest-within-
    * tolerance, which is what the oracle states. */
  def joinAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("k"), col("o_orderdate").cast("timestamp").as("t"),
      lit(0).as("pri"), col("o_orderkey").as("okey"),
      lit(null).cast("long").as("event_id"))
    val e = Tables.events(s, dir).select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(1).as("pri"), lit(null).cast("long").as("okey"),
      col("event_id"))
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("pri").asc, col("okey").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // timestamp-domain comparison (not floored seconds): the boundary
    // is exact at any sub-second event time
    val fresh = col("asof_t") >= col("t") - expr("INTERVAL 30 DAYS")
    o.unionByName(e)
      .withColumn("cand_okey", last("okey", ignoreNulls = true).over(w))
      .withColumn("asof_t",
        last(when(col("pri") === 0, col("t")), ignoreNulls = true).over(w))
      .filter(col("pri") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        when(fresh, col("cand_okey")).as("asof_orderkey"),
        when(fresh, col("t").cast("long") - col("asof_t").cast("long"))
          .as("dt_s"))
      .orderBy("event_id")
  }

  /** Forward as-of join: each event matched to the EARLIEST order of
    * the same customer with o_orderdate >= ts (tiebreak: min
    * o_orderkey) — the "next scheduled thing after this signal" lookup
    * that completes the as-of family. Same union+window shape as
    * [[joinAsof]] with time reversed: one shuffle keyed on the
    * customer, ordered (t DESC, pri ASC, okey DESC), so
    * `last(okey, ignoreNulls)` over the preceding frame is exactly the
    * nearest upcoming order. No per-pair blowup at any scale. */
  def joinAsofForward(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(0).as("pri"), col("o_orderkey").as("okey"),
      lit(null).cast("long").as("event_id"))
    val e = Tables.events(s, dir).select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(1).as("pri"), lit(null).cast("long").as("okey"),
      col("event_id"))
    val w = Window.partitionBy("k")
      .orderBy(col("t").desc, col("pri").asc, col("okey").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("next_orderkey", last("okey", ignoreNulls = true).over(w))
      .filter(col("pri") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("next_orderkey"))
      .orderBy("event_id")
  }

  /** Nearest as-of join — the bidirectional member of the as-of
    * family: each event matched to the closest order of its customer
    * in EITHER direction (backward t ≤ ts inclusive, forward t > ts
    * strict; ties in |Δt| go backward — the match you'd attribute
    * to). The gap-to-schedule lookup for sensor alignment and
    * event-to-order attribution when "nearest context" beats "last
    * context".
    *
    * Scale shape: BOTH directions ride ONE shuffle — the union is
    * sorted once per customer key and two frames of the same window
    * spec (preceding-last / following-first over null-masked order
    * columns) resolve the two candidates; Spark plans a single
    * Exchange+Sort with two Window operators over it, no per-pair
    * blowup at any scale. */
  def joinAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("k"), col("o_orderdate").cast("timestamp_ntz").as("t"),
      lit(0).as("pri"), col("o_orderkey").as("okey"),
      lit(null).cast("long").as("event_id"))
    val e = Tables.events(s, dir).select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(1).as("pri"), lit(null).cast("long").as("okey"),
      col("event_id"))
    // One ordering serves both directions: equal-t orders sort BEFORE
    // the event row (pri 0 < 1), so the preceding frame sees them
    // (backward inclusive) and the following frame does not (forward
    // strict); okey asc makes preceding-last = max okey and
    // following-first = min okey, the two directional tiebreaks.
    val back = Window.partitionBy("k")
      .orderBy(col("t").asc, col("pri").asc, col("okey").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The forward direction is the SAME prefix frame over the exact
    // REVERSE ordering — never (currentRow, unboundedFollowing):
    // Spark evaluates growing prefix frames incrementally (O(n) per
    // partition) but recomputes an UnboundedFollowing frame from
    // scratch at every row (O(n²) per key) — measured 1922 s at ×100
    // vs ~25 s for this form, first exposed when Bench stopped
    // count-pruning the window columns. In reverse order (t desc,
    // pri desc, okey desc) the equal-t orders sort AFTER the event
    // row, so the prefix excludes them (forward stays strict) and
    // prefix-last = the min-t / min-okey forward order, exactly the
    // following-first of the old frame.
    val fwdRev = Window.partitionBy("k")
      .orderBy(col("t").desc, col("pri").desc, col("okey").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val oT = when(col("pri") === 0, col("t"))
    val dtb = Tables.epochMs(col("t")) - Tables.epochMs(col("back_t"))
    val dtf = Tables.epochMs(col("fwd_t")) - Tables.epochMs(col("t"))
    val takeBack = col("back_key").isNotNull &&
      (col("fwd_key").isNull || dtb <= dtf)
    o.unionByName(e)
      .withColumn("back_key", last("okey", ignoreNulls = true).over(back))
      .withColumn("back_t", last(oT, ignoreNulls = true).over(back))
      .withColumn("fwd_key", last("okey", ignoreNulls = true).over(fwdRev))
      .withColumn("fwd_t", last(oT, ignoreNulls = true).over(fwdRev))
      .filter(col("pri") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        when(takeBack, col("back_key")).otherwise(col("fwd_key"))
          .as("nearest_orderkey"),
        when(takeBack, lit("back"))
          .when(col("fwd_key").isNotNull, lit("fwd")).as("direction"),
        when(takeBack, floor(dtb / lit(1000L)))
          .when(col("fwd_key").isNotNull, floor(dtf / lit(1000L)))
          .cast("long").as("dt_s"))
      .orderBy("event_id")
  }

  /** Bucket pruning: a per-key aggregate on a bucketed table reads
    * ONE bucket of 8 and never shuffles — the layout-level analog of
    * Cassandra's partition-key routing (the coordinator contacts only
    * the owning node; here the scan opens only the owning bucket's
    * files, and the bucket hash distribution already satisfies the
    * aggregation). The aggregate matters: a bare filter makes Spark's
    * DisableUnnecessaryBucketedScan drop the bucketed read (nothing
    * wants the distribution) and with it the pruning. PlanSpec asserts
    * `SelectedBucketsCount: 1 out of 8`; at 100 TB this layout turns a
    * key lookup from a full scan into 1/N of the files, before
    * row-group pruning even starts. Oracle = the same aggregate on the
    * unbucketed table (layout must be output-invisible). */
  def scanBucketPruned(s: SparkSession, dir: String): DataFrame = {
    bucketedTable(s, dir, Tables.orders(s, dir), "orders_bucketed", "o_custkey")
      .filter(col("o_custkey") === 42L)
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n_orders"),
        graft.core.Num.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_custkey")
  }

  val oracles: Map[String, String] = Map(
    "scan_bucket_pruned" -> s"""
      SELECT o_custkey, COUNT(*) AS n_orders,
        ${graft.core.Num.sqlDsum("o_totalprice")} AS sum_price
      FROM orders WHERE o_custkey = 42
      GROUP BY o_custkey ORDER BY o_custkey""",
    "join_asof_fwd" -> """
      SELECT e.event_id, e.user_id, o.o_orderkey AS next_orderkey
      FROM events e LEFT JOIN LATERAL (
        SELECT o_orderkey FROM orders
        WHERE o_custkey = e.user_id AND o_orderdate >= e.ts
        ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 1) o ON TRUE
      ORDER BY e.event_id""",
    "join_salted" -> """
      SELECT event_id, user_id, c_name
      FROM events JOIN customer ON user_id = c_custkey
      ORDER BY event_id""",
    "join_bucketed" -> """
      SELECT o_orderkey, o_custkey, c_name
      FROM orders JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey""",
    "join_inner_hash" -> """
      SELECT o_orderkey, o_custkey, c_name, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey""",
    "join_broadcast" -> """
      SELECT c_custkey, n_name, r_name
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      ORDER BY c_custkey""",
    "join_sortmerge" -> """
      SELECT l_orderkey, l_linenumber, o_custkey, o_orderdate, l_quantity
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "join_left" -> """
      SELECT c_custkey, o_orderkey
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""",
    "join_right" -> """
      SELECT c_custkey, o_orderkey
      FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""",
    "join_full" -> """
      SELECT COALESCE(f.fk, p.pk) AS custkey, f.f_cnt, p.p_cnt
      FROM (SELECT o_custkey AS fk, COUNT(*) AS f_cnt FROM orders
            WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
      FULL JOIN (SELECT o_custkey AS pk, COUNT(*) AS p_cnt FROM orders
            WHERE o_orderstatus = 'P' GROUP BY o_custkey) p
      ON f.fk = p.pk
      ORDER BY custkey""",
    "join_semi" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      ORDER BY c_custkey""",
    "join_anti" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      ORDER BY c_custkey""",
    "join_lookup" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders JOIN (SELECT c_custkey FROM customer
                        ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 20) k
      ON o_custkey = k.c_custkey
      ORDER BY o_orderkey""",
    "join_theta" -> """
      SELECT n1.n_regionkey AS r1, n1.n_nationkey AS k1, n2.n_nationkey AS k2,
             n1.n_name AS name1, n2.n_name AS name2
      FROM nation n1 JOIN nation n2
        ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
      ORDER BY r1, k1, k2""",
    "join_asof" -> """
      SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey
      FROM events e LEFT JOIN LATERAL (
        SELECT o_orderkey FROM orders
        WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON TRUE
      ORDER BY e.event_id""",
    // latest-within-tolerance lateral ≡ null-if-stale window (a stale
    // latest order implies every earlier one is staler)
    "join_asof_tolerance" -> """
      SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey,
        (epoch_ms(e.ts) - epoch_ms(CAST(o.o_orderdate AS TIMESTAMP))) // 1000
          AS dt_s
      FROM events e LEFT JOIN LATERAL (
        SELECT o_orderkey, o_orderdate FROM orders
        WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
          AND CAST(o_orderdate AS TIMESTAMP) >= e.ts - INTERVAL 30 DAY
        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON TRUE
      ORDER BY e.event_id""",
    "join_asof_nearest" -> """
      WITH j AS (
        SELECT e.event_id, e.user_id,
          b.o_orderkey AS bk, f.o_orderkey AS fk,
          epoch_ms(e.ts) - epoch_ms(CAST(b.o_orderdate AS TIMESTAMP)) AS dtb,
          epoch_ms(CAST(f.o_orderdate AS TIMESTAMP)) - epoch_ms(e.ts) AS dtf
        FROM events e
        LEFT JOIN LATERAL (
          SELECT o_orderkey, o_orderdate FROM orders
          WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
          ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) b ON TRUE
        LEFT JOIN LATERAL (
          SELECT o_orderkey, o_orderdate FROM orders
          WHERE o_custkey = e.user_id AND CAST(o_orderdate AS TIMESTAMP) > e.ts
          ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 1) f ON TRUE)
      SELECT event_id, user_id,
        CASE WHEN bk IS NOT NULL AND (fk IS NULL OR dtb <= dtf)
             THEN bk ELSE fk END AS nearest_orderkey,
        CASE WHEN bk IS NOT NULL AND (fk IS NULL OR dtb <= dtf) THEN 'back'
             WHEN fk IS NOT NULL THEN 'fwd' END AS direction,
        CASE WHEN bk IS NOT NULL AND (fk IS NULL OR dtb <= dtf) THEN dtb // 1000
             WHEN fk IS NOT NULL THEN dtf // 1000 END AS dt_s
      FROM j ORDER BY event_id""",
    // the oracle is the PLAIN join: the bloom prefilter must be
    // output-invisible (false positives die in the exact join)
    "join_bloom_prefilter" -> """
      SELECT o_orderkey, o_custkey, c_name
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      ORDER BY o_orderkey""",
    // the oracle is the UN-bucketed theta join the operator replaces
    "join_interval" -> """
      WITH w AS (
        SELECT user_id AS window_id, min(ts) AS w_start,
               min(ts) + INTERVAL 90 MINUTE AS w_end
        FROM events WHERE user_id < 20 GROUP BY user_id)
      SELECT w.window_id, e.event_id, e.user_id
      FROM events e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
      ORDER BY w.window_id, e.event_id"""
  )
}
