package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.plans.CassTokenExpr

/** Anti-entropy repair (SURVEY.md §1.2: nodetool repair / read
  * repair): find the rows on which two replicas of the same table
  * disagree, without shipping either replica across the network.
  *
  * Cassandra does this with Merkle trees per token range: replicas
  * exchange range digests, and only ranges whose digests differ stream
  * actual rows. The Spark-first form is the same two-phase shape:
  *
  *   1. **Digest pass** — each replica scans once, buckets every row
  *      by `pmod(cass_token(pk), 256)` (the REAL Murmur3 ring
  *      position, so buckets are exactly token ranges), and reduces
  *      each bucket to one order-insensitive `bit_xor` of row hashes.
  *      Shuffle output: 256 rows per replica, independent of table
  *      size — this is the whole point at 100 TB.
  *   2. **Drill-down** — the differing-bucket list is collected
  *      (bounded by the 256-bucket DOMAIN, not by data — the same
  *      bounded-by-construction class as the langid profile) and
  *      applied as an `IN` filter on both replica re-scans, so only
  *      dirty-range rows reach the keyed full-outer join that emits
  *      each divergent key with a status (`missing_in_a` /
  *      `missing_in_b`/`value_differs`). With divergence localized
  *      (the real-world repair case), the expensive keyed join runs
  *      over a small fraction of the table.
  *
  * Like Cassandra's repair, digest equality is probabilistic (an xor
  * of 64-bit hashes could theoretically cancel); the oracle checks the
  * exact end-to-end answer on the planted divergence.
  *
  * The second replica is derived deterministically from the first so
  * the oracle can re-derive it in SQL: replica B misses every
  * `event_id % 991 == 0` row (lost write) and perturbs `value` on
  * every `event_id % 997 == 0` row (divergent write).
  */
object Repair extends QueryGroup {

  private val buckets = 256

  private[graft] def replicaA(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("event_id"), col("value"))

  private[graft] def replicaB(s: SparkSession, dir: String): DataFrame =
    replicaA(s, dir)
      .filter(col("event_id") % 991 =!= 0)
      .withColumn("value",
        when(col("event_id") % 997 === 0, col("value") + 1.0).otherwise(col("value")))

  private[graft] def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", pmod(CassTokenExpr.token(col("event_id")), lit(buckets)))

  private[graft] def digests(df: DataFrame, name: String): DataFrame =
    withBucket(df)
      .withColumn("h", xxhash64(col("event_id"), col("value")))
      .groupBy("bucket")
      .agg(expr("bit_xor(h)").as(name))

  def repairDiff(s: SparkSession, dir: String): DataFrame = {
    val a = replicaA(s, dir)
    val b = replicaB(s, dir)
    // Phase 1: 256-row digest tables; full-outer so a bucket present
    // on one side only (possible under heavier divergence) is dirty.
    val dirty = digests(a, "da")
      .join(digests(b, "db"), Seq("bucket"), "full_outer")
      .filter(!(col("da") <=> col("db")))
      .select("bucket")
      .collect().map(_.getLong(0)).toSeq // ≤256 rows by domain bound
    // Phase 2: keyed diff over dirty ranges only.
    val aD = withBucket(a).filter(col("bucket").isin(dirty: _*))
      .select(col("event_id").as("a_id"), col("value").as("a_value"))
    val bD = withBucket(b).filter(col("bucket").isin(dirty: _*))
      .select(col("event_id").as("b_id"), col("value").as("b_value"))
    aD.join(bD, col("a_id") === col("b_id"), "full_outer")
      .filter(col("a_id").isNull || col("b_id").isNull ||
        col("a_value") =!= col("b_value"))
      .select(
        coalesce(col("a_id"), col("b_id")).as("event_id"),
        when(col("b_id").isNull, lit("missing_in_b"))
          .when(col("a_id").isNull, lit("missing_in_a"))
          .otherwise(lit("value_differs")).as("status"),
        col("a_value"), col("b_value"))
      .orderBy("event_id")
  }

  /** Repair ACTION — the second half of anti-entropy: apply the diff
    * back onto the stale replica and emit the healed table. Missing
    * rows are re-streamed from the healthy side, divergent values
    * overwritten; rows outside the diff are carried through untouched
    * (at scale that carry-through is the whole table MINUS the dirty
    * ranges — no rewrite of synced data, matching how Cassandra
    * streams only the out-of-sync ranges). The oracle states the
    * postcondition directly: the healed replica IS replica A, byte for
    * byte — diff then apply is a closed loop. */
  def repairApply(s: SparkSession, dir: String): DataFrame = {
    // The diff is referenced twice below (corrections + re-streamed
    // rows); materialize it once so each action doesn't execute the
    // whole digest + drill-down lineage twice. It is divergence-sized,
    // so the scratch write is small at any scale.
    val diffPath = graft.core.RunId.scratch("repair_diff_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    repairDiff(s, dir)
      .select(col("event_id"), col("status"), col("a_value"))
      .write.mode("overwrite").parquet(diffPath)
    val diff = s.read.parquet(diffPath)
    replicaB(s, dir)
      .join(diff.filter(col("status") === "value_differs")
        .select(col("event_id"), col("a_value")), Seq("event_id"), "left_outer")
      .select(col("event_id"),
        coalesce(col("a_value"), col("value")).as("value"))
      .unionByName(
        diff.filter(col("status") === "missing_in_b")
          .select(col("event_id"), col("a_value").as("value")))
      .orderBy("event_id")
  }

  /** READ repair (SURVEY.md §1.2) — the per-query sibling of
    * anti-entropy: a coordinator reading at CL=TWO gets each key's
    * newest state from both replicas, detects divergence (the digest
    * mismatch — here the state-tuple inequality the digests stand in
    * for), answers with the LWW-merged newest, and reports which side
    * needs the heal written back.
    *
    * Replica model: writes fan out to both replicas but each drops a
    * deterministic slice (A misses event_id % 983 == 0, B misses
    * % 991 == 0), so either replica can be AHEAD on a given key —
    * unlike [[repairDiff]]'s one-stale-side pair — and the merge
    * direction varies per key.
    *
    * Scale shape: ONE groupBy(user_id) with two filtered `max_by`
    * partial aggregates — each replica's newest state per key in a
    * single shuffle of (key, state) pairs, no window, no self-join.
    * The heal decision and merged answer are row-local on the
    * aggregate. At 100 TB this is exactly the coordinator's cost:
    * proportional to keys read, never to history length. */
  def readRepair(s: SparkSession, dir: String): DataFrame = {
    def replicaState(miss: Int) = expr(
      s"""max_by(struct(ts, event_id, event_type, value), struct(ts, event_id))
          FILTER (WHERE event_id % $miss != 0)""")
    val states = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(replicaState(983).as("sa"), replicaState(991).as("sb"))
    val newer = when(col("sb").isNull, col("sa"))
      .when(col("sa").isNull, col("sb"))
      .when(struct(col("sa.ts"), col("sa.event_id")) >=
              struct(col("sb.ts"), col("sb.event_id")), col("sa"))
      .otherwise(col("sb"))
    states
      // a key every replica missed entirely has no read to repair (and
      // would be absent from the oracle's replica CTEs)
      .filter(col("sa").isNotNull || col("sb").isNotNull)
      .withColumn("m", newer)
      .select(
        col("user_id"),
        col("m.event_id").as("event_id"),
        col("m.event_type").as("event_type"),
        col("m.value").as("value"),
        when(col("sa") <=> col("sb"), lit("in_sync"))
          .when(col("m") <=> col("sa"), lit("heal_b"))
          .otherwise(lit("heal_a")).as("repair"))
      .orderBy("user_id")
  }

  /** Hinted handoff (SURVEY.md §1.2) — the WRITE-path member of the
    * repair family (anti-entropy = scheduled, read repair = per-query,
    * hints = per-write): while a replica is down, the coordinator
    * buffers each missed mutation as a hint and replays the buffer
    * when the replica returns.
    *
    * Outage model over `events` (ts spans 2024-01-01..30): replica B
    * is down for [01-10, 01-15). Coordinators stop writing hints once
    * the outage exceeds the hint window (Cassandra's
    * `max_hint_window`) — modeled as the first 2 days — so writes in
    * [01-10, 01-12) are hinted and writes in [01-12, 01-15) are LOST
    * until anti-entropy ([[repairDiff]]) finds them. The connection
    * also flaps: B durably applied every `event_id % 3 == 0` outage
    * write but the ACK was lost, so those mutations are BOTH present
    * on B and hinted — replay must be idempotent, which the anti-join
    * states structurally (a replayed hint is one whose key B does not
    * already hold) rather than by re-deriving the flap predicate.
    *
    * Scale shape: the hint store is bounded by outage duration ×
    * write rate, never by table size, and the idempotence anti-join
    * runs hint-window rows against hint-window rows (B's directly-held
    * keys OUTSIDE the window cannot collide with a hint, so the probe
    * side prunes to the window first — both join inputs are
    * outage-sized, broadcast-able at any corpus scale). The healed
    * replica is emitted as direct ∪ replayed with provenance. */
  def hintReplay(s: SparkSession, dir: String): DataFrame = {
    val t1 = lit("2024-01-10 00:00:00").cast("timestamp_ntz")
    val hintEnd = lit("2024-01-12 00:00:00").cast("timestamp_ntz")
    val t2 = lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    val ev = Tables.events(s, dir).select("event_id", "ts", "user_id", "value")
    // What B holds when it returns: everything outside the outage,
    // plus the flap-applied slice inside it.
    val direct = ev.filter(col("ts") < t1 || col("ts") >= t2 ||
      col("event_id") % 3 === 0)
    val hints = ev.filter(col("ts") >= t1 && col("ts") < hintEnd)
    val replayed = hints.join(
      direct.filter(col("ts") >= t1 && col("ts") < hintEnd)
        .select("event_id"),
      Seq("event_id"), "left_anti")
    direct.select(col("event_id"), col("user_id"), col("value"),
        lit("direct").as("via"))
      .unionByName(replayed.select(col("event_id"), col("user_id"),
        col("value"), lit("replayed").as("via")))
      .orderBy("event_id")
  }

  /** Quorum read at RF=3 — [[readRepair]]'s coordinator extended to
    * the full replica set with consistency-level accounting. Cassandra
    * reconciles replica responses by TIMESTAMP (last-write-wins), not
    * by majority vote: the answer is the newest state among however
    * many replicas replied, and the per-key bookkeeping records what
    * consistency the read actually achieved (`all`/`quorum`/`one` =
    * 3/2/1 replies) and how many replicas returned stale-or-missing
    * data and therefore need read repair (`n_stale`).
    *
    * Replica r's visible history drops `event_id % p_r == 0` (primes
    * 7/11/13 — per-replica delivery gaps), so a replica that missed
    * the newest write still answers with its older surviving state.
    * The merge is `array_sort(filter(array(sa,sb,sc), not-null))[-1]`
    * on (ts, event_id)-led structs — row-local on the one keyed
    * aggregate, so the cost at 100 TB is exactly the coordinator's:
    * proportional to keys read, never to history length or RF². */
  def consistencyQuorum(s: SparkSession, dir: String): DataFrame = {
    def replicaState(miss: Int) = expr(
      s"""max_by(struct(ts, event_id, event_type, value), struct(ts, event_id))
          FILTER (WHERE event_id % $miss != 0)""")
    val all = array(col("sa"), col("sb"), col("sc"))
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(replicaState(7).as("sa"), replicaState(11).as("sb"),
        replicaState(13).as("sc"))
      .withColumn("avail", array_sort(filter(all, _.isNotNull)))
      .filter(size(col("avail")) >= 1)
      .withColumn("m", element_at(col("avail"), -1))
      .select(
        col("user_id"),
        col("m.event_id").as("event_id"),
        col("m.event_type").as("event_type"),
        col("m.value").as("value"),
        size(col("avail")).cast("long").as("replies"),
        (lit(3) - size(filter(all, _ <=> col("m")))).cast("long").as("n_stale"),
        when(size(col("avail")) === 3, "all")
          .when(size(col("avail")) === 2, "quorum")
          .otherwise("one").as("cl"))
      .orderBy("user_id")
  }

  /** Quorum WRITE at RF=3 — [[consistencyQuorum]]'s write-path
    * sibling, completing the coordinator pair: every mutation goes to
    * all three replicas, the coordinator counts acks against
    * CL=QUORUM, stores a hint for each missed replica still inside its
    * hint window (Cassandra `max_hint_window`, modeled as the first
    * 2 days of a planned outage; transient per-write drops are always
    * hinted), and accounts the result per day. Cassandra semantics
    * kept deliberately: a write acked by only ONE replica reports a
    * timeout to the client but is NOT rolled back — it stays durable
    * where it landed (the `one` column counts exactly these), and
    * writes missed past the hint window are LOST to hints and only
    * anti-entropy ([[repairDiff]]) finds them.
    *
    * Outage model over `events` (ts spans 2024-01): replica A down
    * [01-05, 01-08) with hints through 01-07; replica B down
    * [01-10, 01-15) with hints through 01-12 (the [[hintReplay]]
    * outage); replica C drops `event_id % 17 == 0` transiently
    * (always hinted). A and B outages never overlap, so acks ≥ 1.
    *
    * Scale shape: availability and hint decisions are ROW-LOCAL
    * predicates on (ts, event_id) — the whole op is one scan + one
    * map-side-combining aggregate to ≤ days rows; no join, no window,
    * nothing driver-side. At 100 TB this is the coordinator ledger a
    * cluster would emit per day at write time. */
  def writeQuorum(s: SparkSession, dir: String): DataFrame = {
    def ts(x: String) = lit(x).cast("timestamp_ntz")
    val t = col("ts")
    val aDown = t >= ts("2024-01-05 00:00:00") && t < ts("2024-01-08 00:00:00")
    val bDown = t >= ts("2024-01-10 00:00:00") && t < ts("2024-01-15 00:00:00")
    val cDown = col("event_id") % 17 === 0
    val aHint = aDown && t < ts("2024-01-07 00:00:00")
    val bHint = bDown && t < ts("2024-01-12 00:00:00")
    val acks = lit(3) - aDown.cast("int") - bDown.cast("int") - cDown.cast("int")
    Tables.events(s, dir).select(col("event_id"), col("ts"))
      .withColumn("acks", acks)
      .withColumn("n_hints",
        aHint.cast("int") + bHint.cast("int") + cDown.cast("int"))
      .withColumn("n_lost",
        (aDown && !aHint).cast("int") + (bDown && !bHint).cast("int"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).cast("long").as("n_writes"),
        count(when(col("acks") === 3, 1)).cast("long").as("n_all"),
        count(when(col("acks") === 2, 1)).cast("long").as("n_quorum"),
        count(when(col("acks") === 1, 1)).cast("long").as("n_one"),
        sum("n_hints").cast("long").as("n_hints"),
        sum("n_lost").cast("long").as("n_lost"))
      .orderBy("day")
  }

  /** Multi-DC consistency read — [[consistencyQuorum]] extended to a
    * NetworkTopologyStrategy keyspace: two datacenters at RF=3 each,
    * coordinator in DC1. Cassandra's cross-DC replication is ASYNC, so
    * DC2 replicas are additionally BEHIND: they have not yet received
    * any mutation from the last replication window (ts ≥ 01-25) on top
    * of their own per-replica delivery gaps (primes 17/19/23; DC1 uses
    * consistency_quorum's 7/11/13). The merge is still LWW over
    * whoever replied; the bookkeeping is per-DC: local/remote reply
    * counts, the achieved consistency level (`each_quorum` needs a
    * quorum in EVERY dc, `local_quorum` only in the coordinator's,
    * else `local_one`/`unavailable`), and n_stale = replicas (of 6)
    * whose answer is not the newest — exactly what drives Cassandra's
    * read-repair and `nodetool status` staleness accounting.
    *
    * Scale shape: identical to consistency_quorum — ONE keyed
    * aggregate with six row-local max_by FILTER states, merged
    * row-local; cost ∝ keys read, never RF², and nothing about the
    * second DC adds a shuffle. */
  def consistencyMultidc(s: SparkSession, dir: String): DataFrame = {
    val lag = "CAST('2024-01-25 00:00:00' AS TIMESTAMP_NTZ)"
    def state(miss: Int, lagged: Boolean) = expr(
      s"""max_by(struct(ts, event_id, event_type, value), struct(ts, event_id))
          FILTER (WHERE event_id % $miss != 0${if (lagged) s" AND ts < $lag" else ""})""")
    val local = array(col("sa"), col("sb"), col("sc"))
    val remote = array(col("sd"), col("se"), col("sf"))
    val all = concat(local, remote)
    val nLocal = size(filter(local, _.isNotNull))
    val nRemote = size(filter(remote, _.isNotNull))
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        state(7, lagged = false).as("sa"), state(11, lagged = false).as("sb"),
        state(13, lagged = false).as("sc"),
        state(17, lagged = true).as("sd"), state(19, lagged = true).as("se"),
        state(23, lagged = true).as("sf"))
      .withColumn("avail", array_sort(filter(all, _.isNotNull)))
      .filter(size(col("avail")) >= 1)
      .withColumn("m", element_at(col("avail"), -1))
      .select(
        col("user_id"),
        col("m.event_id").as("event_id"),
        col("m.event_type").as("event_type"),
        col("m.value").as("value"),
        nLocal.cast("long").as("local_replies"),
        nRemote.cast("long").as("remote_replies"),
        (lit(6) - size(filter(all, _ <=> col("m")))).cast("long").as("n_stale"),
        when(nLocal >= 2 && nRemote >= 2, "each_quorum")
          .when(nLocal >= 2, "local_quorum")
          .when(nLocal >= 1, "local_one")
          .otherwise("unavailable").as("cl"))
      .orderBy("user_id")
  }

  /** Materialized-view validation — anti-entropy pointed at the MV
    * problem: Cassandra MVs drift from their base table under write
    * races and missed view updates (the documented production issue
    * behind `nodetool viewbuildstatus` and the MV health warnings),
    * and the only cure is periodic base↔view reconciliation. Model: a
    * served per-user aggregate view where `user_id % 97 == 0` rows
    * never received their view update (missing) and `% 89` rows
    * double-applied one (stale count). Validation is the
    * [[repairDiff]] shape verbatim: 256 token-bucket `bit_xor`
    * digests per side (domain-bounded), drill into DIRTY buckets
    * only, emit per-key status (missing_in_mv / stale) with both
    * sides' values. At 100 TB the digest pass is two user-domain
    * aggregates and the drill-down reads only the dirty slices —
    * cost ∝ divergence, not view size. */
  def mvValidate(s: SparkSession, dir: String): DataFrame = {
    import graft.core.Num
    val base = Tables.events(s, dir).select("user_id", "value")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(Num.d2(col("value"))).as("sv"))
    val mv = base
      .filter(col("user_id") % 97 =!= 0)
      .withColumn("n",
        when(col("user_id") % 89 === 0, col("n") + 1).otherwise(col("n")))
    def bucketed(df: DataFrame) = df.withColumn("bucket",
      pmod(CassTokenExpr.token(col("user_id")), lit(buckets)))
    def dg(df: DataFrame, nm: String) = bucketed(df)
      .withColumn("h", xxhash64(col("user_id"), col("n"), col("sv")))
      .groupBy("bucket").agg(expr("bit_xor(h)").as(nm))
    val dirty = dg(base, "db").join(dg(mv, "dm"), Seq("bucket"), "full_outer")
      .filter(!(col("db") <=> col("dm")))
      .select("bucket")
      .collect().map(_.getLong(0)).toSeq // ≤256 rows by domain bound
    val bD = bucketed(base).filter(col("bucket").isin(dirty: _*))
      .select(col("user_id"), col("n").as("base_n"), col("sv").as("base_sv"))
    val mD = bucketed(mv).filter(col("bucket").isin(dirty: _*))
      .select(col("user_id"), col("n").as("mv_n"), col("sv").as("mv_sv"))
    bD.join(mD, Seq("user_id"), "left")
      .filter(col("mv_n").isNull ||
        col("mv_n") =!= col("base_n") || col("mv_sv") =!= col("base_sv"))
      .select(col("user_id"),
        when(col("mv_n").isNull, "missing_in_mv").otherwise("stale").as("status"),
        col("base_n").cast("long").as("base_n"),
        round(col("base_sv"), 2).cast("double").as("base_sv"),
        col("mv_n").cast("long").as("mv_n"),
        round(col("mv_sv"), 2).cast("double").as("mv_sv"))
      .orderBy("user_id")
  }

  /** INCREMENTAL repair (VERDICT r10 next #4) — the anti-entropy mode
    * Cassandra actually schedules: sstables carry a repaired/unrepaired
    * state, a session digests ONLY the unrepaired generations (the
    * repaired set was validated by an earlier session and anticompacted
    * into its own files — re-digesting it is the waste full repair
    * pays every run), heals their divergence, and then flips the
    * participating generations to repaired (the anticompaction
    * promotion). Model: generations = flush days; days < 13 were
    * repaired by the last session, so replica B's divergence (the
    * [[repairDiff]] corruption pattern) is planted ONLY in unrepaired
    * generations — the invariant anticompaction maintains. Engine
    * path: per-(generation, token-bucket) XOR digests over the
    * UNREPAIRED slice only → dirty buckets (bounded collect-free
    * relation) → keyed drill-down semi-joined to dirty ranges →
    * per-generation session report. The oracle states the
    * postcondition directly: repaired generations are never digested,
    * unrepaired ones report exactly the planted missing/divergent
    * counts, and every generation exits repaired. At 100 TB the
    * digest pass reads |unrepaired| data — the whole point of
    * incremental repair — and the drill-down reads only dirty
    * buckets. */
  private val IncRepairCut = 13

  def repairIncremental(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.events(s, dir)
      .select(col("event_id"), col("value"), dayofmonth(col("ts")).as("gen"))
    val b = a.filter(col("gen") < IncRepairCut || col("event_id") % 991 =!= 0)
      .withColumn("value",
        when(col("gen") >= IncRepairCut && col("event_id") % 997 === 0,
          col("value") + 1.0).otherwise(col("value")))
    val aU = withBucket(a.filter(col("gen") >= IncRepairCut))
    val bU = withBucket(b.filter(col("gen") >= IncRepairCut))
    def dg(df: DataFrame, name: String) = df
      .withColumn("h", xxhash64(col("event_id"), col("value")))
      .groupBy("gen", "bucket").agg(expr("bit_xor(h)").as(name))
    // dirty ranges: ≤ gens × 256 rows, kept distributed (semi-join
    // below), never collected
    val dirty = dg(aU, "da").join(dg(bU, "db"), Seq("gen", "bucket"), "full_outer")
      .filter(!(col("da") <=> col("db")))
      .select("gen", "bucket")
      .localCheckpoint()
    val aD = aU.join(dirty, Seq("gen", "bucket"), "left_semi")
      .select(col("gen"), col("event_id"), col("value").as("a_value"))
    val bD = bU.join(dirty, Seq("gen", "bucket"), "left_semi")
      .select(col("gen"), col("event_id"), col("value").as("b_value"))
    val healed = aD.join(bD, Seq("gen", "event_id"), "full_outer")
      .filter(col("b_value").isNull || col("a_value").isNull ||
        col("a_value") =!= col("b_value"))
      .groupBy("gen").agg(
        sum(when(col("b_value").isNull, 1L).otherwise(0L)).as("n_streamed"),
        sum(when(col("b_value").isNotNull, 1L).otherwise(0L)).as("n_overwritten"))
    a.groupBy("gen").agg(count(lit(1)).cast("long").as("n_rows"))
      .join(healed, Seq("gen"), "left")
      .select(col("gen"),
        when(col("gen") < IncRepairCut, "repaired").otherwise("unrepaired")
          .as("state_before"),
        col("n_rows"),
        (col("gen") >= IncRepairCut).as("digested"),
        coalesce(col("n_streamed"), lit(0L)).as("n_streamed"),
        coalesce(col("n_overwritten"), lit(0L)).as("n_overwritten"),
        lit("repaired").as("state_after"))
      .orderBy("gen")
  }

  /** PREVIEW repair (`nodetool repair --preview`, Cassandra 4+): run
    * the validation phase — digests compared per range — and report
    * what a real repair WOULD stream, without healing anything; the
    * operator teams run before a maintenance window to size it.
    * Ranges here are id-slice "virtual token ranges" (pmod 64 — a
    * DuckDB-mirrorable stand-in for the Murmur3 buckets
    * [[repairDiff]] uses, so the WHOLE face is oracle-checkable).
    * Engine path: per-range xor digests on both replicas, keyed
    * drill-down ONLY into mismatched ranges to count the would-be
    * streams; `digest_match` comes from the actual digest compare,
    * and the oracle states its semantic meaning (no divergence in
    * the range) — equal unless a 64-bit xor collision, which the
    * fixture run would surface as a hash mismatch. At scale: the
    * digest pass is one aggregate over each replica; the drill-down
    * reads only dirty ranges, and nothing is rewritten. */
  def repairPreview(s: SparkSession, dir: String): DataFrame = {
    val Ranges = 64
    def wb(df: DataFrame) =
      df.withColumn("bucket", pmod(col("event_id"), lit(Ranges)))
    def dg(df: DataFrame, dn: String, cn: String) = wb(df)
      .withColumn("h", xxhash64(col("event_id"), col("value")))
      .groupBy("bucket")
      .agg(expr("bit_xor(h)").as(dn), count(lit(1)).cast("long").as(cn))
    val a = replicaA(s, dir)
    val b = replicaB(s, dir)
    val dd = dg(a, "da", "rows_a").join(dg(b, "db", "rows_b"),
        Seq("bucket"), "full_outer")
      .withColumn("digest_match", col("da") <=> col("db"))
      .localCheckpoint() // ≤ 64 rows; consumed twice below
    val dirty = dd.filter(!col("digest_match")).select("bucket")
    val aD = wb(a).join(dirty, Seq("bucket"), "left_semi")
      .select(col("bucket"), col("event_id"), col("value").as("a_value"))
    val bD = wb(b).join(dirty, Seq("bucket"), "left_semi")
      .select(col("bucket"), col("event_id"), col("value").as("b_value"))
    val diff = aD.join(bD, Seq("bucket", "event_id"), "full_outer")
      .groupBy("bucket").agg(
        sum(when(col("b_value").isNull, 1L).otherwise(0L)).as("n_missing_in_b"),
        sum(when(col("b_value").isNotNull && col("a_value").isNotNull &&
          col("a_value") =!= col("b_value"), 1L).otherwise(0L))
          .as("n_value_differs"))
    dd.join(diff, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("rows_a"), lit(0L)).as("rows_a"),
        coalesce(col("rows_b"), lit(0L)).as("rows_b"),
        col("digest_match"),
        coalesce(col("n_missing_in_b"), lit(0L)).as("n_missing_in_b"),
        coalesce(col("n_value_differs"), lit(0L)).as("n_value_differs"),
        (coalesce(col("n_missing_in_b"), lit(0L)) +
          coalesce(col("n_value_differs"), lit(0L))).as("est_stream_rows"))
      .orderBy("bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "repair_preview" -> (repairPreview _),
    "repair_incremental" -> (repairIncremental _),
    "mv_validate" -> (mvValidate _),
    "consistency_multidc" -> (consistencyMultidc _),
    "repair_diff" -> (repairDiff _),
    "repair_apply" -> (repairApply _),
    "read_repair" -> (readRepair _),
    "hint_replay" -> (hintReplay _),
    "consistency_quorum" -> (consistencyQuorum _),
    "write_quorum" -> (writeQuorum _)
  )

  // One per-replica newest-state block of the multidc oracle's states
  // CTE (row_number mirror of the engine's max_by FILTER).
  private def mdcReplica(dc: String, miss: Int, lagged: Boolean): String = s"""
      SELECT * EXCLUDE (rn) FROM (
        SELECT '$dc' AS dc, user_id, ts, event_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE event_id % $miss <> 0${
      if (lagged) " AND ts < TIMESTAMP '2024-01-25 00:00:00'" else ""})
      WHERE rn = 1"""

  val oracles: Map[String, String] = Map(
    // The digest/bucket machinery is pure pruning (the repair_diff
    // declaration); the session report's postcondition is stated
    // directly: repaired generations skipped, unrepaired generations
    // carry exactly the planted divergence, everything exits repaired.
    // The digest compare is pure pruning; the oracle states the
    // semantics directly: per id-slice range, replica row counts, the
    // would-be stream sizes, and digest_match ≡ "nothing diverges".
    "repair_preview" -> """
      WITH b AS (
        SELECT event_id,
               CASE WHEN event_id % 997 = 0 THEN value + 1.0 ELSE value END
                 AS value
        FROM events WHERE event_id % 991 <> 0),
      ab AS (
        SELECT a.event_id % 64 AS bucket, a.event_id,
               a.value AS a_value, b.value AS b_value
        FROM events a LEFT JOIN b ON a.event_id = b.event_id)
      SELECT bucket,
        CAST(count(*) AS BIGINT) AS rows_a,
        CAST(count(b_value) AS BIGINT) AS rows_b,
        CAST(count(*) FILTER (b_value IS NULL) AS BIGINT) +
          CAST(count(*) FILTER (b_value IS NOT NULL AND a_value <> b_value)
            AS BIGINT) = 0 AS digest_match,
        CAST(count(*) FILTER (b_value IS NULL) AS BIGINT) AS n_missing_in_b,
        CAST(count(*) FILTER (b_value IS NOT NULL AND a_value <> b_value)
          AS BIGINT) AS n_value_differs,
        CAST(count(*) FILTER (b_value IS NULL) AS BIGINT) +
          CAST(count(*) FILTER (b_value IS NOT NULL AND a_value <> b_value)
            AS BIGINT) AS est_stream_rows
      FROM ab GROUP BY bucket ORDER BY bucket""",
    "repair_incremental" -> """
      WITH a AS (
        SELECT event_id, value, datepart('day', ts) AS gen FROM events),
      d AS (
        SELECT gen,
          CAST(count(*) FILTER (event_id % 991 = 0) AS BIGINT) AS n_streamed,
          CAST(count(*) FILTER (event_id % 997 = 0 AND event_id % 991 <> 0)
            AS BIGINT) AS n_overwritten
        FROM a WHERE gen >= 13 GROUP BY gen)
      SELECT g.gen,
        CASE WHEN g.gen < 13 THEN 'repaired' ELSE 'unrepaired' END
          AS state_before,
        g.n_rows,
        g.gen >= 13 AS digested,
        COALESCE(d.n_streamed, 0) AS n_streamed,
        COALESCE(d.n_overwritten, 0) AS n_overwritten,
        'repaired' AS state_after
      FROM (SELECT gen, CAST(count(*) AS BIGINT) AS n_rows
            FROM a GROUP BY gen) g
      LEFT JOIN d ON g.gen = d.gen
      ORDER BY g.gen""",
    // Digest phase is pure pruning (the repair_diff declaration) —
    // the end-to-end answer is the plain base↔view diff.
    "mv_validate" -> """
      WITH base AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               SUM(CAST(value AS DECIMAL(18,2))) AS sv
        FROM events GROUP BY user_id),
      mv AS (
        SELECT user_id,
               CASE WHEN user_id % 89 = 0 THEN n + 1 ELSE n END AS n, sv
        FROM base WHERE user_id % 97 <> 0)
      SELECT b.user_id,
        CASE WHEN m.user_id IS NULL THEN 'missing_in_mv'
             ELSE 'stale' END AS status,
        b.n AS base_n, CAST(ROUND(b.sv, 2) AS DOUBLE) AS base_sv,
        m.n AS mv_n, CAST(ROUND(m.sv, 2) AS DOUBLE) AS mv_sv
      FROM base b LEFT JOIN mv m ON b.user_id = m.user_id
      WHERE m.user_id IS NULL OR m.n <> b.n OR m.sv <> b.sv
      ORDER BY b.user_id""",
    // Six replica states (DC2 behind the async replication cutoff),
    // LWW winner via row_number, per-DC reply counts + staleness via
    // one grouped join against the winner.
    "consistency_multidc" -> s"""
      WITH states AS (${
      Seq(("dc1", 7, false), ("dc1", 11, false), ("dc1", 13, false),
        ("dc2", 17, true), ("dc2", 19, true), ("dc2", 23, true))
        .map { case (dc, p, lag) => mdcReplica(dc, p, lag) }
        .mkString(" UNION ALL ")}),
      w AS (
        SELECT * FROM (
          SELECT s.*, ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
          FROM states s) WHERE rn = 1),
      c AS (
        SELECT s.user_id,
          CAST(COUNT(*) FILTER (WHERE s.dc = 'dc1') AS BIGINT) AS local_replies,
          CAST(COUNT(*) FILTER (WHERE s.dc = 'dc2') AS BIGINT) AS remote_replies,
          CAST(COUNT(*) FILTER (WHERE (s.ts, s.event_id) = (w.ts, w.event_id))
               AS BIGINT) AS n_match
        FROM states s JOIN w ON s.user_id = w.user_id
        GROUP BY s.user_id)
      SELECT w.user_id, w.event_id, w.event_type, w.value,
        c.local_replies, c.remote_replies,
        CAST(6 - c.n_match AS BIGINT) AS n_stale,
        CASE WHEN c.local_replies >= 2 AND c.remote_replies >= 2 THEN 'each_quorum'
             WHEN c.local_replies >= 2 THEN 'local_quorum'
             WHEN c.local_replies >= 1 THEN 'local_one'
             ELSE 'unavailable' END AS cl
      FROM w JOIN c ON w.user_id = c.user_id
      ORDER BY w.user_id""",
    // The digest phase is pure pruning — the end-to-end answer is the
    // plain replica diff, which SQL states directly.
    "repair_diff" -> """
      WITH b AS (
        SELECT event_id,
               CASE WHEN event_id % 997 = 0 THEN value + 1.0 ELSE value END AS value
        FROM events WHERE event_id % 991 <> 0
      )
      SELECT a.event_id AS event_id,
             CASE WHEN b.event_id IS NULL THEN 'missing_in_b'
                  ELSE 'value_differs' END AS status,
             a.value AS a_value, b.value AS b_value
      FROM events a LEFT JOIN b ON a.event_id = b.event_id
      WHERE b.event_id IS NULL OR a.value <> b.value
      ORDER BY event_id""",
    // Postcondition stated directly: healed B == A, byte for byte.
    "repair_apply" -> """
      SELECT event_id, value FROM events ORDER BY event_id""",
    // Each replica's newest state via a window, full-outer on the key,
    // merge + heal direction decided by (ts, event_id) row comparison.
    "read_repair" -> """
      WITH ra AS (
        SELECT user_id, ts, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 983 <> 0),
      rb AS (
        SELECT user_id, ts, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 991 <> 0)
      SELECT COALESCE(a.user_id, b.user_id) AS user_id,
        CASE WHEN b.user_id IS NULL THEN a.event_id
             WHEN a.user_id IS NULL THEN b.event_id
             WHEN (a.ts, a.event_id) >= (b.ts, b.event_id) THEN a.event_id
             ELSE b.event_id END AS event_id,
        CASE WHEN b.user_id IS NULL THEN a.event_type
             WHEN a.user_id IS NULL THEN b.event_type
             WHEN (a.ts, a.event_id) >= (b.ts, b.event_id) THEN a.event_type
             ELSE b.event_type END AS event_type,
        CASE WHEN b.user_id IS NULL THEN a.value
             WHEN a.user_id IS NULL THEN b.value
             WHEN (a.ts, a.event_id) >= (b.ts, b.event_id) THEN a.value
             ELSE b.value END AS value,
        CASE WHEN a.user_id IS NOT NULL AND b.user_id IS NOT NULL
                  AND a.event_id = b.event_id THEN 'in_sync'
             WHEN b.user_id IS NULL OR (a.user_id IS NOT NULL
                  AND (a.ts, a.event_id) >= (b.ts, b.event_id)) THEN 'heal_b'
             ELSE 'heal_a' END AS repair
      FROM (SELECT * FROM ra WHERE rn = 1) a
      FULL JOIN (SELECT * FROM rb WHERE rn = 1) b ON a.user_id = b.user_id
      ORDER BY user_id""",
    // direct = outside-outage plus the flap-applied slice; replayed =
    // hinted (first 2 outage days) minus already-held; lost rows
    // ([01-12, 01-15) with event_id % 3 != 0) are absent by design.
    // NOT IN is safe: event_id is never NULL.
    "hint_replay" -> """
      WITH direct AS (
        SELECT event_id, user_id, value FROM events
        WHERE ts < TIMESTAMP '2024-01-10 00:00:00'
           OR ts >= TIMESTAMP '2024-01-15 00:00:00'
           OR event_id % 3 = 0)
      SELECT event_id, user_id, value, 'direct' AS via FROM direct
      UNION ALL
      SELECT event_id, user_id, value, 'replayed' AS via FROM events
      WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        AND ts <  TIMESTAMP '2024-01-12 00:00:00'
        AND event_id NOT IN (SELECT event_id FROM direct)
      ORDER BY event_id""",
    // Three replica windows, two chained full-outer joins, then the
    // SAME list merge the engine does: sort the non-null states (the
    // (ts, event_id)-led struct order) and take the last. Stale count
    // compares each replica's state against the winner null-safely.
    "consistency_quorum" -> """
      WITH ra AS (
        SELECT user_id, ts, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 7 <> 0),
      rb AS (
        SELECT user_id, ts, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 11 <> 0),
      rc AS (
        SELECT user_id, ts, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 13 <> 0),
      j AS (
        SELECT COALESCE(a.user_id, b.user_id, c.user_id) AS user_id,
          CASE WHEN a.user_id IS NULL THEN NULL ELSE
            {'ts': a.ts, 'event_id': a.event_id,
             'event_type': a.event_type, 'value': a.value} END AS sa,
          CASE WHEN b.user_id IS NULL THEN NULL ELSE
            {'ts': b.ts, 'event_id': b.event_id,
             'event_type': b.event_type, 'value': b.value} END AS sb,
          CASE WHEN c.user_id IS NULL THEN NULL ELSE
            {'ts': c.ts, 'event_id': c.event_id,
             'event_type': c.event_type, 'value': c.value} END AS sc
        FROM (SELECT * FROM ra WHERE rn = 1) a
        FULL JOIN (SELECT * FROM rb WHERE rn = 1) b ON a.user_id = b.user_id
        FULL JOIN (SELECT * FROM rc WHERE rn = 1) c
          ON COALESCE(a.user_id, b.user_id) = c.user_id),
      m AS (
        SELECT user_id, sa, sb, sc,
          list_sort(list_filter([sa, sb, sc], x -> x IS NOT NULL)) AS avail
        FROM j)
      SELECT user_id,
        avail[-1].event_id AS event_id,
        avail[-1].event_type AS event_type,
        avail[-1].value AS value,
        CAST(len(avail) AS BIGINT) AS replies,
        CAST(3 - len(list_filter([sa, sb, sc],
          x -> x IS NOT DISTINCT FROM avail[-1])) AS BIGINT) AS n_stale,
        CASE len(avail) WHEN 3 THEN 'all' WHEN 2 THEN 'quorum'
          ELSE 'one' END AS cl
      FROM m WHERE len(avail) >= 1
      ORDER BY user_id""",
    // Same row-local availability/hint predicates, same per-day
    // ledger; acks/hint arithmetic stated as CASE sums.
    "write_quorum" -> """
      WITH w AS (
        SELECT event_id, ts,
          (ts >= TIMESTAMP '2024-01-05 00:00:00'
           AND ts < TIMESTAMP '2024-01-08 00:00:00') AS a_down,
          (ts >= TIMESTAMP '2024-01-10 00:00:00'
           AND ts < TIMESTAMP '2024-01-15 00:00:00') AS b_down,
          (event_id % 17 = 0) AS c_down
        FROM events),
      x AS (
        SELECT ts,
          3 - (CASE WHEN a_down THEN 1 ELSE 0 END)
            - (CASE WHEN b_down THEN 1 ELSE 0 END)
            - (CASE WHEN c_down THEN 1 ELSE 0 END) AS acks,
          (CASE WHEN a_down AND ts < TIMESTAMP '2024-01-07 00:00:00'
                THEN 1 ELSE 0 END)
          + (CASE WHEN b_down AND ts < TIMESTAMP '2024-01-12 00:00:00'
                  THEN 1 ELSE 0 END)
          + (CASE WHEN c_down THEN 1 ELSE 0 END) AS n_hints,
          (CASE WHEN a_down AND ts >= TIMESTAMP '2024-01-07 00:00:00'
                THEN 1 ELSE 0 END)
          + (CASE WHEN b_down AND ts >= TIMESTAMP '2024-01-12 00:00:00'
                  THEN 1 ELSE 0 END) AS n_lost
        FROM w)
      SELECT CAST(ts AS DATE) AS day,
        CAST(count(*) AS BIGINT) AS n_writes,
        CAST(count(CASE WHEN acks = 3 THEN 1 END) AS BIGINT) AS n_all,
        CAST(count(CASE WHEN acks = 2 THEN 1 END) AS BIGINT) AS n_quorum,
        CAST(count(CASE WHEN acks = 1 THEN 1 END) AS BIGINT) AS n_one,
        CAST(sum(n_hints) AS BIGINT) AS n_hints,
        CAST(sum(n_lost) AS BIGINT) AS n_lost
      FROM x GROUP BY 1 ORDER BY 1"""
  )
}
