package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.Num

/** Structured-Streaming forms of the §2.I operators (CDC-equivalent).
  *
  * Each takes an *already streaming* DataFrame (readStream /
  * MemoryStream) with the events schema and applies the same
  * transformation as the batch-declared StreamingBatch op, plus the
  * watermark that only matters under streaming. StreamingSpec drives
  * them with MemoryStream; the driver's oracle covers the batch twins.
  *
  * State-scale note: all aggregations key on (window × type) or
  * user_id — state size tracks key cardinality, not event volume, and
  * watermarks bound retained windows.
  */
object StreamOps {

  /** Tumbling 1-day counts with a 1-hour watermark (late drop). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))

  /** Session windows per user with a 30-minute gap. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("sess_start"), col("n_events"))

  /** Stream-static dimension enrichment: the static side is a plain
    * batch DataFrame (re-read and broadcast per micro-batch by the
    * engine), so the join itself holds NO stream state — the
    * structural contrast to [[attributionJoin]]'s watermarked
    * buffers. Aggregation output is (segment × event_type) bounded. */
  def dimJoin(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"),
        graft.core.Num.dsum(col("value")).as("sum_value"))

  /** Exactly-once by event_id within the watermark horizon. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id")

  /** Stream-stream interval join (click→purchase attribution): both
    * sides watermarked so the join state for a user is dropped once
    * the watermark passes the 1-hour interval — state is bounded by
    * in-flight time range × user cardinality, not stream length. */
  def attributionJoin(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select("purchase_id", "click_id", "user_id", "p_ts", "c_ts")
  }

  final case class EventRow(event_id: Long, user_id: Long, event_type: String, value: Double)
  final case class UserCount(user_id: Long, n: Long, sum_value: Double)

  /** Running per-user counters via explicit state — the CQL
    * counter-CDC analog with custom state (SURVEY.md §2.I
    * stream_stateful). Emits the updated counter on every batch. */
  def statefulCounts(events: Dataset[EventRow]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserCount, UserCount](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[UserCount]) =>
          val prev = state.getOption.getOrElse(UserCount(user, 0L, 0.0))
          var n = prev.n
          var sum = prev.sum_value
          rows.foreach { r => n += 1; sum += r.value }
          val next = UserCount(user, n, sum)
          state.update(next)
          next
      }
  }

  final case class CellMut(user_id: Long, event_type: String, value: Double,
    writetime: Long, event_id: Long)
  final case class CellState(value: Double, writetime: Long, event_id: Long)
  final case class CellOut(user_id: Long, event_type: String, value: Double,
    writetime: Long, applied: Boolean)

  /** Streaming LWW cell reconciliation — the wide-column WRITE PATH as
    * a stream: mutations arrive in ARBITRARY order (replica relay,
    * hint replay, retries) and the newest (writetime, event_id) wins
    * per PK; a stale mutation — older than the standing cell — is
    * SKIPPED, never applied, exactly Cassandra's reconciliation rule.
    * mapGroupsWithState keyed on the PK holds one CellState per key
    * (state ∝ key cardinality, not stream length — the same bound as
    * statefulCounts); each batch emits the key's current cell plus
    * whether this batch changed it (`applied=false` IS the stale-write
    * observation). Batch twins: win_lww / sink_cell_store — the merge
    * rule is the same `Lww.latest` ordering; StreamingSpec asserts
    * agreement, stale-skip, and checkpoint-restart recovery (the
    * standing cell must survive a restart for the stale rule to hold
    * across it). */
  /** The reconciliation body, shared by [[lwwCells]] (cold state) and
    * [[lwwCellsTail]] (snapshot-bootstrapped state) — one definition
    * so the write path and the commitlog tail cannot drift. */
  private val lwwReconcile:
      ((Long, String), Iterator[CellMut], org.apache.spark.sql.streaming.GroupState[CellState]) => CellOut = {
    case ((user, etype), rows, state) =>
      var cur = state.getOption
      var applied = false
      rows.foreach { m =>
        val newer = cur.forall(c => m.writetime > c.writetime ||
          (m.writetime == c.writetime && m.event_id > c.event_id))
        if (newer) {
          cur = Some(CellState(m.value, m.writetime, m.event_id))
          applied = true
        }
      }
      // rows is non-empty on every data invocation and the timeout
      // is NoTimeout, so cur is defined here
      state.update(cur.get)
      CellOut(user, etype, cur.get.value, cur.get.writetime, applied)
  }

  def lwwCells(muts: Dataset[CellMut]): Dataset[CellOut] = {
    import muts.sparkSession.implicits._
    muts
      .groupByKey(m => (m.user_id, m.event_type))
      .mapGroupsWithState[CellState, CellOut](GroupStateTimeout.NoTimeout)(lwwReconcile)
  }

  /** Commitlog TAIL consumer — the streaming twin of the batch
    * commitlog_replay: cell state is BOOTSTRAPPED from the flushed
    * snapshot (mapGroupsWithState initial state), then arriving log
    * segments stream through the SAME LWW reconciliation. The crash
    * boundary segment replayed whole is harmless here for the same
    * reason it is in batch: a replayed mutation is never strictly
    * newer than the standing cell it already produced, so it reports
    * `applied = false` and changes nothing — idempotence is the
    * reconciliation rule, not sink dedup. State ∝ key cardinality;
    * segments stream in file order and any order is correct. */
  def lwwCellsTail(muts: Dataset[CellMut], snapshot: Dataset[CellMut]): Dataset[CellOut] = {
    import muts.sparkSession.implicits._
    val newer = (a: CellMut, b: CellMut) =>
      b.writetime > a.writetime ||
        (b.writetime == a.writetime && b.event_id > a.event_id)
    val initState = snapshot
      .groupByKey(m => (m.user_id, m.event_type))
      .reduceGroups((a, b) => if (newer(a, b)) b else a)
      .map { case (k, m) => (k._1, k._2, CellState(m.value, m.writetime, m.event_id)) }
      .groupByKey(t => (t._1, t._2))
      .mapValues(_._3)
    muts
      .groupByKey(m => (m.user_id, m.event_type))
      .mapGroupsWithState[CellState, CellOut](
        GroupStateTimeout.NoTimeout, initState)(lwwReconcile)
  }

  final case class SessEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp)
  final case class SessInterval(startMs: Long, endMs: Long, n: Long)
  final case class SessState(intervals: Seq[SessInterval])
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Closed-session emission via flatMapGroupsWithState with an
    * EVENT-TIME timeout (SURVEY.md §2.I — the custom-state shape
    * mapGroupsWithState can't express: zero-to-many output per
    * invocation, sessions closed by the watermark clock, not by new
    * data for the key).
    *
    * The emission rule is the watermark contract itself: a session is
    * closed — and only then emitted — once `end + gap <= watermark`,
    * because any event Spark can still deliver has `t > watermark >=
    * end + gap` and so cannot merge into it. Sessions the watermark
    * has not yet passed stay in state EVEN when a newer session exists
    * for the same user: a late-but-valid event may yet bridge or
    * extend them (emitting "all but the newest" is the subtle bug this
    * rule fixes — the output would depend on batch arrival order, not
    * on the data). Per-batch processing is a plain interval merge of
    * the retained sessions and the new events, so unordered and late
    * arrival are handled uniformly; the timeout is the earliest
    * retained `end + gap`, so idle users' sessions close exactly when
    * the watermark says so. State per user is bounded by the number of
    * in-flight sessions inside the watermark horizon (≤ horizon/gap),
    * not by stream length. Batch twin: StreamingBatch.streamSessionize
    * (oracle-checked islands form) — equal output once the watermark
    * passes, asserted by StreamingSpec.
    */
  def sessionize(events: Dataset[SessEvent], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          val wm = state.getCurrentWatermarkMs()
          // Interval merge of retained sessions + new events (empty on
          // a timeout invocation): sort by start, fuse gap-adjacent.
          val intervals = (state.getOption.map(_.intervals).getOrElse(Nil) ++
            rows.map { r => val t = r.ts.getTime; SessInterval(t, t, 1L) }).toArray
          java.util.Arrays.sort(intervals, Ordering.by((x: SessInterval) => x.startMs))
          val merged = scala.collection.mutable.ArrayBuffer.empty[SessInterval]
          for (iv <- intervals) merged.lastOption match {
            case Some(last) if iv.startMs - last.endMs <= gapMs =>
              merged(merged.size - 1) = SessInterval(
                last.startMs, math.max(last.endMs, iv.endMs), last.n + iv.n)
            case _ => merged += iv
          }
          val (closed, open) = merged.partition(_.endMs + gapMs <= wm)
          if (open.isEmpty) {
            state.remove()
          } else {
            state.update(SessState(open.toSeq))
            // Earliest pending close, clamped above the watermark
            // (Spark rejects a timeout at or below it).
            state.setTimeoutTimestamp(
              math.max(open.map(_.endMs).min + gapMs, wm + 1))
          }
          closed.iterator.map(iv => Session(user, iv.startMs, iv.endMs, iv.n))
      }
  }

  /** Streaming incremental MV maintenance — the mv_incremental delta
    * rule DRIVEN BY the stream: each micro-batch folds into a
    * parquet-backed materialized view through foreachBatch, and the
    * sink is IDEMPOTENT PER batchId (the exactly-once contract
    * foreachBatch actually offers is at-least-once delivery + replay
    * of the last uncommitted batch, so the sink must absorb replays):
    * a batch writes its per-user partial aggregate to its OWN
    * `batch_id=` partition via dynamic partition overwrite — replaying
    * the batch rewrites the same partition byte-identically, never
    * double-counts. The served MV is the groupBy-merge of delta
    * partitions ([[readMv]]); a compactor can fold old partitions
    * together offline without changing reads. State lives in the sink,
    * not the stream — no streaming aggregation state to age out, and
    * each delta is batch-sized, never MV-sized (the mv_incremental_join
    * refresh-cost rule). */
  def incrementalMv(events: DataFrame, root: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyMvBatch(batch, root, id)
      }
      .start()

  /** STREAMING near-dup admission — the gate a live crawl feed runs:
    * each arriving micro-batch of (doc_id, text) is admitted unless it
    * is a 3-gram-Jaccard ≥ 0.6 near-dup of anything admitted before it
    * (seeded corpus index ∪ earlier batches ∪ smaller ids in its own
    * batch). The whole fold — row-local band signatures, band-equality
    * candidate join against the batch_id-partitioned index, exact
    * verify, verdict + index-append writes — is
    * [[graft.operators.Dedup.nearAdmitFold]], shared verbatim with the
    * declared batch twin (`stream_dedup_near`). State lives in the
    * sink's batch partitions, not in streaming state (the
    * incrementalMv discipline): a replayed batchId reads only earlier
    * partitions and overwrites exactly its own, so checkpoint restart
    * and crash-overlap replay are idempotent by construction. */
  def nearDedupAdmit(docs: DataFrame,
      roots: graft.operators.Dedup.NearRoots, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.operators.Dedup.nearAdmitFold(batch.sparkSession, roots,
          batch, id): Unit
      }
      .start()

  /** The idempotent per-batch fold — exposed so StreamingSpec can
    * replay a batchId directly and assert the MV is unchanged. The
    * overwrite mode rides the WRITE as an option, never the session
    * conf: a save/restore of the session value races a concurrent
    * writer on the same SparkSession (its restore could flip an
    * in-flight overwrite to STATIC, which deletes every other
    * batch_id= partition). */
  def applyMvBatch(batch: DataFrame, root: String, id: Long): Unit =
    batch.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(Num.d2(col("value"))).as("sv"))
      .withColumn("batch_id", lit(id))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(root)

  /** Serve the MV: merge the delta partitions. Additive aggregates
    * merge by sum; the read is delta-count-bounded, and offline
    * compaction of old partitions is invisible to it. */
  def readMv(s: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    s.read.parquet(root)
      .groupBy("user_id")
      .agg(sum("n").cast("long").as("n_events"),
        round(sum("sv"), 2).cast("double").as("sum_value"))

  /** Output-mode helper used by tests: run a streaming query over a
    * memory sink until all source data is processed. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }
}
