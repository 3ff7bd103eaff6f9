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

  final case class SessEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp)
  final case class SessState(startMs: Long, endMs: Long, n: Long)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Closed-session emission via flatMapGroupsWithState with an
    * EVENT-TIME timeout (SURVEY.md §2.I — the custom-state shape
    * mapGroupsWithState can't express: zero-to-many output per
    * invocation, sessions closed by the watermark clock, not by new
    * data for the key). A session is emitted either when a same-user
    * event arrives past the gap, or when the watermark passes
    * last-event + gap and the timeout fires — so an idle user's final
    * session still closes. State per user is one (start, end, count)
    * triple; the timeout removes it, so total state is bounded by
    * concurrently-active users, not stream length. Batch twin:
    * StreamingBatch.streamSessionize (oracle-checked islands form).
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
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(Session(user, st.startMs, st.endMs, st.n))
          } else {
            // Interval merge: the open state session and every new
            // event (as a width-0 interval), sorted by start, then
            // gap-merged. Handles unordered WITHIN-batch arrival and
            // late-but-within-watermark CROSS-batch arrival uniformly:
            // a late event inside or gap-adjacent to the open session
            // extends it (including lowering its start — a plain
            // "t - end <= gap" append would silently keep the newer
            // start and even absorb events a full gap older), and a
            // late event more than a gap before it closes as its own
            // session rather than contaminating the open one.
            val intervals = (state.getOption.map(c => (c.startMs, c.endMs, c.n)) ++
              rows.map { r => val t = r.ts.getTime; (t, t, 1L) }).toArray
            java.util.Arrays.sort(intervals, Ordering.by((x: (Long, Long, Long)) => x._1))
            val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
            for (iv <- intervals) merged.lastOption match {
              case Some(last) if iv._1 - last._2 <= gapMs =>
                merged(merged.size - 1) =
                  (last._1, math.max(last._2, iv._2), last._3 + iv._3)
              case _ => merged += iv
            }
            // All but the newest merged interval are definitively
            // closed (a yet-later event could only extend the last);
            // the last stays open as the new state.
            val open = merged.remove(merged.size - 1)
            state.update(SessState(open._1, open._2, open._3))
            // Timeout must sit above the current watermark or Spark
            // rejects it; a session already gap-deep behind the
            // watermark closes at the next watermark advance.
            state.setTimeoutTimestamp(
              math.max(open._2 + gapMs, state.getCurrentWatermarkMs() + 1))
            merged.iterator.map(iv => Session(user, iv._1, iv._2, iv._3))
          }
      }
  }

  /** Output-mode helper used by tests: run a streaming query over a
    * memory sink until all source data is processed. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }
}
