package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}

/** CDC/stream operators in batch form (SURVEY.md §2.I).
  *
  * Cassandra exposes CDC per table; the engine's stand-in is the
  * `events` table. Each operator is declared here in batch form
  * (oracle-checkable); graft.streaming.StreamOps runs the *same
  * transformations* under Structured Streaming (readStream +
  * watermark), covered by StreamingSpec rather than the oracle —
  * windowed aggregation semantics are identical by construction.
  *
  * Scale: windowed groupBys shuffle one row per (window × key ×
  * partition) thanks to partial aggregation; session windows shuffle
  * per user key once. Nothing here widens with raw event volume
  * except the initial scan.
  */
object StreamingBatch extends QueryGroup {

  /** Tumbling 1-day windows per event type. */
  def streamTumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
      .select(
        col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")

  /** Sliding windows: 1 day long, every 6 hours (each event lands in
    * exactly 4 windows). */
  def streamSliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day", "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))
      .orderBy("win_start", "event_type")

  /** Session windows per user, 30-minute gap. Spark's session_window
    * runs in batch too; the oracle reproduces it with lag+cumsum
    * island detection (end = last event + gap). */
  def streamSession(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Num.dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"), col("w.start").as("sess_start"), col("w.end").as("sess_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start")

  /** Late-data watermark declared on the same tumbling aggregation.
    * In batch the watermark is a no-op by definition (all data has
    * arrived); the drop behavior is asserted in StreamingSpec. */
  def streamWatermark(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("n"))
      .orderBy("win_start")

  /** Exactly-once by event_id: duplicates planted by self-union, then
    * dropDuplicates (streaming: dropDuplicates within watermark). */
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.unionByName(e.filter(col("event_id") % 10 === 0))
      .dropDuplicates("event_id")
      .orderBy("event_id")
  }

  /** Running per-user/type counters — the CQL counter-CDC analog; the
    * streaming form is mapGroupsWithState (StreamOps.statefulCounts). */
  def streamStateful(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
      .orderBy("user_id", "event_type")

  /** Trending top-k in batch form: the 3 most frequent event types
    * per tumbling day. The production streaming shape splits exactly
    * here: the windowed COUNTS are maintained incrementally by the
    * stream (partial-agg, one row per window × type), and the rank is
    * applied at the serving layer over that already-tiny relation —
    * ranking inside the stream would force complete-mode state for no
    * benefit. The streaming twin (StreamingSpec) runs the same counts
    * through a MemoryStream and ranks the sink table; the per-window
    * rank partition is bounded by the event-type domain. */
  def streamTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val rk = Window.partitionBy("w").orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rank", row_number().over(rk).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("w.start").as("win_start"), col("event_type"), col("n"),
        col("rank"))
      .orderBy("win_start", "rank")
  }

  /** Stream-STATIC dimension join in batch form: events enriched with
    * the customer dimension (user_id ↦ c_custkey), aggregated to
    * (mktsegment, event_type) counts + exact value sums. In the
    * streaming form the static side is re-read per micro-batch and
    * broadcast — no stream state for the join at all (the structural
    * difference from stream_join's watermarked buffers); the twin in
    * StreamingSpec asserts streamed ≡ batch. At 100 TB the dimension
    * stays broadcast-sized by definition — this is THE enrichment
    * shape for fact streams. */
  def streamDimJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = broadcast(Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment")))
    Tables.events(s, dir)
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.core.Num.dsum(col("value")).as("sum_value"))
      .orderBy("segment", "event_type")
  }

  /** Stream-stream interval join in batch form: click→purchase
    * attribution — every click by the same user within the hour
    * before a purchase. The equality key is (user_id, hour bucket),
    * NOT user_id alone: keyed only on the user, candidate pairs per
    * user grow with the square of that user's history (measured 146×
    * time at ×100 data despite exactly ×100 output), because a year of
    * one user's clicks joins against a year of their purchases before
    * the time filter runs. Each click owns one hour bucket; each
    * purchase probes its own and the preceding bucket (the 1-hour
    * lookback can only span two), so candidates are bounded by
    * per-user-per-hour density — linear in the corpus — and a pair
    * can only collide in hour(c_ts)'s bucket, so no dedup is needed.
    * The streaming twin (StreamOps.attributionJoin) gets the same
    * bound from its two watermarks instead. */
  def streamJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .withColumn("bucket",
        explode(array(date_trunc("hour", col("p_ts")),
          date_trunc("hour", col("p_ts") - expr("INTERVAL 1 HOUR")))))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withColumn("bucket", date_trunc("hour", col("c_ts")))
    p.join(c,
        col("user_id") === col("c_user") && p("bucket") === c("bucket") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      .select(
        col("purchase_id"), col("click_id"), col("user_id"),
        Tables.epochMs(col("p_ts")).as("p_ms"),
        Tables.epochMs(col("c_ts")).as("c_ms"))
      .orderBy("purchase_id", "click_id")
  }

  /** Closed-session emission — the flatMapGroupsWithState analog in
    * batch form (SURVEY.md §2.I): one row per (user, session) with
    * first/last EVENT time and count. Unlike stream_session
    * (session_window), the end is the last event itself, not
    * last+gap — exactly what the stateful streaming twin
    * (StreamOps.sessionize) emits when the event-time timeout fires.
    * Scale: one shuffle keyed on user_id for the lag/cumsum island
    * pass, then a partial-agg groupBy on (user, sid) — both linear,
    * state bounded by user cardinality in the streaming form. */
  def streamSessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNotNull &&
          Tables.epochMs(col("ts")) - Tables.epochMs(col("prev_ts")) <= lit(1800000L),
          lit(0)).otherwise(lit(1)))
      .withColumn("sid",
        sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        min("ts").as("sess_start"), max("ts").as("sess_last"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sess_start"), col("sess_last"), col("n_events"))
      .orderBy("user_id", "sess_start")
  }

  /** Batch twin of the streaming commitlog TAIL
    * (graft.streaming.StreamOps.lwwCellsTail, VERDICT r10 next #5):
    * the consumer a real CDC/commitlog deployment runs — cell state
    * bootstrapped from the flushed snapshot, then the log tail
    * streamed through LWW reconciliation. Differs from
    * commitlog_replay (one-shot crash recovery keyed by user) in key
    * (the (pk, column) CELL — user_id × event_type, the streaming
    * state key), in carrying the winning writetime, and in `applied`:
    * whether the tail changed the cell (the overlap segment's
    * duplicates lose the strict newer-than race, exactly the
    * streaming idempotence rule). At scale the tail input is
    * segment-sized; the snapshot is read once to seed state. */
  def streamCommitlog(s: SparkSession, dir: String): DataFrame = {
    val flushCut = lit("2024-01-14 00:00:00").cast("timestamp_ntz")
    val replayFrom = lit("2024-01-13 00:00:00").cast("timestamp_ntz")
    val e = Tables.events(s, dir).select(
      col("user_id"), col("event_type"), col("value"),
      unix_micros(col("ts").cast("timestamp")).as("writetime"),
      col("event_id"), col("ts"))
    val order = Seq(col("writetime").desc, col("event_id").desc)
    val keys = Seq("user_id", "event_type")
    val snap = graft.core.Lww.latest(e.filter(col("ts") < flushCut), keys, order)
    val tail = e.filter(col("ts") >= replayFrom)
    graft.core.Lww.latest(snap.unionByName(tail), keys, order)
      .select(col("user_id"), col("event_type"), col("value"),
        col("writetime"), (col("ts") >= flushCut).as("applied"))
      .orderBy("user_id", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_commitlog" -> (streamCommitlog _),
    "stream_join" -> (streamJoin _),
    "stream_dim_join" -> (streamDimJoin _),
    "stream_sessionize" -> (streamSessionize _),
    "stream_tumbling" -> (streamTumbling _),
    "stream_topk" -> (streamTopk _),
    "stream_sliding" -> (streamSliding _),
    "stream_session" -> (streamSession _),
    "stream_watermark" -> (streamWatermark _),
    "stream_dedup" -> (streamDedup _),
    "stream_stateful" -> (streamStateful _)
  )

  val oracles: Map[String, String] = Map(
    // Snapshot ∪ tail LWW per (user, type) cell: the overlap day's
    // duplicates are byte-identical rows, so the window pick is
    // order-free (the commitlog_replay argument, cell-keyed).
    "stream_commitlog" -> """
      WITH e AS (
        SELECT user_id, event_type, value, epoch_us(ts) AS writetime,
               event_id, ts
        FROM events),
      snap AS (
        SELECT * EXCLUDE (rn) FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                     ORDER BY writetime DESC, event_id DESC) AS rn
          FROM e WHERE ts < TIMESTAMP '2024-01-14 00:00:00')
        WHERE rn = 1),
      merged AS (
        SELECT * FROM snap
        UNION ALL
        SELECT * FROM e WHERE ts >= TIMESTAMP '2024-01-13 00:00:00'),
      fin AS (
        SELECT * EXCLUDE (rn) FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                     ORDER BY writetime DESC, event_id DESC) AS rn
          FROM merged)
        WHERE rn = 1)
      SELECT user_id, event_type, value, writetime,
        ts >= TIMESTAMP '2024-01-14 00:00:00' AS applied
      FROM fin ORDER BY user_id, event_type""",
    "stream_dim_join" -> """
      SELECT c_mktsegment AS segment, event_type,
        COUNT(*) AS n_events,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "stream_sessionize" -> """
      WITH flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), numbered AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
      )
      SELECT user_id, MIN(ts) AS sess_start, MAX(ts) AS sess_last,
        COUNT(*) AS n_events
      FROM numbered GROUP BY user_id, sid ORDER BY user_id, sess_start""",
    "stream_join" -> """
      SELECT a.event_id AS purchase_id, b.event_id AS click_id, a.user_id,
        epoch_ms(a.ts) AS p_ms, epoch_ms(b.ts) AS c_ms
      FROM events a JOIN events b
        ON a.user_id = b.user_id
        AND a.event_type = 'purchase' AND b.event_type = 'click'
        AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
      ORDER BY purchase_id, click_id""",
    "stream_tumbling" -> s"""
      SELECT date_trunc('day', ts) AS win_start,
        date_trunc('day', ts) + INTERVAL 1 DAY AS win_end,
        event_type, COUNT(*) AS n, ${Num.sqlDsum("value")} AS sum_value
      FROM events GROUP BY 1, 2, 3 ORDER BY win_start, event_type""",
    "stream_topk" -> """
      WITH c AS (
        SELECT date_trunc('day', ts) AS win_start, event_type,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
                 PARTITION BY win_start ORDER BY n DESC, event_type)
               AS BIGINT) AS rank
        FROM c)
      SELECT win_start, event_type, n, rank FROM r
      WHERE rank <= 3 ORDER BY win_start, rank""",
    "stream_sliding" -> """
      SELECT win_start, event_type, COUNT(*) AS n FROM (
        SELECT make_timestamp((CAST(floor(epoch(ts)/21600) AS BIGINT)*21600
                               - k.k*21600)*1000000) AS win_start, event_type
        FROM events, (SELECT unnest([0,1,2,3]) AS k) k)
      GROUP BY win_start, event_type ORDER BY win_start, event_type""",
    "stream_session" -> s"""
      WITH flagged AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), numbered AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
      )
      SELECT user_id, MIN(ts) AS sess_start,
        MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
        COUNT(*) AS n_events, ${Num.sqlDsum("value")} AS sum_value
      FROM numbered GROUP BY user_id, sid ORDER BY user_id, sess_start""",
    "stream_watermark" -> """
      SELECT date_trunc('day', ts) AS win_start, COUNT(*) AS n
      FROM events GROUP BY 1 ORDER BY win_start""",
    "stream_dedup" ->
      "SELECT * FROM events ORDER BY event_id",
    "stream_stateful" -> s"""
      SELECT user_id, event_type, COUNT(*) AS n, ${Num.sqlDsum("value")} AS sum_value
      FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type"""
  )
}
