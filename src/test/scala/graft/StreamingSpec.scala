package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps

/** Structured-Streaming behavior that the batch oracle cannot check
  * (SURVEY.md §2.I, §5.3): windowed aggregation under a real stream,
  * watermark late-drop, dedup, and explicit state. */
case class SEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamingSpec extends SparkSpec {

  private def t(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("tumbling window counts under streaming match the batch result") {
    val s = spark; import s.implicits._
    val rows = Seq(
      SEvent(1, t(1, 1), 1, "click", 1.0), SEvent(2, t(1, 2), 1, "click", 2.0),
      SEvent(3, t(2, 1), 2, "view", 3.0), SEvent(4, t(3, 1), 2, "view", 4.0))
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SEvent]
    mem.addData(rows: _*)
    StreamOps.runToMemory(
      StreamOps.tumblingCounts(mem.toDF()), "tumbling_out", OutputMode.Complete())
    val streamed = s.table("tumbling_out")
      .select("win_start", "event_type", "n").collect()
      .map(_.toString).sorted.toList
    val batch = rows.toDF()
      .groupBy(window($"ts", "1 day").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("win_start"), $"event_type", $"n")
      .collect().map(_.toString).sorted.toList
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stream-static dim join enriches per micro-batch, no join state") {
    val s = spark; import s.implicits._
    val rows = Seq(
      SEvent(1, t(1, 1), 10, "click", 1.5), SEvent(2, t(1, 2), 10, "click", 2.5),
      SEvent(3, t(2, 1), 20, "view", 3.0), SEvent(4, t(3, 1), 30, "buy", 4.0))
    val dim = Seq((10L, "BUILDING"), (20L, "AUTO"), (30L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SEvent]
    mem.addData(rows: _*)
    StreamOps.runToMemory(
      StreamOps.dimJoin(mem.toDF(), dim), "dimjoin_out", OutputMode.Complete())
    val streamed = s.table("dimjoin_out").collect().map(_.toString).sorted.toList
    val batch = StreamOps.dimJoin(rows.toDF(), dim)
      .collect().map(_.toString).sorted.toList
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("trending top-k: rank over streamed windowed counts matches the batch form") {
    val s = spark; import s.implicits._
    // day 1: click×3, view×2, buy×1, refund×1 → top-3 excludes refund
    // (ties broken alphabetically); day 2: single type
    val rows = Seq(
      SEvent(1, t(1, 1), 1, "click", 1.0), SEvent(2, t(1, 2), 1, "click", 1.0),
      SEvent(3, t(1, 3), 2, "click", 1.0), SEvent(4, t(1, 4), 2, "view", 1.0),
      SEvent(5, t(1, 5), 3, "view", 1.0), SEvent(6, t(1, 6), 3, "buy", 1.0),
      SEvent(7, t(1, 7), 4, "refund", 1.0), SEvent(8, t(2, 1), 1, "view", 1.0))
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SEvent]
    mem.addData(rows: _*)
    StreamOps.runToMemory(
      StreamOps.tumblingCounts(mem.toDF()), "topk_counts", OutputMode.Complete())
    // serving-layer rank over the continuously-maintained counts
    def rank(counts: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("win_start").orderBy($"n".desc, $"event_type")
      counts.withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .select("win_start", "event_type", "n", "rank")
    }
    val streamed = rank(s.table("topk_counts").select("win_start", "event_type", "n"))
      .collect().map(_.toString).sorted.toList
    val batch = rank(rows.toDF()
      .groupBy(window($"ts", "1 day").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("win_start"), $"event_type", $"n"))
      .collect().map(_.toString).sorted.toList
    assert(streamed == batch && streamed.size == 4,
      s"streamed=$streamed batch=$batch")
    assert(!streamed.exists(_.contains("refund")), "rank-4 type leaked into top-3")
  }

  test("windowed aggregate survives a checkpoint restart: counts carried, no double-count") {
    // The remaining restart shape: ENGINE-state windowed aggregation
    // (the stream_topk/tumbling family) rather than custom
    // map/flatMapGroupsWithState state. Counts accumulated before the
    // stop must carry into the restarted query — lost state reads
    // day-1 clicks as 0, a reprocessed replay doubles them to 6.
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_wagg").toString
    val (sink, ckpt) = (s"$dir/sink", s"$dir/ckpt")
    def start(mem: MemoryStream[SEvent]) =
      StreamOps.tumblingCounts(mem.toDF())
        .writeStream.outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.write.mode("overwrite").parquet(s"$sink/batch=$id")
        }
        .start()
    val batchA = Seq(
      SEvent(1, t(1, 1), 1, "click", 1.0), SEvent(2, t(1, 2), 2, "click", 1.0),
      SEvent(3, t(1, 3), 3, "click", 1.0))
    val mem1 = MemoryStream[SEvent]
    mem1.addData(batchA: _*)
    val q1 = start(mem1); q1.processAllAvailable(); q1.stop()
    val mem2 = MemoryStream[SEvent]
    mem2.addData(batchA: _*)
    mem2.addData(SEvent(4, t(1, 4), 1, "view", 1.0),
      SEvent(5, t(1, 5), 2, "view", 1.0), SEvent(6, t(2, 1), 1, "click", 1.0))
    val q2 = start(mem2); q2.processAllAvailable(); q2.stop()
    // Complete mode: the LAST batch dir holds the full standing
    // result — numeric sort on the id (a String max would pick
    // "batch=9" over "batch=10").
    val last = new java.io.File(sink).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName)
      .maxBy(_.stripPrefix("batch=").toLong)
    val got = s.read.parquet(s"$sink/$last")
      .select($"win_start".cast("string"), $"event_type", $"n")
      .collect().map(_.toString).sorted.toList
    assert(got == List(
      "[2024-01-01 00:00:00,click,3]",
      "[2024-01-01 00:00:00,view,2]",
      "[2024-01-02 00:00:00,click,1]"), s"got $got")
  }

  test("watermark drops events later than 1 hour behind the max ts") {
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SEvent]
    // batch 1 advances the watermark to day20 - 1h
    mem.addData(SEvent(1, t(1), 1, "click", 1.0), SEvent(2, t(20), 1, "click", 1.0))
    val q = StreamOps.tumblingCounts(mem.toDF())
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("wm_out").start()
    q.processAllAvailable()
    // batch 2: a day-1 event, far behind the watermark → dropped
    mem.addData(SEvent(3, t(1, 1), 1, "click", 99.0))
    q.processAllAvailable()
    q.stop()
    val day1 = s.table("wm_out").filter($"win_start" === t(1)).collect()
    // day-1 window emitted once with only the pre-watermark event
    assert(day1.length == 1 && day1.head.getAs[Long]("n") == 1L)
  }

  test("streaming dedup keeps first occurrence per event_id") {
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SEvent]
    mem.addData(
      SEvent(1, t(1), 1, "click", 1.0), SEvent(1, t(1), 1, "click", 1.0),
      SEvent(2, t(1), 2, "view", 2.0))
    StreamOps.runToMemory(StreamOps.dedup(mem.toDF()), "dedup_out", OutputMode.Append())
    assert(s.table("dedup_out").count() == 2)
  }

  test("file-source stream over the real events parquet matches batch") {
    val s = spark; import s.implicits._
    // Streaming watermarks require TIMESTAMP (not NTZ) event time —
    // session is UTC so the cast is value-preserving on both sides.
    val batchEvents = graft.core.Tables.events(s, sf001)
      .withColumn("ts", col("ts").cast("timestamp"))
    val expected = StreamOps.tumblingCounts(batchEvents)
      .drop("sum_value") // Complete-mode compare on counts
      .collect().map(_.toString).sorted.toList
    // Stream the same parquet file through the file source, converting
    // ts exactly like Tables.events: nanos fixtures arrive as long
    // (nanosAsLong), µs fixtures as TIMESTAMP_NTZ — dispatch on the
    // actual schema so the test tracks the fixture's physical type.
    val schema =
      s.read.option("pathGlobFilter", "events.parquet").parquet(sf001).schema
    val raw = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf001)
    val streamEvents = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    val q = StreamOps.tumblingCounts(streamEvents).drop("sum_value")
      .writeStream.outputMode("complete").format("memory")
      .queryName("file_stream_out").start()
    q.processAllAvailable(); q.stop()
    val got = s.table("file_stream_out").collect().map(_.toString).sorted.toList
    assert(got == expected && got.nonEmpty)
  }

  test("CassandraSource falls back to the parquet substrate and round-trips") {
    val s = spark; import s.implicits._
    assert(!graft.sources.CassandraSource.enabled(s))
    val dir = java.nio.file.Files.createTempDirectory("graft_cs").toString
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    graft.sources.CassandraSource.write(s, df, dir, "t1")
    val back = graft.sources.CassandraSource.read(s, dir, "t1")
      .orderBy("k").collect().map(_.toString).toList
    assert(back == List("[1,x]", "[2,y]"))
  }

  test("stream-stream interval join attributes clicks within the hour") {
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[SEvent]
    mem.addData(
      SEvent(1, Timestamp.valueOf("2024-01-01 09:00:00"), 1, "click", 0.0), // too old
      SEvent(2, Timestamp.valueOf("2024-01-01 10:30:00"), 1, "click", 0.0), // in window
      SEvent(3, Timestamp.valueOf("2024-01-01 10:45:00"), 2, "click", 0.0), // other user
      SEvent(4, Timestamp.valueOf("2024-01-01 11:00:00"), 1, "purchase", 5.0))
    StreamOps.runToMemory(
      StreamOps.attributionJoin(mem.toDF()), "attr_out", OutputMode.Append())
    val got = s.table("attr_out")
      .select("purchase_id", "click_id").collect().map(_.toString).toList
    assert(got == List("[4,2]"), got.mkString(","))
  }

  test("file sink + checkpoint: restart resumes exactly-once") {
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (sink, ckpt) = (s"$dir/sink", s"$dir/ckpt")
    def start(mem: MemoryStream[SEvent]) =
      mem.toDF().select("event_id", "user_id", "value")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
    val mem1 = MemoryStream[SEvent]
    mem1.addData(SEvent(1, t(1), 1, "click", 1.0), SEvent(2, t(1), 2, "view", 2.0))
    val q1 = start(mem1); q1.processAllAvailable(); q1.stop()
    // New query instance over the SAME checkpoint. The source replays
    // its first batch (as a recovering upstream would); the offset log
    // marks it committed, so the sink must NOT duplicate rows 1-2 and
    // must append only the genuinely new batch.
    val mem2 = MemoryStream[SEvent]
    mem2.addData(SEvent(1, t(1), 1, "click", 1.0), SEvent(2, t(1), 2, "view", 2.0))
    mem2.addData(SEvent(3, t(2), 1, "click", 3.0))
    val q2 = start(mem2); q2.processAllAvailable(); q2.stop()
    val ids = s.read.parquet(sink).select("event_id")
      .collect().map(_.getLong(0)).sorted.toList
    assert(ids == List(1L, 2L, 3L), ids.mkString(","))
  }

  test("mapGroupsWithState accumulates running per-user counters") {
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[StreamOps.EventRow]
    val q = StreamOps.statefulCounts(mem.toDS())
      .writeStream.outputMode(OutputMode.Update()).format("memory")
      .queryName("state_out").start()
    mem.addData(StreamOps.EventRow(1, 7, "click", 1.0), StreamOps.EventRow(2, 7, "click", 2.0))
    q.processAllAvailable()
    mem.addData(StreamOps.EventRow(3, 7, "view", 4.0))
    q.processAllAvailable()
    q.stop()
    // state persists across batches: final update for user 7 is n=3, sum=7
    val last = s.table("state_out").collect().map(_.toString)
    assert(last.contains("[7,3,7.0]"), last.mkString(","))
  }

  test("stateful counts run on the RocksDB state store (VERDICT r4 #8)") {
    // The production state backend for 100 TB streams: state lives in
    // per-partition RocksDB instances (native memory + local SST
    // files), not on the JVM heap — unbounded key cardinality can't
    // OOM an executor. Same operator, same results; the provider swap
    // is pure configuration, which is exactly what the test pins down.
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // The query must stop in the finally too: an assert or provider
    // failure mid-test would otherwise leave a RocksDB-backed query
    // running against a session whose conf the finally just reverted,
    // leaking native state into the rest of the shared-session suite.
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      val mem = MemoryStream[StreamOps.EventRow]
      q = StreamOps.statefulCounts(mem.toDS())
        .writeStream.outputMode(OutputMode.Update()).format("memory")
        .queryName("rocksdb_state_out").start()
      mem.addData(StreamOps.EventRow(1, 7, "click", 1.0),
        StreamOps.EventRow(2, 7, "click", 2.0))
      q.processAllAvailable()
      mem.addData(StreamOps.EventRow(3, 7, "view", 4.0))
      q.processAllAvailable()
      val stateMetrics = q.lastProgress.stateOperators.head
        .customMetrics.keySet()
      q.stop()
      // cross-batch accumulation correct under the swapped backend
      val last = s.table("rocksdb_state_out").collect().map(_.toString)
      assert(last.contains("[7,3,7.0]"), last.mkString(","))
      // and the RocksDB provider was genuinely engaged: its custom
      // metrics (rocksdbGet/Put/flush latencies, SST sizes) only exist
      // when state went through the native store
      import scala.jdk.CollectionConverters._
      assert(stateMetrics.asScala.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb state metrics — provider not engaged: $stateMetrics")
    } finally {
      if (q != null) q.stop() // idempotent on a stopped query
      prev match {
        case Some(p) => s.conf.set(key, p)
        case None => s.conf.unset(key)
      }
    }
  }

  test("flatMapGroupsWithState closes sessions on gap and on event-time timeout") {
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    def ts(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    val mem = MemoryStream[StreamOps.SessEvent]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("sessionize_out").start()
    // burst 1: user 7, three events within the 30-min gap
    mem.addData(
      StreamOps.SessEvent(1, 7, ts("10:00")), StreamOps.SessEvent(2, 7, ts("10:10")),
      StreamOps.SessEvent(3, 7, ts("10:20")))
    q.processAllAvailable()
    // same key past the gap: the first session closes by NEW DATA
    mem.addData(StreamOps.SessEvent(4, 7, ts("12:00")))
    q.processAllAvailable()
    // a different user far in the future advances the watermark
    // (13:00 - 1h = 12:00) past user 7's timeout (12:00 + 30min…
    // not yet), then further (14:00 - 1h = 13:00 > 12:30) so user 7's
    // second session closes by TIMEOUT with no new user-7 data.
    mem.addData(StreamOps.SessEvent(5, 9, ts("13:00")))
    q.processAllAvailable()
    mem.addData(StreamOps.SessEvent(6, 9, ts("14:00")))
    q.processAllAvailable()
    q.stop()
    val got = s.table("sessionize_out")
      .select("user_id", "start_ms", "end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val gapClosed = (7L, ts("10:00").getTime, ts("10:20").getTime, 3L)
    val timeoutClosed = (7L, ts("12:00").getTime, ts("12:00").getTime, 1L)
    assert(got.contains(gapClosed), s"gap-closed session missing: $got")
    assert(got.contains(timeoutClosed), s"timeout-closed session missing: $got")
  }

  test("sessionize merges late-but-within-watermark events correctly") {
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    def ts(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    val mem = MemoryStream[StreamOps.SessEvent]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("sessionize_late_out").start()
    // batch 1: the open session starts at 11:30 (watermark → 10:30)
    mem.addData(StreamOps.SessEvent(1, 7, ts("11:30")))
    q.processAllAvailable()
    // batch 2, both late but ABOVE the watermark (below it Spark
    // rightly drops them before the operator runs): 11:10 is
    // gap-adjacent and must LOWER the session start; 10:35 is more
    // than a gap earlier and must close as its own session, never
    // contaminating the open one (the pre-fix append logic absorbed
    // it and kept start=11:30)
    mem.addData(StreamOps.SessEvent(2, 7, ts("11:10")),
      StreamOps.SessEvent(3, 7, ts("10:35")))
    q.processAllAvailable()
    // advance the watermark far enough to flush the open session
    mem.addData(StreamOps.SessEvent(4, 9, ts("15:00")))
    q.processAllAvailable()
    mem.addData(StreamOps.SessEvent(5, 9, ts("17:00")))
    q.processAllAvailable()
    q.stop()
    val got = s.table("sessionize_late_out")
      .filter($"user_id" === 7)
      .select("start_ms", "end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lateSingleton = (ts("10:35").getTime, ts("10:35").getTime, 1L)
    val lowered = (ts("11:10").getTime, ts("11:30").getTime, 2L)
    assert(got == Set(lateSingleton, lowered), s"got $got")
  }

  test("sessionize retains gap-separated sessions until the watermark closes them") {
    // The arrival-order trap: events 10:00 and 11:00 arrive first,
    // then a late 10:20 bridges toward the older one. Closing "all but
    // the newest" session at the first batch would have already
    // emitted (10:00) alone and the bridge would create a phantom
    // (10:20) singleton — output depending on batch boundaries, not
    // data. Watermark-gated closing must yield exactly the batch
    // twin's answer: (10:00,10:20,2) and (11:00,11:00,1).
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    def ts(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    val mem = MemoryStream[StreamOps.SessEvent]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("sessionize_bridge_out").start()
    mem.addData(StreamOps.SessEvent(1, 7, ts("10:00")),
      StreamOps.SessEvent(2, 7, ts("11:00")))
    q.processAllAvailable()
    // late bridge, above the 10:00 watermark
    mem.addData(StreamOps.SessEvent(3, 7, ts("10:20")))
    q.processAllAvailable()
    // flush via another user's far-future events
    mem.addData(StreamOps.SessEvent(4, 9, ts("14:00")))
    q.processAllAvailable()
    mem.addData(StreamOps.SessEvent(5, 9, ts("16:00")))
    q.processAllAvailable()
    q.stop()
    val got = s.table("sessionize_bridge_out")
      .filter($"user_id" === 7)
      .select("start_ms", "end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (ts("10:00").getTime, ts("10:20").getTime, 2L),
      (ts("11:00").getTime, ts("11:00").getTime, 1L)), s"got $got")
  }

  test("sessionize survives a checkpoint restart on RocksDB: no lost or duplicated sessions") {
    // The exactly-once story end to end: OPEN sessions live in the
    // (RocksDB) state store when the query stops; a new query instance
    // over the same checkpoint must recover them, skip the replayed
    // committed batches, and emit each session exactly once when the
    // watermark finally closes it. Losing state loses u7/u8's sessions;
    // reprocessing the replayed batches would double-count u7's n=3.
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    def ts(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_ckpt").toString
    val (sink, ckpt) = (s"$dir/sink", s"$dir/ckpt")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      def start(mem: MemoryStream[StreamOps.SessEvent]) =
        StreamOps.sessionize(mem.toDS())
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append()).start()
      val batchA = Seq(StreamOps.SessEvent(1, 7, ts("10:00")),
        StreamOps.SessEvent(2, 7, ts("10:10")), StreamOps.SessEvent(3, 8, ts("10:05")))
      val batchB = Seq(StreamOps.SessEvent(4, 7, ts("10:20")),
        StreamOps.SessEvent(5, 9, ts("11:30")))
      val mem1 = MemoryStream[StreamOps.SessEvent]
      mem1.addData(batchA: _*)
      mem1.addData(batchB: _*)
      q = start(mem1); q.processAllAvailable(); q.stop()
      // nothing closed before the stop: every session is still state
      assert(!new java.io.File(sink).exists() ||
        s.read.parquet(sink).count() == 0, "sessions leaked before restart")
      // new instance, same checkpoint; replayed batches line up the
      // memory source's offsets and MUST NOT be reprocessed
      val mem2 = MemoryStream[StreamOps.SessEvent]
      mem2.addData(batchA: _*)
      mem2.addData(batchB: _*)
      mem2.addData(StreamOps.SessEvent(6, 9, ts("13:30"))) // wm 10:30 → 12:30
      mem2.addData(StreamOps.SessEvent(7, 9, ts("15:00"))) // closes u7, u8, u9@11:30
      mem2.addData(StreamOps.SessEvent(8, 9, ts("17:00"))) // closes u9@13:30; the
      // post-batch no-data trigger then sees wm 16:00 and closes u9@15:00 too
      q = start(mem2); q.processAllAvailable(); q.stop()
      val got = s.read.parquet(sink)
        .select("user_id", "start_ms", "end_ms", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toList
      assert(got.distinct.size == got.size, s"duplicated sessions: $got")
      assert(got.toSet == Set(
        (7L, ts("10:00").getTime, ts("10:20").getTime, 3L),
        (8L, ts("10:05").getTime, ts("10:05").getTime, 1L),
        (9L, ts("11:30").getTime, ts("11:30").getTime, 1L),
        (9L, ts("13:30").getTime, ts("13:30").getTime, 1L),
        (9L, ts("15:00").getTime, ts("15:00").getTime, 1L)), s"got $got")
    } finally {
      if (q != null) q.stop()
      prev match {
        case Some(p) => s.conf.set(key, p)
        case None => s.conf.unset(key)
      }
      // checkpoint + RocksDB SSTs + sink parquet are not under RunId's
      // shutdown hook — delete them so repeated runs don't pile up /tmp
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("stateful counters survive a checkpoint restart on RocksDB: state recovered, replays skipped") {
    // The other custom-state shape (mapGroupsWithState counters,
    // stream_stateful): counters accumulated before the stop must
    // carry into the restarted query — losing state restarts u7 at
    // n=1, reprocessing the replayed batch double-counts to n=4. The
    // sink is the production foreachBatch idiom: one idempotent
    // overwrite per batchId, so a replayed batch can never duplicate.
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cnt_ckpt").toString
    val (sink, ckpt) = (s"$dir/sink", s"$dir/ckpt")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      def start(mem: MemoryStream[StreamOps.EventRow]) =
        StreamOps.statefulCounts(mem.toDS())
          .writeStream.outputMode(OutputMode.Update())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamOps.UserCount], id: Long) =>
            df.write.mode("overwrite").parquet(s"$sink/batch=$id")
          }
          .start()
      val batchA = Seq(StreamOps.EventRow(1, 7, "click", 1.0),
        StreamOps.EventRow(2, 7, "click", 2.0),
        StreamOps.EventRow(3, 8, "view", 5.0))
      val mem1 = MemoryStream[StreamOps.EventRow]
      mem1.addData(batchA: _*)
      q = start(mem1); q.processAllAvailable(); q.stop()
      // new instance, same checkpoint; the replayed batch lines up the
      // source offsets and MUST NOT be reprocessed
      val mem2 = MemoryStream[StreamOps.EventRow]
      mem2.addData(batchA: _*)
      mem2.addData(StreamOps.EventRow(4, 7, "view", 4.0))
      q = start(mem2); q.processAllAvailable(); q.stop()
      val got = s.read.parquet(sink)
        .select("batch", "user_id", "n", "sum_value")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == Set(
        (0, 7L, 2L, 3.0), (0, 8L, 1L, 5.0),
        (1, 7L, 3L, 7.0)), s"got $got")
    } finally {
      if (q != null) q.stop()
      prev match {
        case Some(p) => s.conf.set(key, p)
        case None => s.conf.unset(key)
      }
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("stream-stream join survives a checkpoint restart: buffered side recovered from state") {
    // The third custom-state shape (stream_join): an unmatched click
    // buffered in the join state before the stop must still attribute
    // a purchase that arrives only AFTER the restart. Lost state ⇒ no
    // output ever; a reprocessed replay would re-buffer and duplicate.
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    def ts(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    val dir = java.nio.file.Files.createTempDirectory("graft_attr_ckpt").toString
    val (sink, ckpt) = (s"$dir/sink", s"$dir/ckpt")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      def start(mem: MemoryStream[SEvent]) =
        StreamOps.attributionJoin(mem.toDF())
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append()).start()
      val batchA = Seq(
        SEvent(1, ts("10:30"), 1, "click", 0.0),  // will match after restart
        SEvent(2, ts("10:45"), 2, "click", 0.0))  // other user, never matches
      val mem1 = MemoryStream[SEvent]
      mem1.addData(batchA: _*)
      q = start(mem1); q.processAllAvailable(); q.stop()
      assert(!new java.io.File(sink).exists() ||
        s.read.parquet(sink).count() == 0, "join emitted before any purchase")
      val mem2 = MemoryStream[SEvent]
      mem2.addData(batchA: _*)
      mem2.addData(SEvent(3, ts("11:00"), 1, "purchase", 5.0))
      q = start(mem2); q.processAllAvailable(); q.stop()
      val got = s.read.parquet(sink)
        .select("purchase_id", "click_id", "user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      assert(got == List((3L, 1L, 1L)), s"got $got")
    } finally {
      if (q != null) q.stop()
      prev match {
        case Some(p) => s.conf.set(key, p)
        case None => s.conf.unset(key)
      }
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("streaming LWW cells skip stale writes across a checkpoint restart") {
    // The write-path state shape (StreamOps.lwwCells): the standing
    // cell set before the stop must survive the restart, because the
    // stale-write rule is ABOUT the standing cell — losing state would
    // let an out-of-order old mutation (wt=50) overwrite the newer
    // value the key already holds (wt=100). Idempotent per-batchId
    // foreachBatch sink, per the counters precedent.
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_lww_ckpt").toString
    val (sink, ckpt) = (s"$dir/sink", s"$dir/ckpt")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      def start(mem: MemoryStream[StreamOps.CellMut]) =
        StreamOps.lwwCells(mem.toDS())
          .writeStream.outputMode(OutputMode.Update())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamOps.CellOut], id: Long) =>
            df.write.mode("overwrite").parquet(s"$sink/batch=$id")
          }
          .start()
      // in-batch disorder: wt=90 arrives after wt=100 in the same
      // batch and must not win
      val batchA = Seq(
        StreamOps.CellMut(1, "click", 10.0, 100L, 1),
        StreamOps.CellMut(1, "click", 20.0, 90L, 2))
      val mem1 = MemoryStream[StreamOps.CellMut]
      mem1.addData(batchA: _*)
      q = start(mem1); q.processAllAvailable(); q.stop()
      // restart: replay batchA (must not reprocess), then a stale
      // mutation for the standing key + a fresh key
      val mem2 = MemoryStream[StreamOps.CellMut]
      mem2.addData(batchA: _*)
      mem2.addData(
        StreamOps.CellMut(1, "click", 99.0, 50L, 3),
        StreamOps.CellMut(2, "view", 7.0, 60L, 4))
      q = start(mem2); q.processAllAvailable(); q.stop()
      val got = s.read.parquet(sink)
        .select("batch", "user_id", "event_type", "value", "writetime", "applied")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getDouble(3),
          r.getLong(4), r.getBoolean(5))).toSet
      assert(got == Set(
        (0, 1L, "click", 10.0, 100L, true),
        (1, 1L, "click", 10.0, 100L, false), // stale wt=50 skipped, state intact
        (1, 2L, "view", 7.0, 60L, true)), s"got $got")
      // agreement with the batch twin: Lww ordering over ALL mutations
      val all = (batchA ++ Seq(
        StreamOps.CellMut(1, "click", 99.0, 50L, 3),
        StreamOps.CellMut(2, "view", 7.0, 60L, 4))).toDF()
      val batchFinal = graft.core.Lww.latest(all, Seq("user_id", "event_type"),
          Seq(col("writetime").desc, col("event_id").desc))
        .select("user_id", "event_type", "value", "writetime")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
      // batch 1 emitted every key's CURRENT state, so it is the final
      // cell set
      val streamFinal = got.filter(_._1 == 1).map(x => (x._2, x._3, x._4, x._5))
      assert(batchFinal == streamFinal, s"batch $batchFinal vs stream $streamFinal")
    } finally {
      if (q != null) q.stop()
      prev match {
        case Some(p) => s.conf.set(key, p)
        case None => s.conf.unset(key)
      }
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("commitlog tail: snapshot-bootstrapped cells over segment FILES, restart-safe, overlap idempotent") {
    // The stream_commitlog shape (StreamOps.lwwCellsTail): a real
    // readStream over arriving log segment files, with cell state
    // SEEDED from the flushed snapshot via initial state — the stale
    // rule must hold against a snapshot cell the stream itself never
    // saw, survive a checkpoint restart, and absorb the crash-overlap
    // duplicate (a segment mutation replayed verbatim) as applied=false.
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_clog_tail").toString
    val (segs, sink, ckpt) = (s"$dir/segments", s"$dir/sink", s"$dir/ckpt")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      val snapshot = Seq(
        StreamOps.CellMut(7, "click", 1.0, 100L, 1),
        StreamOps.CellMut(8, "view", 5.0, 200L, 2)).toDS()
      def writeSegment(ms: StreamOps.CellMut*): Unit =
        ms.toDS().coalesce(1).write.mode("append").parquet(segs)
      def start() = {
        val muts = s.readStream
          .schema(org.apache.spark.sql.Encoders.product[StreamOps.CellMut].schema)
          .parquet(segs).as[StreamOps.CellMut]
        StreamOps.lwwCellsTail(muts, snapshot)
          .writeStream.outputMode(OutputMode.Update())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamOps.CellOut], id: Long) =>
            df.write.mode("overwrite").parquet(s"$sink/batch=$id")
          }
          .start()
      }
      // segment 1: a genuinely newer write for u7 and a STALE write
      // for u8 — stale only relative to the BOOTSTRAPPED snapshot cell
      writeSegment(
        StreamOps.CellMut(7, "click", 2.0, 300L, 3),
        StreamOps.CellMut(8, "view", 9.0, 150L, 4))
      q = start(); q.processAllAvailable(); q.stop()
      // restart over the same checkpoint (segment 1's file must not
      // reprocess); segment 2 carries the crash-overlap duplicate of
      // u7's mutation plus a genuinely new u8 write
      writeSegment(
        StreamOps.CellMut(7, "click", 2.0, 300L, 3), // replayed verbatim
        StreamOps.CellMut(8, "view", 4.0, 400L, 5))
      q = start(); q.processAllAvailable(); q.stop()
      val got = s.read.parquet(sink)
        .select("batch", "user_id", "event_type", "value", "writetime", "applied")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getDouble(3),
          r.getLong(4), r.getBoolean(5))).toSet
      assert(got == Set(
        (0, 7L, "click", 2.0, 300L, true),  // beats snapshot cell
        (0, 8L, "view", 5.0, 200L, false),  // stale vs SNAPSHOT state
        (1, 7L, "click", 2.0, 300L, false), // overlap replay: idempotent
        (1, 8L, "view", 4.0, 400L, true)), s"got $got")
      // agreement with the batch-twin rule: LWW over snapshot ∪ tail
      val all = snapshot.union(Seq(
        StreamOps.CellMut(7, "click", 2.0, 300L, 3),
        StreamOps.CellMut(8, "view", 9.0, 150L, 4),
        StreamOps.CellMut(7, "click", 2.0, 300L, 3),
        StreamOps.CellMut(8, "view", 4.0, 400L, 5)).toDS()).toDF()
      val batchFinal = graft.core.Lww.latest(all, Seq("user_id", "event_type"),
          Seq(col("writetime").desc, col("event_id").desc))
        .select("user_id", "event_type", "value", "writetime")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
        .toSet
      val streamFinal = got.filter(_._1 == 1).map(x => (x._2, x._3, x._4, x._5))
      assert(batchFinal == streamFinal, s"batch $batchFinal vs stream $streamFinal")
    } finally {
      if (q != null) q.stop()
      prev match {
        case Some(p) => s.conf.set(key, p)
        case None => s.conf.unset(key)
      }
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("streaming sessionize agrees with the batch twin on closed sessions") {
    val s = spark; import s.implicits._
    // Batch twin over the real events table restricted to a few users.
    val batch = graft.operators.StreamingBatch.streamSessionize(s, sf001)
      .filter($"user_id" <= 3)
      .select($"user_id", graft.core.Tables.epochMs($"sess_start").as("start_ms"),
        graft.core.Tables.epochMs($"sess_last").as("end_ms"), $"n_events")
      .collect().map(_.toString).sorted.toList
    // Same rows through the stateful streaming operator; a sentinel
    // event far in the future pushes the watermark past every timeout
    // so ALL sessions close (the sentinel's own never does — filtered).
    implicit val sq = s.sqlContext
    val mem = MemoryStream[StreamOps.SessEvent]
    val rows = graft.core.Tables.events(s, sf001)
      .filter($"user_id" <= 3)
      .select($"event_id", $"user_id", $"ts".cast("timestamp").as("ts"))
      .as[StreamOps.SessEvent].collect()
    mem.addData(rows.toIndexedSeq: _*)
    val maxTs = rows.map(_.ts.getTime).max
    mem.addData(StreamOps.SessEvent(-1, -1, new Timestamp(maxTs + 86400000L * 30)))
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("sessionize_batch_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = s.table("sessionize_batch_out")
      .filter($"user_id" >= 0)
      .select("user_id", "start_ms", "end_ms", "n_events")
      .collect().map(_.toString).sorted.toList
    assert(streamed == batch && streamed.nonEmpty,
      s"streamed ${streamed.size} vs batch ${batch.size}")
  }

  test("streaming incremental MV maintenance converges to the batch view") {
    // End-to-end capstone: a standing (user, type) aggregate view
    // maintained incrementally from the stream — each micro-batch's
    // partial aggregate merged into the previous view version, exactly
    // the mv_incremental contract driven by foreachBatch instead of a
    // batch job. Decimal-exact sums make the merge associative, so the
    // final view must EQUAL the one-shot batch aggregate, not just
    // approximate it.
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm").toString
    @volatile var prev: Option[String] = None
    def mergeBatch(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val delta = df.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"), sum(graft.core.Num.d2($"value")).as("sv"))
      val merged = prev match {
        case Some(p) => s.read.parquet(p).unionByName(delta)
          .groupBy("user_id", "event_type")
          .agg(sum("n").as("n"), sum("sv").as("sv"))
        case None => delta
      }
      merged.write.mode("overwrite").parquet(s"$dir/v$id")
      prev = Some(s"$dir/v$id")
    }
    val mem = MemoryStream[SEvent]
    val q = mem.toDF().select("user_id", "event_type", "value")
      .writeStream.foreachBatch(mergeBatch _)
      .option("checkpointLocation", s"$dir/ckpt").start()
    val all = Seq(
      SEvent(1, t(1), 1, "click", 1.5), SEvent(2, t(1), 1, "click", 2.25),
      SEvent(3, t(1), 2, "view", 3.0), SEvent(4, t(2), 1, "view", 0.75),
      SEvent(5, t(2), 2, "click", 4.5), SEvent(6, t(3), 1, "click", 1.0))
    for (batch <- all.grouped(2)) {
      mem.addData(batch: _*)
      q.processAllAvailable()
    }
    q.stop()
    val got = s.read.parquet(prev.get)
      .select($"user_id", $"event_type", $"n", $"sv".cast("string"))
      .collect().map(_.toString).sorted.toList
    val expected = all.toDF()
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"), sum(graft.core.Num.d2($"value")).as("sv"))
      .select($"user_id", $"event_type", $"n", $"sv".cast("string"))
      .collect().map(_.toString).sorted.toList
    assert(got == expected && got.nonEmpty, s"got $got\nexpected $expected")
  }

  test("delta-partition MV survives restart and batch replay, converges to batch") {
    // The at-scale variant of the MV test above: each micro-batch
    // writes only its OWN batch-sized delta partition (dynamic
    // partition overwrite), never the MV; the served view merges
    // deltas at read. Restart-safe because committed batches are
    // skipped by the checkpoint, and replay-safe because a replayed
    // batchId overwrites its own partition byte-identically.
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_dmv").toString
    val (root, ckpt) = (s"$dir/mv", s"$dir/ckpt")
    val b1 = Seq(SEvent(1, t(1), 1, "click", 1.5), SEvent(2, t(1), 2, "view", 2.25))
    val b2 = Seq(SEvent(3, t(2), 1, "view", 3.0), SEvent(4, t(2), 3, "click", 0.75))
    val b3 = Seq(SEvent(5, t(3), 2, "click", 4.5))
    val mem1 = MemoryStream[SEvent]
    val q1 = StreamOps.incrementalMv(mem1.toDF(), root, ckpt)
    mem1.addData(b1: _*); q1.processAllAvailable()
    mem1.addData(b2: _*); q1.processAllAvailable()
    q1.stop()
    // Restart against the same checkpoint with a fresh source whose
    // addData calls line up the original offsets: committed batches
    // are skipped, only b3 is processed.
    val mem2 = MemoryStream[SEvent]
    mem2.addData(b1: _*); mem2.addData(b2: _*); mem2.addData(b3: _*)
    val q2 = StreamOps.incrementalMv(mem2.toDF(), root, ckpt)
    q2.processAllAvailable(); q2.stop()
    def mvNow(): List[String] = StreamOps.readMv(s, root)
      .collect().map(_.toString).sorted.toList
    val afterRestart = mvNow()
    // Forced replay of batch 0: the idempotent sink must not move.
    StreamOps.applyMvBatch(b1.toDF(), root, 0L)
    assert(mvNow() == afterRestart, "replayed batch changed the MV")
    val expected = (b1 ++ b2 ++ b3).toDF()
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_events"),
        round(sum(graft.core.Num.d2($"value")), 2).cast("double").as("sum_value"))
      .collect().map(_.toString).sorted.toList
    assert(afterRestart == expected && afterRestart.nonEmpty,
      s"got $afterRestart\nexpected $expected")
  }

  test("foreachBatch sink is idempotent under batch replay (exactly-once)") {
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_feb").toString
    // The canonical exactly-once foreachBatch recipe: write each
    // micro-batch to a batchId-derived location with overwrite, so a
    // replayed batch (crash between sink write and offset commit)
    // lands in the same place instead of appending duplicates.
    def writeBatch(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      df.write.mode("overwrite").parquet(s"$dir/batch=$batchId")
    val mem = MemoryStream[SEvent]
    mem.addData(SEvent(1, t(1), 1, "click", 1.0), SEvent(2, t(1), 2, "view", 2.0))
    val q = mem.toDF().select("event_id", "user_id", "value")
      .writeStream.foreachBatch(writeBatch _)
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable(); q.stop()
    // Simulate the replay the recipe defends against: re-run batch 0's
    // data through the same writer with the same batchId.
    writeBatch(
      Seq((1L, 1L, 1.0), (2L, 2L, 2.0)).toDF("event_id", "user_id", "value"), 0L)
    val ids = s.read.parquet(s"$dir/batch=0").select("event_id")
      .collect().map(_.getLong(0)).sorted.toList
    assert(ids == List(1L, 2L), s"replay duplicated rows: $ids")
  }

  test("memtable flush lifecycle: micro-batches flush into NEW SAI generations with postings") {
    // The scan_sai_memtable layout's streaming side — Cassandra's
    // memtable→sstable lifecycle: each micro-batch of arriving writes
    // FLUSHES into a brand-new generation (data files + its SAI
    // postings built at flush time, batchId-derived so a crash replay
    // overwrites instead of duplicating), and the shared probe
    // (Scans.saiFlushProbe) answers over base + flushed generations.
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sai_flush").toString
    val (root, segs, ckpt) = (s"$dir/layout", s"$dir/segments", s"$dir/ckpt")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      // base layout: 4 rows already flushed into 2 generations
      val base = Seq(
        (1L, 1L, "click", 1.0), (2L, 2L, "view", 2.0),
        (3L, 1L, "click", 3.0), (4L, 2L, "view", 4.0))
        .toDF("event_id", "user_id", "event_type", "value")
        .withColumn("_gen", col("event_id") % 2)
      base.write.partitionBy("_gen").parquet(s"$root/data")
      base.select("_gen", "user_id", "event_id").write.parquet(s"$root/idx_user")
      // two arriving segments (the memtable contents, in write order)
      Seq((10L, 1L, "click", 10.0), (11L, 3L, "view", 11.0))
        .toDF("event_id", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(segs)
      Seq((12L, 1L, "buy", 12.0), (13L, 2L, "click", 13.0))
        .toDF("event_id", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(segs)
      val schema = s.read.parquet(segs).schema
      def flush(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        val gen = 100L + batchId
        // flush = data files for the new generation + its postings;
        // the data write is batchId-keyed overwrite (replay-safe), the
        // postings carry the gen so a probe can name it
        df.write.mode("overwrite").parquet(s"$root/data/_gen=$gen")
        df.select(lit(gen).as("_gen"), col("user_id"), col("event_id"))
          .write.mode("append").parquet(s"$root/idx_user_extra")
      }
      q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(segs)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(flush _).start()
      q.processAllAvailable(); q.stop()
      // both segments flushed: generations 100 and 101 exist with data
      val flushedGens = new java.io.File(s"$root/data").listFiles()
        .map(_.getName).filter(_.startsWith("_gen=")).sorted.toList
      assert(flushedGens == List("_gen=0", "_gen=1", "_gen=100", "_gen=101"),
        s"unexpected generations: $flushedGens")
      // the probe over base + flushed generations sees every user-1
      // write, pre- and post-flush, exactly once
      val got = graft.operators.Scans
        .saiFlushProbe(s, root, 1L, Seq(100L, 101L))
        .collect().map(r => (r.getLong(0), r.getDouble(3))).sorted.toList
      assert(got == List((1L, 1.0), (3L, 3.0), (10L, 10.0), (12L, 12.0)),
        s"probe after flush: $got")
      // without the flushed generations' postings the probe serves
      // only the base — the index append is what keeps reads correct
      val baseOnly = graft.operators.Scans.saiFlushProbe(s, root, 1L)
        .collect().map(_.getLong(0)).sorted.toList
      assert(baseOnly == List(1L, 3L), s"base-only probe: $baseOnly")
      // restart over the same checkpoint with a new segment: the old
      // segments must NOT re-flush (no duplicate postings), the new
      // one lands in generation 102
      Seq((14L, 1L, "view", 14.0))
        .toDF("event_id", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(segs)
      q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(segs)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(flush _).start()
      q.processAllAvailable(); q.stop()
      val got2 = graft.operators.Scans
        .saiFlushProbe(s, root, 1L, Seq(100L, 101L, 102L))
        .collect().map(_.getLong(0)).sorted.toList
      assert(got2 == List(1L, 3L, 10L, 12L, 14L),
        s"probe after restart+flush: $got2")
    } finally {
      if (q != null) q.stop()
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }
  test("vector memtable flush lifecycle: micro-batches flush into NEW ANN generations; restart does not re-flush; replay idempotent") {
    // stream_ann_memtable's streaming side — the scan_sai_memtable
    // flush discipline applied to the ANN layout: each micro-batch of
    // arriving vectors flushes into a brand-new generation with ALL
    // index artifacts (cell-partitioned data leaves under the
    // persisted centroids, label postings, per-cell residual bounds)
    // built at flush time, and the ONE exact probe answers over
    // base ∪ flushed generations.
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_flush").toString
    val (root, segs, ckpt) = (s"$dir/layout", s"$dir/segments", s"$dir/ckpt")
    val G = graft.operators.Scans.AnnFlushGenBase
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      val emb = graft.core.Tables.embeddings(s, sf001)
      val ten = pmod(col("vec_id"), lit(10))
      graft.operators.Scans.buildAnnLayout(s, root,
        emb.filter(ten =!= 3 && ten =!= 7))
      // two arriving segments (the vector memtable contents)
      emb.filter(ten === 3).coalesce(1).write.mode("append").parquet(segs)
      emb.filter(ten === 7).coalesce(1).write.mode("append").parquet(segs)
      val schema = s.read.parquet(segs).schema
      def flush(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
        graft.operators.Scans.annFlush(s, root, df, batchId)
      def run(): Unit = {
        q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(segs)
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch(flush _).start()
        q.processAllAvailable(); q.stop()
      }
      run()
      def dataGens: List[String] = new java.io.File(s"$root/data").listFiles()
        .map(_.getName).filter(_.startsWith("_gen=")).sorted.toList
      assert(dataGens.contains(s"_gen=$G") && dataGens.contains(s"_gen=${G + 1}"),
        s"flushed generations missing: $dataGens")
      // the probe over base ∪ flushed generations is EXACT over the
      // whole corpus — equals brute force
      val qPred = col("vec_id") >= 10 && col("vec_id") < 15
      def probe(extra: Seq[Long]): List[(Long, Long, Double, Int)] =
        graft.operators.Scans.saiAnnSearch(s, sf001, labelSel = 0, k = 8,
          qPred = qPred, rootOverride = Some(root), extraGens = extra)._1
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getInt(4)))
          .toList
      def brute(extraRows: org.apache.spark.sql.DataFrame): List[(Long, Long, Double, Int)] = {
        val qv = emb.filter(qPred)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("vec_id").asc)
        emb.unionByName(extraRows).filter(col("label") === 0)
          .crossJoin(broadcast(qv))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            round(graft.functions.Vectors.fdot(col("embedding"), col("qvec")), 6)
              .as("score"))
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= 8)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
          .toList.sorted
      }
      assert(probe(Seq(G, G + 1)).sorted == brute(emb.filter(lit(false))),
        "probe over base + flushed generations must equal brute force")
      // without the flushed generations the unflushed slices are
      // invisible — the flush-time index build is what keeps reads
      // complete
      val baseOnlyIds = probe(Nil).map(_._2)
      assert(baseOnlyIds.nonEmpty &&
        baseOnlyIds.forall(v => v % 10 != 3 && v % 10 != 7),
        "base-only probe must not see unflushed ids")
      // restart over the same checkpoint with a third wave: exact
      // TWINS of two query vectors under fresh ids — the old segments
      // must NOT re-flush, the twins land in the next generation and
      // surface at rank 1 with score 1.0 (unit-norm fixture)
      val twins = emb.filter(col("vec_id").isin(10L, 11L))
        .select((col("vec_id") + (1L << 40)).as("vec_id"),
          col("embedding"), lit(0).as("label"))
      twins.coalesce(1).write.mode("append").parquet(segs)
      val posts0 = s.read.parquet(s"$root/idx_label_extra/_gen=$G").count()
      run()
      assert(s.read.parquet(s"$root/idx_label_extra/_gen=$G").count() == posts0,
        "restart re-flushed an already-committed batch")
      assert(dataGens.contains(s"_gen=${G + 2}"), s"third wave missing: $dataGens")
      val got2 = probe(Seq(G, G + 1, G + 2))
      for (qid <- Seq(10L, 11L)) {
        val top = got2.filter(_._1 == qid).minBy(_._4)
        assert(top._2 == qid + (1L << 40) && top._3 == 1.0,
          s"planted twin of $qid not at rank 1: $top")
      }
      assert(got2.sorted == brute(twins),
        "probe with twins must equal brute force over the grown corpus")
      // replay idempotence: re-flushing the third batch (the crash
      // replay) leaves the probe byte-identical — generation-keyed
      // overwrite, not append
      graft.operators.Scans.annFlush(s, root, twins, 2L)
      assert(probe(Seq(G, G + 1, G + 2)) == got2, "replayed flush changed the read")
    } finally {
      if (q != null) q.stop()
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("near-dup admission stream: file waves, in-stream index, restart, replay idempotent") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_neardedup").toString
    val (docsDir, ckpt) = (s"$dir/docs", s"$dir/ckpt")
    val roots = graft.operators.Dedup.nearStreamSeed(s, sf001, s"$dir/roots")
    // synthetic novel docs: vocabulary disjoint from the fixture's, so
    // admission vs the seeded corpus index is guaranteed
    val a = (1 to 12).map(i => s"qa$i").mkString(" ")
    val aDropFirst = a.split(" ").drop(1).mkString(" ")   // J = 0.9 vs a
    val aDropLast = a.split(" ").dropRight(1).mkString(" ")
    val dNew = (1 to 12).map(i => s"zz$i").mkString(" ")
    def writeWave(rows: (Long, String)*): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(docsDir)
    def run(): Unit = {
      val docs = s.readStream
        .schema("doc_id LONG, text STRING").parquet(docsDir)
      val q = StreamOps.nearDedupAdmit(docs, roots, ckpt)
      q.processAllAvailable(); q.stop()
    }
    try {
      // wave 1: A novel (admit), B = A minus first word (in-batch
      // first-wins: rejected by the smaller id in the SAME batch)
      writeWave(900001L -> a, 900002L -> aDropFirst)
      run()
      // wave 2 after a full restart: C rejects against A via the
      // batch-0 index partition; D is novel
      writeWave(900003L -> aDropLast, 900004L -> dNew)
      run()
      def results(): Set[(Long, Long, Boolean, Long)] =
        s.read.parquet(roots.res)
          // partition-column readback infers INT from the dir names
          .select(col("doc_id"), col("batch_id").cast("long"),
            col("admitted"), col("match_id"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
            if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      val got = results()
      assert(got == Set(
        (900001L, 0L, true, -1L),
        (900002L, 0L, false, 900001L),
        (900003L, 1L, false, 900001L),
        (900004L, 1L, true, -1L)), s"got $got")
      // crash-overlap replay: refold batch 1 directly — it must read
      // only batch_id < 1 partitions and overwrite exactly its own,
      // leaving the final state unchanged
      graft.operators.Dedup.nearAdmitFold(s, roots,
        Seq(900003L -> aDropLast, 900004L -> dNew).toDF("doc_id", "text"), 1L)
      assert(results() == got, "replaying batch 1 changed the admission state")
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }
}
