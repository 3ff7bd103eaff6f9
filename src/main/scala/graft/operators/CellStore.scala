package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Lww, Num, RunId, Tables}

/** Storage-layer semantics of the wide-column data model (SURVEY.md
  * §1.1): explicit cell metadata columns, tombstone merge, native
  * collection/UDT columns round-tripped through parquet, and the
  * `duration` type.
  *
  * The write-then-read queries here are deliberate: the point is that
  * map/array/struct/metadata columns survive STORAGE (parquet encode +
  * decode), not just an in-plan projection. Writes go to a per-JVM
  * scratch dir ([[RunId]]), the pay-once pattern of a real engine
  * table; every oracle recomputes the same result from the original
  * fixture tables, so the round-trip itself is what is being checked.
  */
object CellStore extends QueryGroup {

  /** Fixed read time: queries over TTL'd cells must pin "now" or they
    * are nondeterministic (same constant as fn_writetime_ttl). */
  private val ReadTime = "2024-01-15 00:00:00"

  /** Cell representation of events: value + `_writetime` (epoch µs) +
    * `_ttl_expires`, PK (user_id, event_type). TTL seeds from props.k
    * so expiry varies per cell. */
  private def cellTable(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("user_id"), col("event_type"), col("value"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("_writetime"),
        expr("ts + make_interval(0, 0, 0, CAST(get_json_object(props, '$.k') AS INT) % 14, 0, 0, 0)")
          .as("_ttl_expires"))

  /** Engine-table write + metadata-column read (SURVEY §1.1 cell
    * model): cells are persisted WITH their `_writetime`/`_ttl_expires`
    * metadata via the sink path (repartition by PK, sort within
    * partitions — the MV layout), read back, LWW-merged on writetime,
    * then expired cells dropped AFTER the merge: in Cassandra an
    * expired newest cell acts as a tombstone and hides older versions,
    * it does not resurrect them. */
  def sinkCellStore(s: SparkSession, dir: String): DataFrame = {
    val path = RunId.scratch("cell_store/events_cells")
    cellTable(s, dir)
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "event_type", "_writetime")
      .write.mode("overwrite").parquet(path)
    val stored = s.read.parquet(path)
    Lww.latest(stored, Seq("user_id", "event_type"),
        Seq(col("_writetime").desc, col("event_id").desc))
      .filter(col("_ttl_expires") > lit(ReadTime).cast("timestamp_ntz"))
      .select("user_id", "event_type", "value", "_writetime")
      .orderBy("user_id", "event_type")
  }

  /** Tombstone merge: newest version per key wins INCLUDING deletes
    * (modeled as event_type='error'), deleted keys absent from the
    * read. The delete-then-reinsert resurrection property is covered
    * in KernelSpec. */
  def tombstoneMerge(s: SparkSession, dir: String): DataFrame =
    Lww.mergeTombstones(
        Tables.events(s, dir), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc),
        isDelete = col("event_type") === "error")
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")

  /** Generational compaction — the SSTable-merge maintenance job at
    * the heart of the storage engine: three sorted runs (generations,
    * split by event_id mod 3, each persisted repartitioned-by-PK and
    * sorted — the sorted-string-table layout) are merged newest-wins
    * INCLUDING tombstones, and a tombstone older than gc_grace is
    * PURGED outright (its key vanishes — everything it shadowed is in
    * this compaction, so nothing can resurrect), while a younger
    * tombstone survives as a marker other replicas may still need.
    * The generation split is output-invisible by construction, so the
    * oracle states the postcondition directly on `events`. At scale:
    * union of co-sorted runs + ONE keyed window — the merge itself is
    * the shuffle, tombstone GC is row-local. */
  private val compactionRoots =
    new graft.core.BuildOnce[String, String]

  def compactGenerations(s: SparkSession, dir: String): DataFrame = {
    val gcGrace = "2024-01-10 00:00:00"
    // layout built once per (JVM, dir) — a second call must not race a
    // still-lazy reader of the first call's parquet with an overwrite
    val root = compactionRoots.getOrElseUpdate(dir, {
      val r = RunId.scratchKeyed("compaction/events_gen", dir)
      val ev = Tables.events(s, dir)
        .select("user_id", "event_id", "event_type", "value", "ts")
      (0 until 3).foreach { g =>
        ev.filter(pmod(col("event_id"), lit(3)) === g)
          .repartition(col("user_id"))
          .sortWithinPartitions("user_id", "ts")
          .write.mode("overwrite").parquet(s"$r/g$g")
      }
      r
    })
    val merged = s.read.parquet((0 until 3).map(g => s"$root/g$g"): _*)
    Lww.latest(merged, Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc))
      .withColumn("is_tombstone", col("event_type") === "error")
      .filter(!(col("is_tombstone") &&
        col("ts") < lit(gcGrace).cast("timestamp_ntz")))
      .select("user_id", "event_id", "event_type", "value", "is_tombstone")
      .orderBy("user_id")
  }

  /** Size-tiered compaction planning (STCS) — the strategy half of
    * the maintenance story ([[compactGenerations]] executes a merge;
    * this decides WHICH tables to merge): flush generations are
    * bucketed by size order, a tier with >= 4 similar-sized tables
    * is a compaction candidate (Cassandra's min_threshold), and the
    * smallest candidate tier is chosen first — merging small tables
    * is cheap and collapses the long tail the next flush feeds.
    * Generations are modeled as (decimal-magnitude, mod-4) slices of
    * events, which yields the geometric size spread a flush history
    * produces; size order = digit count of n_rows (pure integer
    * arithmetic — a float log10 would round differently at exact
    * powers across engines). Everything after the per-table count is
    * metadata-sized: the windows run over the SSTABLE list (tens of
    * rows at any data scale, like the ring plans), never the data. */
  def compactStcs(s: SparkSession, dir: String): DataFrame = {
    val ss = Tables.events(s, dir)
      .groupBy(
        // cast: DuckDB length() is BIGINT, Spark's is int
        length(col("event_id").cast("string")).cast("long").as("d"),
        pmod(col("event_id"), lit(4)).as("m"))
      .agg(count(lit(1)).cast("long").as("n_rows"))
      .withColumn("tier", length(col("n_rows").cast("string")).cast("long"))
    val wt = Window.partitionBy("tier")
    val c = ss
      .withColumn("tier_tables", count(lit(1)).over(wt).cast("long"))
      .withColumn("tier_rows", sum("n_rows").over(wt).cast("long"))
      .withColumn("candidate", col("tier_tables") >= 4)
    val chosen = c.agg(min(when(col("candidate"), col("tier"))).as("chosen_tier"))
    c.crossJoin(chosen)
      .select(col("d"), col("m"), col("n_rows"), col("tier"),
        col("tier_tables"), col("tier_rows"), col("candidate"),
        coalesce(col("candidate") && col("tier") === col("chosen_tier"),
          lit(false)).as("chosen"))
      .orderBy("d", "m")
  }

  /** Time-window compaction planning (TWCS) — Cassandra's time-series
    * strategy, the third member of the maintenance-planning family
    * ([[compactStcs]] buckets by size; TWCS buckets by WRITE TIME):
    * sstables group into day windows; the CURRENT window compacts by
    * the ordinary STCS rule (>= 4 similar-sized tables), while every
    * PAST window with more than one sstable is a major-compaction
    * candidate — old windows collapse to exactly one table each, so a
    * TTL'd time series expires whole files at a time instead of
    * rewriting them. Generations are modeled as (day, mod-4) slices of
    * events — the flush history a steady writer produces. As with
    * STCS, everything after the per-table count is metadata-sized:
    * windows run over the sstable LIST (tens of rows at any data
    * scale), never the data. */
  def compactTwcs(s: SparkSession, dir: String): DataFrame = {
    // materialized once: the sstable list is tens of rows, and without
    // the pin the cur aggregate and the crossJoin consumer would each
    // re-scan events (the b0ff4d2 discipline: checkpoint the BOUNDED
    // relation, stream the corpus-sized one)
    val ss = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("w_day"),
        pmod(col("event_id"), lit(4)).as("m"))
      .agg(count(lit(1)).cast("long").as("n_rows"))
      .localCheckpoint()
    val cur = ss.agg(max("w_day").as("cur_day"))
    val wWin = Window.partitionBy("w_day")
    val wTier = Window.partitionBy("w_day", "tier")
    val t = ss.crossJoin(cur)
      .withColumn("is_current", col("w_day") === col("cur_day"))
      .withColumn("win_tables", count(lit(1)).over(wWin).cast("long"))
      // size order = digit count (integer-exact; see compactStcs)
      .withColumn("tier", length(col("n_rows").cast("string")).cast("long"))
      .withColumn("tier_tables", count(lit(1)).over(wTier).cast("long"))
    val chosen = t.filter(col("is_current") && col("tier_tables") >= 4)
      .agg(min("tier").as("chosen_tier"))
    t.crossJoin(chosen)
      .select(col("w_day"), col("m"), col("n_rows"), col("is_current"),
        when(!col("is_current") && col("win_tables") > 1, lit("major"))
          .when(col("is_current") &&
            coalesce(col("tier") === col("chosen_tier"), lit(false)), lit("stcs"))
          .otherwise(lit("none")).as("action"))
      .orderBy("w_day", "m")
  }

  /** Leveled compaction planning (LCS) — the third strategy
    * ([[compactStcs]] by size, [[compactTwcs]] by write time, LCS by
    * KEY RANGE): L0 holds raw flushes whose key ranges overlap; deeper
    * levels hold non-overlapping contiguous runs, each level ~10× the
    * last. Two triggers, both emitted (a real compactor serializes
    * them L0-first; the planner exposes every applicable task):
    *  - L0 with >= 4 tables compacts into L1, dragging along every L1
    *    table whose range intersects the L0 span;
    *  - a level over its row target promotes its smallest-key table,
    *    merging with the next level's range-overlapping tables.
    * SSTables are modeled as hash slices (L0 — overlapping by
    * construction, like flushes) and contiguous range runs (L1: 8,
    * L2: 32) of events; slice ids use integer `div` so the layout is
    * engine-exact. Row targets are fixed constants (2000 / 20000 —
    * Cassandra's 10× ladder at fixture scale). As with STCS/TWCS,
    * everything past the per-table aggregate runs over the sstable
    * LIST — metadata-sized at any data scale. */
  def compactLcs(s: SparkSession, dir: String): DataFrame = {
    val mx = Tables.events(s, dir).agg(max("event_id").as("mx"))
    val base = Tables.events(s, dir).select(col("event_id")).crossJoin(mx)
    def slices(level: Int, tbl: Column): DataFrame =
      base.groupBy(lit(level).cast("long").as("level"), tbl.as("tbl"))
        .agg(min("event_id").as("min_k"), max("event_id").as("max_k"),
          count(lit(1)).cast("long").as("n_rows"))
    // pinned once (44 rows): l0span, cand and the final projection all
    // branch from t — unpinned, each branch re-runs the three
    // event-wide slicing aggregates
    val ss = slices(0, pmod(col("event_id"), lit(4)).cast("long"))
      .unionByName(slices(1, expr("(event_id * 8) div (mx + 1)").cast("long")))
      .unionByName(slices(2, expr("(event_id * 32) div (mx + 1)").cast("long")))
      .localCheckpoint()
    val lvl = Window.partitionBy("level")
    val t = ss
      .withColumn("level_rows", sum("n_rows").over(lvl).cast("long"))
      .withColumn("target_rows",
        when(col("level") === 1, lit(2000L))
          .when(col("level") === 2, lit(20000L)).otherwise(lit(0L)))
    val l0span = t.filter(col("level") === 0)
      .agg(min("min_k").as("l0_min"), max("max_k").as("l0_max"),
        count(lit(1)).cast("long").as("l0_n"))
    val cand = t.filter(col("level") === 1 && col("level_rows") > col("target_rows"))
      .agg(min("min_k").as("c_min"), expr("min_by(max_k, min_k)").as("c_max"))
    t.crossJoin(l0span).crossJoin(cand)
      .select(col("level"), col("tbl"), col("min_k"), col("max_k"),
        col("n_rows"), col("level_rows"), col("target_rows"),
        when(col("level") === 0 && col("l0_n") >= 4, lit("compact_to_l1"))
          // promotion first so the candidate stays visible even when
          // the (always-matching) L0-overlap rule also applies to it
          .when(col("level") === 1 && col("level_rows") > col("target_rows") &&
            col("min_k") === col("c_min"), lit("promote_to_l2"))
          .when(col("level") === 1 && col("l0_n") >= 4 &&
            col("max_k") >= col("l0_min") && col("min_k") <= col("l0_max"),
            lit("receive_l0"))
          .when(col("level") === 2 && col("c_min").isNotNull &&
            col("max_k") >= col("c_min") && col("min_k") <= col("c_max"),
            lit("merge_with_promoted"))
          .otherwise(lit("none")).as("action"))
      .orderBy("level", "tbl")
  }

  /** Unified compaction strategy (the Cassandra 5 / CEP-26 default,
    * completing the [[compactStcs]]/[[compactTwcs]]/[[compactLcs]]
    * family): ONE strategy parameterized per level by the scaling
    * parameter w — w ≥ 0 behaves TIERED (trigger at w + 2 same-level
    * tables, the STCS rule: cheap absorption of fresh flushes), w < 0
    * behaves LEVELED (trigger at 2, the LCS rule: bounded read
    * amplification) — so one hierarchy is tiered at the top and
    * leveled at the bottom, the production default. Model: sstables =
    * (day, mod-4) flush slices; size level = digit count of n_rows
    * (the compactStcs integer-exact size ordering, fanout 10);
    * levels ≤ 1 carry w = +2, deeper levels w = −8. The LOWEST
    * triggering level is chosen (the compactor's priority — newest
    * data first). Everything after the per-table count runs over the
    * sstable LIST — metadata-sized at any data scale. */
  def compactUcs(s: SparkSession, dir: String): DataFrame = {
    val ss = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("w_day"),
        pmod(col("event_id"), lit(4)).as("m"))
      .agg(count(lit(1)).cast("long").as("n_rows"))
    val t = ss
      .withColumn("level",
        (length(col("n_rows").cast("string")) - 1).cast("long"))
      .withColumn("w", when(col("level") <= 1, lit(2L)).otherwise(lit(-8L)))
      .withColumn("mode",
        when(col("w") >= 0, lit("tiered")).otherwise(lit("leveled")))
      .withColumn("threshold",
        when(col("w") >= 0, col("w") + 2L).otherwise(lit(2L)).cast("long"))
    val lvl = Window.partitionBy("level")
    val c = t
      .withColumn("level_tables", count(lit(1)).over(lvl).cast("long"))
      .withColumn("candidate", col("level_tables") >= col("threshold"))
    val chosen = c.agg(min(when(col("candidate"), col("level"))).as("chosen_level"))
    c.crossJoin(chosen)
      .select(col("w_day"), col("m"), col("n_rows"), col("level"), col("w"),
        col("mode"), col("level_tables"), col("threshold"), col("candidate"),
        coalesce(col("candidate") && col("level") === col("chosen_level"),
          lit(false)).as("chosen"))
      .orderBy("w_day", "m")
  }

  /** TTL compaction pass — the expiry half of the maintenance story
    * ([[compactGenerations]] covers tombstone GC): per PK the LWW
    * winner is classified at compaction time [[ReadTime]] as
    *  - `live` (expiry in the future): kept, with remaining-TTL
    *    seconds — the localDeletionTime accounting a compactor
    *    rewrites into each cell;
    *  - `expired_marker` (expired, but within gc_grace): the cell's
    *    value is GONE but the expiry survives as a deletion marker
    *    other replicas may still need (an expired cell IS a tombstone
    *    with its expiry as the delete timestamp);
    *  - purged (expired before the gc_grace floor): dropped outright —
    *    every shadowed version is in this compaction, nothing can
    *    resurrect.
    * One keyed window over the cell table, classification row-local —
    * the same scale shape as the generation merge. */
  def ttlCompact(s: SparkSession, dir: String): DataFrame = {
    // Pinned mid-stream so all three classes carry traffic at every
    // fixture SF (the events timeline spans Jan 13 – Feb 13; [[ReadTime]]
    // predates it and would leave the marker/purge branches dead).
    val compactTs = "2024-02-05 00:00:00"
    val grace = "2024-01-28 00:00:00"
    // epoch ms of compactTs, computed once driver-side (NTZ values are
    // interpreted as UTC by Tables.epochMs; session tz is pinned UTC)
    val compactMs = java.time.Instant.parse("2024-02-05T00:00:00Z")
      .getEpochSecond * 1000L
    Lww.latest(cellTable(s, dir), Seq("user_id", "event_type"),
        Seq(col("_writetime").desc, col("event_id").desc))
      .withColumn("state",
        when(col("_ttl_expires") > lit(compactTs).cast("timestamp_ntz"), lit("live"))
          .when(col("_ttl_expires") >= lit(grace).cast("timestamp_ntz"),
            lit("expired_marker"))
          .otherwise(lit("purged")))
      .filter(col("state") =!= "purged")
      .select(col("user_id"), col("event_type"), col("state"),
        when(col("state") === "live", col("value")).as("value"),
        // the ms delta is exact in double below 2^53; the division
        // truncates via the long cast, matching DuckDB's epoch // 1000
        when(col("state") === "live",
          floor((Tables.epochMs(col("_ttl_expires")) - lit(compactMs)) / lit(1000L))
            .cast("long")).as("ttl_remaining_s"))
      .orderBy("user_id", "event_type")
  }

  /** Point-in-time snapshot read — SELECT ... "as of T" over the
    * persisted cell store: only cells written at or before T exist,
    * LWW resolves among THOSE, and TTL expiry is evaluated at T (a
    * cell expired by T acts as a tombstone at T even if a later read
    * time would long have purged it). The consistency-point read a
    * repair/debug workflow does against a wide-column store. */
  private val snapPaths =
    new graft.core.BuildOnce[String, String]

  private def snapPath(s: SparkSession, dir: String): String =
    snapPaths.getOrElseUpdate(dir, {
      val p = RunId.scratchKeyed("cell_store/events_cells_snap", dir)
      cellTable(s, dir)
        .repartition(col("user_id"))
        .sortWithinPartitions("user_id", "event_type", "_writetime")
        .write.mode("overwrite").parquet(p)
      p
    })

  /** Consistency-point LWW state of the stored cell layout at `ts`:
    * newest write ≤ ts per PK, TTL-expired cells invisible. Shared by
    * [[scanSnapshot]] and [[scanSnapshotDiff]]. */
  private def snapshotStateAt(s: SparkSession, dir: String, ts: String): DataFrame = {
    val stored = s.read.parquet(snapPath(s, dir))
      .filter(col("_writetime") <= unix_micros(lit(ts).cast("timestamp")))
    Lww.latest(stored, Seq("user_id", "event_type"),
        Seq(col("_writetime").desc, col("event_id").desc))
      .filter(col("_ttl_expires") > lit(ts).cast("timestamp_ntz"))
      .select(col("user_id"), col("event_type"), col("value"), col("_writetime"))
  }

  def scanSnapshot(s: SparkSession, dir: String): DataFrame =
    snapshotStateAt(s, dir, "2024-01-10 00:00:00")
      .orderBy("user_id", "event_type")

  /** Snapshot CHANGELOG — the incremental-consumer read between two
    * consistency points (what a downstream sync pulls instead of a
    * full re-export; the Iceberg/Delta changelog pattern applied to
    * the wide-column snapshot): per PK, the LWW state at T1 vs T2
    * full-outer joined and classified inserted / updated / deleted —
    * a "deleted" here is a cell whose TTL expired in the window with
    * no newer write, exactly the class a full-state copy silently
    * misses. Scale shape: two filtered LWW passes over ONE stored
    * sorted layout + a PK-keyed join — cost ∝ the keyspace, output ∝
    * the churn. */
  def scanSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val a = snapshotStateAt(s, dir, "2024-01-10 00:00:00")
      .select(col("user_id"), col("event_type"),
        col("value").as("old_value"), col("_writetime").as("old_wt"))
    val b = snapshotStateAt(s, dir, "2024-01-20 00:00:00")
      .select(col("user_id"), col("event_type"),
        col("value").as("new_value"), col("_writetime").as("new_wt"))
    a.join(b, Seq("user_id", "event_type"), "full_outer")
      .withColumn("change",
        when(col("old_wt").isNull, "inserted")
          .when(col("new_wt").isNull, "deleted")
          .when(col("new_wt") =!= col("old_wt"), "updated"))
      .filter(col("change").isNotNull)
      .select("user_id", "event_type", "change",
        "old_value", "new_value", "old_wt", "new_wt")
      .orderBy("user_id", "event_type")
  }

  /** Native MapType column round-tripped through parquet: the CQL
    * `map<text,int>` mapping. Built from the props JSON's `k` field +
    * a second entry, STORED as a real MapType column, read back and
    * queried with map functions — not a map assembled inline from
    * scalars. Extraction is get_json_object('$.k') — the SAME
    * single-field semantics the oracle's regexp uses — rather than a
    * whole-map from_json, whose PERMISSIVE mode would silently yield a
    * NULL map (and a NULL map_concat) for any row with a non-integer
    * value or extra key (ADVICE r2). */
  def fnMapStored(s: SparkSession, dir: String): DataFrame = {
    val path = RunId.scratch("collections/event_props_map")
    Tables.events(s, dir)
      .select(col("event_id"),
        map(
          lit("k"), get_json_object(col("props"), "$.k").cast("int"),
          lit("u"), col("user_id").cast("int")).as("m"))
      .write.mode("overwrite").parquet(path)
    s.read.parquet(path)
      .select(
        col("event_id"),
        array_join(array_sort(map_keys(col("m"))), ",").as("m_keys"),
        element_at(col("m"), "k").as("m_k"),
        element_at(col("m"), "u").as("m_u"),
        size(col("m")).as("m_size"))
      .orderBy("event_id")
  }

  /** Native ArrayType column round-tripped through parquet: the CQL
    * `list<text>` mapping. Token arrays are STORED, read back, and
    * filtered with collection predicates on the storage column. */
  def filterCollectionStored(s: SparkSession, dir: String): DataFrame = {
    val path = RunId.scratch("collections/doc_words")
    // `source` is stored but never queried — PlanSpec asserts the
    // read-side scan prunes it
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("words"), col("source"))
      .write.mode("overwrite").parquet(path)
    s.read.parquet(path)
      .filter(array_contains(col("words"), "the") && size(col("words")) >= 40)
      .select(
        col("doc_id"),
        size(col("words")).as("n_words"),
        element_at(col("words"), 1).as("first_word"))
      .orderBy("doc_id")
  }

  /** Nested UDT mapping (SURVEY §1.1): a two-level StructType column
    * STORED in parquet, read back, navigated with field access and
    * aggregated — the frozen-UDT round trip. */
  def udtStructStored(s: SparkSession, dir: String): DataFrame = {
    val path = RunId.scratch("collections/doc_meta_udt")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        struct(
          col("lang"),
          struct(
            col("n_chars"),
            size(split(col("text"), " ")).as("n_words")).as("stats")).as("meta"))
      .write.mode("overwrite").parquet(path)
    s.read.parquet(path)
      .filter(col("meta.stats.n_chars") > 150)
      .groupBy(col("meta.lang").as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("meta.stats.n_words").cast("long")).as("sum_words"))
      .orderBy("lang")
  }

  /** CQL `duration` type: (months, days, nanos) — calendar components
    * kept separate because months have no fixed length. Stored as the
    * SURVEY §1.1 struct mapping; arithmetic = calendar-aware interval
    * add onto the event timestamp. */
  def fnDuration(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", expr("CAST(get_json_object(props, '$.k') AS INT)"))
      .select(
        col("event_id"), col("ts"),
        struct(
          (col("k") % 3).as("months"),
          (col("k") % 11).as("days"),
          ((col("k") % 60).cast("long") * lit(1000000000L)).as("nanos")).as("dur"))
      .select(
        col("event_id"),
        col("dur.months").as("dur_months"),
        col("dur.days").as("dur_days"),
        col("dur.nanos").as("dur_nanos"),
        expr("ts + make_interval(0, dur.months, 0, dur.days, 0, 0, dur.nanos div 1000000000)")
          .as("ts_plus_dur"))
      .orderBy("event_id")

  /** CDC apply: merge a change batch onto a compacted snapshot.
    * Base = LWW-compacted state up to a cutoff (delete markers KEPT as
    * rows — compaction may not drop tombstones the change batch could
    * still lose to); changes = everything after. Because LWW is
    * associative, merging the compacted base with the raw batch equals
    * one merge over the full history — which is exactly the oracle.
    * This is the per-batch pattern of maintaining a 100 TB snapshot
    * from a CDC feed: each apply touches only |keys-in-batch| state. */
  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-14 00:00:00").cast("timestamp_ntz")
    val e = Tables.events(s, dir)
      .select("user_id", "event_id", "event_type", "value", "ts")
    val base = Lww.latest(e.filter(col("ts") <= cutoff),
      Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
    val changes = e.filter(col("ts") > cutoff)
    Lww.mergeTombstones(
        base.unionByName(changes), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc),
        isDelete = col("event_type") === "error")
      // provenance: did the change batch overwrite this key's state?
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        (col("ts") > cutoff).as("from_change_batch"))
      .orderBy("user_id")
  }

  /** Commitlog crash recovery — the write-durability half of the CDC
    * story ([[cdcApply]] consumes a change feed; this RECOVERS from
    * one). Cassandra acks a write once it is in the commitlog; the
    * memtable is volatile, and a flush records the commitlog position
    * it covered. After a crash the node rebuilds state as
    * sstables (flushed segments) + replay of every log segment at or
    * after the last covered position — the boundary SEGMENT is
    * replayed WHOLE, so some mutations apply twice and recovery is
    * only correct because LWW reconciliation is idempotent. Model:
    * segments = days, flush covered segments < day 13, crash loses
    * the memtable, replay re-applies day 13 onward — one day of
    * OVERLAP with the flushed snapshot (day 13 mutations ≤ the flush
    * cutoff below are in both inputs; their duplicates are
    * byte-identical rows, so the LWW pick is order-free). The
    * invariant the oracle states: recovered state ≡ LWW over the full
    * mutation history — a crash is invisible. `recovered_from_log`
    * marks keys whose newest state existed ONLY in the log (the
    * mutations a flush-only restore would have lost). One keyed
    * window over snapshot ∪ tail segments; at 100 TB the replay input
    * is the tail segments only, never the log history. */
  def commitlogReplay(s: SparkSession, dir: String): DataFrame = {
    val flushCut = lit("2024-01-14 00:00:00").cast("timestamp_ntz")
    val replayFrom = lit("2024-01-13 00:00:00").cast("timestamp_ntz")
    val log = Tables.events(s, dir)
      .select("user_id", "event_id", "event_type", "value", "ts")
    val flushed = Lww.latest(log.filter(col("ts") < flushCut),
      Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
    val replayed = log.filter(col("ts") >= replayFrom)
    Lww.latest(flushed.unionByName(replayed), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc))
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        (col("ts") >= flushCut).as("recovered_from_log"))
      .orderBy("user_id")
  }

  /** CAS merge kernel for [[casApply]]: base state LEFT JOIN attempts
    * on the key; an attempt applies iff it exists AND the CURRENT
    * row's event_type equals the attempt's expected_type (CQL
    * `UPDATE … IF col = expected`). A failed or absent attempt leaves
    * the base row byte-identical (property-tested in BatchCasSpec);
    * keys absent from base are never written (CQL: the condition is
    * false on a missing row). Column contract: base(user_id, event_id,
    * event_type, value), attempts(user_id, a_event_id, a_event_type,
    * a_value, expected_type). */
  private[graft] def casMerge(base: DataFrame, attempts: DataFrame): DataFrame = {
    val applied = col("a_event_id").isNotNull &&
      (col("event_type") === col("expected_type"))
    base.join(attempts, Seq("user_id"), "left")
      .select(
        col("user_id"),
        applied.as("cas_applied"),
        when(applied, col("a_event_id")).otherwise(col("event_id")).as("event_id"),
        when(applied, col("a_event_type")).otherwise(col("event_type")).as("event_type"),
        when(applied, col("a_value")).otherwise(col("value")).as("value"))
  }

  /** Lightweight transaction (CQL LWT conditional write — VERDICT r2
    * missing #1): apply each key's newest post-cutoff write iff the
    * current LWW state matches the write's expected value, else keep
    * the current state and report the failed CAS. The expected value
    * is carried by the attempt itself (here derived deterministically
    * from its event_id so the oracle can reproduce it). At 100 TB the
    * apply touches |keys-in-batch| state: one shuffle of each side on
    * the key, exactly like [[cdcApply]]. */
  def casApply(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-14 00:00:00").cast("timestamp_ntz")
    val e = Tables.events(s, dir)
      .select("user_id", "event_id", "event_type", "value", "ts")
    val base = Lww.latest(e.filter(col("ts") <= cutoff),
      Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
    val attempts = Lww.latest(e.filter(col("ts") > cutoff),
        Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
      .select(col("user_id"), col("event_id").as("a_event_id"),
        col("event_type").as("a_event_type"), col("value").as("a_value"),
        when(col("event_id") % 2 === 0, "click").otherwise("view")
          .as("expected_type"))
    casMerge(base, attempts)
      .select("user_id", "cas_applied", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  /** Conditional-BATCH merge kernel for [[batchCas]]: each user's
    * attempt set is one CQL logged BATCH with IF conditions — all
    * statements on ONE partition (user_id), per-row condition
    * "target row exists AND a_value > current value" (the monotonic
    * guard `UPDATE … IF value < ?`), and the batch applies
    * ALL-OR-NOTHING: one failed condition anywhere in the user's
    * batch leaves EVERY row of that user byte-identical, and an
    * attempt on a missing (user, type) row fails the whole batch
    * without creating anything (the condition is false on a missing
    * row). Column contract: base(user_id, event_type, event_id,
    * value), attempts(user_id, event_type, a_event_id, a_value).
    * Scale shape: one shuffle of each side on (user_id, event_type)
    * for the condition join, one user-keyed aggregate over the
    * attempt relation (batch-sized, not corpus-sized), one key join
    * back — the [[casMerge]] class with a bool_and between. */
  private[graft] def batchCasMerge(base: DataFrame,
      attempts: DataFrame): DataFrame = {
    val checked = attempts.join(
        base.select(col("user_id"), col("event_type"),
          col("event_id").as("b_event_id"), col("value").as("b_value")),
        Seq("user_id", "event_type"), "left")
      .withColumn("cond_ok",
        col("b_event_id").isNotNull && (col("a_value") > col("b_value")))
    val perUser = checked.groupBy("user_id")
      .agg(bool_and(col("cond_ok")).as("batch_applied"))
    val applied = coalesce(col("batch_applied"), lit(false))
    base.join(checked.select("user_id", "event_type", "a_event_id", "a_value"),
        Seq("user_id", "event_type"), "left")
      .join(perUser, Seq("user_id"), "left")
      .select(
        col("user_id"), col("event_type"),
        applied.as("batch_applied"),
        (applied && col("a_event_id").isNotNull).as("row_written"),
        when(applied && col("a_event_id").isNotNull, col("a_event_id"))
          .otherwise(col("event_id")).as("event_id"),
        when(applied && col("a_event_id").isNotNull, col("a_value"))
          .otherwise(col("value")).as("value"))
  }

  /** CQL conditional BATCH (logged BATCH + LWT — VERDICT r12 missing
    * #4, composing [[casApply]]'s condition gate with [[batchApply]]'s
    * all-or-nothing apply): the newest post-cutoff write per
    * (user, event_type) forms the user's batch; the whole batch
    * applies iff EVERY row's monotonic condition holds against the
    * current LWW state. Failed batches are pure no-ops — the oracle
    * states the postcondition row-for-row, so this face is
    * hash-exact; BatchCasSpec carries the no-op/missing-row/replay
    * properties on planted fixtures. */
  def batchCas(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-14 00:00:00").cast("timestamp_ntz")
    val e = Tables.events(s, dir)
      .select("user_id", "event_id", "event_type", "value", "ts")
    val base = Lww.latest(e.filter(col("ts") <= cutoff),
        Seq("user_id", "event_type"), Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_type", "event_id", "value")
    val attempts = Lww.latest(e.filter(col("ts") > cutoff),
        Seq("user_id", "event_type"), Seq(col("ts").desc, col("event_id").desc))
      .select(col("user_id"), col("event_type"),
        col("event_id").as("a_event_id"), col("value").as("a_value"))
    batchCasMerge(base, attempts)
      .orderBy("user_id", "event_type")
  }

  /** Logged-BATCH write path for [[batchApply]]: append the batch's
    * rows to BOTH engine tables (per-user and per-type layouts), THEN
    * append the commit marker. Readers gate on the marker, so a crash
    * between the table writes (modeled by `crashBetweenWrites`) leaves
    * the torn batch INVISIBLE rather than half-applied — the logged
    * batch guarantee. */
  private[graft] def applyBatches(changes: DataFrame, root: String,
      crashBetweenWrites: Boolean = false): Unit = {
    // overwrite, not append: a retry after a crash (or a racing
    // duplicate build on the same root) must converge to one copy of
    // each row, never double the tables (ADVICE r3). The engine
    // analogue is batch-log REPLAY being idempotent per batch.
    changes.repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts")
      .write.mode("overwrite").parquet(s"$root/by_user")
    if (crashBetweenWrites) return
    changes.repartition(col("event_type"))
      .sortWithinPartitions("event_type", "ts")
      .write.mode("overwrite").parquet(s"$root/by_type")
    changes.select("batch_id").distinct()
      .write.mode("overwrite").parquet(s"$root/commits")
  }

  /** Committed-read: rows of `table` whose batch_id has a commit
    * marker. The marker relation is one row per batch — tiny at any
    * scale — and AQE broadcasts the semi-join at runtime (unhinted:
    * it is an aggregate, see the PlanSpec broadcast guard). */
  private[graft] def readCommitted(s: SparkSession, root: String,
      table: String): DataFrame = {
    // A crash before the marker write leaves no commits dir at all —
    // that state must read as "no batch committed", not an error.
    val commitsPath = new org.apache.hadoop.fs.Path(s"$root/commits")
    val fs = commitsPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val commits =
      if (fs.exists(commitsPath)) s.read.parquet(commitsPath.toString)
      else s.emptyDataFrame.withColumn("batch_id", lit(0L)).filter(lit(false))
    s.read.parquet(s"$root/$table")
      .join(commits, Seq("batch_id"), "left_semi")
  }

  private val batchApplied =
    new graft.core.BuildOnce[String, String]

  /** CQL logged `BATCH` (multi-table atomic apply — VERDICT r2 missing
    * #2): the change feed is grouped into batches (batch_id =
    * event_id % 50), each applied all-or-nothing to two engine tables
    * via [[applyBatches]]; the query then audits both committed views
    * per batch. In the non-crash path every batch commits, so the
    * oracle is a plain aggregation over the fixture — the crash path
    * is covered by BatchCasSpec's kill-between-writes test. */
  def batchApply(s: SparkSession, dir: String): DataFrame = {
    val root = batchApplied.getOrElseUpdate(dir, {
      val r = RunId.scratch(
        "batch_apply/" + dir.replaceAll("[^A-Za-z0-9]", "_"))
      applyBatches(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), col("ts"), (col("event_id") % 50).as("batch_id")),
        r)
      r
    })
    val byUser = readCommitted(s, root, "by_user")
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_user_rows"),
        min("event_id").as("min_event_id"),
        max("event_id").as("max_event_id"))
    val byType = readCommitted(s, root, "by_type")
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_type_rows"))
    byUser.join(byType, "batch_id").orderBy("batch_id")
  }

  /** CQL STATIC columns: a static cell belongs to the PARTITION
    * (user_id), not the clustering row — every clustering row of the
    * partition reads the same static value, the static cell is
    * LWW-merged independently of the regular cells, and a partition
    * holding ONLY a static cell still surfaces as one row with null
    * clustering columns (Cassandra's static-only row).
    *
    * Model on events: 'signup' writes are the static column
    * (s_val, s_writetime); the other event types are regular
    * clustering rows, windowed so some partitions are static-only.
    *
    * Scale shape: both LWW merges shuffle once on user_id (the
    * regular one on (user_id, event_type) — a superset key the same
    * exchange serves); the static side is user-domain bounded, the
    * visibility join and the static-only anti join both key on
    * user_id. No window over event volume survives the merges. */
  def staticCells(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val winLo = lit("2024-01-14 00:00:00").cast("timestamp_ntz")
    val winHi = lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    val static = Lww.latest(
        ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("value").as("s_val"),
            unix_micros(col("ts").cast("timestamp")).as("s_writetime"),
            col("event_id")),
        Seq("user_id"), Seq(col("s_writetime").desc, col("event_id").desc))
      .select("user_id", "s_val", "s_writetime")
    val regular = Lww.latest(
        ev.filter(col("event_type") =!= "signup" &&
            col("ts") >= winLo && col("ts") < winHi)
          .select(col("user_id"), col("event_type"), col("value"),
            unix_micros(col("ts").cast("timestamp")).as("_writetime"),
            col("event_id")),
        Seq("user_id", "event_type"),
        Seq(col("_writetime").desc, col("event_id").desc))
      .select("user_id", "event_type", "value", "_writetime")
    val withStatic = regular.join(static, Seq("user_id"), "left")
      .select("user_id", "event_type", "value", "_writetime", "s_val", "s_writetime")
    val staticOnly = static
      .join(regular.select("user_id"), Seq("user_id"), "left_anti")
      .select(col("user_id"),
        lit(null).cast("string").as("event_type"),
        lit(null).cast("double").as("value"),
        lit(null).cast("long").as("_writetime"),
        col("s_val"), col("s_writetime"))
    withStatic.unionByName(staticOnly)
      .orderBy(col("user_id"), col("event_type").asc_nulls_last)
  }

  /** Range tombstones: a CQL `DELETE … WHERE pk = ? AND ck <= ?`
    * writes ONE marker that hides every version in the clustering
    * range with an OLDER writetime — the version never has to exist
    * when the delete lands. Model on events: each 'error' event is a
    * range tombstone for its user hiding versions with value ≤ the
    * error's value written before it; the surviving versions then
    * LWW-merge per (user, event_type) as usual — Cassandra applies
    * tombstones during merge, so a hidden newest version does NOT
    * resurrect older ones it was shadowing (they are hidden by the
    * same range or win the merge on their own).
    *
    * Scale shape: coverage is a STAIRCASE lookup, not a per-version
    * scan of the partition's tombstone list. A version is hidden iff
    * max(del_wt | v_hide ≥ value) > writetime, and that max is a
    * running aggregate once tombstones and versions share one
    * descending-value order: union both, sort per user by (value
    * DESC, tombstones-first), carry `max(del_wt)` over the prefix —
    * ONE window over ONE user-keyed sort, O(n log n) regardless of
    * how many range deletes a partition has accumulated. The first
    * form (per-user collect_list + row-local exists()) was
    * O(versions × tombstones/partition): fine under Cassandra's
    * bounded-markers assumption, but the ×100 fixture densifies
    * per-user history 100× and measured 53 s vs ~8 s for this shape —
    * and a real cluster's tombstone_failure_threshold exists exactly
    * because partitions violate that assumption in practice. */
  def tombstoneRange(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val tombs = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("value").as("v"),
        unix_micros(col("ts").cast("timestamp")).as("del_wt"),
        lit(0).as("kind"),
        lit(null).cast("string").as("event_type"),
        lit(null).cast("long").as("_writetime"),
        lit(null).cast("long").as("event_id"))
    val versions = ev.filter(col("event_type") =!= "error")
      .select(col("user_id"), col("value").as("v"),
        lit(null).cast("long").as("del_wt"), lit(1).as("kind"),
        col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("_writetime"),
        col("event_id"))
    // kind asc puts equal-value tombstones BEFORE the versions they
    // cover (the ≥ of the range); max over the prefix is insensitive
    // to order within ties, so the window is layout-deterministic.
    val w = Window.partitionBy("user_id")
      .orderBy(col("v").desc, col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val visible = tombs.unionByName(versions)
      .withColumn("cover_wt",
        max(when(col("kind") === 0, col("del_wt"))).over(w))
      .filter(col("kind") === 1 &&
        (col("cover_wt").isNull || col("cover_wt") <= col("_writetime")))
      .select(col("user_id"), col("event_type"), col("v").as("value"),
        col("_writetime"), col("event_id"))
    Lww.latest(visible, Seq("user_id", "event_type"),
        Seq(col("_writetime").desc, col("event_id").desc))
      .select("user_id", "event_type", "value", "_writetime")
      .orderBy("user_id", "event_type")
  }

  /** Cassandra counter internals — the sharded CRDT behind
    * `counter` columns (what [[Aggregates.aggCounter]]'s plain sum
    * abstracts away): each replica-local SHARD carries (clock, local
    * running total), a local increment bumps the shard's clock and
    * total, and the counter's value is the per-(key, node) max-clock
    * shard summed across nodes — so replicas exchange STATES, never
    * deltas, and replays/stale copies merge idempotently. Model on
    * events: node = event_id % 3, shard clock = (epoch µs, event_id),
    * shard total = the node's running decimal sum; replicas B and C
    * hold stale prefixes of the shard streams (cut at 01-20 / 01-10).
    * Merge = max_by over the three replica snapshots per (key, node),
    * then one sum per key, with staleness accounting (how many
    * replica copies were behind the merged clock).
    *
    * Scale shape: one keyed window for the running totals (the write
    * path), then everything is (key, node)-domain aggregates — the
    * snapshots, the merge and the per-key sum all ride map-side
    * combine; nothing is event-volume-sized past the first window. */
  def counterCrdt(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .select(col("user_id"), pmod(col("event_id"), lit(3)).as("node"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id").as("eid"), Num.d2(col("value")).as("inc"), col("ts"))
    val wRun = Window.partitionBy("user_id", "node").orderBy("us", "eid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val states = base.withColumn("cnt", sum("inc").over(wRun))
    // All three replica snapshots in ONE aggregate over the shard
    // stream (conditional max_by FILTER per replica cut) — a
    // per-replica groupBy would re-run the running-total window once
    // per replica (measured 9.4 s vs 5.4 s at sf0.1). The complete
    // replica's snapshot (sa) is by construction the max-clock state,
    // so it IS the merge winner; the oracle computes the general
    // cross-replica max and lands on the same rows.
    val snaps = states.groupBy("user_id", "node").agg(
      max_by(struct(col("us"), col("eid"), col("cnt")),
        struct(col("us"), col("eid"))).as("sa"),
      expr("""max_by(struct(us, eid, cnt), struct(us, eid))
              FILTER (WHERE ts < CAST('2024-01-20 00:00:00' AS TIMESTAMP_NTZ))""")
        .as("sb"),
      expr("""max_by(struct(us, eid, cnt), struct(us, eid))
              FILTER (WHERE ts < CAST('2024-01-10 00:00:00' AS TIMESTAMP_NTZ))""")
        .as("sc"))
    // a stale COPY is a present snapshot strictly behind the merged
    // clock; a replica holding no shard at all is absent, not stale
    // (matches the union-of-snapshots formulation).
    def staleOf(x: String) = when(col(x).isNotNull &&
      (col(s"$x.us") < col("sa.us") ||
        (col(s"$x.us") === col("sa.us") && col(s"$x.eid") < col("sa.eid"))),
      1L).otherwise(0L)
    snaps
      .select(col("user_id"), col("sa.cnt").as("mcnt"),
        (staleOf("sb") + staleOf("sc")).as("stale"))
      .groupBy("user_id")
      .agg(
        round(sum("mcnt"), 2).cast("double").as("counter_value"),
        count(lit(1)).cast("long").as("n_nodes"),
        sum("stale").cast("long").as("n_stale_copies"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "counter_crdt" -> (counterCrdt _),
    "static_cells" -> (staticCells _),
    "tombstone_range" -> (tombstoneRange _),
    "cdc_apply" -> (cdcApply _),
    "commitlog_replay" -> (commitlogReplay _),
    "cas_apply" -> (casApply _),
    "batch_apply" -> (batchApply _),
    "batch_cas" -> (batchCas _),
    "sink_cell_store" -> (sinkCellStore _),
    "tombstone_merge" -> (tombstoneMerge _),
    "compact_generations" -> (compactGenerations _),
    "ttl_compact" -> (ttlCompact _),
    "compact_stcs" -> (compactStcs _),
    "compact_ucs" -> (compactUcs _),
    "compact_twcs" -> (compactTwcs _),
    "compact_lcs" -> (compactLcs _),
    "scan_snapshot" -> (scanSnapshot _),
    "scan_snapshot_diff" -> (scanSnapshotDiff _),
    "fn_map_stored" -> (fnMapStored _),
    "filter_collection_stored" -> (filterCollectionStored _),
    "udt_struct_stored" -> (udtStructStored _),
    "fn_duration" -> (fnDuration _)
  )

  // One replica-snapshot block of the counter_crdt oracle: the
  // max-clock shard state per (key, node) visible to that replica.
  private def crdtSnap(tag: String, cut: Option[String]): String = s"""
      SELECT user_id, node, '$tag' AS replica, us, eid, cnt FROM (
        SELECT user_id, node, us, eid, cnt,
          ROW_NUMBER() OVER (PARTITION BY user_id, node
                             ORDER BY us DESC, eid DESC) AS rn
        FROM states${cut.map(c => s" WHERE ts < TIMESTAMP '$c'").getOrElse("")})
      WHERE rn = 1"""

  val oracles: Map[String, String] = Map(
    // same shard/merge recurrence: running decimal shard totals, three
    // replica prefix snapshots, max-clock merge per (key, node),
    // per-key sum + staleness accounting
    "counter_crdt" -> s"""
      WITH base AS (
        SELECT user_id, event_id % 3 AS node, epoch_us(ts) AS us,
               event_id AS eid, CAST(value AS DECIMAL(18,2)) AS inc, ts
        FROM events),
      states AS (
        SELECT *, SUM(inc) OVER (PARTITION BY user_id, node
          ORDER BY us, eid
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
        FROM base),
      alls AS (${Seq(
        crdtSnap("a", None),
        crdtSnap("b", Some("2024-01-20 00:00:00")),
        crdtSnap("c", Some("2024-01-10 00:00:00"))).mkString(" UNION ALL ")}),
      merged AS (
        SELECT user_id, node, us AS mus, eid AS meid, cnt AS mcnt FROM (
          SELECT a.*, ROW_NUMBER() OVER (PARTITION BY user_id, node
                                         ORDER BY us DESC, eid DESC) AS rn
          FROM alls a) WHERE rn = 1),
      pernode AS (
        SELECT a.user_id, a.node, m.mcnt,
          CAST(SUM(CASE WHEN (a.us, a.eid) < (m.mus, m.meid)
                        THEN 1 ELSE 0 END) AS BIGINT) AS stale
        FROM alls a JOIN merged m
          ON a.user_id = m.user_id AND a.node = m.node
        GROUP BY a.user_id, a.node, m.mcnt)
      SELECT user_id,
        CAST(ROUND(SUM(mcnt), 2) AS DOUBLE) AS counter_value,
        CAST(count(*) AS BIGINT) AS n_nodes,
        CAST(SUM(stale) AS BIGINT) AS n_stale_copies
      FROM pernode GROUP BY user_id ORDER BY user_id""",
    "tombstone_range" -> """
      WITH vis AS (
        SELECT user_id, event_type, value, epoch_us(ts) AS _writetime,
               event_id
        FROM events v
        WHERE event_type <> 'error'
          AND NOT EXISTS (
            SELECT 1 FROM events d
            WHERE d.event_type = 'error' AND d.user_id = v.user_id
              AND d.value >= v.value AND epoch_us(d.ts) > epoch_us(v.ts))),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
          ORDER BY _writetime DESC, event_id DESC) AS rn
        FROM vis)
      SELECT user_id, event_type, value, _writetime
      FROM ranked WHERE rn = 1
      ORDER BY user_id, event_type""",
    "static_cells" -> """
      WITH s0 AS (
        SELECT user_id, value AS s_val, epoch_us(ts) AS s_writetime,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'signup'),
      s AS (SELECT user_id, s_val, s_writetime FROM s0 WHERE rn = 1),
      r0 AS (
        SELECT user_id, event_type, value, epoch_us(ts) AS _writetime,
               row_number() OVER (PARTITION BY user_id, event_type
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events WHERE event_type <> 'signup'
          AND ts >= TIMESTAMP '2024-01-14' AND ts < TIMESTAMP '2024-01-15'),
      r AS (SELECT user_id, event_type, value, _writetime FROM r0 WHERE rn = 1)
      SELECT r.user_id, r.event_type, r.value, r._writetime,
             s.s_val, s.s_writetime
      FROM r LEFT JOIN s USING (user_id)
      UNION ALL
      SELECT s.user_id, NULL, NULL, NULL, s.s_val, s.s_writetime
      FROM s WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.user_id = s.user_id)
      ORDER BY user_id, event_type NULLS LAST""",
    "cas_apply" -> """
      WITH base AS (
        SELECT user_id, event_id, event_type, value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts <= TIMESTAMP '2024-01-14 00:00:00') t
        WHERE rn = 1),
      att AS (
        SELECT user_id, event_id AS a_event_id, event_type AS a_event_type,
               value AS a_value,
               CASE WHEN event_id % 2 = 0 THEN 'click' ELSE 'view' END
                 AS expected_type
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts > TIMESTAMP '2024-01-14 00:00:00') t
        WHERE rn = 1)
      SELECT b.user_id,
        (a.a_event_id IS NOT NULL AND b.event_type = a.expected_type)
          AS cas_applied,
        CASE WHEN a.a_event_id IS NOT NULL AND b.event_type = a.expected_type
             THEN a.a_event_id ELSE b.event_id END AS event_id,
        CASE WHEN a.a_event_id IS NOT NULL AND b.event_type = a.expected_type
             THEN a.a_event_type ELSE b.event_type END AS event_type,
        CASE WHEN a.a_event_id IS NOT NULL AND b.event_type = a.expected_type
             THEN a.a_value ELSE b.value END AS value
      FROM base b LEFT JOIN att a USING (user_id)
      ORDER BY user_id""",
    "batch_cas" -> """
      WITH base AS (
        SELECT user_id, event_type, event_id, value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts <= TIMESTAMP '2024-01-14 00:00:00') t
        WHERE rn = 1),
      att AS (
        SELECT user_id, event_type, event_id AS a_event_id,
               value AS a_value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts > TIMESTAMP '2024-01-14 00:00:00') t
        WHERE rn = 1),
      checked AS (
        SELECT a.user_id, a.event_type, a.a_event_id, a.a_value,
               (b.event_id IS NOT NULL AND a.a_value > b.value) AS cond_ok
        FROM att a LEFT JOIN base b USING (user_id, event_type)),
      per_user AS (
        SELECT user_id, bool_and(cond_ok) AS batch_applied
        FROM checked GROUP BY user_id)
      SELECT b.user_id, b.event_type,
        COALESCE(p.batch_applied, FALSE) AS batch_applied,
        (COALESCE(p.batch_applied, FALSE) AND c.a_event_id IS NOT NULL)
          AS row_written,
        CASE WHEN COALESCE(p.batch_applied, FALSE) AND c.a_event_id IS NOT NULL
             THEN c.a_event_id ELSE b.event_id END AS event_id,
        CASE WHEN COALESCE(p.batch_applied, FALSE) AND c.a_event_id IS NOT NULL
             THEN c.a_value ELSE b.value END AS value
      FROM base b
      LEFT JOIN checked c USING (user_id, event_type)
      LEFT JOIN per_user p USING (user_id)
      ORDER BY user_id, event_type""",
    "batch_apply" -> """
      SELECT CAST(event_id % 50 AS BIGINT) AS batch_id,
        COUNT(*) AS n_user_rows,
        MIN(event_id) AS min_event_id,
        MAX(event_id) AS max_event_id,
        COUNT(*) AS n_type_rows
      FROM events GROUP BY 1 ORDER BY 1""",
    "cdc_apply" -> """
      SELECT user_id, event_id, event_type, value,
        ts > TIMESTAMP '2024-01-14 00:00:00' AS from_change_batch
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1 AND event_type <> 'error'
      ORDER BY user_id""",
    // the recovery invariant IS the oracle: flushed snapshot + tail
    // replay must equal LWW over the full mutation history
    "commitlog_replay" -> """
      SELECT user_id, event_id, event_type, value,
        ts >= TIMESTAMP '2024-01-14 00:00:00' AS recovered_from_log
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1
      ORDER BY user_id""",
    "sink_cell_store" -> s"""
      SELECT user_id, event_type, value, _writetime FROM (
        SELECT user_id, event_type, value,
          epoch_us(ts) AS _writetime,
          ts + to_days(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) % 14)
            AS ttl_expires,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1 AND ttl_expires > TIMESTAMP '$ReadTime'
      ORDER BY user_id, event_type""",
    "compact_ucs" -> """
      WITH ss AS (
        SELECT CAST(ts AS DATE) AS w_day,
               event_id % 4 AS m,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM events GROUP BY 1, 2),
      t AS (
        SELECT *,
          CAST(length(CAST(n_rows AS VARCHAR)) - 1 AS BIGINT) AS level
        FROM ss),
      p AS (
        SELECT *,
          CAST(CASE WHEN level <= 1 THEN 2 ELSE -8 END AS BIGINT) AS w,
          CASE WHEN level <= 1 THEN 'tiered' ELSE 'leveled' END AS mode,
          CAST(CASE WHEN level <= 1 THEN 4 ELSE 2 END AS BIGINT) AS threshold
        FROM t),
      c AS (
        SELECT *,
          CAST(count(*) OVER (PARTITION BY level) AS BIGINT) AS level_tables
        FROM p),
      d AS (SELECT *, level_tables >= threshold AS candidate FROM c),
      mc AS (
        SELECT min(CASE WHEN candidate THEN level END) AS chosen_level
        FROM d)
      SELECT w_day, m, n_rows, level, w, mode, level_tables, threshold,
        candidate,
        coalesce(candidate AND level = mc.chosen_level, false) AS chosen
      FROM d, mc ORDER BY w_day, m""",
    "compact_stcs" -> """
      WITH ss AS (
        SELECT length(CAST(event_id AS VARCHAR)) AS d,
               event_id % 4 AS m,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM events GROUP BY 1, 2),
      t AS (
        SELECT *, length(CAST(n_rows AS VARCHAR)) AS tier FROM ss),
      w AS (
        SELECT d, m, n_rows, tier,
               CAST(count(*) OVER (PARTITION BY tier) AS BIGINT)
                 AS tier_tables,
               CAST(sum(n_rows) OVER (PARTITION BY tier) AS BIGINT)
                 AS tier_rows
        FROM t),
      c AS (SELECT *, tier_tables >= 4 AS candidate FROM w),
      mc AS (
        SELECT min(CASE WHEN candidate THEN tier END) AS chosen_tier
        FROM c)
      SELECT d, m, n_rows, tier, tier_tables, tier_rows, candidate,
             coalesce(candidate AND tier = mc.chosen_tier, false) AS chosen
      FROM c, mc ORDER BY d, m""",
    "compact_lcs" -> """
      WITH mx AS (SELECT max(event_id) AS mx FROM events),
      l0 AS (
        SELECT CAST(0 AS BIGINT) AS level,
               CAST(event_id % 4 AS BIGINT) AS tbl,
               min(event_id) AS min_k, max(event_id) AS max_k,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM events GROUP BY 2),
      l1 AS (
        SELECT CAST(1 AS BIGINT) AS level,
               CAST((event_id * 8) // (mx + 1) AS BIGINT) AS tbl,
               min(event_id) AS min_k, max(event_id) AS max_k,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM events, mx GROUP BY 2),
      l2 AS (
        SELECT CAST(2 AS BIGINT) AS level,
               CAST((event_id * 32) // (mx + 1) AS BIGINT) AS tbl,
               min(event_id) AS min_k, max(event_id) AS max_k,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM events, mx GROUP BY 2),
      ss AS (SELECT * FROM l0 UNION ALL SELECT * FROM l1
             UNION ALL SELECT * FROM l2),
      t AS (
        SELECT *,
          CAST(sum(n_rows) OVER (PARTITION BY level) AS BIGINT) AS level_rows,
          CAST(CASE WHEN level = 1 THEN 2000
                    WHEN level = 2 THEN 20000 ELSE 0 END AS BIGINT)
            AS target_rows
        FROM ss),
      sp AS (
        SELECT min(min_k) AS l0_min, max(max_k) AS l0_max,
               CAST(count(*) AS BIGINT) AS l0_n
        FROM t WHERE level = 0),
      cand AS (
        SELECT min(min_k) AS c_min, min_by(max_k, min_k) AS c_max
        FROM t WHERE level = 1 AND level_rows > target_rows)
      SELECT level, tbl, min_k, max_k, n_rows, level_rows, target_rows,
        CASE WHEN level = 0 AND l0_n >= 4 THEN 'compact_to_l1'
             WHEN level = 1 AND level_rows > target_rows
                  AND min_k = c_min THEN 'promote_to_l2'
             WHEN level = 1 AND l0_n >= 4
                  AND max_k >= l0_min AND min_k <= l0_max THEN 'receive_l0'
             WHEN level = 2 AND c_min IS NOT NULL
                  AND max_k >= c_min AND min_k <= c_max
               THEN 'merge_with_promoted'
             ELSE 'none' END AS action
      FROM t, sp, cand ORDER BY level, tbl""",
    "compact_twcs" -> """
      WITH ss AS (
        SELECT CAST(ts AS DATE) AS w_day, event_id % 4 AS m,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM events GROUP BY 1, 2),
      cur AS (SELECT max(w_day) AS cur_day FROM ss),
      t AS (
        SELECT ss.*, ss.w_day = cur.cur_day AS is_current,
          CAST(count(*) OVER (PARTITION BY w_day) AS BIGINT) AS win_tables,
          CAST(length(CAST(n_rows AS VARCHAR)) AS BIGINT) AS tier,
          CAST(count(*) OVER (PARTITION BY w_day,
                 length(CAST(n_rows AS VARCHAR))) AS BIGINT) AS tier_tables
        FROM ss, cur),
      ch AS (
        SELECT min(tier) AS chosen_tier FROM t
        WHERE is_current AND tier_tables >= 4)
      SELECT w_day, m, n_rows, is_current,
        CASE WHEN NOT is_current AND win_tables > 1 THEN 'major'
             WHEN is_current AND coalesce(tier = ch.chosen_tier, false)
               THEN 'stcs'
             ELSE 'none' END AS action
      FROM t, ch ORDER BY w_day, m""",
    "ttl_compact" -> """
      WITH c AS (
        SELECT user_id, event_type, value, event_id, ts,
          ts + to_days(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) % 14)
            AS ttl_expires,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id, event_type,
        CASE WHEN ttl_expires > TIMESTAMP '2024-02-05 00:00:00'
             THEN 'live' ELSE 'expired_marker' END AS state,
        CASE WHEN ttl_expires > TIMESTAMP '2024-02-05 00:00:00'
             THEN value END AS value,
        CASE WHEN ttl_expires > TIMESTAMP '2024-02-05 00:00:00'
             THEN (epoch_ms(ttl_expires) - epoch_ms(TIMESTAMP '2024-02-05 00:00:00')) // 1000
             END AS ttl_remaining_s
      FROM c
      WHERE rn = 1 AND ttl_expires >= TIMESTAMP '2024-01-28 00:00:00'
      ORDER BY user_id, event_type""",
    // The generation split is a partition of `events`, so the merged
    // LWW state equals the direct window over the whole table; the
    // gc_grace clause is the tombstone-purge postcondition.
    "compact_generations" -> """
      SELECT user_id, event_id, event_type, value,
        event_type = 'error' AS is_tombstone
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1
        AND NOT (event_type = 'error' AND ts < TIMESTAMP '2024-01-10 00:00:00')
      ORDER BY user_id""",
    // sink_cell_store's oracle with BOTH clocks pinned to T: writes
    // after T don't exist, TTL expiry is evaluated at T.
    // two consistency-point states (the scan_snapshot CTE at T1/T2),
    // full-outer on the PK, churn classified
    "scan_snapshot_diff" -> """
      WITH snap AS (
        SELECT user_id, event_type, value, event_id,
          epoch_us(ts) AS wt,
          ts + to_days(CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
                            AS INTEGER) % 14) AS ttl_expires
        FROM events),
      a AS (
        SELECT user_id, event_type, value AS old_value, wt AS old_wt FROM (
          SELECT user_id, event_type, value, wt, ttl_expires,
            ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY wt DESC, event_id DESC) AS rn2
          FROM snap
          WHERE wt <= epoch_us(TIMESTAMP '2024-01-10 00:00:00'))
        WHERE rn2 = 1 AND ttl_expires > TIMESTAMP '2024-01-10 00:00:00'),
      b AS (
        SELECT user_id, event_type, value AS new_value, wt AS new_wt FROM (
          SELECT user_id, event_type, value, wt, ttl_expires,
            ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY wt DESC, event_id DESC) AS rn2
          FROM snap
          WHERE wt <= epoch_us(TIMESTAMP '2024-01-20 00:00:00'))
        WHERE rn2 = 1 AND ttl_expires > TIMESTAMP '2024-01-20 00:00:00')
      SELECT COALESCE(a.user_id, b.user_id) AS user_id,
        COALESCE(a.event_type, b.event_type) AS event_type,
        CASE WHEN a.old_wt IS NULL THEN 'inserted'
             WHEN b.new_wt IS NULL THEN 'deleted'
             WHEN b.new_wt <> a.old_wt THEN 'updated' END AS change,
        a.old_value, b.new_value, a.old_wt, b.new_wt
      FROM a FULL OUTER JOIN b
        ON a.user_id = b.user_id AND a.event_type = b.event_type
      WHERE (CASE WHEN a.old_wt IS NULL THEN 'inserted'
                  WHEN b.new_wt IS NULL THEN 'deleted'
                  WHEN b.new_wt <> a.old_wt THEN 'updated' END) IS NOT NULL
      ORDER BY user_id, event_type""",
    "scan_snapshot" -> """
      SELECT user_id, event_type, value, _writetime FROM (
        SELECT user_id, event_type, value,
          epoch_us(ts) AS _writetime,
          ts + to_days(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) % 14)
            AS ttl_expires,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE epoch_us(ts) <= epoch_us(TIMESTAMP '2024-01-10 00:00:00')) t
      WHERE rn = 1 AND ttl_expires > TIMESTAMP '2024-01-10 00:00:00'
      ORDER BY user_id, event_type""",
    "tombstone_merge" -> """
      SELECT user_id, event_id, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1 AND event_type <> 'error'
      ORDER BY user_id""",
    "fn_map_stored" -> """
      SELECT event_id,
        'k,u' AS m_keys,
        CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS m_k,
        CAST(user_id AS INTEGER) AS m_u,
        2 AS m_size
      FROM events ORDER BY event_id""",
    "filter_collection_stored" -> """
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
        string_split(text, ' ')[1] AS first_word
      FROM documents
      WHERE list_contains(string_split(text, ' '), 'the')
        AND len(string_split(text, ' ')) >= 40
      ORDER BY doc_id""",
    "udt_struct_stored" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS sum_words
      FROM documents
      WHERE n_chars > 150
      GROUP BY lang ORDER BY lang""",
    "fn_duration" -> """
      SELECT event_id,
        CAST(k % 3 AS INTEGER) AS dur_months,
        CAST(k % 11 AS INTEGER) AS dur_days,
        CAST(k % 60 AS BIGINT) * 1000000000 AS dur_nanos,
        ts + to_months(k % 3) + to_days(k % 11) + to_seconds(k % 60) AS ts_plus_dur
      FROM (SELECT event_id, ts,
              CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k
            FROM events)
      ORDER BY event_id"""
  )
}
