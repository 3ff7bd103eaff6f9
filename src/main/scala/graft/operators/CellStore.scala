package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Lww, RunId, Tables}

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

  /** Native MapType column round-tripped through parquet: the CQL
    * `map<text,int>` mapping. Built from props JSON + a second entry,
    * STORED as a real MapType column, read back and queried with map
    * functions — not a map assembled inline from scalars. */
  def fnMapStored(s: SparkSession, dir: String): DataFrame = {
    val path = RunId.scratch("collections/event_props_map")
    Tables.events(s, dir)
      .select(col("event_id"),
        map_concat(
          from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.IntegerType)),
          map(lit("u"), col("user_id").cast("int"))).as("m"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_apply" -> (cdcApply _),
    "sink_cell_store" -> (sinkCellStore _),
    "tombstone_merge" -> (tombstoneMerge _),
    "fn_map_stored" -> (fnMapStored _),
    "filter_collection_stored" -> (filterCollectionStored _),
    "udt_struct_stored" -> (udtStructStored _),
    "fn_duration" -> (fnDuration _)
  )

  val oracles: Map[String, String] = Map(
    "cdc_apply" -> """
      SELECT user_id, event_id, event_type, value,
        ts > TIMESTAMP '2024-01-14 00:00:00' AS from_change_batch
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1 AND event_type <> 'error'
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
