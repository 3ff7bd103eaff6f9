package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{RunId, Tables}

/** Deterministic sharded corpus writer — the training pipeline's last
  * mile (the webdataset / Megatron handoff): every document gets a
  * reproducible global position (pure function of (seed, doc_id) —
  * the shuffle_deterministic order), shards are fixed-size slices of
  * that order (`shard_id = floor((position−1)/shard_size)`), each
  * shard is written as ONE bounded parquet file, and a manifest row
  * per shard records (n_seqs, n_tokens, position span, content md5)
  * so a consumer can verify every shard it reads bit-for-bit.
  *
  * Scale shape: the global position is computed WITHOUT a global
  * window — phase 1 buckets rows by the first 16 bits of the order
  * key and collects the ≤65536 per-bucket counts (bounded at ANY
  * corpus size), phase 2 adds a per-bucket row_number to the
  * broadcast cumulative offsets (the shuffle_deterministic /
  * sample_token_budget discipline). The write is one shuffle keyed on
  * shard_id, so each shard lands in exactly one task and emits
  * exactly one file; shard COUNT grows with the corpus while shard
  * SIZE stays fixed — no single task, file, or driver structure grows
  * with the data. The manifest aggregate is per-shard (≤shard_size
  * rows per group) and its content md5 folds the per-doc md5s in
  * position order, so it is layout-independent and oracle-exact.
  */
object Shards extends QueryGroup {

  /** Documents per shard. Fixture-sized so sf0.01 yields 8 shards; at
    * production scale this is the "~100–500 MB per output file" knob
    * and changes nothing structural. */
  private val ShardSize = 64L
  private val Seed = "42"

  /** Per-doc surface riding the order computation: content hash and
    * whitespace token count (the packing currency of pack_sequences;
    * the manifest must be derivable from data alone, independent of
    * file layout). */
  private def ordered(s: SparkSession, dir: String): DataFrame =
    orderedFrom(s, Tables.documents(s, dir)
      .select(
        col("doc_id"),
        md5(coalesce(col("text"), lit(""))).as("doc_md5"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long")
          .as("n_tokens")))
      .drop("tok_start")

  /** The two-phase deterministic global order, generalized over any
    * (doc_id, doc_md5, n_tokens) relation (pipeline_pretrain runs it
    * on the curated survivor set). Emits BOTH the global position and
    * the global token prefix start — the second two-phase sum rides
    * the same ≤65536-bucket collect and the same per-bucket window,
    * so token-budget sharding costs no extra pass. */
  private[graft] def orderedFrom(s: SparkSession, base: DataFrame): DataFrame = {
    val sp = s; import sp.implicits._
    val bucketed = base
      .withColumn("skey",
        md5(concat_ws(":", lit(Seed), col("doc_id").cast("string"))))
      .withColumn("b", conv(substring(col("skey"), 1, 4), 16, 10).cast("int"))
    val counts = bucketed.groupBy("b")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .lazyZip(counts.map(_._2).scanLeft(0L)(_ + _))
      .lazyZip(counts.map(_._3).scanLeft(0L)(_ + _))
      .toSeq
    val byB = Window.partitionBy("b").orderBy("skey", "doc_id")
    bucketed
      .join(broadcast(offsets.toDF("b", "off", "tok_off")), "b")
      .withColumn("position",
        (col("off") + row_number().over(byB)).cast("long"))
      .withColumn("tok_start",
        (col("tok_off") +
          sum("n_tokens").over(byB.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)) - col("n_tokens")).cast("long"))
      .select("doc_id", "doc_md5", "n_tokens", "position", "tok_start")
  }

  private val shardRoots =
    new graft.core.BuildOnce[String, String]

  /** Build the sharded layout once per (JVM, dir): one directory per
    * shard_id, one data file per shard (each shard lives in exactly
    * one task of the shard_id shuffle). */
  private[graft] def shardRoot(s: SparkSession, dir: String): String =
    shardRoots.getOrElseUpdate(dir, {
      val p = RunId.scratchKeyed("shards/documents", dir)
      ordered(s, dir)
        .withColumn("shard_id",
          floor((col("position") - 1) / ShardSize).cast("long"))
        .repartition(col("shard_id"))
        .sortWithinPartitions("position")
        .write.mode("overwrite").partitionBy("shard_id").parquet(p)
      p
    })

  /** The manifest — read back from the WRITTEN shards (proving the
    * sink round-trip, the scan_snapshot discipline), one row per
    * shard with a position-ordered content fingerprint. */
  def sinkShards(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(shardRoot(s, dir))
      .withColumn("shard_id", col("shard_id").cast("long"))
      .groupBy("shard_id")
      .agg(
        count(lit(1)).cast("long").as("n_seqs"),
        sum("n_tokens").cast("long").as("n_tokens"),
        min("position").cast("long").as("first_pos"),
        max("position").cast("long").as("last_pos"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("position"), col("doc_md5")))),
            x => x.getField("doc_md5")),
          ",")).as("content_md5"))
      .orderBy("shard_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sink_shards" -> (sinkShards _)
  )

  val oracles: Map[String, String] = Map(
    // The two-phase bucketed rank must equal the plain global
    // ROW_NUMBER (the shuffle_deterministic contract), and the
    // manifest must match a direct computation over `documents` —
    // shard assignment, token totals and the position-ordered
    // content fingerprint all included.
    "sink_shards" -> s"""
      WITH r AS (
        SELECT doc_id,
               md5(coalesce(text, '')) AS doc_md5,
               CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
                 AS n_tokens,
               CAST(ROW_NUMBER() OVER (
                 ORDER BY md5('$Seed:' || CAST(doc_id AS VARCHAR)), doc_id)
                 AS BIGINT) AS position
        FROM documents),
      sh AS (
        SELECT *, CAST(floor((position - 1) / $ShardSize) AS BIGINT)
                    AS shard_id
        FROM r)
      SELECT shard_id,
             CAST(count(*) AS BIGINT) AS n_seqs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             CAST(min(position) AS BIGINT) AS first_pos,
             CAST(max(position) AS BIGINT) AS last_pos,
             md5(string_agg(doc_md5, ',' ORDER BY position)) AS content_md5
      FROM sh GROUP BY shard_id ORDER BY shard_id"""
  )
}
