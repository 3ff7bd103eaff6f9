package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text kernels for the LLM-pipeline operators (SURVEY.md §2.K):
  * tokenization, shingling, MinHash, SimHash, fingerprints. All pure
  * Column expressions built from codegen'd higher-order functions —
  * no UDFs — so they distribute trivially and stay in-row (no
  * shuffle) until the caller aggregates or joins.
  */
object Text {

  /** Whitespace tokens. */
  def words(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokens: word runs or single non-space symbols. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))

  /** k-gram word shingles of a token array (empty if too short).
    *
    * Built as arrays_zip of k shifted slices rather than per-element
    * element_at: the token array is then referenced k+1 times per ROW
    * instead of k times per ELEMENT, which matters because Catalyst's
    * CollapseProject may inline the (expensive) tokenizer expression
    * into each reference — measured 10× slower in the per-element
    * form. */
  def shingles(w: Column, k: Int): Column = {
    val n = size(w) - (k - 1)
    val zipped = arrays_zip((0 until k).map(j => slice(w, lit(j + 1), n)): _*)
    val gram = (s: Column) => concat_ws(" ", (0 until k).map(j => s.getField(j.toString)): _*)
    when(size(w) >= k, transform(zipped, gram))
      .otherwise(array().cast("array<string>"))
  }

  /** LSH band keys over a minhash signature: `bands` groups of
    * `rowsPerBand` coordinates hashed together. Docs sharing any band
    * key are candidate near-duplicates; at scale the self-join runs
    * per band key, never all-pairs. */
  def bandKeys(mh: Seq[Column], bands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until bands).map { b =>
      xxhash64((mh.slice(b * rowsPerBand, (b + 1) * rowsPerBand) :+ lit(b)): _*).as(s"band$b")
    }

  /** Rolling-hash document fingerprint: the minimum over 3-gram
    * shingle MD5s (single-window winnowing). */
  def fingerprint(w: Column): Column =
    array_min(transform(shingles(w, 3), x => md5(x)))

  import org.apache.spark.sql.DataFrame

  /** MinHash signature via explode + codegen'd hash aggregate: one
    * row per (doc, shingle), `k` seeded xxhash64 columns, min-reduced
    * per doc. One shuffle on the doc id; everything else is Tungsten
    * codegen — orders of magnitude faster than per-row interpreted
    * array lambdas, and the shape that scales (shuffle volume = docs ×
    * k longs, independent of document length). */
  def minhashSignature(docs: DataFrame, idCol: String, shCol: String, k: Int): DataFrame = {
    val exploded = docs.select(col(idCol), explode(col(shCol)).as("_shingle"))
    val aggs = (0 until k).map(j => min(xxhash64(col("_shingle"), lit(j))).as(s"mh$j"))
    exploded.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** 64-bit SimHash via explode + codegen'd hash aggregate.
    *
    * The naive form (64 `sum(when(bit_j, 1, -1))` agg columns) was the
    * round-1 bench's single biggest cost (~25 s at sf0.1): the 64-long
    * aggregation buffer blows past the codegen'd fast hash-map width.
    * Instead, pack four 16-bit set-bit counters per long — 16 agg
    * columns + one count — and reconstruct each bit's majority after
    * the aggregate: sum of ±1 over n rows is `2*cnt_set - n`, so
    * bit j is set iff `2*cnt_j > n`. The shingle array is capped at
    * 32 767 (via slice) HERE, which makes the packing worst-case
    * overflow-safe: each 16-bit field sums to ≤ 32 767 (no cross-field
    * carry) and the aggregate's long total is bounded by
    * 32 767·(2^48+2^32+2^16+1) < 2^63. The previous 65 535 cap was NOT
    * safe — a max-size doc could push the sum past Long.MaxValue and
    * ANSI mode would throw at runtime (ADVICE r2). The first ~32 k
    * shingles dominate any longer document's signature anyway. Same
    * scale shape as
    * [[minhashSignature]]: one shuffle on the doc id, shuffle volume =
    * docs × 17 longs. The declared dedup_simhash face uses the same
    * packed-counter shape over an md5 bit source
    * (Dedup.simhashSignatureMd5) so its oracle mirrors; THIS xxhash64
    * variant is the higher-throughput kernel for pipelines that don't
    * need a SQL twin, overflow-safety pinned by KernelSpec. */
  def simhashSignature(docs: DataFrame, idCol: String, shCol: String): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode(slice(col(shCol), 1, 32767)).as("_s"))
      .select(col(idCol), xxhash64(col("_s")).as("_h"))
    // p_g packs counters for bits 4g..4g+3 at 16-bit offsets.
    val packed = (0 until 16).map { g =>
      (0 until 4).map { i =>
        val bit = g * 4 + i
        shiftright(col("_h"), bit).bitwiseAND(lit(1L)) * lit(1L << (16 * i))
      }.reduce(_ + _).as(s"p$g")
    }
    val aggs = (0 until 16).map(g => sum(col(s"p$g")).as(s"p$g")) :+
      count(lit(1)).as("_n")
    val counts = exploded
      .select(col(idCol) +: packed: _*)
      .groupBy(idCol)
      .agg(aggs.head, aggs.tail: _*)
    val sim = (0 until 64).map { j =>
      val (g, i) = (j / 4, j % 4)
      val cnt = shiftright(col(s"p$g"), 16 * i).bitwiseAND(lit(0xffffL))
      when(cnt * 2 > col("_n"), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    counts.select(col(idCol), sim.as("sim"))
  }

  /** Exact token Jaccard similarity of two distinct-token arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))
}
