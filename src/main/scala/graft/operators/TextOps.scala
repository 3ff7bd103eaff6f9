package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Num, Tables}
import graft.functions.Text

/** Text-analysis + dedup operators over `documents`
  * (SURVEY.md §2.K and the LLM-pipeline mandate).
  *
  * Everything row-local (tokenize, score, fingerprint) is a pure
  * Column expression; only the final statistics/dedup steps shuffle,
  * and then only on doc hashes or group keys — the 100 TB-safe shape.
  */
object TextOps extends QueryGroup {

  // ---- shared stage kernels (Scala Column + DuckDB SQL mirrors) ----
  // Single source of truth for the expressions that appear both in the
  // standalone stage operators and in the composed pipelineCuration:
  // a stage tweak (stop-word list, bucket width, regex) edits ONE
  // Scala builder and ONE SQL mirror, and pipeline + stage + oracles
  // stay in lockstep.

  private val StopWords = Seq("the", "a", "of")

  /** Normalization: lowercase, strip non-alphanumerics, collapse
    * whitespace, trim. */
  /** One fused native pass ([[graft.plans.CleanTextExpr]]) replacing
    * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))`
    * — three regex-engine scans become one character walk, output
    * bit-identical (the SQL mirror below still states the regex form
    * and the whole oracle suite stays hash-exact). */
  private[operators] def cleanCol(text: Column): Column =
    graft.plans.CleanTextExpr.clean(text)
  private[operators] def sqlClean(x: String): String =
    s"trim(regexp_replace(regexp_replace(lower($x), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** Stop-word count of a token array. */
  private def stopCountCol(w: Column): Column =
    size(filter(w, x => x.isin(StopWords.map(lit): _*)))
  private def sqlStopCount(w: String): String =
    s"len(list_filter($w, x -> x IN (${StopWords.map(s => s"'$s'").mkString(", ")})))"

  /** Composite keep-score over a token array:
    * saturating length factor × (1 − stop-word ratio). */
  private[operators] def qualityCol(w: Column): Column =
    least(lit(1.0), size(w).cast("double") / 100.0) *
      (lit(1.0) - stopCountCol(w).cast("double") / size(w))
  private[operators] def sqlQuality(w: String): String =
    s"least(1.0, CAST(len($w) AS DOUBLE) / 100.0) * " +
      s"(1.0 - CAST(${sqlStopCount(w)} AS DOUBLE) / len($w))"

  /** Content-hash split bucket: first 16 bits of md5 — stable under
    * re-shards, re-orders and re-runs. */
  private def bucketCol(c: Column): Column =
    conv(substring(md5(c), 1, 4), 16, 10).cast("int")
  private def sqlBucket(x: String): String =
    s"CAST(concat('0x', substring(md5($x), 1, 4)) AS INTEGER)"

  /** Exact dedup: duplicates planted by self-union, removed again by
    * content grouping with a DETERMINISTIC min-doc_id survivor (the
    * "first writer wins" convention). dropDuplicates("text") would
    * keep an arbitrary row per text, which only looked deterministic
    * while the fixture was dup-free — the oracle is now dup-aware and
    * correct at ANY scale factor, including sf0.1's 8 genuinely
    * duplicated texts (ADVICE r2). n_chars = length(text) is a
    * FIXTURES.md invariant, so min() over the group is exact. */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.unionByName(d.filter(col("doc_id") < 50))
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("n_chars")).as("n_chars"))
      .select(col("doc_id"), sha2(col("text"), 256).as("text_sha"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Scope-local dedup — the FineWeb finding (Penedo et al. 2024):
    * deduplicating each crawl snapshot/source INDEPENDENTLY beats
    * global dedup, because a passage repeated across scopes is
    * evidence of quality while a passage repeated within one scope is
    * boilerplate. The operator reports BOTH decisions side by side:
    * `kept_global` (min-doc_id survivor per text, the [[dedupExact]]
    * rule) vs `kept_scoped` (min-doc_id per (source, text)) — planted
    * cross-source copies (originals mirrored into a foreign source)
    * are dropped globally but KEPT scoped, which is exactly the
    * retention policy difference the report exists to audit. Both
    * decisions are window minimums over the text digest; the scoped
    * partition (source, digest) refines the global one (digest), so
    * Spark satisfies the second window with the FIRST window's
    * exchange — one shuffle total, text never shuffles (digest only).
    */
  def dedupScoped(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "source", "text")
    // mirrors at +2^40 — the engine's collision-proof planted-id
    // offset (dedup_semantic convention): a +1e6 offset collides with
    // natural ids one decade past the ×100 fixture, making the output
    // order non-total exactly when it matters
    val corpus = d.unionByName(
      d.filter(col("doc_id") < 40).select(
        (col("doc_id") + (1L << 40)).as("doc_id"),
        lit("src_mirror").as("source"), col("text")))
    corpus
      .withColumn("h", sha2(col("text"), 256))
      .withColumn("kept_global",
        col("doc_id") === min("doc_id").over(Window.partitionBy("h")))
      .withColumn("kept_scoped",
        col("doc_id") === min("doc_id").over(Window.partitionBy("source", "h")))
      .select("doc_id", "source", "kept_global", "kept_scoped")
      .orderBy("doc_id")
  }

  /** Per-language corpus statistics (quality-gate inputs). */
  def textStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), col("n_chars"), size(Text.words(col("text"))).as("n_words"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_words").cast("long")).as("sum_words"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 6).as("avg_chars"))
      .orderBy("lang")

  /** Language whitelist + length-window filter chain. */
  def textLangFilter(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("lang").isin("en", "de") && col("n_chars").between(100, 400))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** Token counting: whitespace tokens + BPE-ish regex tokens. */
  def textTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(Text.words(col("text"))).as("ws_tokens"),
        size(Text.regexTokens(col("text"))).as("re_tokens"),
        col("n_chars"))
      .orderBy("doc_id")

  /** Quality scoring: length, average word length, stopword ratio,
    * and a composite keep-score. */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val w = Text.words(col("text"))
    val nWords = size(w)
    val charSum = length(regexp_replace(col("text"), " ", ""))
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        round(charSum.cast("double") / nWords, 6).as("avg_word_len"),
        round(stopCountCol(w).cast("double") / nWords, 6).as("stop_ratio"),
        round(qualityCol(w), 6).as("quality_score"))
      .orderBy("doc_id")
  }

  /** Repetition-based quality gate — the Gopher-filter family's
    * repetition signals (duplicate-word fraction, top-word fraction,
    * duplicate-bigram fraction) plus the keep decision at fixed
    * thresholds. Machine-generated and boilerplate text shows up in
    * these counters before any language model does.
    *
    * Shape at scale: the two set-size metrics are row-local
    * (`array_distinct` on the token/shingle arrays — no shuffle); only
    * the top-word count needs the explode → (doc, word) partial-agg →
    * per-doc max path, whose post-combine shuffle volume is distinct
    * words per doc, not total words. */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val w = Text.words(col("text"))
    // Distinct counts via exploded two-level aggregates, NOT row-local
    // array_distinct: Spark's array_distinct has no hash fast-path for
    // string elements — it is a nested-loop O(n²) PER ROW, measured
    // 662 s at ×100 (first exposed when Bench stopped count-pruning
    // these columns). The exploded form partial-aggregates (doc, gram)
    // map-side, so the shuffle carries surviving distinct grams and
    // every step is linear; the word pass also yields the top-word
    // count that previously rode its own explode.
    val base = d.select(col("doc_id"), explode(w).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max("c").as("top_word_count"))
    val bg = d.select(col("doc_id"), explode(Text.shingles(w, 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"))
    base.join(bg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        round(lit(1.0) - col("n_distinct_words").cast("double") / col("n_words"), 6)
          .as("dup_word_frac"),
        round(col("top_word_count").cast("double") / col("n_words"), 6)
          .as("top_word_frac"),
        round(when(col("n_bigrams") > 0,
          lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams"))
          .otherwise(lit(0.0)), 6).as("dup_bigram_frac"))
      .withColumn("keep",
        col("dup_word_frac") <= 0.4 && col("top_word_frac") <= 0.2 &&
          col("dup_bigram_frac") <= 0.2)
      .orderBy("doc_id")
  }

  /** Temperature-based mixture sampling — the multinomial source/
    * language re-weighting step of multilingual corpus construction:
    * class weights `n^α` (α = 0.7) flatten the raw distribution, so
    * rare classes keep everything (p capped at 1) while the majority
    * class is downsampled toward the target budget (half the corpus).
    * Membership is content-hash thresholded (`bucketCol`), so the
    * sample is stable under re-shards, re-orders and re-runs — the
    * same determinism contract as text_split.
    *
    * Shape at scale: class stats are one partial-agg groupBy whose
    * output is bounded by the class DOMAIN; the per-class thresholds
    * are collected (bounded-by-construction, same class as the langid
    * profile) and applied as a row-local CASE — the corpus itself is
    * touched by exactly one scan + filter, no join, no second shuffle. */
  def sampleTemperature(s: SparkSession, dir: String): DataFrame = {
    val alpha = 0.7
    val frac = 0.5
    val d = Tables.documents(s, dir)
    // Weights are quantized to 6 decimals, then summed as DECIMAL:
    // a naive sum(double) accumulates in partition order and a
    // last-ulp difference (vs DuckDB, or between shuffle layouts)
    // could flip the floor(p*65536) threshold by one bucket. With
    // quantized addends the sum is exact and order-free on both
    // engines — the same discipline as graft.core.Num.
    val stats = d.groupBy("lang").agg(count(lit(1)).as("n_s"))
      .withColumn("w", round(pow(col("n_s").cast("double"), alpha), 6))
    val (nTotal, wTotal) = {
      val r = stats.agg(sum("n_s"), sum(col("w").cast("decimal(28,6)"))).head()
      (r.getLong(0).toDouble, r.getDecimal(1).doubleValue)
    }
    val thresholds = stats
      .withColumn("p", round(least(lit(1.0),
        col("w") / wTotal * (frac * nTotal) / col("n_s")), 6))
      .withColumn("thr", floor(col("p") * 65536).cast("int"))
      .select("lang", "thr")
      .collect().map(r => r.getString(0) -> r.getInt(1)) // ≤ lang domain
    val thrCol = thresholds.foldLeft(lit(-1)) { case (acc, (lang, thr)) =>
      when(col("lang") === lang, lit(thr)).otherwise(acc)
    }
    d.withColumn("bucket", bucketCol(col("text")))
      .filter(col("bucket") < thrCol)
      .select("doc_id", "lang", "bucket")
      .orderBy("doc_id")
  }

  /** Sequence packing — the concat-and-chunk step that turns a doc
    * corpus into fixed-length (2048-token) training sequences: docs
    * are concatenated in deterministic order and chunk boundaries fall
    * wherever they fall (standard LM-pretraining packing; no padding
    * waste). Each doc's placement is its running token offset, so the
    * output maps every doc to (sequence id, offset) — what a loader
    * needs to materialize any sequence.
    *
    * Scale shape: the running sum is windowed WITHIN content-hash
    * shards (64 of them), never globally — a global cumsum is a
    * single-partition window, the classic distributed-prefix-sum trap.
    * Sequence ids are scoped (shard, seq_in_shard), which is exactly
    * how per-worker packing behaves in production loaders. One shuffle
    * on the shard key; token counting is row-local. */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    packFrom(Tables.documents(s, dir).select(
      col("doc_id"),
      (bucketCol(col("text")) % 64).as("shard"),
      size(Text.words(col("text"))).cast("bigint").as("n_tokens")))
      .orderBy("doc_id")

  /** Shared packing kernel over (doc_id, shard, n_tokens): sharded
    * prefix sums → (sequence id, offset) placement. Used by the
    * whitespace-proxy [[packSequences]], the BPE-real
    * [[packSequencesBpe]], and (at the SFT face's sequence length)
    * [[Pipeline.sftPackMasked]], so all three stay
    * boundary-compatible. */
  private[operators] def packFrom(base: DataFrame,
      seqLen: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byShard = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("tok_end", sum("n_tokens").over(byShard))
      .select(
        col("doc_id"), col("shard"), col("n_tokens"),
        (col("tok_end") - col("n_tokens")).as("tok_start"),
        floor((col("tok_end") - col("n_tokens")) / seqLen).as("seq_in_shard"),
        ((col("tok_end") - col("n_tokens")) % seqLen).as("seq_offset"))
  }

  /** Per-sequence document-boundary spans — the loader/attention-mask
    * face of [[packSequences]]: concat-and-chunk packing tears
    * documents across sequence boundaries, and training with
    * intra-sequence document masking (each doc attends only within
    * itself — the Llama-3-class recipe) needs, for every packed
    * sequence, the ordered list of (doc, start, end) spans inside it.
    * [[packSequences]] answers "where did my doc land"; this answers
    * "what does sequence s contain" — the other direction of the same
    * placement. A doc spanning tokens [tok_start, tok_end) touches
    * sequences floor(tok_start/L)..floor((tok_end−1)/L), ≤ 2 for any
    * doc shorter than L, so the explode is output-sized, not
    * quadratic; span offsets are row-local clamps and slot/n_docs are
    * one window over the (shard, seq) key the explode already
    * produced. Same sharded discipline — nothing global. */
  def packAttentionSpans(s: SparkSession, dir: String): DataFrame = {
    val L = 2048
    val placed = packFrom(Tables.documents(s, dir).select(
      col("doc_id"),
      (bucketCol(col("text")) % 64).as("shard"),
      size(Text.words(col("text"))).cast("bigint").as("n_tokens")))
    val bySeq = Window.partitionBy("shard", "seq")
    val slotW = bySeq.orderBy(col("span_start").asc, col("doc_id").asc)
    placed
      .filter(col("n_tokens") > 0)
      .withColumn("tok_end", col("tok_start") + col("n_tokens"))
      .withColumn("seq", explode(sequence(
        floor(col("tok_start") / L), floor((col("tok_end") - lit(1)) / L))))
      .withColumn("span_start",
        greatest(col("tok_start") - col("seq") * L, lit(0L)))
      .withColumn("span_end",
        least(col("tok_end") - col("seq") * L, lit(L.toLong)))
      .withColumn("slot", row_number().over(slotW))
      .withColumn("n_docs", count(lit(1)).over(bySeq))
      .select("shard", "seq", "slot", "doc_id", "span_start", "span_end",
        "n_docs")
      .orderBy("shard", "seq", "slot")
  }

  /** Whole-document greedy packing — the OTHER packing contract:
    * [[packSequences]] concatenates and SPLITS docs at sequence
    * boundaries (pretraining packing, zero padding, documents torn);
    * SFT/instruction-tuning packing must keep each document intact,
    * so bins are filled greedily and the unfilled tail of every bin is
    * padding. Next-fit-decreasing inside deterministic content-hash
    * shards: sort the shard's docs by (tokens desc, doc_id), walk
    * once, close the bin whenever the next doc does not fit. The walk
    * is inherently sequential, so it runs as ONE higher-order
    * `aggregate` fold over the shard's collected doc list — legal
    * only because shards are bounded by construction (shard count =
    * smallest power of two with shards·512 ≥ corpus docs, so a shard
    * holds ~512 docs at ANY corpus size; the fold state is one
    * shard's (doc, bin) list, never the corpus). One shuffle on the
    * shard key; `bin_tokens` (the padding report: budget − bin_tokens
    * is wasted pad) is a bin-domain window over the same shuffle.
    * Oracle = the identical recurrence as a recursive CTE over the
    * identical (tokens desc, doc_id) order. */
  /** The NFD fold kernel shared by [[packGreedy]] and
    * [[Pipeline.pipelineSft]]: input (doc_id, n_tokens) rows →
    * (doc_id, shard, bin, n_tokens). Shard count is derived from the
    * input's OWN count (smallest power of two with shards·512 ≥ rows),
    * so the per-shard fold state stays ~512 docs at any input size. */
  private[operators] def nfdPack(docs: DataFrame, budget: Int = 512): DataFrame = {
    // pinned before the count: the shard-count derivation executes the
    // whole input plan, and for pipeline_sft that plan is the gated +
    // deduped corpus scan — unpinned, the pack pass would run it all a
    // second time
    val keyed = docs.withColumn("skey",
      md5(concat_ws(":", lit("42"), col("doc_id").cast("string"))))
      .localCheckpoint()
    val n = keyed.count()
    var nShards = 1L
    while (nShards * 512 < n) nShards <<= 1
    keyed
      // 8 hex chars = 32 hash bits: a 16-bit slice caps usable shards
      // at 65536, silently unbounding the per-shard fold past ~33M
      // docs; 32 bits keep the ~512-docs-per-shard claim real to 2^32
      // shards
      .withColumn("shard",
        (conv(substring(col("skey"), 1, 8), 16, 10).cast("long")
          % lit(nShards)).cast("int"))
      .groupBy("shard")
      .agg(sort_array(collect_list(struct(
        (-col("n_tokens")).as("nt_neg"), col("doc_id"), col("n_tokens")))).as("arr"))
      .select(col("shard"), explode(expr(
        s"""aggregate(arr,
             named_struct(
               'res', cast(array() as array<struct<doc_id:bigint,n_tokens:int,bin:int>>),
               'bin', 0, 'used', 0),
             (acc, x) -> named_struct(
               'res', array_append(acc.res, named_struct(
                 'doc_id', x.doc_id, 'n_tokens', x.n_tokens,
                 'bin', if(acc.used + x.n_tokens > $budget and acc.used > 0,
                           acc.bin + 1, acc.bin))),
               'bin', if(acc.used + x.n_tokens > $budget and acc.used > 0,
                         acc.bin + 1, acc.bin),
               'used', if(acc.used + x.n_tokens > $budget and acc.used > 0,
                          x.n_tokens, acc.used + x.n_tokens)),
             acc -> acc.res)""")).as("p"))
      .select(col("p.doc_id").as("doc_id"), col("shard"),
        col("p.bin").as("bin"), col("p.n_tokens").as("n_tokens"))
  }

  def packGreedy(s: SparkSession, dir: String): DataFrame =
    nfdPack(Tables.documents(s, dir).select(
      col("doc_id"), size(Text.words(col("text"))).as("n_tokens")))
      .withColumn("bin_tokens",
        sum("n_tokens").over(Window.partitionBy("shard", "bin")))
      .orderBy("doc_id")

  /** Quality-gate FUNNEL report — the rule-by-rule attrition table
    * every published curation run ships (RefinedWeb/Dolma style):
    * each rule sees only the previous rules' survivors, so the report
    * is n_in → n_dropped → n_out per stage in declared order. Rules
    * are row-local integer/array predicates (the engine's richer
    * learned gates — perplexity, quality_model — publish their own
    * reports; this is the cheap-heuristics front of the funnel):
    * length window, language allowlist, minimum tokens, distinct-word
    * ratio (integer cross-multiplied — no float threshold), stopword
    * presence. ONE corpus pass: five cumulative-conjunction counters
    * in a single aggregate, then a row-local stack to the
    * rule-domain report. */
  /** The five funnel gates over (n_chars, lang, w) columns — ONE
    * definition shared by [[qualityFunnel]]'s report and
    * [[Pipeline.pipelineSft]]'s filter, so the report and the
    * pipeline cannot drift. */
  private[graft] def funnelFlags: Seq[Column] = Seq(
    col("n_chars").between(100, 2000),
    col("lang").isin("en", "de", "fr", "es"),
    size(col("w")) >= 20,
    size(array_distinct(col("w"))) * 10 >= size(col("w")) * 4,
    array_contains(col("w"), "the") || array_contains(col("w"), "a"))

  def qualityFunnel(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"), col("lang"),
        Text.words(col("text")).as("w"))
    val Seq(f1, f2, f3, f4, f5) = funnelFlags
    val cum = Seq(f1, f1 && f2, f1 && f2 && f3, f1 && f2 && f3 && f4,
      f1 && f2 && f3 && f4 && f5)
    val agg0 = d.agg(
      count(lit(1)).as("s0"),
      cum.zipWithIndex.map { case (c, i) =>
        count(when(c, 1)).as(s"s${i + 1}")
      }: _*)
    val rules = Seq("len_window", "lang_allow", "min_tokens",
      "distinct_ratio", "stopword_present")
    agg0.select(expr(
      "stack(5, " + rules.zipWithIndex.map { case (r, i) =>
        s"${i + 1}, '$r', s$i, s${i + 1}"
      }.mkString(", ") + ") as (stage, rule, n_in, n_out)"))
      .select(col("stage"), col("rule"), col("n_in"),
        (col("n_in") - col("n_out")).as("n_dropped"), col("n_out"))
      .orderBy("stage")
  }

  /** Per-(JVM, dir) learned BPE merges — the "train the tokenizer on
    * the corpus" offline job. The word-frequency table is a bounded
    * distributed aggregate (top-4096 words by count, deterministic
    * tiebreak) collected for the driver-side merge loop, exactly the
    * bounded-planning-relation move the IVF index build makes; the
    * corpus itself is never collected. 48 merges: at this fixture's
    * 31-word vocabulary, high-frequency words merge to single tokens
    * while the tail keeps genuine subword splits. */
  private val bpeMergesCache =
    scala.collection.concurrent.TrieMap.empty[String, Vector[(String, String)]]
  private[graft] def bpeMerges(s: SparkSession, dir: String): Vector[(String, String)] =
    bpeMergesCache.getOrElseUpdate(dir, {
      val wf = Tables.documents(s, dir)
        .select(explode(Text.words(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("word").asc)
        .limit(4096)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      graft.functions.Bpe.train(wf, 48)
    })

  /** Persisted merge table — the FROZEN tokenizer vocabulary. Real
    * pipelines never retrain per batch: the vocab is trained once,
    * shipped as an artifact, and every later corpus slice is encoded
    * against it unchanged. The artifact is (rank, left, right), ≤48
    * rows, written once per (JVM, dir). */
  private val bpeVocabPaths =
    new graft.core.BuildOnce[String, String]
  private[graft] def bpeVocabPath(s: SparkSession, dir: String): String =
    bpeVocabPaths.getOrElseUpdate(dir, {
      val sp = s; import sp.implicits._
      val p = graft.core.RunId.scratchKeyed("bpe/merges", dir)
      bpeMerges(s, dir).zipWithIndex
        .map { case ((l, r), i) => (i, l, r) }
        .toDF("rank", "left", "right")
        .coalesce(1).write.mode("overwrite").parquet(p)
      p
    })

  /** Reload the frozen merges, rank-ordered — the encode-only entry
    * point. BpeSpec asserts encoding against this table is
    * byte-identical to encoding against the in-memory one. */
  private[graft] def bpeMergesFrozen(s: SparkSession, dir: String): Vector[(String, String)] =
    s.read.parquet(bpeVocabPath(s, dir))
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toVector

  /** Row-local BPE token count over a word array; the ≤48-entry rank
    * map rides the UDF closure. A UDF is the right tool HERE: greedy
    * rank-ordered symbol merging is per-row imperative logic with no
    * Catalyst-expression form (same justification as
    * multimodal_decode's mapPartitions). */
  private[graft] def bpeCountUdf(merges: Vector[(String, String)]) = {
    val rank = merges.zipWithIndex.toMap
    udf { (ws: Seq[String]) =>
      var n = 0L
      ws.foreach(w => n += graft.functions.Bpe.encode(w, rank).length)
      n
    }
  }

  /** Real subword tokenization: corpus-trained BPE token counts next
    * to the whitespace proxy, plus fertility (BPE tokens per word) —
    * the statistic that says how well the learned vocabulary fits the
    * corpus. Declared no-oracle (iterative BPE training has no SQL
    * form); BpeSpec pins the merge table with a known-answer corpus
    * and proves lossless encode via the concat round-trip. */
  def tokenizeBpe(s: SparkSession, dir: String): DataFrame = {
    val cnt = bpeCountUdf(bpeMerges(s, dir))
    val w = Text.words(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), size(w).as("ws_tokens"), cnt(w).as("bpe_tokens"))
      .withColumn("fertility",
        round(col("bpe_tokens").cast("double") / col("ws_tokens"), 6))
      .orderBy("doc_id")
  }

  /** Encode-only tokenization against the FROZEN vocab: the nightly
    * batch (held-out slice doc_id % 5 == 0 — rows the training job of
    * a real deployment would not have seen) is encoded with the
    * persisted merge table, never retrained. Characters outside the
    * learned alphabet fall back to single-symbol tokens (the
    * byte-fallback contract: ANY input encodes losslessly). Same
    * fertility surface as tokenize_bpe; same no-oracle declaration
    * (iterative BPE has no SQL form) — BpeSpec pins frozen == live. */
  def tokenizeBpeFrozen(s: SparkSession, dir: String): DataFrame = {
    val cnt = bpeCountUdf(bpeMergesFrozen(s, dir))
    val w = Text.words(col("text"))
    Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), size(w).as("ws_tokens"), cnt(w).as("bpe_tokens"))
      .withColumn("fertility",
        round(col("bpe_tokens").cast("double") / col("ws_tokens"), 6))
      .orderBy("doc_id")
  }

  /** Byte-level BPE merges per (JVM, dir) — the production-tokenizer
    * discipline (VERDICT r10 next #7): GPT-2-family regex
    * pre-tokenization, merges over the 256-symbol byte alphabet, no
    * unknown token possible. Training input is the bounded top-4096
    * pre-token frequency table (distributed regexp_extract_all +
    * count — the same Java-regex pattern the row-local encoder uses,
    * so train and encode tokenize identically); 64 merges. */
  private val bpeBytesMergesCache =
    scala.collection.concurrent.TrieMap.empty[String, Vector[(String, String)]]
  private[graft] def bpeBytesMerges(s: SparkSession, dir: String): Vector[(String, String)] =
    bpeBytesMergesCache.getOrElseUpdate(dir, {
      val wf = Tables.documents(s, dir)
        .select(explode(regexp_extract_all(col("text"),
          lit(graft.functions.Bpe.pretokenRegex), lit(0))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("tok").asc)
        .limit(4096)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      graft.functions.Bpe.trainBytes(wf, 64)
    })

  /** Row-local byte-level token count: pre-tokenize, encode each
    * pre-token over the byte alphabet. Same UDF justification as
    * [[bpeCountUdf]] (greedy rank-ordered merging has no
    * Catalyst-expression form). */
  private[graft] def bpeBytesCountUdf(merges: Vector[(String, String)]) = {
    val rank = merges.zipWithIndex.toMap
    udf { (text: String) =>
      var n = 0L
      graft.functions.Bpe.pretokenize(text)
        .foreach(t => n += graft.functions.Bpe.encodeBytes(t, rank).length)
      n
    }
  }

  /** Persisted byte-level merge table — the frozen artifact, same
    * discipline as [[bpeVocabPath]]: trained once, written as
    * (rank, left, right) parquet (symbols are the GPT-2 printable
    * stand-in chars, so plain strings round-trip exactly), ≤64 rows,
    * once per (JVM, dir). */
  private val bpeBytesVocabPaths =
    new graft.core.BuildOnce[String, String]
  private[graft] def bpeBytesVocabPath(s: SparkSession, dir: String): String =
    bpeBytesVocabPaths.getOrElseUpdate(dir, {
      val sp = s; import sp.implicits._
      val p = graft.core.RunId.scratchKeyed("bpe/merges_bytes", dir)
      bpeBytesMerges(s, dir).zipWithIndex
        .map { case ((l, r), i) => (i, l, r) }
        .toDF("rank", "left", "right")
        .coalesce(1).write.mode("overwrite").parquet(p)
      p
    })

  /** Reload the frozen byte-level merges, rank-ordered. BpeSpec
    * asserts encode-against-frozen == encode-against-live. */
  private[graft] def bpeBytesMergesFrozen(s: SparkSession, dir: String): Vector[(String, String)] =
    s.read.parquet(bpeBytesVocabPath(s, dir))
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toVector

  /** Byte-level tokenization next to the word-internal BPE and the
    * whitespace proxy: per document, the UTF-8 byte count, both BPE
    * token counts, and both fertilities (tokens per whitespace word) —
    * the comparison that says what the byte-level vocabulary buys on
    * multi-script text (word-internal BPE can never cross or split
    * non-letter boundaries; byte-level has no out-of-alphabet case at
    * all). Declared no-oracle (iterative BPE has no SQL form); BpeSpec
    * pins the lossless round-trip on multi-script text, the
    * empty-rank byte-count identity, and train determinism. */
  def tokenizeBpeBytes(s: SparkSession, dir: String): DataFrame = {
    val bcnt = bpeBytesCountUdf(bpeBytesMerges(s, dir))
    val wcnt = bpeCountUdf(bpeMerges(s, dir))
    val w = Text.words(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        size(w).as("ws_tokens"),
        wcnt(w).as("bpe_word_tokens"),
        bcnt(col("text")).as("bpe_byte_tokens"))
      .withColumn("fertility_word",
        round(col("bpe_word_tokens").cast("double") / col("ws_tokens"), 6))
      .withColumn("fertility_byte",
        round(col("bpe_byte_tokens").cast("double") / col("ws_tokens"), 6))
      .orderBy("doc_id")
  }

  /** Encode-only byte-level tokenization against the FROZEN byte
    * vocab — the artifact discipline [[tokenizeBpeFrozen]] runs at the
    * word level, now for the production byte-level tokenizer: the
    * held-out slice (doc_id % 5 == 0) is encoded with the persisted
    * merge table, never retrained. Byte-level has no out-of-alphabet
    * case, so unlike the word path there is no fallback branch at
    * all — ANY byte sequence encodes. Same no-oracle declaration
    * (iterative BPE has no SQL form); BpeSpec pins frozen == live
    * token counts on the same slice. */
  def tokenizeBpeBytesFrozen(s: SparkSession, dir: String): DataFrame = {
    val bcnt = bpeBytesCountUdf(bpeBytesMergesFrozen(s, dir))
    Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        bcnt(col("text")).as("bpe_byte_tokens"))
      .withColumn("compression",
        round(col("n_bytes").cast("double") / col("bpe_byte_tokens"), 6))
      .orderBy("doc_id")
  }

  /** Per-(JVM, dir) unigram-LM vocab — trained once on the SAME
    * bounded top-4096 pre-token frequency table the byte-BPE trainer
    * uses (one regex, so all three tokenizers see identical
    * pre-tokens); ≤512 quantized-score pieces. */
  private val unigramVocabCache =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, Long]]
  private[graft] def unigramVocab(s: SparkSession, dir: String): Map[String, Long] =
    unigramVocabCache.getOrElseUpdate(dir, {
      val wf = Tables.documents(s, dir)
        .select(explode(regexp_extract_all(col("text"),
          lit(graft.functions.Bpe.pretokenRegex), lit(0))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("tok").asc)
        .limit(4096)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      graft.functions.Unigram.train(wf, 512)
    })

  /** Unigram-LM tokenization — the THIRD production tokenizer family
    * (SentencePiece unigram, Kudo 2018) next to word-internal and
    * byte-level BPE: a scored piece vocabulary learned by hard-EM +
    * pruning, encoding via Viterbi max-likelihood segmentation (which
    * greedy BPE merge order can miss — the comparison columns show
    * where). Same bounded-driver-state contract as the BPE trainers
    * (≤4096-word table, ≤512-piece vocab); encode is row-local.
    * Declared no-oracle (EM + Viterbi have no SQL form); BpeSpec pins
    * lossless round-trip, Viterbi optimality against a brute-force
    * enumeration, vocab bounds, and train determinism. */
  def tokenizeUnigram(s: SparkSession, dir: String): DataFrame = {
    val vocab = unigramVocab(s, dir)
    val wcnt = bpeCountUdf(bpeMerges(s, dir))
    val ucnt = udf { (text: String) =>
      var n = 0L
      graft.functions.Bpe.pretokenize(text)
        .foreach(t => n += graft.functions.Unigram.segment(t, vocab).length)
      n
    }
    val w = Text.words(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(w).as("ws_tokens"),
        wcnt(w).as("bpe_word_tokens"),
        ucnt(col("text")).as("uni_pieces"))
      .withColumn("fertility_uni",
        round(col("uni_pieces").cast("double") / col("ws_tokens"), 6))
      .orderBy("doc_id")
  }

  /** Persisted unigram vocab — the frozen artifact, same discipline
    * as [[bpeBytesVocabPath]]: (piece, quantized score) parquet, ≤512
    * rows, once per (JVM, dir). */
  private val unigramVocabPaths = new graft.core.BuildOnce[String, String]
  private[graft] def unigramVocabPath(s: SparkSession, dir: String): String =
    unigramVocabPaths.getOrElseUpdate(dir, {
      val sp = s; import sp.implicits._
      val p = graft.core.RunId.scratchKeyed("unigram/vocab", dir)
      unigramVocab(s, dir).toSeq.sortBy(_._1)
        .toDF("piece", "qscore")
        .coalesce(1).write.mode("overwrite").parquet(p)
      p
    })

  /** Encode-only unigram tokenization against the FROZEN persisted
    * vocab — the artifact discipline ([[tokenizeBpeFrozen]] /
    * [[tokenizeBpeBytesFrozen]]) for the third tokenizer family: the
    * held-out slice (doc_id % 5 == 0) is segmented with the reloaded
    * (piece, score) table, never retrained; single-char fallback
    * means any text still segments. BpeSpec pins frozen == live piece
    * counts on the same slice. */
  def tokenizeUnigramFrozen(s: SparkSession, dir: String): DataFrame = {
    val vocab = s.read.parquet(unigramVocabPath(s, dir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ucnt = udf { (text: String) =>
      var n = 0L
      graft.functions.Bpe.pretokenize(text)
        .foreach(t => n += graft.functions.Unigram.segment(t, vocab).length)
      n
    }
    Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        ucnt(col("text")).as("uni_pieces"))
      .withColumn("compression",
        round(col("n_bytes").cast("double") / col("uni_pieces"), 6))
      .orderBy("doc_id")
  }

  /** Per-(JVM, dir) WordPiece vocabulary — the FOURTH tokenizer family
    * (BERT's; VERDICT r11 missing #4), trained on the SAME bounded
    * top-4096 word-frequency table the word-level BPE trainer uses
    * (WordPiece is whitespace-word-level, so the word table — not the
    * GPT-2 pre-token table — is its natural input): likelihood-scored
    * merges, `##` continuation pieces, ≤96-piece target (48-symbol alphabet + ~48 genuine merges — sized so the fixture tail keeps real subword splits, the tokenize_bpe 48-merge reasoning). */
  private val wordpieceVocabCache =
    new graft.core.BuildOnce[String, Set[String]]
  private[graft] def wordpieceVocab(s: SparkSession, dir: String): Set[String] =
    wordpieceVocabCache.getOrElseUpdate(dir, {
      val wf = Tables.documents(s, dir)
        .select(explode(Text.words(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("word").asc)
        .limit(4096)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      graft.functions.WordPiece.train(wf, 96)
    })

  /** Row-local WordPiece counts: greedy longest-match per word — the
    * fixed BERT inference rule — returning (pieces, unk words). Same
    * UDF justification as [[bpeCountUdf]]. */
  private def wordpieceCountUdf(vocab: Set[String]) =
    udf { (ws: Seq[String]) =>
      var n = 0L; var unk = 0L
      ws.foreach { w =>
        val enc = graft.functions.WordPiece.encode(w, vocab)
        n += enc.length
        if (enc.length == 1 && enc.head == graft.functions.WordPiece.Unk)
          unk += 1
      }
      (n, unk)
    }

  /** WordPiece tokenization — greedy longest-match over the learned
    * `##`-prefixed vocabulary, with the [UNK] word count the BERT
    * rule produces on out-of-alphabet characters. Declared no-oracle
    * (iterative likelihood-scored training has no SQL form); BpeSpec
    * pins the round-trip (concat of pieces, `##` stripped, re-reads
    * the word whenever no [UNK] fired), greedy-longest-match
    * optimality at each position, vocab-bound, train determinism, and
    * the explicit [UNK] case. */
  def tokenizeWordpiece(s: SparkSession, dir: String): DataFrame = {
    val cnt = wordpieceCountUdf(wordpieceVocab(s, dir))
    val w = Text.words(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), size(w).as("ws_tokens"), cnt(w).as("wp"))
      .select(col("doc_id"), col("ws_tokens"),
        col("wp._1").as("wp_tokens"), col("wp._2").as("n_unk_words"))
      .withColumn("fertility_wp",
        round(col("wp_tokens").cast("double") / col("ws_tokens"), 6))
      .orderBy("doc_id")
  }

  /** Persisted WordPiece vocab — the frozen artifact, same discipline
    * as the other three families: one `piece` column, ≤96 rows, once
    * per (JVM, dir). */
  private val wordpieceVocabPaths = new graft.core.BuildOnce[String, String]
  private[graft] def wordpieceVocabPath(s: SparkSession, dir: String): String =
    wordpieceVocabPaths.getOrElseUpdate(dir, {
      val sp = s; import sp.implicits._
      val p = graft.core.RunId.scratchKeyed("wordpiece/vocab", dir)
      wordpieceVocab(s, dir).toSeq.sorted.toDF("piece")
        .coalesce(1).write.mode("overwrite").parquet(p)
      p
    })

  /** Encode-only WordPiece against the FROZEN persisted vocab on the
    * held-out slice (doc_id % 5 == 0) — the artifact discipline the
    * other three tokenizer families ship. BpeSpec pins frozen == live
    * counts on the same slice. */
  def tokenizeWordpieceFrozen(s: SparkSession, dir: String): DataFrame = {
    val vocab = s.read.parquet(wordpieceVocabPath(s, dir))
      .collect().map(_.getString(0)).toSet
    val cnt = wordpieceCountUdf(vocab)
    val w = Text.words(col("text"))
    Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), size(w).as("ws_tokens"), cnt(w).as("wp"))
      .select(col("doc_id"), col("ws_tokens"),
        col("wp._1").as("wp_tokens"), col("wp._2").as("n_unk_words"))
      .withColumn("fertility_wp",
        round(col("wp_tokens").cast("double") / col("ws_tokens"), 6))
      .orderBy("doc_id")
  }

  /** [[packSequences]] with REAL token offsets: sequence boundaries
    * fall at corpus-trained BPE token counts instead of whitespace
    * word counts (VERDICT r6 #2 — the proxy made every boundary
    * approximate). Same sharded-prefix-sum shape, same no-oracle
    * declaration as tokenize_bpe; BpeSpec asserts the placement
    * invariants against a driver-side recomputation. */
  def packSequencesBpe(s: SparkSession, dir: String): DataFrame = {
    val cnt = bpeCountUdf(bpeMerges(s, dir))
    packFrom(Tables.documents(s, dir).select(
      col("doc_id"),
      (bucketCol(col("text")) % 64).as("shard"),
      cnt(Text.words(col("text"))).as("n_tokens")))
      .orderBy("doc_id")
  }

  /** Rolling-hash fingerprint per document (min 3-gram MD5). */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), Text.fingerprint(Text.words(col("text"))).as("fp"))
      .orderBy("doc_id")

  /** Language ID via learned character-bigram profiles: top-30 bigrams
    * per language from the corpus itself, then classify each doc by
    * profile overlap (tiebreak: lang asc). Self-contained n-gram
    * langid mechanism; no oracle (multi-stage pipeline, declared
    * rows-only). At scale: profiles are tiny (5×30 rows, broadcast);
    * the classify join never shuffles the corpus more than once. */
  def textLangId(s: SparkSession, dir: String): DataFrame = {
    // Features: bigrams of the first 200 chars (caps per-doc work, the
    // standard langid trick). The exploded bigram relation feeds both
    // the profile build and classification — materialize it once.
    // Materialize the prepared text before the per-element transform:
    // CollapseProject would otherwise inline lower(substring(...))
    // into every bigram element (see Text.shingles scaladoc).
    // (Round 7: a data-sized coalesce before this checkpoint was tried
    // and REVERTED — the profile explode below multiplies rows ×200,
    // so shrinking partitions by doc count serialized the hot stage
    // and cost 4.6× at the ×10 fixture. The r6 in-suite 9.48 s bench
    // line did not reproduce under re-measurement — 2.64 s in-suite on
    // identical code — root cause recorded in BASELINE.md.)
    val prepared = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        lower(substring(col("text"), 1, 200)).as("t"))
      .localCheckpoint()
    // Per-doc DISTINCT bigrams computed row-locally (array_distinct
    // before explode): the corpus-wide distinct shuffle the round-1
    // version paid disappears entirely, and both aggregations below
    // become plain counts with map-side partial aggregation. Profiles
    // therefore rank by document frequency — the better-behaved langid
    // statistic anyway. (Since round 4 only the profile build explodes;
    // classification is row-local below.)
    //
    // Bigram extraction is a native expression (one tight loop per
    // row, inside whole-stage codegen): the HOF compositions tried
    // first — transform(sequence(i), substring(t,i,2)) and
    // split+zip_with — both pay per-ELEMENT interpreted lambda
    // dispatch, ~300 µs per 200-char doc, the measured dominant cost
    // of this operator's earlier versions.
    val bigrams = graft.plans.CharBigramsExpr.bigrams(col("t"))
    def exploded(src: DataFrame) = src
      .select(col("doc_id"), col("lang"), explode(bigrams).as("bg"))
    // Profiles learn from a 20% document sample: top-30 ranks are
    // stable under sampling and the profile pass (explode + agg)
    // drops to a fifth of the corpus. Selection is a CONTENT hash of
    // doc_id — unlike rdd-style sample(), identical on any partition
    // layout / core count, so the output never flaps across machines.
    val profile = exploded(prepared.filter(pmod(xxhash64(col("doc_id")), lit(5)) === 0))
      .groupBy("lang", "bg").count()
      .withColumn("rk",
        row_number().over(Window.partitionBy("lang").orderBy(col("count").desc, col("bg").asc)))
      .filter(col("rk") <= 30)
      .groupBy("lang").agg(sort_array(collect_list(col("bg"))).as("bgs"))
    // The learned profile is ≤ 5 langs × 30 bigrams — collect it to
    // the driver (the bounded-stats move AQE makes) and classify each
    // doc ROW-LOCALLY: overlap = |array_intersect(doc bigrams,
    // literal profile)| per language, argmax via array_min over
    // (-count, lang) structs — highest count first, alphabetically
    // first language on ties, the same order the round-2/3 min_by
    // argmax used. This deletes the full-corpus explode (~200 rows
    // per doc), the broadcast join, AND both classify aggregations:
    // the corpus is scanned exactly once with per-row work only.
    // Zero-overlap docs keep the inner-join semantics (dropped).
    val profArrays = profile.collect()
      .map(r => (r.getString(0), r.getSeq[String](1)))
      .sortBy(_._1)
    val best = array_min(array(profArrays.toIndexedSeq.map { case (lang, pbgs) =>
      struct((-size(array_intersect(bigrams, typedlit(pbgs)))).as("nc"),
        lit(lang).as("cand_lang"))
    }: _*))
    // ONE scoring projection, materialized once: the filter and the
    // field extraction below both reference `best`, and CollapseProject
    // would otherwise re-inline the whole 5-intersect argmax (and its
    // bigram extraction) into each — 3× the row work. One checkpoint
    // is the sweet spot now that the bigram kernel is native: more
    // staging just multiplies per-query plan compilations, which at
    // this point cost more than the row work they save.
    prepared
      .select(col("doc_id"), col("lang"), best.as("best"))
      .localCheckpoint()
      .filter(col("best.nc") < 0)
      .select(col("doc_id"), col("lang"), col("best.cand_lang").as("predicted"))
      .orderBy("doc_id")
  }

  /** Corpus-familiarity scoring — the LM-style quality filter shape
    * (score each document by how familiar its vocabulary is to the
    * corpus; gibberish and OCR noise score low): familiarity =
    * Σ df(word) / (n_words · n_docs), i.e. the mean document
    * frequency of the doc's words. Deliberately built on INTEGER
    * aggregation only — Σdf is an exact order-independent long sum,
    * and the single double division + floor-truncation at the end is
    * bit-identical on any engine — so unlike a log-prob LM score this
    * float surface is oracle-exact. Two shuffles (word df build, per-
    * doc aggregate), both partial-aggregable; the 1-row corpus count
    * rides a cross join AQE broadcasts. */
  def textRarityScore(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val words = docs.select(col("doc_id"), explode(Text.words(col("text"))).as("word"))
    val dfreq = docs
      .select(explode(array_distinct(Text.words(col("text")))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    words.join(dfreq, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("df").as("sum_df"))
      .crossJoin(nDocs)
      .select(col("doc_id"), col("n_words"),
        (floor(col("sum_df") * 1e9 / (col("n_words") * col("n_docs")))
          .cast("double") / 1e9).as("familiarity"))
      .orderBy("doc_id")
  }

  /** Normalization stage: lowercase, strip non-alphanumerics,
    * collapse whitespace, trim — the standard pre-dedup cleanup. */
  def textClean(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        cleanCol(col("text")).as("clean_text"),
        length(col("text")).as("raw_len"))
      .withColumn("clean_len", length(col("clean_text")))
      .orderBy("doc_id")

  /** Stratified (per-class) sampling by CONTENT hash — the corpus
    * rebalancing step of a training-data pipeline (downsample the
    * majority language, keep the rest). Selection is a threshold on
    * the md5 bucket of the text, so it is exactly reproducible on any
    * partition layout / cluster size, stable across re-runs, and
    * oracle-checkable — none of which holds for rdd-style sample().
    * Per-class rates ride in via a tiny literal map; at 100 TB this
    * is a single scan with row-local work and no shuffle before the
    * final ordering. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    // keep ~25% of the majority class (en), everything else intact;
    // bucket space is 16 bits (0..65535)
    val keepThreshold = when(col("lang") === "en", lit(16384)).otherwise(lit(65536))
    Tables.documents(s, dir)
      .withColumn("bucket", bucketCol(col("text")))
      .filter(col("bucket") < keepThreshold)
      .select("doc_id", "lang", "bucket")
      .orderBy("doc_id")
  }

  /** Deterministic train/val split by CONTENT hash (not row position):
    * stable under re-shards, re-orders and re-runs — the property a
    * training pipeline needs. Bucket = first 16 bits of md5(text);
    * ~6% val at the 4096 threshold. */
  def textSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket", bucketCol(col("text")))
      .withColumn("split", when(col("bucket") < 4096, "val").otherwise("train"))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  /** Benchmark decontamination: find corpus documents sharing any
    * 8-word shingle with a benchmark set (here docs 0-19, plus planted
    * contaminated copies that must be caught). The 100 TB shape: the
    * benchmark side is tiny and BROADCAST after row-local distinct
    * shingling; the corpus explodes once and the only shuffle is the
    * final per-pair count. */
  def textContamination(s: SparkSession, dir: String): DataFrame = {
    // contaminated copies: the shared planted-mutation kernel
    // (benchmark text with its first word dropped) at disjoint ids
    val all = Dedup.withPlanted(s, dir, offset = 200000L)
    def grams(df: DataFrame) = df.select(col("doc_id"),
      explode(array_distinct(Text.shingles(Text.words(col("text")), 8))).as("g"))
    val bench = grams(all.filter(col("doc_id") < 20))
      .withColumnRenamed("doc_id", "bench_id")
    grams(all.filter(col("doc_id") >= 20))
      .join(broadcast(bench), "g")
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id", "bench_id")
  }

  /** Bloom-prefiltered benchmark decontamination — [[textContamination]]
    * is the exact face (every corpus 8-gram probes the broadcast
    * benchmark gram map); this is the shape that survives a
    * PRODUCTION benchmark suite. The benchmark grams are collected
    * once (bounded: the benchmark suite is fixed-size no matter how
    * big the corpus — same class as the langid profile) into a Bloom
    * filter (fpp 1e-6 ≈ 29 bits/gram vs the exact map's full strings:
    * GPT-3's 13-gram decontamination set is ~10⁸ grams, a ~350 MB
    * bloom where the exact hash side stops fitting), the corpus pass
    * is a row-local short-circuiting EXISTS over each doc's gram
    * array via [[graft.plans.BloomHitExpr]] — no join, no shuffle,
    * nothing leaves the scan — and only flagged docs (true hits plus
    * a provably rare FP tail: P(doc flagged falsely) ≈ grams·1e-6)
    * enter the exact confirm join. FPs die in the confirm (the
    * join_bloom_prefilter discipline), so the output is hash-exact
    * against the plain doc-level gram join; the no-false-negative
    * superset guarantee and the FP bound are pinned in KernelSpec. */
  def textContaminationBloom(s: SparkSession, dir: String): DataFrame =
    contaminationBloomParts(s, dir)._2

  /** (bloom-flagged doc ids, confirmed doc-level report) — split out
    * so KernelSpec can pin flagged ⊇ exact and the FP bound. */
  private[graft] def contaminationBloomParts(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val all = Dedup.withPlanted(s, dir, offset = 200000L)
    def gramsArr(df: DataFrame) = df.select(col("doc_id"),
      array_distinct(Text.shingles(Text.words(col("text")), 8)).as("gs"))
    val bench = gramsArr(all.filter(col("doc_id") < 20))
    val gramList = bench.select(explode(col("gs")).as("g")).distinct()
      .collect().map(_.getString(0)) // benchmark-sized, never corpus-sized
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(
      math.max(gramList.length.toLong, 1L), 1e-6)
    gramList.foreach(bloom.putString)
    val flagged = gramsArr(all.filter(col("doc_id") >= 20))
      .filter(exists(col("gs"), g => graft.plans.BloomHitExpr.hit(g, bloom)))
    val benchPairs = bench.select(
      col("doc_id").as("bench_id"), explode(col("gs")).as("g"))
    val out = flagged.select(col("doc_id"), explode(col("gs")).as("g"))
      .join(broadcast(benchPairs), "g")
      .groupBy("doc_id")
      .agg(countDistinct("bench_id").as("n_bench_docs"),
        count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
    (flagged.select("doc_id"), out)
  }

  /** Packing-efficiency report — the fill/waste accounting a training
    * run publishes before committing to a bin budget: over
    * [[nfdPack]]'s whole-document bins (the SFT contract, the one
    * place padding exists — concat-and-chunk packing wastes nothing
    * by construction), per shard: bins, docs, payload tokens, padding
    * tokens (budget − fill, clamped at 0 for the oversize singleton
    * bin a doc longer than the budget forces), the oversize count,
    * fullest/emptiest bin, and the fill rate. Shard-domain output
    * (~n/512 rows at any corpus size); two stacked aggregates on the
    * pack kernel's existing shard shuffle — bin_tokens is keyed BY
    * (shard, bin) which is a prefix-refinement of the shard key, so
    * the second aggregate is map-side-local after the first. Shares
    * [[nfdPack]] with pack_greedy/pipeline_sft: the report can never
    * drift from the packer it describes. */
  def packEfficiency(s: SparkSession, dir: String): DataFrame = {
    val budget = 512
    nfdPack(Tables.documents(s, dir).select(
        col("doc_id"), size(Text.words(col("text"))).as("n_tokens")))
      .groupBy("shard", "bin")
      .agg(sum("n_tokens").as("bin_tokens"), count(lit(1)).as("n_docs"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_bins"),
        sum("n_docs").as("n_docs"),
        sum("bin_tokens").as("sum_tokens"),
        sum(greatest(lit(budget.toLong) - col("bin_tokens"), lit(0L)))
          .as("pad_tokens"),
        sum(when(col("bin_tokens") > budget, lit(1L)).otherwise(lit(0L)))
          .as("n_oversize"),
        max("bin_tokens").as("max_bin_tokens"),
        min("bin_tokens").as("min_bin_tokens"))
      .withColumn("fill_rate",
        round(col("sum_tokens").cast("double") /
          (col("n_bins") * lit(budget.toDouble)), 6))
      .orderBy("shard")
  }

  /** PII scrub stage: redact emails and phone-shaped digit runs,
    * reporting per-doc redaction counts. PII is planted
    * deterministically (every 10th doc) so the scrub provably fires;
    * row-local Column expressions only. */
  def textPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\d{3}-\\d{4}"
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or 555-0142")))
          .otherwise(col("text")).as("raw"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("raw"), lit(phoneRe), lit(0))).as("n_phones"),
        md5(regexp_replace(
          regexp_replace(col("raw"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>")).as("scrubbed_md5"))
      .orderBy("doc_id")
  }

  /** End-to-end curation pipeline — the composed LLM-training-data
    * flow: normalize → language gate → quality gate → exact dedup on
    * the CLEANED text (deterministic keep = lowest doc_id) →
    * content-hash train/val split. Every stage is one of the
    * already-verified operators; composing them costs one window
    * shuffle (the dedup) on top of row-local work. */
  def pipelineCuration(s: SparkSession, dir: String): DataFrame = {
    val w = split(col("ct"), " ")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), cleanCol(col("text")).as("ct"))
      .select(col("doc_id"), col("lang"), col("ct"),
        size(w).as("n_words"), qualityCol(w).as("q"))
      .filter(col("lang").isin("en", "de", "fr") &&
        col("n_words") >= 20 && col("q") >= 0.4)
      // dedup window keyed on md5(ct), not the raw cleaned text: the
      // shuffle hashes/compares 16-byte keys instead of full document
      // strings (same groups as PARTITION BY ct barring md5 collision)
      .withColumn("rn",
        row_number().over(Window.partitionBy(md5(col("ct"))).orderBy("doc_id")))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"), col("lang"), col("n_words"),
        round(col("q"), 6).as("quality"),
        when(bucketCol(col("ct")) < 4096, "val").otherwise("train").as("split"))
      .orderBy("doc_id")
  }

  /** Deterministic global shuffle — reproducible training-data order.
    * Epoch order must be a pure function of (seed, doc_id): identical
    * across re-runs, cluster sizes and input layouts, so a run can be
    * resumed or replayed bit-for-bit. Order key = md5(seed ":" id);
    * the global position is computed WITHOUT a global window (which
    * would funnel 100 TB through one task): phase 1 buckets rows by
    * the first 16 bits of the key and collects the ≤65536 per-bucket
    * counts to the driver (bounded at ANY data size — same discipline
    * as the BPE merge table); phase 2 takes a per-bucket row_number
    * and adds the broadcast cumulative offset. One shuffle on the
    * bucket, ~1.5 GB per bucket at 100 TB, no driver bottleneck. */
  def shuffleDeterministic(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    val seed = "42"
    val bucketed = Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(concat_ws(":", lit(seed), col("doc_id").cast("string"))).as("skey"))
      .withColumn("b", conv(substring(col("skey"), 1, 4), 16, 10).cast("int"))
    val counts = bucketed.groupBy("b").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toSeq
    bucketed
      .join(broadcast(offsets.toDF("b", "off")), "b")
      .withColumn("position", (col("off") +
        row_number().over(Window.partitionBy("b").orderBy("skey", "doc_id")))
        .cast("long"))
      .select("doc_id", "skey", "position")
      .orderBy("doc_id")
  }

  /** Deterministic fixed-k per-group sample — the reservoir-sampling
    * contract (EXACTLY k per stratum) without reservoir state: rank
    * every doc inside its language by the seeded content hash
    * (md5(seed ":" id) — the [[shuffleDeterministic]] key, so the
    * sample is reproducible on any layout and any cluster size) and
    * keep the first k. The rank ≤ k predicate gets Spark's
    * WindowGroupLimit rewrite (win_pplimit PlanSpec precedent): each
    * partition forwards at most k rows per group BEFORE the shuffle,
    * so the exchange carries ~k·groups·partitions rows, never the
    * corpus. Contrast with sample_stratified (hash-membership RATE
    * sampling: unbounded exact count, zero coordination) — fixed-k is
    * what an eval-set builder needs. */
  def sampleFixedK(s: SparkSession, dir: String): DataFrame = {
    val seed = "42"
    val k = 20
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        md5(concat_ws(":", lit(seed), col("doc_id").cast("string"))).as("skey"))
      .withColumn("rk", row_number()
        .over(Window.partitionBy("lang").orderBy("skey", "doc_id")).cast("long"))
      .filter(col("rk") <= k)
      .select("lang", "rk", "doc_id")
      .orderBy("lang", "rk")
  }

  /** Curriculum ordering — shortest-first length curriculum with a
    * deterministic shuffle inside each stage (the standard "easy
    * examples first, random within difficulty" schedule; length is
    * the classic difficulty proxy, Bengio et al. 2009). Stage =
    * word-count band (<25, <50, <75, rest — integer thresholds, so
    * the bucket edge can never split between engines); within a
    * stage the order is md5(seed:id), the shuffle_deterministic key.
    *
    * The global position is computed WITHOUT a global window: phase 1
    * groups by (stage, first 12 bits of the shuffle key) — ≤ 4·4096 =
    * 16384 groups at ANY corpus size — and collects the bounded group
    * counts; phase 2 adds the broadcast cumulative offset to a
    * per-group row_number. Same two-phase discipline as
    * shuffle_deterministic, with the stage riding ahead of the key so
    * the concatenated order IS the curriculum. */
  def curriculumOrder(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    val seed = "42"
    val bucketed = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(split(coalesce(col("text"), lit("")), " ")).as("n_words"),
        md5(concat_ws(":", lit(seed), col("doc_id").cast("string"))).as("skey"))
      .withColumn("stage", least(lit(3), (col("n_words") / lit(25)).cast("int")))
      .withColumn("sub", conv(substring(col("skey"), 1, 3), 16, 10).cast("int"))
    val counts = bucketed.groupBy("stage", "sub").count()
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
      .map { case ((st, sb), off) => (st, sb, off) }.toSeq
    bucketed
      .join(broadcast(offsets.toDF("stage", "sub", "off")), Seq("stage", "sub"))
      .withColumn("position", (col("off") +
        row_number().over(
          Window.partitionBy("stage", "sub").orderBy("skey", "doc_id")))
        .cast("long"))
      .select("doc_id", "stage", "n_words", "position")
      .orderBy("doc_id")
  }

  /** Fixed-size overlapping chunking — the RAG / context-window prep
    * stage: each document's whitespace tokens split into windows of
    * [[ChunkWindow]] tokens every [[ChunkStride]] (16-token overlap
    * carries context across boundaries). Pure row-local explode — a
    * narrow plan with NO shuffle at any scale; chunk identity is
    * (doc_id, chunk_id) and the emitted surface is the chunk's md5,
    * offsets and length, so the row stays small however long the
    * source text is. */
  private val ChunkWindow = 64
  private val ChunkStride = 48

  /** The chunk CORPUS — (doc_id, chunk_id, chunk_text) retrieval
    * units over the same windows [[chunkDocuments]] digests
    * (KernelSpec pins md5(chunk_text) == chunk_md5 per unit, so the
    * retrieval face and the digest face cannot drift). Shared with
    * [[Search.searchHybridChunks]]. */
  private[graft] def chunkCorpus(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(coalesce(col("text"), lit("")), " ").as("w"))
      .withColumn("n", size(col("w")))
      .withColumn("start",
        explode(sequence(lit(0), col("n") - 1, lit(ChunkStride))))
      .select(col("doc_id"),
        (col("start") / ChunkStride).cast("long").as("chunk_id"),
        array_join(slice(col("w"), col("start") + 1, lit(ChunkWindow)), " ")
          .as("chunk_text"))

  /** Corpus-level (n_docs, sum_dl) over [[chunkCorpus]]'s windows
    * WITHOUT materializing the windows (r17, guide §1.2 — don't
    * compute things you throw away): a chunk's word count is
    * `least(n − start, ChunkWindow)` EXACTLY, because chunk_text is
    * `array_join(slice(w, start+1, W), " ")` and space-split tokens
    * contain no spaces, so join-then-split is lossless — re-splitting
    * reproduces the slice, whose size is that formula. The start
    * offsets here are THE SAME `sequence(0, n−1, ChunkStride)`
    * expression chunkCorpus explodes, so the chunk count and each dl
    * are equal by construction, not by numeric luck (verified
    * value-identical on the fixture: (7945, 309211) both ways). This
    * turns the BM25 chunk faces' second full re-chunk pass (explode +
    * array_join + re-split per window) into one doc-level arithmetic
    * projection — at corpus scale, a full pass saved. */
  private[graft] def chunkCorpusStats(docs: DataFrame): DataFrame =
    docs
      .select(size(split(coalesce(col("text"), lit("")), " ")).as("n"))
      .select(col("n"),
        sequence(lit(0), col("n") - 1, lit(ChunkStride)).as("seq"))
      .select(size(col("seq")).cast("long").as("nc"),
        aggregate(transform(col("seq"),
            st => least(col("n") - st, lit(ChunkWindow)).cast("long")),
          lit(0L), (a, x) => a + x).as("dl"))
      .agg(sum("nc").cast("long").as("n_docs"),
        sum("dl").cast("long").as("sum_dl"))

  def chunkDocuments(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(coalesce(col("text"), lit("")), " ").as("w"))
      .withColumn("n", size(col("w")))
      .withColumn("start",
        explode(sequence(lit(0), col("n") - 1, lit(ChunkStride))))
      .select(
        col("doc_id"),
        (col("start") / ChunkStride).cast("long").as("chunk_id"),
        col("start").cast("long").as("start"),
        least(col("n") - col("start"), lit(ChunkWindow)).cast("long")
          .as("chunk_len"),
        md5(array_join(slice(col("w"), col("start") + 1, lit(ChunkWindow)), " "))
          .as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  /** Content-defined chunking — the FastCDC/rsync-family alternative
    * to [[chunkDocuments]]'s fixed stride: a chunk boundary opens
    * wherever the fingerprint of the trailing 4-word window falls in
    * a 1/32 slice of its space (md5 hex prefix < '08'), so an edit
    * near the start of a document moves only the chunk containing it
    * — every later boundary re-synchronizes on content. That is what
    * makes CHUNK-level dedup robust to insertions at 100 TB; under a
    * fixed stride every downstream chunk shifts and nothing matches.
    * Boundary test and chunk digest share their md5 surface with the
    * oracle verbatim. One shuffle (the per-doc position window); the
    * re-assembly groups bounded (doc_id, chunk_id) cells, and the
    * emitted row is digest + offsets, never the chunk text. */
  def chunkCdc(s: SparkSession, dir: String): DataFrame =
    cdcChunks(Tables.documents(s, dir))

  /** CDC kernel over any (doc_id, text) relation — split out so the
    * insertion re-sync property is testable on crafted docs. */
  private[graft] def cdcChunks(docs: DataFrame): DataFrame = {
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val run = byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), posexplode(split(coalesce(col("text"), lit("")), " ")))
      .toDF("doc_id", "pos", "w")
      .withColumn("gram", concat_ws(" ",
        lag("w", 3).over(byPos), lag("w", 2).over(byPos),
        lag("w", 1).over(byPos), col("w")))
      .withColumn("boundary",
        (col("pos") === 0) ||
          (col("pos") >= 3 && substring(md5(col("gram")), 1, 2) < "08"))
      .withColumn("chunk_id", sum(col("boundary").cast("long")).over(run) - 1)
      .groupBy("doc_id", "chunk_id")
      .agg(
        count(lit(1)).cast("long").as("n_words"),
        min("pos").cast("long").as("start"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x.getField("w")), " ")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Shared CDC oracle CTE (documents → positions → boundary flags →
    * per-chunk digests) — one source for the chunk_cdc and
    * dedup_chunk oracles so the boundary rule cannot drift. */
  private val CdcCte: String = """dd AS (
        SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
        FROM documents),
      tok AS (
        SELECT doc_id,
               unnest([{'pos': i - 1, 'w': w[i]}
                       FOR i IN range(1, len(w) + 1)], recursive := true)
        FROM dd),
      g AS (
        SELECT doc_id, pos, w,
               concat_ws(' ', lag(w, 3) OVER win, lag(w, 2) OVER win,
                         lag(w, 1) OVER win, w) AS gram
        FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
      b AS (
        SELECT doc_id, pos, w,
               CASE WHEN pos = 0
                         OR (pos >= 3 AND substr(md5(gram), 1, 2) < '08')
                    THEN 1 ELSE 0 END AS boundary
        FROM g),
      c AS (
        SELECT doc_id, pos, w,
               sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos) - 1
                 AS chunk_id
        FROM b),
      chunks AS (
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(min(pos) AS BIGINT) AS start,
               md5(string_agg(w, ' ' ORDER BY pos)) AS chunk_md5
        FROM c GROUP BY doc_id, chunk_id)"""

  /** Chunk-level exact dedup over the CDC chunking — what
    * [[chunkCdc]] exists FOR: boilerplate shared across documents
    * (headers, license blocks, templated passages) dedups at chunk
    * granularity even when no two whole documents match, and because
    * the boundaries are content-defined the same passage yields the
    * same digests wherever it sits. Reports each duplicated chunk
    * with its copy count and the tokens removable by keeping one
    * copy. Digest-only groupBy — chunk text never shuffles. */
  def dedupChunk(s: SparkSession, dir: String): DataFrame =
    cdcChunks(Tables.documents(s, dir))
      .groupBy("chunk_md5")
      .agg(
        count(lit(1)).cast("long").as("n_copies"),
        countDistinct("doc_id").as("n_docs"),
        min("doc_id").as("min_doc"),
        min("n_words").as("n_words"),
        ((count(lit(1)) - 1) * min("n_words")).as("words_saved"))
      .filter(col("n_copies") > 1)
      .orderBy("chunk_md5")

  /** Corpus n-gram vocabulary: top-20 unigrams and bigrams PER
    * LANGUAGE by occurrence count (ties broken lexicographically) —
    * the corpus-statistics read behind stopword lists, tokenizer-vocab
    * sanity checks, and boilerplate detection. Shape: one exploded
    * hash aggregate per n (map-side combine compacts each partition to
    * its surviving gram counts — the shuffle carries the gram domain,
    * not the token stream), then the per-(n, lang) top-20 rides a
    * rank window that Spark executes as WindowGroupLimit: each partition
    * forwards at most 20 rows per group before the final sort. At
    * 100 TB the only data-sized work is the scan+explode; everything
    * that moves is gram-domain-sized. */
  def textNgramTopk(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val w = Text.words(col("text"))
    def counts(n: Int): DataFrame =
      d.select(col("lang"),
          explode(if (n == 1) w else Text.shingles(w, n)).as("gram"))
        .groupBy("lang", "gram").agg(count(lit(1)).cast("long").as("n_occ"))
        .select(lit(n).as("n"), col("lang"), col("gram"), col("n_occ"))
    val rk = row_number().over(
      Window.partitionBy("n", "lang").orderBy(col("n_occ").desc, col("gram")))
    counts(1).unionByName(counts(2))
      .withColumn("rk", rk).filter(col("rk") <= 20)
      .orderBy("n", "lang", "rk")
  }

  /** Shared verbatim with the DuckDB oracle (the text_perplexity
    * discipline): per-character entropy term, quantized to a long
    * BEFORE the per-doc sum so summation order cannot perturb the
    * result. Free identifiers cv (char count) and nv (doc length). */
  private val EntropyTermSql =
    "CAST(floor((cv * (ln(nv) - ln(cv)) / ln(2) / nv) * 1e6) AS BIGINT)"

  /** Character-level Shannon entropy per document — the
    * degenerate-content gate (binary blobs, base64 runs, repeated-char
    * padding and keyboard mash all sit far from natural-language
    * entropy, so a [lo, hi] band on this column is a standard cheap
    * quality filter alongside [[textQuality]]'s word-level ratios).
    * H = Σ_c p_c·log2(1/p_c) in bits, each per-character term
    * quantized `floor(·1e6)` to a long before the sum — the
    * [[Perplexity]] quantized-ln discipline, so the DuckDB oracle
    * shares the formula string verbatim and hash-matches exactly.
    * Scale shape: the char explode is the only corpus-sized stage and
    * it immediately partial-aggregates to the (doc, char) domain
    * (≤ alphabet per doc); the doc-length window and final sum run on
    * that bounded relation. */
  def textEntropy(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("cv"))
    val withN = c.withColumn("nv",
      sum("cv").over(Window.partitionBy("doc_id")))
    withN.groupBy("doc_id")
      .agg(
        max("nv").cast("long").as("n_chars_split"),
        sum(expr(EntropyTermSql)).cast("long").as("entropy_fp"))
      .withColumn("entropy_bits",
        round(col("entropy_fp").cast("double") / 1e6, 6))
      .orderBy("doc_id")
  }

  /** Tokenizer-family evaluation — the "which tokenizer" audit every
    * pretraining effort runs before committing a vocab: all FOUR
    * frozen-artifact encoders (word BPE, byte BPE, unigram-LM,
    * WordPiece) over the SAME held-out slice (doc_id % 5 = 0, the
    * frozen faces' slice), one report row per family with the three
    * numbers that decide the choice — fertility (tokens per
    * whitespace word), compression (bytes per token), and the
    * unknown-word count (WordPiece's [UNK] path; byte BPE is 0 by
    * CONSTRUCTION — no out-of-alphabet case exists). One corpus-
    * linear pass computes all four encodings per row, one global
    * aggregate (exact integer sums), and the 4-row report assembles
    * driver-side from the single collected row (bounded state).
    * Declared no-oracle (the encoders are the adjudicated iterative
    * UDFs); BpeSpec pins the report totals EQUAL the per-doc frozen
    * faces' sums — the no-drift gate — plus the structural facts
    * (byte BPE never UNKs, every fertility positive). */
  def tokenizeEval(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    val w = Text.words(col("text"))
    val wcnt = bpeCountUdf(bpeMergesFrozen(s, dir))
    val bcnt = bpeBytesCountUdf(bpeBytesMergesFrozen(s, dir))
    val uvocab = s.read.parquet(unigramVocabPath(s, dir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ucnt = udf { (text: String) =>
      var n = 0L
      graft.functions.Bpe.pretokenize(text)
        .foreach(t => n += graft.functions.Unigram.segment(t, uvocab).length)
      n
    }
    val wpcnt = wordpieceCountUdf(
      s.read.parquet(wordpieceVocabPath(s, dir)).collect()
        .map(_.getString(0)).toSet)
    val m = Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(
        size(w).cast("long").as("ws"),
        octet_length(col("text")).cast("long").as("nb"),
        wcnt(w).as("t_bpe"), bcnt(col("text")).as("t_bytebpe"),
        ucnt(col("text")).as("t_unigram"), wpcnt(w).as("wp"))
      .agg(
        count(lit(1)).as("n_docs"), sum("ws").as("ws_words"),
        sum("nb").as("n_bytes"), sum("t_bpe").as("s_bpe"),
        sum("t_bytebpe").as("s_bytebpe"), sum("t_unigram").as("s_unigram"),
        sum(col("wp._1")).as("s_wp"), sum(col("wp._2")).as("s_unk"))
      .collect()(0)
    val (nDocs, wsW, nB) =
      (m.getAs[Long]("n_docs"), m.getAs[Long]("ws_words"), m.getAs[Long]("n_bytes"))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq(
      ("bpe_word", m.getAs[Long]("s_bpe"), 0L),
      ("bpe_byte", m.getAs[Long]("s_bytebpe"), 0L),
      ("unigram_lm", m.getAs[Long]("s_unigram"), 0L),
      ("wordpiece", m.getAs[Long]("s_wp"), m.getAs[Long]("s_unk")))
      .map { case (fam, toks, unk) =>
        (fam, nDocs, wsW, nB, toks,
          r6(toks.toDouble / wsW), r6(nB.toDouble / toks), unk)
      }
      .toDF("family", "n_docs", "ws_words", "n_bytes", "n_tokens",
        "fertility", "bytes_per_token", "unk_words")
      .orderBy("family")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_entropy" -> (textEntropy _),
    "text_ngram_topk" -> (textNgramTopk _),
    "dedup_chunk" -> (dedupChunk _),
    "chunk_cdc" -> (chunkCdc _),
    "sample_fixed_k" -> (sampleFixedK _),
    "shuffle_deterministic" -> (shuffleDeterministic _),
    "curriculum_order" -> (curriculumOrder _),
    "chunk_documents" -> (chunkDocuments _),
    "text_contamination" -> (textContamination _),
    "text_contamination_bloom" -> (textContaminationBloom _),
    "pack_efficiency" -> (packEfficiency _),
    "text_pii_scrub" -> (textPiiScrub _),
    "pipeline_curation" -> (pipelineCuration _),
    "text_clean" -> (textClean _),
    "text_split" -> (textSplit _),
    "text_rarity_score" -> (textRarityScore _),
    "sample_stratified" -> (sampleStratified _),
    "sample_temperature" -> (sampleTemperature _),
    "pack_sequences" -> (packSequences _),
    "pack_attention_spans" -> (packAttentionSpans _),
    "pack_greedy" -> (packGreedy _),
    "quality_funnel" -> (qualityFunnel _),
    "dedup_scoped" -> (dedupScoped _),
    "tokenize_bpe" -> (tokenizeBpe _),
    "tokenize_bpe_frozen" -> (tokenizeBpeFrozen _),
    "tokenize_bpe_bytes" -> (tokenizeBpeBytes _),
    "tokenize_bpe_bytes_frozen" -> (tokenizeBpeBytesFrozen _),
    "tokenize_unigram" -> (tokenizeUnigram _),
    "tokenize_unigram_frozen" -> (tokenizeUnigramFrozen _),
    "tokenize_wordpiece" -> (tokenizeWordpiece _),
    "tokenize_wordpiece_frozen" -> (tokenizeWordpieceFrozen _),
    "tokenize_eval" -> (tokenizeEval _),
    "pack_sequences_bpe" -> (packSequencesBpe _),
    "dedup_exact" -> (dedupExact _),
    "text_stats" -> (textStats _),
    "text_lang_filter" -> (textLangFilter _),
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_repetition" -> (textRepetition _),
    "text_fingerprint" -> (textFingerprint _),
    "text_langid" -> (textLangId _)
  )

  val oracles: Map[String, String] = Map(
    "text_entropy" -> s"""
      WITH ch AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
      c AS (
        SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cv
        FROM ch GROUP BY doc_id, ch),
      t AS (
        SELECT doc_id, cv,
          CAST(SUM(cv) OVER (PARTITION BY doc_id) AS BIGINT) AS nv
        FROM c)
      SELECT doc_id,
        CAST(max(nv) AS BIGINT) AS n_chars_split,
        CAST(SUM($EntropyTermSql) AS BIGINT) AS entropy_fp,
        ROUND(CAST(SUM($EntropyTermSql) AS DOUBLE) / 1e6, 6) AS entropy_bits
      FROM t GROUP BY doc_id ORDER BY doc_id""",
    "text_ngram_topk" -> """
      WITH w AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
      u AS (
        SELECT 1 AS n, lang, unnest(w) AS gram FROM w
        UNION ALL
        SELECT 2 AS n, lang,
          unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
        FROM w),
      c AS (
        SELECT n, lang, gram, CAST(count(*) AS BIGINT) AS n_occ
        FROM u GROUP BY n, lang, gram),
      r AS (
        SELECT *, CAST(row_number() OVER (
          PARTITION BY n, lang ORDER BY n_occ DESC, gram) AS INTEGER) AS rk
        FROM c)
      SELECT n, lang, gram, n_occ, rk FROM r WHERE rk <= 20
      ORDER BY n, lang, rk""",
    // The two-phase bucketed rank must equal the plain global rank.
    "sample_fixed_k" -> """
      SELECT lang, rk, doc_id FROM (
        SELECT lang, doc_id,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id)
            AS BIGINT) AS rk
        FROM documents) t
      WHERE rk <= 20 ORDER BY lang, rk""",
    "shuffle_deterministic" -> """
      SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS skey,
        ROW_NUMBER() OVER (
          ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id) AS position
      FROM documents ORDER BY doc_id""",
    "curriculum_order" -> """
      WITH t AS (
        SELECT doc_id,
          len(string_split(coalesce(text, ''), ' ')) AS n_words,
          md5('42:' || CAST(doc_id AS VARCHAR)) AS skey
        FROM documents)
      SELECT doc_id,
        least(3, n_words // 25) AS stage, n_words,
        ROW_NUMBER() OVER (
          ORDER BY least(3, n_words // 25), skey, doc_id) AS position
      FROM t ORDER BY doc_id""",
    "chunk_documents" -> """
      WITH t AS (
        SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
        FROM documents),
      s AS (
        SELECT doc_id, w, len(w) AS n,
               unnest(generate_series(0, len(w) - 1, 48)) AS start
        FROM t)
      SELECT doc_id, start // 48 AS chunk_id, start,
        least(n - start, 64) AS chunk_len,
        md5(coalesce(array_to_string(w[start + 1 : start + 64], ' '), ''))
          AS chunk_md5
      FROM s ORDER BY doc_id, chunk_id""",
    "chunk_cdc" -> s"""
      WITH $CdcCte
      SELECT doc_id, chunk_id, n_words, start, chunk_md5
      FROM chunks ORDER BY doc_id, chunk_id""",
    "dedup_chunk" -> s"""
      WITH $CdcCte
      SELECT chunk_md5,
             CAST(count(*) AS BIGINT) AS n_copies,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             min(doc_id) AS min_doc,
             min(n_words) AS n_words,
             CAST((count(*) - 1) * min(n_words) AS BIGINT) AS words_saved
      FROM chunks GROUP BY chunk_md5 HAVING count(*) > 1
      ORDER BY chunk_md5""",
    "text_contamination" -> """
      WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 200000, substring(text, instr(text, ' ') + 1)
        FROM documents WHERE doc_id < 20),
      g AS (
        SELECT doc_id, list_distinct([
            w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||
            w[i+5]||' '||w[i+6]||' '||w[i+7]
            FOR i IN range(1, len(w) - 6)]) AS gs
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs))
      SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
      FROM (SELECT doc_id, unnest(gs) AS g FROM g WHERE doc_id >= 20) c
      JOIN (SELECT doc_id AS bench_id, unnest(gs) AS g FROM g WHERE doc_id < 20) b
        ON c.g = b.g
      GROUP BY c.doc_id, b.bench_id
      ORDER BY c.doc_id, b.bench_id""",
    // the bloom prefilter is output-invisible (FPs die in the exact
    // confirm join; no false negatives by construction), so the oracle
    // is the plain doc-level gram join
    "text_contamination_bloom" -> """
      WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 200000, substring(text, instr(text, ' ') + 1)
        FROM documents WHERE doc_id < 20),
      g AS (
        SELECT doc_id, list_distinct([
            w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||
            w[i+5]||' '||w[i+6]||' '||w[i+7]
            FOR i IN range(1, len(w) - 6)]) AS gs
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs)),
      cj AS (
        SELECT c.doc_id, b.bench_id
        FROM (SELECT doc_id, unnest(gs) AS g FROM g WHERE doc_id >= 20) c
        JOIN (SELECT doc_id AS bench_id, unnest(gs) AS g FROM g WHERE doc_id < 20) b
          ON c.g = b.g)
      SELECT doc_id,
        CAST(COUNT(DISTINCT bench_id) AS BIGINT) AS n_bench_docs,
        CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM cj GROUP BY doc_id ORDER BY doc_id""",
    // same recurrence as pack_greedy, aggregated to the bin then shard
    // domain — the report face of the identical packing
    "pack_efficiency" -> """
      WITH RECURSIVE docs AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
          md5('42:' || CAST(doc_id AS VARCHAR)) AS skey
        FROM documents),
      p AS (
        SELECT CAST(MIN(pw) AS INTEGER) AS nshards FROM (
          SELECT (CAST(1 AS BIGINT) << i) AS pw FROM range(0, 31) t(i))
        WHERE pw * 512 >= (SELECT COUNT(*) FROM docs)),
      r AS (
        SELECT doc_id, n_tokens,
          CAST(CAST(concat('0x', substring(skey, 1, 8)) AS BIGINT)
            % (SELECT nshards FROM p) AS INTEGER) AS shard
        FROM docs),
      rk AS (
        SELECT shard, doc_id, n_tokens,
          ROW_NUMBER() OVER (PARTITION BY shard
                             ORDER BY n_tokens DESC, doc_id) AS rn
        FROM r),
      f AS (
        SELECT shard, doc_id, n_tokens, rn, 0 AS bin, n_tokens AS used
        FROM rk WHERE rn = 1
        UNION ALL
        SELECT rk.shard, rk.doc_id, rk.n_tokens, rk.rn,
          CASE WHEN f.used + rk.n_tokens > 512 THEN f.bin + 1 ELSE f.bin END,
          CASE WHEN f.used + rk.n_tokens > 512 THEN rk.n_tokens
               ELSE f.used + rk.n_tokens END
        FROM f JOIN rk ON rk.shard = f.shard AND rk.rn = f.rn + 1),
      b AS (
        SELECT shard, bin,
          CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM f GROUP BY shard, bin)
      SELECT shard,
        CAST(COUNT(*) AS BIGINT) AS n_bins,
        CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        CAST(SUM(bin_tokens) AS BIGINT) AS sum_tokens,
        CAST(SUM(GREATEST(512 - bin_tokens, 0)) AS BIGINT) AS pad_tokens,
        CAST(SUM(CASE WHEN bin_tokens > 512 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_oversize,
        CAST(MAX(bin_tokens) AS BIGINT) AS max_bin_tokens,
        CAST(MIN(bin_tokens) AS BIGINT) AS min_bin_tokens,
        ROUND(CAST(SUM(bin_tokens) AS DOUBLE) / (COUNT(*) * 512.0), 6)
          AS fill_rate
      FROM b GROUP BY shard ORDER BY shard""",
    "text_pii_scrub" -> """
      SELECT doc_id,
        CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
             AS INTEGER) AS n_emails,
        CAST(len(regexp_extract_all(raw, '\d{3}-\d{4}')) AS INTEGER) AS n_phones,
        md5(regexp_replace(
          regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
          '\d{3}-\d{4}', '<PHONE>', 'g')) AS scrubbed_md5
      FROM (SELECT doc_id,
        CASE WHEN doc_id % 10 = 0
          THEN text || ' contact user' || doc_id || '@example.com or 555-0142'
          ELSE text END AS raw
        FROM documents)
      ORDER BY doc_id""",
    "pipeline_curation" -> s"""
      WITH c AS (
        SELECT doc_id, lang, ${sqlClean("text")} AS ct
        FROM documents),
      q AS (
        SELECT doc_id, lang, ct,
          CAST(len(w) AS INTEGER) AS n_words,
          ${sqlQuality("w")} AS quality
        FROM (SELECT doc_id, lang, ct, string_split(ct, ' ') AS w FROM c))
      SELECT doc_id, lang, n_words, ROUND(quality, 6) AS quality,
        CASE WHEN ${sqlBucket("ct")} < 4096 THEN 'val' ELSE 'train' END AS split
      FROM q
      WHERE lang IN ('en', 'de', 'fr') AND n_words >= 20 AND quality >= 0.4
      QUALIFY ROW_NUMBER() OVER (PARTITION BY ct ORDER BY doc_id) = 1
      ORDER BY doc_id""",
    "text_clean" -> s"""
      SELECT doc_id,
        ${sqlClean("text")} AS clean_text,
        CAST(length(text) AS INTEGER) AS raw_len,
        CAST(length(${sqlClean("text")}) AS INTEGER) AS clean_len
      FROM documents ORDER BY doc_id""",
    "text_split" -> s"""
      SELECT doc_id,
        ${sqlBucket("text")} AS bucket,
        CASE WHEN ${sqlBucket("text")} < 4096
             THEN 'val' ELSE 'train' END AS split
      FROM documents ORDER BY doc_id""",
    "sample_stratified" -> s"""
      SELECT doc_id, lang, ${sqlBucket("text")} AS bucket
      FROM documents
      WHERE ${sqlBucket("text")} <
        CASE WHEN lang = 'en' THEN 16384 ELSE 65536 END
      ORDER BY doc_id""",
    // same planted mirror, same min-survivor windows (partition by the
    // raw text ≡ partition by its digest)
    "dedup_scoped" -> """
      WITH corpus AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT doc_id + 1099511627776 AS doc_id, 'src_mirror' AS source, text
        FROM documents WHERE doc_id < 40)
      SELECT doc_id, source,
        doc_id = MIN(doc_id) OVER (PARTITION BY text) AS kept_global,
        doc_id = MIN(doc_id) OVER (PARTITION BY source, text) AS kept_scoped
      FROM corpus ORDER BY doc_id""",
    // identical recurrence, identical (tokens desc, doc_id) walk order
    "pack_greedy" -> """
      WITH RECURSIVE docs AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
          md5('42:' || CAST(doc_id AS VARCHAR)) AS skey
        FROM documents),
      p AS (
        SELECT CAST(MIN(pw) AS INTEGER) AS nshards FROM (
          SELECT (CAST(1 AS BIGINT) << i) AS pw FROM range(0, 31) t(i))
        WHERE pw * 512 >= (SELECT COUNT(*) FROM docs)),
      r AS (
        SELECT doc_id, n_tokens,
          CAST(CAST(concat('0x', substring(skey, 1, 8)) AS BIGINT)
            % (SELECT nshards FROM p) AS INTEGER) AS shard
        FROM docs),
      rk AS (
        SELECT shard, doc_id, n_tokens,
          ROW_NUMBER() OVER (PARTITION BY shard
                             ORDER BY n_tokens DESC, doc_id) AS rn
        FROM r),
      f AS (
        SELECT shard, doc_id, n_tokens, rn, 0 AS bin, n_tokens AS used
        FROM rk WHERE rn = 1
        UNION ALL
        SELECT rk.shard, rk.doc_id, rk.n_tokens, rk.rn,
          CASE WHEN f.used + rk.n_tokens > 512 THEN f.bin + 1 ELSE f.bin END,
          CASE WHEN f.used + rk.n_tokens > 512 THEN rk.n_tokens
               ELSE f.used + rk.n_tokens END
        FROM f JOIN rk ON rk.shard = f.shard AND rk.rn = f.rn + 1)
      SELECT doc_id, shard, bin, n_tokens,
        CAST(SUM(n_tokens) OVER (PARTITION BY shard, bin) AS BIGINT)
          AS bin_tokens
      FROM f ORDER BY doc_id""",
    // shared predicate strings; counts of cumulative conjunctions
    "quality_funnel" -> """
      WITH d AS (
        SELECT doc_id, n_chars, lang, string_split(text, ' ') AS w
        FROM documents),
      f AS (
        SELECT
          (n_chars BETWEEN 100 AND 2000) AS f1,
          (lang IN ('en', 'de', 'fr', 'es')) AS f2,
          (len(w) >= 20) AS f3,
          (len(list_distinct(w)) * 10 >= len(w) * 4) AS f4,
          (list_contains(w, 'the') OR list_contains(w, 'a')) AS f5
        FROM d),
      a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS s0,
          CAST(COUNT(CASE WHEN f1 THEN 1 END) AS BIGINT) AS s1,
          CAST(COUNT(CASE WHEN f1 AND f2 THEN 1 END) AS BIGINT) AS s2,
          CAST(COUNT(CASE WHEN f1 AND f2 AND f3 THEN 1 END) AS BIGINT) AS s3,
          CAST(COUNT(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 END) AS BIGINT) AS s4,
          CAST(COUNT(CASE WHEN f1 AND f2 AND f3 AND f4 AND f5 THEN 1 END) AS BIGINT) AS s5
        FROM f)
      SELECT stage, rule, n_in, n_in - n_out AS n_dropped, n_out FROM (
        SELECT 1 AS stage, 'len_window' AS rule, s0 AS n_in, s1 AS n_out FROM a
        UNION ALL SELECT 2, 'lang_allow', s1, s2 FROM a
        UNION ALL SELECT 3, 'min_tokens', s2, s3 FROM a
        UNION ALL SELECT 4, 'distinct_ratio', s3, s4 FROM a
        UNION ALL SELECT 5, 'stopword_present', s4, s5 FROM a)
      ORDER BY stage""",
    "pack_sequences" -> s"""
      WITH d AS (
        SELECT doc_id,
          CAST(${sqlBucket("text")} % 64 AS INTEGER) AS shard,
          len(string_split(text, ' ')) AS n_tokens
        FROM documents
      ), c AS (
        SELECT doc_id, shard, n_tokens,
          SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS tok_end
        FROM d
      )
      SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(tok_end - n_tokens AS BIGINT) AS tok_start,
        CAST(floor((tok_end - n_tokens) / 2048.0) AS BIGINT) AS seq_in_shard,
        CAST((tok_end - n_tokens) % 2048 AS BIGINT) AS seq_offset
      FROM c ORDER BY doc_id""",
    "pack_attention_spans" -> s"""
      WITH d AS (
        SELECT doc_id,
          CAST(${sqlBucket("text")} % 64 AS INTEGER) AS shard,
          len(string_split(text, ' ')) AS n_tokens
        FROM documents
      ), c AS (
        SELECT doc_id, shard, n_tokens,
          SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS tok_end
        FROM d
      ), p AS (
        SELECT doc_id, shard,
          CAST(tok_end - n_tokens AS BIGINT) AS tok_start,
          CAST(tok_end AS BIGINT) AS tok_end
        FROM c WHERE n_tokens > 0
      ), e AS (
        SELECT doc_id, shard, tok_start, tok_end,
          UNNEST(range(CAST(floor(tok_start / 2048.0) AS BIGINT),
                       CAST(floor((tok_end - 1) / 2048.0) AS BIGINT) + 1))
            AS seq
        FROM p
      ), sp AS (
        SELECT shard, seq, doc_id,
          GREATEST(tok_start - seq * 2048, 0) AS span_start,
          LEAST(tok_end - seq * 2048, 2048) AS span_end
        FROM e
      )
      SELECT shard, seq,
        ROW_NUMBER() OVER (PARTITION BY shard, seq
                           ORDER BY span_start ASC, doc_id ASC) AS slot,
        doc_id, span_start, span_end,
        COUNT(*) OVER (PARTITION BY shard, seq) AS n_docs
      FROM sp ORDER BY shard, seq, slot""",
    "sample_temperature" -> s"""
      WITH c AS (SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY lang),
      t AS (SELECT lang, n_s, round(pow(n_s, 0.7), 6) AS w FROM c),
      s AS (SELECT CAST(SUM(n_s) AS DOUBLE) AS n_total,
                   CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS w_total FROM t),
      thr AS (
        SELECT lang,
          CAST(floor(round(least(1.0, w / w_total * (0.5 * n_total) / n_s), 6)
            * 65536) AS INTEGER) AS thr
        FROM t, s)
      SELECT d.doc_id, d.lang, d.bucket
      FROM (SELECT doc_id, lang, ${sqlBucket("text")} AS bucket FROM documents) d
      JOIN thr ON d.lang = thr.lang
      WHERE d.bucket < thr.thr
      ORDER BY doc_id""",
    "text_rarity_score" -> """
      WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      d AS (
        SELECT word, count(*) AS df FROM (
          SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
          FROM documents) GROUP BY word),
      n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT w.doc_id, count(*) AS n_words,
        floor(sum(d.df) * 1e9 / (count(*) * n.n_docs)) / 1e9 AS familiarity
      FROM w JOIN d USING (word) CROSS JOIN n
      GROUP BY w.doc_id, n.n_docs
      ORDER BY w.doc_id""",
    "dedup_exact" -> """
      SELECT min(doc_id) AS doc_id, sha256(text) AS text_sha,
             min(n_chars) AS n_chars
      FROM documents GROUP BY text ORDER BY doc_id""",
    "text_stats" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS sum_words,
        ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
      FROM documents GROUP BY lang ORDER BY lang""",
    "text_lang_filter" -> """
      SELECT doc_id, lang, source, n_chars FROM documents
      WHERE lang IN ('en', 'de') AND n_chars BETWEEN 100 AND 400
      ORDER BY doc_id""",
    "text_tokens" -> """
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INTEGER) AS re_tokens,
        n_chars
      FROM documents ORDER BY doc_id""",
    "text_quality" -> s"""
      SELECT doc_id,
        CAST(len(w) AS INTEGER) AS n_words,
        ROUND(CAST(len(replace(text, ' ', '')) AS DOUBLE) / len(w), 6) AS avg_word_len,
        ROUND(CAST(${sqlStopCount("w")} AS DOUBLE) / len(w), 6) AS stop_ratio,
        ROUND(${sqlQuality("w")}, 6) AS quality_score
      FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
      ORDER BY doc_id""",
    "text_repetition" -> """
      WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
      ), m AS (
        SELECT doc_id, len(w) AS n_words,
          len(list_distinct(w)) AS n_distinct_words,
          list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS bi
        FROM base
      ), t AS (
        SELECT doc_id, MAX(c) AS top_word_count FROM (
          SELECT doc_id, word, COUNT(*) AS c
          FROM (SELECT doc_id, unnest(w) AS word FROM base)
          GROUP BY doc_id, word)
        GROUP BY doc_id
      ), f AS (
        SELECT m.doc_id,
          ROUND(1.0 - CAST(n_distinct_words AS DOUBLE) / n_words, 6) AS dup_word_frac,
          ROUND(CAST(top_word_count AS DOUBLE) / n_words, 6) AS top_word_frac,
          ROUND(CASE WHEN len(bi) > 0
            THEN 1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / len(bi)
            ELSE 0.0 END, 6) AS dup_bigram_frac
        FROM m JOIN t ON m.doc_id = t.doc_id
      )
      SELECT doc_id, dup_word_frac, top_word_frac, dup_bigram_frac,
        (dup_word_frac <= 0.4 AND top_word_frac <= 0.2
          AND dup_bigram_frac <= 0.2) AS keep
      FROM f ORDER BY doc_id""",
    "text_fingerprint" -> """
      SELECT doc_id,
        list_min([md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                  FOR i IN range(1, len(w)-1)]) AS fp
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      ORDER BY doc_id"""
    // text_langid: no oracle (multi-stage learned pipeline)
    // tokenize_bpe, pack_sequences_bpe: no oracle (iterative BPE
    // training/encoding has no SQL form; BpeSpec pins merges with a
    // known-answer corpus + lossless-encode round trip + placement
    // recomputation)
  )
}
