package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Text

/** Corpus-assembly stages of a pre-training pipeline: carving a fixed
  * token budget out of a shuffled corpus, and scheduling a weighted
  * mixture across sources. Both are ORDERING problems at 100 TB, and
  * both use the same discipline as `shuffle_deterministic`: the order
  * key is a pure function of (seed, doc_id) — md5("42:" + id) — and
  * any global rank/prefix-sum is computed two-phase (bucket by the
  * key's first 16 bits, collect the ≤65536 bounded per-bucket totals,
  * broadcast cumulative offsets, finish with a per-bucket window) so
  * NO global single-task window exists at any data size.
  */
object Mixture extends QueryGroup {

  private val Seed = "42"
  private def skeyCol: org.apache.spark.sql.Column = skeyCol(Seed)
  /** Seeded shuffle key — ONE definition for every phase/seed, so the
    * key scheme cannot fork between the main and anneal orders. */
  private def skeyCol(seed: String): org.apache.spark.sql.Column =
    md5(concat_ws(":", lit(seed), col("doc_id").cast("string")))
  private def bucketCol = conv(substring(col("skey"), 1, 4), 16, 10).cast("int")

  /** Token-budget subset — "give me the first N tokens of the shuffled
    * corpus, reproducibly": documents in deterministic shuffle order,
    * kept while the running token total fits the budget. The running
    * total is a distributed prefix sum: phase 1 aggregates per-bucket
    * token counts (bounded at 65536 rows, collected + broadcast as
    * cumulative offsets), phase 2 adds a per-bucket running window.
    * The kept set is a clean prefix: the first document that would
    * cross the budget blocks everything after it. */
  /** Two-phase distributed token-budget prefix over (doc_id, skey,
    * n_tokens) rows: per-bucket totals (≤65536, collected + broadcast
    * as cumulative offsets) + a per-bucket running window — the
    * budget cut without a global single-task window. Shared by
    * [[sampleTokenBudget]] and both phases of [[mixAnneal]]. */
  private def budgetPrefix(s: SparkSession, base0: DataFrame, budget: Long): DataFrame = {
    val sp = s; import sp.implicits._
    val base = base0.withColumn("b", bucketCol)
    val counts = base.groupBy("b").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toSeq
    base
      .join(broadcast(offsets.toDF("b", "off")), "b")
      .withColumn("cum_end", col("off") +
        sum("n_tokens").over(Window.partitionBy("b").orderBy("skey", "doc_id")))
      .filter(col("cum_end") <= budget)
      .select("doc_id", "skey", "n_tokens", "cum_end")
  }

  def sampleTokenBudget(s: SparkSession, dir: String): DataFrame =
    budgetPrefix(s,
      Tables.documents(s, dir)
        .select(col("doc_id"), skeyCol.as("skey"),
          size(Text.words(col("text"))).cast("long").as("n_tokens")),
      budget = 10000L)
      .orderBy("doc_id")

  /** Two-phase annealing schedule — the "midtraining" recipe current
    * pretraining runs publish (late-stage quality upweighting): the
    * MAIN phase fills 90% of the token budget from the full corpus in
    * the standard seed-42 shuffle order; the ANNEAL phase fills the
    * final 10% from the HIGH-QUALITY subset only (the
    * [[TextOps.funnelFlags]] gates — shared definition, so the gate
    * and the report cannot drift), re-shuffled under its own seed.
    * A document may appear in both phases — annealing deliberately
    * re-samples quality data the run has already seen. Both phases
    * are the same distributed budget prefix as
    * [[sampleTokenBudget]]; the union is stage-tagged, so the output
    * IS the loader's schedule. */
  def mixAnneal(s: SparkSession, dir: String): DataFrame = {
    val annealSkey = skeyCol("77")
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"), col("lang"),
        Text.words(col("text")).as("w"))
    val main = budgetPrefix(s,
      d.select(col("doc_id"), skeyCol.as("skey"),
        size(col("w")).cast("long").as("n_tokens")),
      budget = 10800L)
      .select(lit("main").as("stage"), col("doc_id"), col("n_tokens"),
        col("cum_end"))
    val anneal = budgetPrefix(s,
      d.filter(TextOps.funnelFlags.reduce(_ && _))
        .select(col("doc_id"), annealSkey.as("skey"),
          size(col("w")).cast("long").as("n_tokens")),
      budget = 1200L)
      .select(lit("anneal").as("stage"), col("doc_id"), col("n_tokens"),
        col("cum_end"))
    main.unionByName(anneal).orderBy("stage", "doc_id")
  }

  /** Weighted mixture schedule — the "sample source A 4× as often as
    * source C" interleave of pre-training data loading, as a
    * deterministic ordering: each document gets a per-source shuffle
    * rank r (two-phase, bucketed WITHIN source so a 90%-of-corpus
    * source never funnels through one task) and a virtual time r/w.
    * Merging all sources by vtime yields the weighted round-robin
    * order; weights are powers of two so every vtime is an exact
    * double and the schedule is bit-reproducible anywhere. */
  def mixSources(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    val weight = when(col("source") === "src0", lit(4.0))
      .when(col("source") === "src1", lit(2.0)).otherwise(lit(1.0))
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), skeyCol.as("skey"))
      .withColumn("b", bucketCol)
    val counts = base.groupBy("source", "b").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
    // per-source cumulative offsets: each (source, bucket)'s offset is
    // the count of that source's rows in all LOWER buckets
    val offsets = counts.groupBy(_._1._1).toSeq.flatMap { case (_, cs) =>
      val sorted = cs.sortBy(_._1._2)
      sorted.map(_._1).zip(sorted.map(_._2).scanLeft(0L)(_ + _))
        .map { case ((src, b), off) => (src, b, off) }
    }
    base
      .join(broadcast(offsets.toDF("source", "b", "off")), Seq("source", "b"))
      .withColumn("r", (col("off") + row_number().over(
        Window.partitionBy("source", "b").orderBy("skey", "doc_id"))).cast("long"))
      .withColumn("vtime", col("r").cast("double") / weight)
      .select("doc_id", "source", "r", "vtime")
      .orderBy("doc_id")
  }

  /** Per-source corpus statistics — the data-map a mixture schedule is
    * planned FROM (how many tokens does each source hold, how long are
    * its documents, how language-diverse is it): doc/token totals,
    * max, language count, and an EXACT lower-median token length per
    * source.
    *
    * The median is the scale problem: a naive percentile aggregate
    * buffers every group member (100 TB of lengths on one reducer for
    * a dominant source). Here it rides a bounded-domain HISTOGRAM —
    * groupBy (source, n_words) partial-aggregates to ≤ sources ×
    * max-doc-length rows (domain-sized, not corpus-sized), and the
    * median is read off the histogram's running count with one tiny
    * window: min n_words whose cumulative count reaches ⌈n/2⌉. Every
    * output is an integer — no float surface at all — and the oracle
    * shares the histogram formula. */
  def statsCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("source"), col("lang"),
        size(split(coalesce(col("text"), lit("")), " ")).as("n_words"))
    val agg = d.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_words").cast("long")).as("n_tokens"),
      max("n_words").as("max_tokens"),
      countDistinct("lang").as("n_langs"))
    val hist = d.groupBy("source", "n_words").agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy("source").orderBy("n_words")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = hist.withColumn("cum", sum("c").over(wcum))
      .join(agg.select(col("source"), col("n_docs")), "source")
      .filter(col("cum") >= expr("(n_docs + 1) div 2"))
      .groupBy("source").agg(min("n_words").as("median_tokens"))
    agg.join(med, "source")
      .select("source", "n_docs", "n_tokens", "median_tokens",
        "max_tokens", "n_langs")
      .orderBy("source")
  }

  /** Epoch allocation — the data-recipe step between [[statsCorpus]]
    * (what each source holds) and [[mixSources]] (the interleave
    * order): given a token budget of 2× the corpus, per-source
    * weights, and a 3-epoch repetition cap (the "don't repeat a small
    * source forever" rule every published pre-training recipe
    * carries), how many EPOCHS of each source does the run consume?
    * Two-round capped water-filling, entirely in 64-bit integer
    * fixed-point (epochs scaled 1e6): round 1 allocates the budget
    * weight-proportionally and caps, round 2 redistributes the
    * leftover over the uncapped sources by the same rule. Fixed round
    * count ⇒ SQL-expressible ⇒ hash-exact oracle.
    *
    * Scale shape: ONE corpus-sized aggregate (per-source token
    * totals, map-side combined to the source domain); every later
    * step is arithmetic over source-domain rows with 1-row aggregate
    * cross-joins — no collect, no window, nothing driver-side. */
  def mixEpochs(s: SparkSession, dir: String): DataFrame = {
    val E6 = 3000000L // 3-epoch cap, 1e6 fixed point
    val w = when(col("source") === "src0", lit(4L))
      .when(col("source") === "src1", lit(2L)).otherwise(lit(1L))
    val src = Tables.documents(s, dir)
      .select(col("source"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("nw"))
      .groupBy("source")
      .agg(sum("nw").as("n_tokens"))
      .withColumn("w", w)
    val tot = src.agg(
      sum(col("w") * col("n_tokens")).cast("long").as("wt_sum"),
      (sum("n_tokens") * 2).cast("long").as("budget"))
    val r1 = src.crossJoin(tot)
      .withColumn("e1",
        least(lit(E6), expr("(budget * w * 1000000) div wt_sum")))
    val r1agg = r1.agg(
      sum(expr("(e1 * n_tokens) div 1000000")).cast("long").as("used"),
      sum(when(col("e1") < E6, col("w") * col("n_tokens"))
        .otherwise(0L)).cast("long").as("wt_unc"))
    r1.crossJoin(r1agg)
      .withColumn("e2",
        when(col("e1") < E6 && col("wt_unc") > 0,
          least(lit(E6), col("e1") +
            expr("((budget - used) * w * 1000000) div wt_unc")))
          .otherwise(col("e1")))
      .select(col("source"), col("n_tokens"), col("w").as("weight"),
        col("budget"), col("e2").as("epochs_fp"),
        expr("(e2 * n_tokens) div 1000000").as("tokens_alloc"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mix_anneal" -> (mixAnneal _),
    "mix_epochs" -> (mixEpochs _),
    "sample_token_budget" -> (sampleTokenBudget _),
    "mix_sources" -> (mixSources _),
    "stats_corpus" -> (statsCorpus _)
  )

  val oracles: Map[String, String] = Map(
    // both phases as plain global running-sum windows over the same
    // seeded orders; the anneal subset repeats the funnel predicates
    "mix_anneal" -> """
      WITH d AS (
        SELECT doc_id, n_chars, lang, string_split(text, ' ') AS w
        FROM documents),
      mainp AS (
        SELECT 'main' AS stage, doc_id, n_tokens,
          CAST(cum_end AS BIGINT) AS cum_end
        FROM (
          SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
            SUM(CAST(len(w) AS BIGINT)) OVER (
              ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id)
              AS cum_end
          FROM d)
        WHERE cum_end <= 10800),
      ann AS (
        SELECT 'anneal' AS stage, doc_id, n_tokens,
          CAST(cum_end AS BIGINT) AS cum_end
        FROM (
          SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
            SUM(CAST(len(w) AS BIGINT)) OVER (
              ORDER BY md5('77:' || CAST(doc_id AS VARCHAR)), doc_id)
              AS cum_end
          FROM d
          WHERE (n_chars BETWEEN 100 AND 2000)
            AND lang IN ('en', 'de', 'fr', 'es')
            AND len(w) >= 20
            AND len(list_distinct(w)) * 10 >= len(w) * 4
            AND (list_contains(w, 'the') OR list_contains(w, 'a')))
        WHERE cum_end <= 1200)
      SELECT stage, doc_id, n_tokens, cum_end FROM (
        SELECT * FROM mainp UNION ALL SELECT * FROM ann)
      ORDER BY stage, doc_id""",
    // same two-round integer water-filling, verbatim; every SUM cast
    // back to BIGINT (DuckDB sums into HUGEINT)
    "mix_epochs" -> """
      WITH src AS (
        SELECT source,
          CAST(SUM(CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT))
               AS BIGINT) AS n_tokens,
          CASE source WHEN 'src0' THEN 4 WHEN 'src1' THEN 2 ELSE 1 END AS w
        FROM documents GROUP BY source),
      tot AS (
        SELECT CAST(SUM(w * n_tokens) AS BIGINT) AS wt_sum,
               CAST(SUM(n_tokens) * 2 AS BIGINT) AS budget
        FROM src),
      r1 AS (
        SELECT src.*, tot.budget,
          LEAST(3000000, (budget * w * 1000000) // wt_sum) AS e1
        FROM src CROSS JOIN tot),
      r1agg AS (
        SELECT CAST(SUM((e1 * n_tokens) // 1000000) AS BIGINT) AS used,
          CAST(SUM(CASE WHEN e1 < 3000000 THEN w * n_tokens ELSE 0 END)
               AS BIGINT) AS wt_unc
        FROM r1)
      SELECT source, n_tokens, CAST(w AS BIGINT) AS weight, budget,
        CAST(CASE WHEN e1 < 3000000 AND wt_unc > 0
          THEN LEAST(3000000,
                     e1 + ((budget - used) * w * 1000000) // wt_unc)
          ELSE e1 END AS BIGINT) AS epochs_fp,
        CAST((CASE WHEN e1 < 3000000 AND wt_unc > 0
          THEN LEAST(3000000,
                     e1 + ((budget - used) * w * 1000000) // wt_unc)
          ELSE e1 END * n_tokens) // 1000000 AS BIGINT) AS tokens_alloc
      FROM r1 CROSS JOIN r1agg
      ORDER BY source""",
    "stats_corpus" -> """
      WITH d AS (
        SELECT source, lang,
          len(string_split(coalesce(text, ''), ' ')) AS n_words
        FROM documents),
      a AS (
        SELECT source, count(*) AS n_docs, sum(n_words) AS n_tokens,
               max(n_words) AS max_tokens, count(DISTINCT lang) AS n_langs
        FROM d GROUP BY source),
      h AS (
        SELECT source, n_words, count(*) AS c
        FROM d GROUP BY source, n_words),
      cum AS (
        SELECT source, n_words,
          sum(c) OVER (PARTITION BY source ORDER BY n_words) AS cum
        FROM h),
      m AS (
        SELECT cum.source, min(n_words) AS median_tokens
        FROM cum JOIN a ON cum.source = a.source
        WHERE cum.cum >= (a.n_docs + 1) // 2
        GROUP BY cum.source)
      SELECT a.source, n_docs,
             CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(median_tokens AS INTEGER) AS median_tokens,
             CAST(max_tokens AS INTEGER) AS max_tokens,
             n_langs
      FROM a JOIN m ON a.source = m.source ORDER BY a.source""",
    // Plain global running sum over the same shuffle order.
    "sample_token_budget" -> """
      WITH t AS (
        SELECT doc_id,
               md5('42:' || CAST(doc_id AS VARCHAR)) AS skey,
               CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
                 AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, skey, n_tokens,
               SUM(n_tokens) OVER (ORDER BY skey, doc_id) AS cum_end
        FROM t)
      SELECT doc_id, skey, n_tokens, CAST(cum_end AS BIGINT) AS cum_end
      FROM c WHERE cum_end <= 10000 ORDER BY doc_id""",
    // Plain per-source ROW_NUMBER over the same order; weights are
    // powers of two so r/w is exact in both engines.
    "mix_sources" -> """
      WITH r AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id) AS r
        FROM documents)
      SELECT doc_id, source, CAST(r AS BIGINT) AS r,
             CAST(r AS DOUBLE) /
               (CASE source WHEN 'src0' THEN 4e0 WHEN 'src1' THEN 2e0
                ELSE 1e0 END) AS vtime
      FROM r ORDER BY doc_id"""
  )
}
