package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.multimodal.{MediaCodec, MediaRecord}

/** Multimodal columns (SURVEY.md §2.K).
  *
  * Binary payloads + typed metadata survive the pipeline as
  * struct/binary columns; the decode stage runs as a typed
  * mapPartitions (per-partition batches — where a real codec would
  * amortize library init), with a stubbed codec (see
  * graft.multimodal.MediaCodec). Both queries are oracle-checked:
  * the oracle recomputes the stub's byte statistics with SQL string
  * functions.
  */
object Multimodal extends QueryGroup {

  /** Nested struct/binary round-trip: pack payload + metadata, then
    * re-flatten and measure. */
  def multimodalCols(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        struct(
          col("text").cast("binary").as("payload"),
          struct(col("lang"), col("n_chars")).as("meta")).as("media"))
      .select(
        col("doc_id"),
        octet_length(col("media.payload")).as("n_bytes"),
        col("media.meta.lang").as("lang"),
        col("media.meta.n_chars").as("n_chars"))
      .orderBy("doc_id")

  /** Decode pipeline: binary payload → per-partition batched decode
    * (stub codec) → fixed-width feature columns. */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("lang"))
      .as[MediaRecord]
      .mapPartitions(_.map(MediaCodec.decode))
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling: 1 payload → 4 frame rows via a typed flatMap
    * (stub codec chunks the payload; a real one decodes a container).
    * Character-based chunking on both sides keeps the oracle exact on
    * this ASCII corpus. */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("lang"))
      .as[MediaRecord]
      .flatMap(MediaCodec.sampleFrames(_, 4))
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize: fixed-width resample (8 evenly spaced code points) —
    * the fixed-output-shape contract of an image resize. */
  def multimodalResize(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("lang"))
      .as[MediaRecord]
      .map(MediaCodec.resize(_, 8))
      .toDF("doc_id", "resized")
      // fixed-width int array under test; joined to a scalar so the
      // driver's pandas compare can hash the column
      .select(col("doc_id"),
        array_join(col("resized").cast("array<string>"), ",").as("resized"))
      .orderBy("doc_id")
  }

  /** CLIP-score filtering (the LAION curation gate): a paired-modality
    * corpus keeps a pair only when the image embedding and its
    * caption embedding agree — cosine(img, txt) ≥ τ. Pairs are modeled
    * as consecutive embedding rows (img = even vec_id, caption =
    * odd vec_id = img + 1 — the layout a contact-sheet ingest writes);
    * the score is the engine's codegen float-dot kernel, mirrored
    * bit-for-bit in the oracle (the sim_topk discipline: FLOAT
    * products CAST to DOUBLE, left-to-right sum). The keep flag stays
    * in the output (the audit table a curation run publishes) rather
    * than dropping rows, so the filter rate is visible. One equi-join
    * on the derived pair key — shuffle bounded by the pair count, and
    * at 100 TB the pair key is the ingest's own co-partitioning, so
    * the join is shuffle-free on a bucketed layout. */
  def multimodalClipFilter(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vectors
    val emb = Tables.embeddings(s, dir)
    val img = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
      .select(col("vec_id").as("img_id"), col("embedding").as("vimg"))
    val txt = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
      .select((col("vec_id") - 1).as("img_id"), col("vec_id").as("txt_id"),
        col("embedding").as("vtxt"))
    img.join(txt, "img_id")
      .withColumn("clip_score", round(Vectors.fdot(col("vimg"), col("vtxt")), 6))
      .select(col("img_id"), col("txt_id"), col("clip_score"),
        (col("clip_score") >= 0.1).as("keep"))
      .orderBy("img_id")
  }

  /** Perceptual-hash near-dup detection over the media corpus — the
    * image-dedup stage every multimodal curation run needs (re-encoded
    * / lightly-retouched copies share no byte hash but collide
    * perceptually). Pipeline: stub resize to a 64-cell grid →
    * [[graft.multimodal.MediaCodec.ahash64]] (mean-threshold sign
    * bits — the aHash; a production pHash swaps in a DCT, same 64-bit
    * contract) → the SimHash banding discipline (8 bands × 8 bits:
    * pigeonhole guarantees every Hamming ≤ 7 pair collides in some
    * band, so the banded join provably equals brute force at the
    * declared τ = 6) → XOR+popcount verify on candidates only.
    * Planted mutants: docs < 20 re-encoded with one mid-payload
    * symbol changed (+2^40 ids) — a pixel-local perturbation, the
    * near-dup class byte hashing misses. Because the whole chain is
    * integer arithmetic over sampled code points, the ORACLE restates
    * it exactly (per-bit mirror, brute-force pairs) — hash-checked,
    * like the md5-rekeyed dedup_simhash (round 13). Scale:
    * candidates are band-bucketed, never all-pairs; signatures are 8
    * bytes/doc; the brute-force mirror lives only in DuckDB. */
  /** The one-symbol "re-encode" perturbation planted as a perceptual
    * near-dup — ONE definition shared by [[multimodalDedupPhash]] and
    * [[Pipeline.pipelineMultimodal]] (and mirrored by [[sqlReencode]])
    * so the planted class cannot drift between the standalone op and
    * the capstone. */
  private[graft] def reencodeMutant: Column =
    concat(
      expr("substring(text, 1, length(text) div 2)"), lit("Z"),
      expr("substring(text, length(text) div 2 + 2)"))
  private[operators] def sqlReencode(x: String): String =
    s"substr($x, 1, len($x) // 2) || 'Z' || substr($x, len($x) // 2 + 2)"

  /** Shared pHash pair machinery over a (doc_id, text) feed: one
    * typed-map signature pass (pinned — both band sides read it), the
    * chunk-PAIR banded self-join, XOR+popcount verify at τ = 6.
    * Banding is dedup_simhash's round-2 scale lever verbatim: 28
    * bands of 16 bits (every pair of 8-bit chunks) instead of 8 bands
    * of 8 bits — a Hamming ≤ 6 pair dirties at most 6 of 8 chunks,
    * leaving ≥ 2 clean, so some clean PAIR collides and recall stays
    * pigeonhole-guaranteed; bucket occupancy is |corpus|/2^16 per
    * band, so candidates grow linearly where single-chunk banding
    * grew quadratically (measured: the 8×8-bit cut ran 199 s at ×100
    * — n²/256 candidate pairs — this one is in BASELINE.md's receipt
    * table). Returns (id_a, id_b, hamming), id_a < id_b, unordered. */
  /** aHash signature relation over a (doc_id, text) feed — one typed
    * map pass, pinned (every consumer reads it once). */
  private def sigOf(s: SparkSession, feed: DataFrame): DataFrame = {
    val sp = s
    import sp.implicits._
    feed
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("xx").as("lang"))
      .as[MediaRecord]
      .map(r => (r.doc_id, MediaCodec.ahash64(MediaCodec.resize(r, 64)._2)))
      .toDF("doc_id", "ph")
      .localCheckpoint()
  }

  /** Banded Hamming ≤ 6 pairs over a (doc_id, ph) relation. Banding
    * is dedup_simhash's round-2 scale lever verbatim: 28 bands of 16
    * bits (every PAIR of 8-bit chunks) — a Hamming ≤ 6 pair dirties
    * at most 6 of 8 chunks, leaving ≥ 2 clean, so some clean pair
    * collides and recall is pigeonhole-guaranteed, with 2^16 buckets
    * per band instead of single-chunk banding's 2^8. */
  private def pairsFromSig(sig: DataFrame): DataFrame = {
    def chunk(c: Int) = shiftright(col("ph"), c * 8).bitwiseAND(lit(0xFFL))
    val pairsIdx = for { i <- 0 until 8; j <- i + 1 until 8 } yield (i, j)
    val bands = sig.select(col("doc_id"), col("ph"),
      explode(array(pairsIdx.zipWithIndex.map { case ((i, j), p) =>
        struct(lit(p).as("b"),
          (chunk(i) * lit(256L) + chunk(j)).as("chunk"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("ph"), col("bk.b"), col("bk.chunk"))
    val a = bands.select(col("doc_id").as("id_a"), col("ph").as("pha"),
      col("b"), col("chunk"))
    val bb = bands.select(col("doc_id").as("id_b"), col("ph").as("phb"),
      col("b"), col("chunk"))
    a.join(bb, Seq("b", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "pha", "phb").distinct()
      .withColumn("hamming", bit_count(col("pha").bitwiseXOR(col("phb"))))
      .filter(col("hamming") <= 6)
      .select("id_a", "id_b", "hamming")
  }

  /** Per-doc perceptual-dedup verdicts over a (doc_id, text) feed —
    * the LINEAR-OUTPUT contract a 100 TB corpus needs. Emitting the
    * pair relation is quadratic in duplicate-group size (a corpus
    * with g identical-signature copies owes C(g,2) rows — measured
    * 290 s at the ×100 fixture, whose template texts form exactly
    * such groups), so dedup runs in two tiers instead:
    * (1) EXACT tier — identical 64-bit signatures collapse in ONE
    * hash aggregate (min-id representative; members never meet the
    * band join at all); (2) NEAR tier — only the DISTINCT-signature
    * representatives enter the banded Hamming join, and a rep is
    * dropped by the smallest rep within Hamming ≤ 6. The kept set is
    * PROVABLY the same as the pair rule's "drop the larger id of
    * every colliding pair": a smaller colliding doc e always has a
    * rep e0 ≤ e with the identical signature, so d's collision with e
    * is witnessed by the rep pair (e0, d). Output: one row per doc —
    * (doc_id, kept, dup_of, hamming), hamming 0 for exact dups, the
    * rep-pair Hamming for near dups, null for survivors. */
  private[graft] def phashVerdicts(s: SparkSession, feed: DataFrame): DataFrame = {
    val sig = sigOf(s, feed)
    val groups = sig.groupBy("ph").agg(min(col("doc_id")).as("rep"))
    val withRep = sig.join(groups, "ph")
    val reps = groups.select(col("rep").as("doc_id"), col("ph"))
    val nearBest = pairsFromSig(reps)
      .groupBy(col("id_b").as("doc_id"))
      .agg(min(struct(col("id_a").as("near_rep"),
        col("hamming").as("h"))).as("m"))
      .select(col("doc_id"), col("m.near_rep").as("near_rep"),
        col("m.h").as("near_h"))
    withRep.join(nearBest, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        (col("doc_id") === col("rep") && col("near_rep").isNull).as("kept"),
        when(col("doc_id") =!= col("rep"), col("rep"))
          .otherwise(col("near_rep")).as("dup_of"),
        when(col("doc_id") =!= col("rep"), lit(0))
          .otherwise(col("near_h")).as("hamming"))
  }

  /** DuckDB mirror of the resize→ahash64→banded-pairs chain over a
    * CTE named `feed` (doc_id, text) — per-bit integer restatement,
    * brute-force pairs, Hamming ≤ 6. Shared by the standalone oracle
    * and the capstone's.
    *
    * BMP-ONLY assumption (ADVICE r11): this mirror samples pixels with
    * unicode()/len() — CODEPOINT indexing — while MediaCodec.resize
    * indexes with String.charAt/length — UTF-16 CODE UNITS. The two
    * agree exactly on BMP text (every fixture payload) and diverge on
    * astral characters (emoji, rare CJK), where one codepoint occupies
    * two code units. A future fixture with astral payload must either
    * iterate codepoints in resize or expect a (correct) oracle
    * mismatch here — the divergence is in the mirror's restatement,
    * not the engine. */
  private[operators] val sqlPhashCtes: String = """
      px AS (
        SELECT doc_id, t.i,
          unicode(substr(text, 1 + (t.i * (len(text) - 1)) // 63, 1)) AS p
        FROM feed, range(0, 64) t(i)),
      bits AS (
        SELECT doc_id, i,
          (p * 64 > SUM(p) OVER (PARTITION BY doc_id)) AS b
        FROM px),
      hpairs AS (
        SELECT x.doc_id AS id_a, y.doc_id AS id_b,
          SUM(CASE WHEN x.b <> y.b THEN 1 ELSE 0 END) AS hamming
        FROM bits x JOIN bits y ON x.i = y.i AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id
        HAVING SUM(CASE WHEN x.b <> y.b THEN 1 ELSE 0 END) <= 6)"""

  def multimodalDedupPhash(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val mutants = d.filter(col("doc_id") < 20)
      .select((col("doc_id") + (1L << 40)).as("doc_id"),
        reencodeMutant.as("text"))
    phashVerdicts(s, d.unionByName(mutants))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_dedup_phash" -> (multimodalDedupPhash _),
    "multimodal_clip_filter" -> (multimodalClipFilter _),
    "multimodal_cols" -> (multimodalCols _),
    "multimodal_decode" -> (multimodalDecode _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_resize" -> (multimodalResize _)
  )

  val oracles: Map[String, String] = Map(
    // per-bit integer mirror of resize→ahash64 (sampled code points,
    // pixel·64 > Σpixels), brute-force pairs — the banded Spark plan
    // provably equals this at τ=6 (8×8-bit pigeonhole covers Hamming≤7)
    // the two-tier verdict restated over brute force: exact groups by
    // the per-bit signature string, near tier = min colliding rep
    "multimodal_dedup_phash" -> s"""
      WITH feed AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1099511627776 AS doc_id,
          ${sqlReencode("text")} AS text
        FROM documents WHERE doc_id < 20),
      $sqlPhashCtes,
      sigstr AS (
        SELECT doc_id,
          string_agg(CASE WHEN b THEN '1' ELSE '0' END, '' ORDER BY i) AS ph
        FROM bits GROUP BY doc_id),
      groups AS (SELECT ph, MIN(doc_id) AS rep FROM sigstr GROUP BY ph),
      withrep AS (SELECT s.doc_id, g.rep FROM sigstr s JOIN groups g USING (ph)),
      rp AS (
        SELECT h.id_a, h.id_b, h.hamming FROM hpairs h
        JOIN groups ga ON ga.rep = h.id_a
        JOIN groups gb ON gb.rep = h.id_b),
      near AS (SELECT id_b AS doc_id, MIN(id_a) AS near_rep FROM rp GROUP BY id_b),
      nearh AS (
        SELECT n.doc_id, n.near_rep, r.hamming AS near_h
        FROM near n JOIN rp r ON r.id_b = n.doc_id AND r.id_a = n.near_rep)
      SELECT w.doc_id,
        (w.doc_id = w.rep AND nh.near_rep IS NULL) AS kept,
        CASE WHEN w.doc_id <> w.rep THEN w.rep ELSE nh.near_rep END AS dup_of,
        CAST(CASE WHEN w.doc_id <> w.rep THEN 0 ELSE nh.near_h END AS INTEGER)
          AS hamming
      FROM withrep w LEFT JOIN nearh nh USING (doc_id)
      ORDER BY w.doc_id""",
    // float-mirror kernel (sim_topk discipline): FLOAT element
    // products each CAST to DOUBLE, accumulated left-to-right
    "multimodal_clip_filter" -> """
      WITH img AS (
        SELECT vec_id AS img_id, embedding AS vimg
        FROM embeddings WHERE vec_id % 2 = 0),
      txt AS (
        SELECT vec_id - 1 AS img_id, vec_id AS txt_id, embedding AS vtxt
        FROM embeddings WHERE vec_id % 2 = 1),
      d AS (
        SELECT img.img_id, txt.txt_id,
          ROUND(list_aggregate(list_transform(range(1, len(vimg) + 1),
            i -> CAST(vimg[i] * vtxt[i] AS DOUBLE)), 'sum'), 6) AS clip_score
        FROM img JOIN txt USING (img_id))
      SELECT img_id, txt_id, clip_score, clip_score >= 0.1 AS keep
      FROM d ORDER BY img_id""",
    "multimodal_cols" -> """
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        lang, n_chars
      FROM documents ORDER BY doc_id""",
    "multimodal_decode" -> """
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        CAST(length(text) - length(replace(text, 'a', '')) AS INTEGER) AS n_a,
        CAST(length(text) - length(replace(text, ' ', '')) AS INTEGER) AS n_space,
        CASE WHEN length(text) = 0 THEN -1
             ELSE ascii(substring(text, 1, 1)) END AS head_codepoint
      FROM documents ORDER BY doc_id""",
    "multimodal_frames" -> """
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        CAST(((i+1)*length(text))//4 - (i*length(text))//4 AS INTEGER) AS frame_len,
        md5(substring(text, (i*length(text))//4 + 1,
                      ((i+1)*length(text))//4 - (i*length(text))//4)) AS frame_md5
      FROM documents, (SELECT unnest(range(0, 4)) AS i) f
      ORDER BY doc_id, frame_idx""",
    "multimodal_resize" -> """
      SELECT doc_id,
        array_to_string(
          [CASE WHEN length(text) = 0 THEN -1
                ELSE ascii(substring(text, (i*(length(text)-1))//7 + 1, 1)) END
           FOR i IN range(0, 8)], ',') AS resized
      FROM documents ORDER BY doc_id"""
  )
}
