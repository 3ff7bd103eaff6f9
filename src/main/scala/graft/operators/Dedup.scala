package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{RunId, Tables}
import graft.functions.Text

/** Near-duplicate detection over `documents` (SURVEY.md §2.K):
  * MinHash+LSH, SimHash banding, and exact n-gram Jaccard.
  *
  * The fixture corpus has zero near-dups (FIXTURES.md), so the LSH
  * operators plant mutated copies (doc_id+100000, first word dropped)
  * and must rediscover exactly those pairs. At 100 TB the only
  * shuffles are groupBy/join on band keys — candidate generation is
  * never all-pairs; the exact-Jaccard verify runs only on candidates.
  */
object Dedup extends QueryGroup {

  private[graft] val NumHashes = 16
  private[graft] val Bands = 4 // 4 rows per band
  /** Bump when the MinHash/band index build arithmetic changes in a
    * way no parameter captures — the delta/index artifacts feed
    * artifact-replay oracles, so a stale serve is invisible to the
    * hash check (ADVICE r15). Shared by idx + delta: the delta format
    * is defined by the index kernel. */
  private val NeardupKernelVer = 1
  /** Modulus of dedup_near's universal affine MinHash family — 2³¹−1
    * (prime), so a_j·h < 2⁶² stays BIGINT-exact in Spark AND DuckDB.
    * private[graft]: split_leakage_safe runs the SAME family (shared
    * kernel constants, shared oracle interpolation — no drift). */
  private[graft] val MinhashP = 2147483647L
  /** (a_j, b_j) of component j — fixed multiplicative-hash constants,
    * interpolated verbatim into the DuckDB oracle's `aff` VALUES so
    * the two engines run the SAME family by construction. */
  private[graft] val MinhashAffine: IndexedSeq[(Long, Long)] =
    (0 until NumHashes).map(j =>
      ((2654435761L * (j + 1)) % MinhashP,
        (1013904223L * (j + 1)) % MinhashP)).toIndexedSeq

  /** Corpus + planted near-duplicate mutations — docs 0-19 copied
    * with the first word dropped, at `offset` ids (public: tests and
    * the decontamination operator recompute ground truth from the same
    * input; oracles mirror the same mutation in SQL). */
  def withPlanted(s: SparkSession, dir: String, offset: Long = 100000L): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val mutated = d.filter(col("doc_id") < 20)
      .select(
        (col("doc_id") + offset).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    d.unionByName(mutated)
  }

  /** MinHash + LSH banding + exact-Jaccard verify.
    *
    * Shape: signatures via explode + codegen hash-agg (one shuffle),
    * band keys from the signature only, candidate PAIRS of bare ids
    * from the per-band self-join, and shingle arrays joined back in
    * only for the (few) candidates — arrays never ride through the
    * band shuffle.
    *
    * Hash family: ONE md5 base hash per shingle (first 15 hex chars,
    * 60 bits, positive in both engines, reduced mod P = 2³¹−1) fanned
    * into [[NumHashes]] components by the classical universal affine
    * family h_j = (a_j·h + b_j) mod P (Broder's minwise-via-universal
    * construction — public knowledge; a_j·h < 2⁶² so BIGINT-safe in
    * both engines); band key = the comma-joined component string.
    * Every step (signature, banding, collision join, exact verify)
    * mirrors verbatim in DuckDB, so this face is HASH-EXACT, not just
    * planted-recall-tested (VERDICT r12 next #5). One crypto hash per
    * shingle, not one per (component, shingle): the 16-md5 form this
    * replaces measured 4× slower at ×100 with identical shape. */
  /** The md5-affine MinHash BAND construction — the one definition
    * [[dedupNear]] and [[graft.operators.Pipeline.splitLeakageSafe]]
    * share, so the two operators cannot drift (sharing only the
    * CONSTANTS would leave the base-hash/banding shape free to
    * diverge): one md5 base hash per shingle fanned into
    * [[NumHashes]] components by [[MinhashAffine]], comma-joined into
    * [[Bands]] band keys. `carry` columns (the doc id, plus any split
    * flags) ride through signature aggregation into the band rows.
    * The signature is localCheckpoint'ed: every caller consumes the
    * band relation at least twice (self-join sides / split arms). */
  private[graft] def minhashBandsMd5(base: DataFrame, carry: Seq[String]): DataFrame = {
    val cs = carry.map(col)
    val exploded = base.select(cs :+ explode(col("sh")).as("g"): _*)
      .select(cs :+
        pmod(conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long"),
          lit(MinhashP)).as("h"): _*)
    val aggs = (0 until NumHashes).map { j =>
      val (a, b) = MinhashAffine(j)
      min(pmod(lit(a) * col("h") + lit(b), lit(MinhashP))).as(s"mh$j")
    }
    val sig = exploded.groupBy(cs: _*).agg(aggs.head, aggs.tail: _*)
      .localCheckpoint()
    val rows = NumHashes / Bands
    val bandCols = (0 until Bands).map { b =>
      struct(lit(b).as("band_idx"),
        concat_ws(",", (b * rows until (b + 1) * rows)
          .map(j => col(s"mh$j")): _*).as("band_val"))
    }
    sig.select(cs :+ explode(array(bandCols: _*)).as("bk"): _*)
      .select(cs :+ col("bk.band_idx").as("band_idx") :+
        col("bk.band_val").as("band_val"): _*)
  }

  def dedupNear(s: SparkSession, dir: String): DataFrame = {
    // Materialize the shingle arrays once: three downstream branches
    // (signature, both sides of the verify join) would otherwise each
    // recompute the tokenize+shingle projection. At cluster scale this
    // is the "write signatures to a table, then band-join" pattern.
    val base = withPlanted(s, dir)
      .withColumn("w", Text.words(col("text")))
      .withColumn("sh", Text.shingles(col("w"), 3))
      .select("doc_id", "sh")
      .localCheckpoint()
    val banded = minhashBandsMd5(base, Seq("doc_id"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val sh = base.withColumn("shd", array_distinct(col("sh"))).select("doc_id", "shd")
    candidates
      .join(sh.select(col("doc_id").as("id_a"), col("shd").as("sha")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("shd").as("shb")), "id_b")
      .withColumn("jaccard", round(Text.jaccard(col("sha"), col("shb")), 6))
      .filter(col("jaccard") >= 0.6)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** 64-bit SimHash signature with an md5 bit source — the
    * [[graft.functions.Text.simhashSignature]] packed-counter shape
    * (16 packed agg columns + one count, one shuffle on the doc id)
    * rekeyed from xxhash64 (no DuckDB twin) to md5 hex chunks so the
    * WHOLE operator mirrors in SQL and dedup_simhash flips
    * no_oracle → hash-exact (VERDICT r12 next #5): per shingle, chunk
    * i (of 8) = hex pair 2i..2i+1 of md5(shingle) — 8 bits each, 64
    * total; per-bit majorities re-assemble doc chunk values, OR-packed
    * into one sim long (bitwise, so bit 63 can't trip ANSI addition
    * overflow). Same 32 767 slice cap ⇒ the 16-bit packed counters
    * stay carry-free. */
  private[graft] def simhashSignatureMd5(base: DataFrame): DataFrame = {
    // Bit extraction is ONCE per row, before the aggregate: two hex
    // parses (chars 1–8 and 9–16 of the digest as 32-bit groups), then
    // the 8 chunk columns by shift-mask — chunk i is hex pair
    // (2i+1, 2i+2), i.e. byte (3 − i mod 4) of its big-endian group,
    // the identity the DuckDB mirror's per-pair CAST states directly.
    // Inlining the parse into the 16 packed aggregate columns instead
    // evaluated it up to 8× per chunk per row (measured +20 s at ×100).
    val chunkCols = (0 until 8).map { i =>
      val grp = conv(substring(col("_h"), 8 * (i / 4) + 1, 8), 16, 10)
        .cast("long")
      shiftright(grp, 8 * (3 - i % 4)).bitwiseAND(lit(0xFFL)).as(s"_c$i")
    }
    val exploded = base
      .select(col("doc_id"), explode(slice(col("sh"), 1, 32767)).as("_s"))
      .select(col("doc_id"), md5(col("_s")).as("_h"))
      .select(col("doc_id") +: chunkCols: _*)
    def chunk(i: Int) = col(s"_c$i")
    // p_{i,g} packs counters for bits 4g..4g+3 of chunk i at 16-bit
    // offsets (the simhashSignature packing, two longs per chunk)
    val packedCols = for { i <- 0 until 8; g <- 0 until 2 } yield
      sum((0 until 4).map { j =>
        shiftright(chunk(i), 4 * g + j).bitwiseAND(lit(1L)) * lit(1L << (16 * j))
      }.reduce(_ + _)).as(s"p_${i}_$g")
    val counted = exploded.groupBy("doc_id")
      .agg(packedCols.head, (packedCols.tail :+ count(lit(1)).as("n")): _*)
    def cnt(i: Int, j: Int) =
      shiftright(col(s"p_${i}_${j / 4}"), 16 * (j % 4)).bitwiseAND(lit(0xFFFFL))
    // 1L << 63 is Long.MinValue — a fixed Scala-side literal, and the
    // chunks land in disjoint bit ranges, so bitwise OR (never +)
    // assembles sim without any ANSI-overflow surface
    val sim = (for { i <- 0 until 8; j <- 0 until 8 } yield
      when(cnt(i, j) * 2 > col("n"), lit(1L << (8 * i + j)))
        .otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    counted.select(col("doc_id"), sim.as("sim"))
  }

  /** SimHash near-dup: 64-bit fingerprints over 3-gram shingles
    * (word-level hashes collide on a shared vocabulary). Banding is on
    * PAIRS of 8-bit chunks (28 bands of 16 bits): a pair within
    * Hamming distance 6 dirties at most 6 of the 8 chunks, leaving at
    * least two clean — so at least one clean PAIR collides, and recall
    * at the Hamming <= 6 verify threshold stays guaranteed, not
    * probabilistic. The 16-bit keys are the scale lever: bucket
    * occupancy is |corpus| / 2^16 per band (vs /2^8 for single
    * chunks), so candidate pairs grow linearly with the corpus where
    * single-chunk banding grew quadratically — measured 8.8 s → see
    * BASELINE.md at the ×10 fixture. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val base = withPlanted(s, dir)
      .withColumn("w", Text.words(col("text")))
      .withColumn("sh", Text.shingles(col("w"), 3))
      .select("doc_id", "sh")
    val docs = simhashSignatureMd5(base).localCheckpoint()
    def chunk(c: Int) = shiftright(col("sim"), c * 8).bitwiseAND(lit(0xFFL))
    val bands = for { i <- 0 until 8; j <- i + 1 until 8 } yield (i, j)
    val banded = docs.select(
      col("doc_id"), col("sim"),
      explode(array(bands.zipWithIndex.map { case ((i, j), p) =>
        struct(lit(p).as("band_idx"),
          (chunk(i) * lit(256L) + chunk(j)).as("band_val"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("sim"), col("bk.band_idx"), col("bk.band_val"))
    val a = banded.select(
      col("doc_id").as("id_a"), col("sim").as("sim_a"), col("band_idx"), col("band_val"))
    val b = banded.select(
      col("doc_id").as("id_b"), col("sim").as("sim_b"), col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= 6)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** Exact 3-gram Jaccard, all pairs within a bounded id range —
    * the oracle-checkable ground-truth kernel the LSH ops approximate.
    * Counts-only arithmetic (|A∩B| / (|A|+|B|-|A∩B|)) so Spark and
    * DuckDB produce identical doubles. */
  def dedupJaccard(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).filter(col("doc_id") < 60)
      .withColumn("w", Text.words(col("text")))
      .withColumn("sh", array_distinct(Text.shingles(col("w"), 3)))
    val a = base.select(col("doc_id").as("id_a"), col("sh").as("sha"))
    val b = base.select(col("doc_id").as("id_b"), col("sh").as("shb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(col("sha")) + size(col("shb")) - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") > 0.01)
      .select("id_a", "id_b", "inter", "uni", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** Asymmetric CONTAINMENT — the quote / partial-copy detector
    * symmetric Jaccard structurally misses: C(A→B) = |A∩B| / |A| is
    * ≈1 when A's shingles sit inside B (a short doc quoted by a long
    * one) even though the symmetric J = |A∩B| / |A∪B| stays low
    * because the union is dominated by the longer doc. Lee et al.'s
    * dedup taxonomy treats containment as its own near-dup mode;
    * `partial_copy` flags exactly the pairs where the max-direction
    * containment clears 0.5 while Jaccard does not — the rows a
    * Jaccard-thresholded pass would silently keep twice. The fixture
    * corpus has no natural partial copies (measured max containment
    * 0.11 under doc_id < 60), so the evaluation set PLANTS them, the
    * dedup_minhash_eval discipline: each doc_id < 20 original gets a
    * "quote" mutant (its first third, ≥4 words) at id + 2^40 — the
    * offset that survives ScaleGen's +1e6-per-copy id shifts — giving
    * known pairs with containment ≈ 1 and Jaccard ≈ ⅓. Bounded by
    * construction (40 docs); the scale path is the same MinHash
    * banding with the shorter side's signature deciding the band key.
    * Every reported number is integer arithmetic or one exact IEEE
    * division — the DuckDB oracle mirrors it bit-for-bit. */
  def dedupContainment(s: SparkSession, dir: String): DataFrame = {
    val orig = Tables.documents(s, dir).filter(col("doc_id") < 20)
      .select(col("doc_id"), Text.words(col("text")).as("w"))
    val quotes = orig.select(
      (col("doc_id") + lit(1L << 40)).as("doc_id"),
      slice(col("w"), lit(1), greatest(expr("size(w) div 3"), lit(4))).as("w"))
    val base = orig.unionByName(quotes)
      .withColumn("sh", array_distinct(Text.shingles(col("w"), 3)))
    val a = base.select(col("doc_id").as("id_a"), col("sh").as("sha"))
    val b = base.select(col("doc_id").as("id_b"), col("sh").as("shb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .filter(col("inter") > 0)
      .withColumn("n_a", size(col("sha")))
      .withColumn("n_b", size(col("shb")))
      .withColumn("c_ab", col("inter").cast("double") / col("n_a"))
      .withColumn("c_ba", col("inter").cast("double") / col("n_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(greatest(col("c_ab"), col("c_ba")) > 0.1)
      .withColumn("partial_copy",
        greatest(col("c_ab"), col("c_ba")) >= 0.5 && col("jaccard") < 0.5)
      .select("id_a", "id_b", "inter", "n_a", "n_b", "c_ab", "c_ba",
        "jaccard", "partial_copy")
      .orderBy("id_a", "id_b")
  }

  /** MinHash ESTIMATOR audit — the signature-quality gate a dedup
    * deployment runs before trusting banding thresholds (the MinHash
    * sibling of sim_recall_eval's IVF gate): over a bounded evaluation
    * set of known pairs (20 planted first-word-drop near-dups, true
    * J ≈ 0.9, + 10 unrelated pairs), compare the k=64 component-match
    * estimate against the exact shingle Jaccard. Unlike the
    * production signature ([[Text.minhashSignature]], xxhash64 — no
    * DuckDB twin), the audit hashes via md5 so the WHOLE estimator is
    * oracle-mirrored bit-for-bit: per-component hash = first 15 hex
    * chars (60 bits) of md5(c ":" shingle), signature = relational
    * (doc, component) MIN — one hash aggregate — match count = an
    * equi-join on (doc, component). Integer surfaces everywhere; the
    * two reported fractions are single exact divisions of small ints.
    * Scale: the evaluation set is declared-bounded (30 pairs, 40
    * docs) — the audit's cost does not grow with the corpus. */
  def dedupMinhashEval(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    val K = 64
    // Bounded-by-construction eval corpus: the 20 originals + their
    // mutants, built from the PRE-filtered slice (filter pushes to the
    // scan) — filtering withPlanted's full-corpus union instead would
    // admit every id ≥ 100000 a scaled fixture carries, silently
    // growing the "bounded" audit with the corpus (measured: 421 s at
    // ×100 vs ~4 s bounded).
    val d20 = Tables.documents(s, dir).select("doc_id", "text")
      .filter(col("doc_id") < 20)
    val sh = d20
      .unionByName(d20.select(
        (col("doc_id") + 100000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
      .withColumn("sh", array_distinct(Text.shingles(Text.words(col("text")), 3)))
      // Guard (ADVICE r10): a doc too short to shingle (< 3 words —
      // possible if the fixture generator changes) would make uni = 0
      // and true_jaccard a NULL division; drop it from the audit base
      // LOUDLY here (and identically in the oracle) instead of
      // resting on an undeclared fixture property.
      .filter(size(col("sh")) > 0)
      .select("doc_id", "sh")
      .localCheckpoint() // signature + truth branches
    val sig = sh.select(col("doc_id"), explode(col("sh")).as("g"))
      .select(col("doc_id"), col("g"),
        explode(sequence(lit(0), lit(K - 1))).as("c"))
      .withColumn("h",
        conv(substring(md5(concat_ws(":", col("c"), col("g"))), 1, 15), 16, 10)
          .cast("long"))
      .groupBy("doc_id", "c").agg(min("h").as("minh"))
    val pairs = ((0 until 20).map(i => (i.toLong, i + 100000L, "planted")) ++
      (0 until 10).map(i => (i.toLong, i + 10L, "random")))
      .toDF("id_a", "id_b", "pair_type")
    val est = pairs
      .join(sig.select(col("doc_id").as("id_a"), col("c"), col("minh").as("ha")), "id_a")
      .join(sig.select(col("doc_id").as("id_b"), col("c"), col("minh").as("hb")),
        Seq("id_b", "c"))
      .groupBy("id_a", "id_b", "pair_type")
      .agg(sum(when(col("ha") === col("hb"), 1).otherwise(0)).cast("int")
        .as("est_matches"))
    val truth = pairs.select("id_a", "id_b")
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sha")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("shb")), "id_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(col("sha")) + size(col("shb")) - col("inter"))
      .select("id_a", "id_b", "inter", "uni")
    est.join(truth, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("pair_type"), col("est_matches"),
        round(col("est_matches").cast("double") / K, 6).as("est_jaccard"),
        col("inter"), col("uni"),
        round(col("inter").cast("double") / col("uni"), 6).as("true_jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Connected-components clustering of near-duplicate pairs — the
    * step a curation pipeline runs AFTER pairwise detection: pair
    * lists don't dedup a corpus, clusters do (keep one canonical doc
    * per component, drop the rest). Pairs come from the
    * oracle-reproducible [[dedupJaccard]] kernel, so the whole operator
    * is exactly checkable against a DuckDB recursive CTE.
    *
    * Algorithm: iterated min-label propagation with pointer-jumping
    * shortcuts — each round every node takes the min label over itself
    * and its neighbors, then labels are composed through themselves
    * (label := label(label)), which halves label-chain length and
    * gives O(log diameter) rounds (the alternating-star bound of the
    * classic MapReduce connected-components literature).
    *
    * The FIXPOINT LOOP runs on co-partitioned pair RDDs — the one
    * place in this engine where dropping below the DataFrame API is
    * the right call, for the same reason GraphX's Pregel layer is
    * RDD-based (VERDICT r4 #5: the DataFrame loop spent ~0.4 s/round
    * on eager Catalyst re-analysis plus a full edge re-shuffle per
    * round; the actions themselves were 0.1 s). Edges are hash-
    * partitioned ONCE and every per-round join against the label map
    * is partitioner-aligned — at 100 TB the edge set never moves
    * again; only label-sized updates shuffle. The previous label rides
    * each round's tuples, so convergence is one count on the round's
    * persisted output — a single job per round. Input pairs and final
    * cluster assembly stay DataFrames (the oracle-checked surface). */
  def dedupCluster(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    val pairs = dedupJaccard(s, dir).select("id_a", "id_b").as[(Long, Long)]
    val prdd = pairs.rdd
    val part = new org.apache.spark.HashPartitioner(math.max(1, prdd.getNumPartitions))
    val edges = prdd.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .partitionBy(part)
      .persist()
    // Round 0 folded into initialization: with label=id the first
    // neighbor-min is just min over adjacent ids.
    var labels = edges.reduceByKey(part, math.min(_: Long, _: Long))
      .mapPartitions(_.map { case (id, m) => (id, math.min(id, m)) },
        preservesPartitioning = true)
      .persist()
    var prevRound: org.apache.spark.rdd.RDD[_] = labels
    var changed = 1L
    var rounds = 0
    try {
    while (changed > 0 && rounds < 16) {
      val nbrMin = edges.join(labels) // aligned: no edge shuffle
        .map { case (_, (dst, lbl)) => (dst, lbl) }
        .reduceByKey(part, math.min(_: Long, _: Long))
      val propagated = labels.leftOuterJoin(nbrMin) // aligned
        .mapPartitions(_.map { case (id, (lbl, nbr)) =>
          (id, (lbl, math.min(lbl, nbr.getOrElse(lbl)))) },
          preservesPartitioning = true)
      // pointer jumping: label := label(label). Monotone (labels only
      // decrease), composes two hops into one — log-round convergence.
      val byLabel = propagated.map { case (id, (prev, lbl)) => (lbl, (id, prev)) }
      val labelOfLabel = propagated.mapPartitions(
        _.map { case (id, (_, lbl)) => (id, lbl) }, preservesPartitioning = true)
      val jumped = byLabel.join(labelOfLabel, part)
        .map { case (lbl, ((id, prev), ll)) => (id, (prev, math.min(lbl, ll))) }
        .partitionBy(part)
        .persist()
      // Track BEFORE the action: if the count throws, the finally
      // block must know about this round's cached RDD too — persisted
      // registration is immediate, so an untracked `jumped` would
      // strand blocks on the failure path.
      val lastRound = prevRound
      prevRound = jumped
      changed = jumped.filter { case (_, (prev, lbl)) => prev != lbl }.count()
      lastRound.unpersist(blocking = false)
      labels = jumped.mapPartitions(
        _.map { case (id, (_, lbl)) => (id, lbl) }, preservesPartitioning = true)
      rounds += 1
      if (sys.env.contains("GRAFT_DEBUG"))
        System.err.println(s"[dedup_cluster] round $rounds: changed=$changed")
    }
    // Pointer jumping converges in O(log diameter) — 16 rounds covers
    // any realistic graph — but an unconverged exit must not
    // masquerade as a correct clustering (ADVICE r5): say so loudly.
    if (changed > 0)
      System.err.println(s"[dedup_cluster] WARNING: fixpoint exited after " +
        s"$rounds rounds with $changed labels still changing — " +
        "clusters may be partially merged (pathological graph diameter)")
    // Materialize the labels to scratch parquet BEFORE releasing the
    // cached RDDs: the returned DataFrame must not depend on the
    // 16-round iterative lineage (a later action would recompute the
    // whole fixpoint chain with nothing cached), and a localCheckpoint
    // would itself pin blocks for the JVM lifetime — the write-then-
    // read truncates lineage with zero retained cache (VERDICT r5 #3).
    // The write is distributed and label-sized: scale-safe.
    // MD5 of the full dir, not 32-bit hashCode: a hashCode collision
    // between the sf and ×10 dirs in one JVM would overwrite this
    // path under the other call's lazily-reading DataFrame (the same
    // bug class the IVF cache key fix removed).
    val lblPath = RunId.scratchKeyed("dedup_cluster", dir)
    labels.toDF("doc_id", "cluster_id")
      .write.mode("overwrite").parquet(lblPath)
    clusterLabelPaths(dir) = lblPath // reused by dedupSurvivor
    val lblDf = s.read.parquet(lblPath)
    val sizes = lblDf.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    lblDf.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
      .orderBy("doc_id")
    } finally {
      // Every block this operator pinned is released on exit — success
      // or failure — so a long-lived session running thousands of
      // queries doesn't strand MEMORY_ONLY partitions (VERDICT r5 #3).
      edges.unpersist(blocking = false)
      prevRound.unpersist(blocking = false)
    }
  }

  /** Per-(JVM, dir) location of dedupCluster's materialized labels —
    * the fixpoint is the heaviest iterative operator in the engine, so
    * dedupSurvivor must not re-run it when the labels are already on
    * scratch disk (same write-once pattern as CellStore.batchApplied;
    * dirs are immutable for the life of a run). */
  private val clusterLabelPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Survivor selection — the step that makes dedup actionable: per
    * near-dup cluster, KEEP the longest member (a standard keep-best
    * policy; length is the quality proxy here, tiebreak min doc_id)
    * and mark the rest for deletion. Composes the oracle-checked
    * cluster labels with a per-cluster argmax window; at scale that is
    * one extra shuffle keyed on the cluster id over the (small) label
    * relation, never over the corpus. */
  def dedupSurvivor(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (!clusterLabelPaths.contains(dir)) { dedupCluster(s, dir); () }
    val clusters = s.read.parquet(clusterLabelPaths(dir))
    val lens = Tables.documents(s, dir).filter(col("doc_id") < 60)
      .select(col("doc_id"), size(Text.words(col("text"))).as("n_words"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("n_words").desc, col("doc_id").asc)
    clusters.join(lens, "doc_id")
      .withColumn("is_survivor", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "n_words", "is_survivor")
      .orderBy("doc_id")
  }

  /** SOFT dedup — the keep-everything alternative to
    * [[dedupSurvivor]]'s keep-one: every document stays in the corpus
    * but near-dup cluster members are DOWN-WEIGHTED to 1/cluster_size
    * (so a 5-way duplicated page contributes one page's worth of
    * loss — the re-weighting framing of dedup used when dropping data
    * is too aggressive, e.g. for rare-domain corpora). Weights are
    * 1e6 integer fixed-point (exact, layout-free); singletons — docs
    * in no near-dup pair — carry weight 1.0 by definition. Composes
    * the oracle-checked cluster labels (cached scratch parquet, the
    * dedupSurvivor pattern): at scale this is one label-relation join
    * over the corpus keys, never a second fixpoint. */
  def dedupSoft(s: SparkSession, dir: String): DataFrame = {
    if (!clusterLabelPaths.contains(dir)) { dedupCluster(s, dir); () }
    val clusters = s.read.parquet(clusterLabelPaths(dir))
    val sizes = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    Tables.documents(s, dir).filter(col("doc_id") < 60).select("doc_id")
      .join(clusters.join(sizes, "cluster_id"), Seq("doc_id"), "left")
      .withColumn("cluster_size", coalesce(col("cluster_size"), lit(1L)))
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        col("cluster_size"),
        expr("1000000 div cluster_size").cast("long").as("weight_fp"))
      .orderBy("doc_id")
  }

  /** Exact substring-level dedup — the third dedup mode of the
    * Lee et al. 2022 taxonomy (document-exact / near / SUBSTRING): find
    * long token spans repeated anywhere in the corpus, even across
    * otherwise-distinct documents (license boilerplate, templated
    * headers, quoted passages). Document-level dedup can never catch
    * these; span-level removal is the mode that most improves LM
    * training data in practice.
    *
    * Algorithm (the scalable suffix-array substitute): slide a
    * K=20-token window over every document, hash each window, keep the
    * (doc, pos) positions whose window hash occurs ≥2 times in the
    * corpus, then merge each document's dirty positions into maximal
    * spans — two windows merge when their token intervals overlap or
    * touch (gap ≤ K). Output is one row per (doc, span): token
    * coordinates + how many duplicated windows support it.
    *
    * Scale shape: one explode (corpus × windows — linear in total
    * tokens), ONE shuffle keyed on the 16-byte window hash for the
    * occurrence count (bare (doc, pos, hash) triples ride it, never
    * text), and one per-doc window shuffle for the interval merge over
    * the (small) dirty subset. Never all-pairs, no driver state.
    *
    * The fixture corpus shares no natural 20-grams across docs, so
    * spans are PLANTED two ways (both mirrored verbatim in the DuckDB
    * oracle, so the operator stays hash-checked):
    *  - cross-doc: ids 2^40+i (i<10) concatenate the first 30 words
    *    of docs i and i+10 — both sources gain a [0,29] span, the
    *    plant's two adjacent dirty regions must MERGE into one span;
    *  - two-slice: ids 2^40+2^20+i copy words [0,30) and [50,80) of one
    *    ≥80-word source — the source's two dirty regions sit gap-40
    *    apart and must stay SEPARATE spans. */
  /** Window width (tokens) shared by the substring-dedup family. */
  private val SubK = 20

  /** The substring-dedup corpus: documents + the two planted span
    * shapes (cross-doc and two-slice; 2^40-offset ids are collision-
    * proof at any reachable corpus size). Shared by dedupSubstring
    * and dedupSubstringApply; [[substringCorpusSql]] is its verbatim
    * DuckDB mirror so both oracles stay in lockstep. */
  private[graft] def substringCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    def first30(c: org.apache.spark.sql.Column) =
      concat_ws(" ", slice(Text.words(c), 1, 30))
    val crossDoc = d.as("a").filter(col("a.doc_id") < 10)
      .join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 10)
      .select((col("a.doc_id") + (1L << 40)).as("doc_id"),
        concat_ws(" ", first30(col("a.text")), first30(col("b.text"))).as("text"))
    val twoSlice = d.select(col("doc_id"), Text.words(col("text")).as("w"))
      .filter(col("doc_id") < 40 && size(col("w")) >= 80)
      .select((col("doc_id") + (1L << 40) + (1L << 20)).as("doc_id"),
        concat_ws(" ",
          concat_ws(" ", slice(col("w"), 1, 30)),
          concat_ws(" ", slice(col("w"), 51, 30))).as("text"))
    d.unionByName(crossDoc).unionByName(twoSlice)
  }

  private val substringCorpusSql = """all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT a.doc_id + 1099511627776 AS doc_id,
          array_to_string(string_split(a.text, ' ')[1:30], ' ') || ' ' ||
          array_to_string(string_split(b.text, ' ')[1:30], ' ') AS text
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 10
        WHERE a.doc_id < 10
        UNION ALL
        SELECT doc_id + 1099512676352 AS doc_id,
          array_to_string(w[1:30], ' ') || ' ' ||
          array_to_string(w[51:80], ' ') AS text
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        WHERE doc_id < 40 AND len(w) >= 80)"""

  /** (doc_id, pos, h) per sliding SubK-token window — the text never
    * leaves the row. */
  private def substringWindows(all: DataFrame): DataFrame =
    all.select(col("doc_id"),
      posexplode(transform(Text.shingles(Text.words(col("text")), SubK), g => md5(g)))
        .as(Seq("pos", "h")))

  private val substringWindowsSql = """wins AS (
        SELECT doc_id,
          unnest([{'pos': i - 1, 'h': md5(array_to_string(w[i:i+19], ' '))}
                  FOR i IN range(1, len(w) - 18)], recursive := true)
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs))"""

  /** Gaps-and-islands interval merge over (doc_id, pos) dirty-window
    * rows: window at pos p covers tokens [p, p+SubK-1]; consecutive
    * windows merge iff gap ≤ SubK (overlap or adjacency), so an
    * island breaks when gap > SubK. Shared by the report and apply
    * operators; [[islandsSql]] is the verbatim mirror, so a merge-rule
    * change edits exactly one Scala site and one SQL site. */
  private def islands(dirty: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    dirty
      .withColumn("gap", col("pos") - lag("pos", 1).over(byDoc))
      .withColumn("brk", when(col("gap").isNull || col("gap") <= SubK, 0).otherwise(1))
      .withColumn("island",
        sum("brk").over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private def islandsSql(src: String) = s"""isl AS (
        SELECT doc_id, pos,
          SUM(CASE WHEN gap IS NULL OR gap <= $SubK THEN 0 ELSE 1 END)
            OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS UNBOUNDED PRECEDING) AS island
        FROM (SELECT doc_id, pos,
                pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS gap
              FROM $src))"""

  def dedupSubstring(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val K = SubK
    val wins = substringWindows(substringCorpus(s, dir))
    // corpus-wide occurrence count per hash: one shuffle on h (window
    // count, not groupBy+join-back — same result, half the shuffles)
    val dirty = wins
      .withColumn("occ", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("occ") > 1)
      .select("doc_id", "pos")
    islands(dirty)
      .groupBy("doc_id", "island")
      .agg(min("pos").as("span_start"),
        (max("pos") + (K - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
      .orderBy("doc_id", "span_start")
  }

  /** Substring dedup APPLIED — the removal step that makes
    * [[dedupSubstring]]'s report actionable (Lee et al. keep ONE
    * occurrence of each duplicated span and delete the rest): the
    * canonical occurrence of a duplicated window is the globally first
    * (min (doc_id, pos) — a deterministic, join-free rule); every
    * OTHER occurrence marks its window for removal, per-doc removal
    * windows merge into spans exactly like the report, and each doc's
    * cleaned text drops the covered tokens. Output carries token
    * counts and the md5 of the cleaned text, so the oracle hash
    * catches a single mis-kept token.
    *
    * Scale shape: identical to the report (one shuffle on the window
    * hash — the row_number canonical rule rides the SAME shuffle as
    * the occurrence count — one per-doc merge), plus a row-local
    * indexed-token filter; the span list per doc is small and rides a
    * left join keyed on doc_id. */
  def dedupSubstringApply(s: SparkSession, dir: String): DataFrame =
    substringCleanedFrom(substringCorpus(s, dir))
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        md5(concat_ws(" ", col("clean_words"))).as("clean_md5"))
      .orderBy("doc_id")

  /** The removal kernel of [[dedupSubstringApply]], generalized over
    * any (doc_id, text) relation so pipeline_pretrain can run it on
    * the gated survivor set instead of the planted test corpus.
    * Returns (doc_id, n_tokens, n_removed, clean_words) — the caller
    * picks the surface (md5 for the oracle, the words themselves for
    * downstream tokenization). Same plan as the report: one shuffle on
    * the window hash carrying both the occurrence count and the
    * canonical-occurrence rank, one per-doc island merge, then a
    * row-local indexed-token filter. */
  private[graft] def substringCleanedFrom(all: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val K = SubK
    val wh = Window.partitionBy("h")
    val remove = substringWindows(all)
      .withColumn("occ", count(lit(1)).over(wh))
      .withColumn("rn", row_number().over(wh.orderBy("doc_id", "pos")))
      .filter(col("occ") > 1 && col("rn") > 1)
      .select("doc_id", "pos")
    val spans = islands(remove)
      .groupBy("doc_id", "island")
      .agg(min("pos").as("a"), (max("pos") + (K - 1)).as("b"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("a"), col("b")))).as("spans"))
    val w = Text.words(col("text"))
    val indexed = transform(w, (t, i) => struct(t.as("t"), i.as("i")))
    val kept = filter(indexed, x =>
      !exists(col("spans"), sp =>
        x.getField("i") >= sp.getField("a") && x.getField("i") <= sp.getField("b")))
    all.join(spans, Seq("doc_id"), "left")
      .withColumn("spans",
        coalesce(col("spans"), array().cast("array<struct<a:int,b:int>>")))
      .select(
        col("doc_id"),
        size(w).as("n_tokens"),
        (size(w) - size(kept)).as("n_removed"),
        transform(kept, x => x.getField("t")).as("clean_words"))
  }

  /** Incremental (delta-vs-corpus) dedup — the admission gate a
    * production pipeline runs on every new crawl shard: the standing
    * corpus is already deduped, and a delta document is admitted only
    * if its content is globally novel (absent from the corpus AND
    * first-by-id within the delta itself, the dedup_exact survivor
    * convention).
    *
    * Split is deterministic (corpus = doc_id % 10 < 8, delta = the
    * rest) and the delta additionally re-submits copies of docs
    * 0-29 at +2^40 ids, so BOTH rejection paths carry traffic:
    * corpus-collision (copies of % 10 < 8 docs) and intra-delta
    * collision (copies of % 10 ≥ 8 docs, where the original delta row
    * must win by id). Planted ids at +2^40 per the collision-proof
    * offset rule (VERDICT r6).
    *
    * Scale shape — the whole point of the operator: the corpus side
    * reduces to DISTINCT content hashes before the join, so the
    * standing 100 TB of text never rides the shuffle — only its
    * 32-byte hashes do — and the anti-join output is delta-sized. With
    * the corpus hash set bucketed on hash (the layout a standing
    * dedup index would keep), each shard admission is a bucket-local
    * probe; a bloom prefilter (join_bloom_prefilter's move) cuts the
    * shuffled delta further when novelty dominates. */
  /** Admission kernel: delta(doc_id, text) rows whose content hash is
    * absent from corpus(text), first-by-id within the delta. Exposed
    * for the spec's idempotence test (admitting an already-admitted
    * shard admits nothing). */
  private[graft] def admit(corpus: DataFrame, delta: DataFrame): DataFrame = {
    val corpusSha = corpus
      .select(sha2(col("text"), 256).as("text_sha")).distinct()
    delta.select(col("doc_id"), sha2(col("text"), 256).as("text_sha"))
      .join(corpusSha, Seq("text_sha"), "left_anti")
      .groupBy("text_sha").agg(min("doc_id").as("doc_id"))
      .select("doc_id", "text_sha")
  }

  def dedupDelta(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val delta = d.filter(pmod(col("doc_id"), lit(10)) >= 8)
      .unionByName(d.filter(col("doc_id") < 30)
        .select((col("doc_id") + (1L << 40)).as("doc_id"), col("text")))
    admit(d.filter(pmod(col("doc_id"), lit(10)) < 8), delta)
      .orderBy("doc_id")
  }

  /** Per-(JVM, dir) paths of the persisted near-dup admission index
    * over the standing corpus (docs with doc_id % 10 < 8): the MinHash
    * band table (band_idx, band_val, doc_id) and the distinct-shingle
    * table (doc_id, shd). Built once and written to scratch parquet —
    * the standing artifact a production pipeline maintains alongside
    * the corpus — so nightly admissions never re-scan corpus text
    * (the same write-once discipline as the IVF index and
    * dedupCluster's labels; dirs are immutable for the life of a run). */
  private val deltaNearIndexDirs =
    new graft.core.BuildOnce[String, (String, String)]
  private def deltaNearIndexPaths(s: SparkSession, dir: String): (String, String) =
    deltaNearIndexDirs.getOrElseUpdate(dir, {
      // StableStore (not RunId scratch) since r15: the dedup_delta_near
      // oracle reads these tables, so they must outlive the Verify JVM
      // and never hit an overwrite window (the agg_quantile_merge
      // lesson). The xxhash64 MinHash itself runs HERE, at build time —
      // DuckDB cannot compute it, so the oracle's coverage starts at
      // the persisted band/shingle relations and replays everything
      // downstream (candidates, verify, admission).
      val key = s"nh=$NumHashes|b=$Bands|" +
        graft.core.StableStore.inputKey(s, dir, "documents.parquet")
      val root = graft.core.StableStore.getOrBuild("neardup_idx_v1", key,
          NeardupKernelVer) { tmp =>
        val base = Tables.documents(s, dir)
          .filter(pmod(col("doc_id"), lit(10)) < 8)
          .withColumn("w", Text.words(col("text")))
          .withColumn("sh", Text.shingles(col("w"), 3))
          .select("doc_id", "sh")
          .localCheckpoint()
        val sig = Text.minhashSignature(base, "doc_id", "sh", NumHashes)
        val mh = (0 until NumHashes).map(j => col(s"mh$j"))
        sig.withColumn("bands", array(Text.bandKeys(mh, Bands, NumHashes / Bands): _*))
          .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_val")))
          .write.mode("overwrite").parquet(s"$tmp/bands")
        base.withColumn("shd", array_distinct(col("sh"))).select("doc_id", "shd")
          .write.mode("overwrite").parquet(s"$tmp/sh")
      }
      (s"$root/bands", s"$root/sh")
    })

  /** The nightly shard's OWN signature tables (band rows + distinct
    * shingles of the delta = novel slice ∪ planted mutants), persisted
    * like the corpus index so the oracle consumes the same bytes the
    * admission join does — in production this is the shard-signature
    * step of the nightly job, a separate write the admission query
    * then joins. */
  private val deltaNearDeltaDirs =
    new graft.core.BuildOnce[String, (String, String)]
  private def deltaNearDeltaPaths(s: SparkSession, dir: String): (String, String) =
    deltaNearDeltaDirs.getOrElseUpdate(dir, {
      val key = s"nh=$NumHashes|b=$Bands|" +
        graft.core.StableStore.inputKey(s, dir, "documents.parquet")
      val root = graft.core.StableStore.getOrBuild("neardup_delta_v1", key,
          NeardupKernelVer) { tmp =>
        val d = Tables.documents(s, dir).select("doc_id", "text")
        val delta = d.filter(pmod(col("doc_id"), lit(10)) >= 8)
          .unionByName(d
            .filter(pmod(col("doc_id"), lit(10)) < 8 && col("doc_id") < 20)
            .select((col("doc_id") + (1L << 40)).as("doc_id"),
              expr("substring(text, instr(text, ' ') + 1)").as("text")))
        val base = delta
          .withColumn("w", Text.words(col("text")))
          .withColumn("sh", Text.shingles(col("w"), 3))
          .select("doc_id", "sh")
          .localCheckpoint()
        val sig = Text.minhashSignature(base, "doc_id", "sh", NumHashes)
        val mh = (0 until NumHashes).map(j => col(s"mh$j"))
        sig.withColumn("bands", array(Text.bandKeys(mh, Bands, NumHashes / Bands): _*))
          .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_val")))
          .write.mode("overwrite").parquet(s"$tmp/bands")
        base.withColumn("sha", array_distinct(col("sh"))).select("doc_id", "sha")
          .write.mode("overwrite").parquet(s"$tmp/sh")
      }
      (s"$root/bands", s"$root/sh")
    })

  /** Artifact-path substitutions for this group's oracles (merged by
    * [[graft.Verify]] at dump time). */
  private[graft] def oracleArtifactSubs(
      s: SparkSession, dir: String): Map[String, String] = {
    val (idxBands, idxSh) = deltaNearIndexPaths(s, dir)
    val (dBands, dSh) = deltaNearDeltaPaths(s, dir)
    Map(
      "__ND_IDX_BANDS__" -> idxBands, "__ND_IDX_SH__" -> idxSh,
      "__ND_DELTA_BANDS__" -> dBands, "__ND_DELTA_SH__" -> dSh)
  }

  /** Incremental NEAR-dup admission — dedup_delta's sibling for the
    * fuzzy case: a nightly crawl shard is admitted doc-by-doc unless
    * it is a near-duplicate (3-gram Jaccard ≥ 0.6) of something the
    * standing corpus already holds. Exact-hash novelty is dedup_delta;
    * THIS gate catches boilerplate re-crawls and lightly-edited
    * mirrors, the dominant duplicate class in web corpora (Lee et al.
    * 2022).
    *
    * Scale shape: the corpus side is the PERSISTED band index — the
    * delta computes signatures only for itself, band-joins against the
    * index (bucketed equality, never all-pairs), and the exact-Jaccard
    * verify joins corpus shingles for candidate docs only. A 100 TB
    * corpus contributes bands (16 longs/doc) and the few candidate
    * shingle rows to the admission run; its text is never re-read.
    *
    * Delta = docs with doc_id % 10 ≥ 8 plus mutated copies (first
    * word dropped) of corpus docs < 20 at +2^40 ids. The planted
    * mutants must be REJECTED; the %10 ≥ 8 slice carries BOTH classes
    * — the fixture's small template vocabulary yields genuine
    * near-identical doc pairs across the id range (e.g. 8 ≈ 360 at
    * jaccard 0.99), so some novel-slice docs are correctly rejected
    * against the corpus too, exactly what a re-crawl admission sees.
    * Hash-exact oracled since r15: both signature tables (corpus
    * index AND delta shard) are persisted StableStore artifacts, so
    * DuckDB replays the candidate band join, the exact-Jaccard
    * verify, and the admission left-join over the same bytes — only
    * the xxhash64 MinHash build itself (no DuckDB equivalent) stays
    * engine-side, spec-anchored. DedupSimilaritySpec additionally
    * asserts rejection precision (every reported match re-verifies
    * exactly), planted-mutant recall, and must-reject recall for
    * brute-force pairs ≥ 0.9. */
  def dedupDeltaNear(s: SparkSession, dir: String): DataFrame = {
    val (bandPath, shPath) = deltaNearIndexPaths(s, dir)
    val (dBandPath, dShPath) = deltaNearDeltaPaths(s, dir)
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val delta = d.filter(pmod(col("doc_id"), lit(10)) >= 8)
      .unionByName(d
        .filter(pmod(col("doc_id"), lit(10)) < 8 && col("doc_id") < 20)
        .select((col("doc_id") + (1L << 40)).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))
    val deltaBands = s.read.parquet(dBandPath)
    val idx = s.read.parquet(bandPath)
      .select(col("doc_id").as("corpus_id"), col("band_idx"), col("band_val"))
    val candidates = deltaBands
      .join(idx, Seq("band_idx", "band_val"))
      .select("doc_id", "corpus_id")
      .distinct()
    val matches = candidates
      .join(s.read.parquet(dShPath), "doc_id")
      .join(s.read.parquet(shPath)
        .select(col("doc_id").as("corpus_id"), col("shd").as("shb")), "corpus_id")
      .withColumn("jaccard", round(Text.jaccard(col("sha"), col("shb")), 6))
      .filter(col("jaccard") >= 0.6)
      // best corpus match: highest jaccard, tie-break smallest id —
      // one struct-max aggregate, no window over the corpus
      .groupBy("doc_id")
      .agg(max(struct(col("jaccard"), (-col("corpus_id")).as("negid"))).as("m"))
      .select(col("doc_id"), col("m.jaccard").as("match_jaccard"),
        (-col("m.negid")).as("match_id"))
    delta.select("doc_id")
      .join(matches, Seq("doc_id"), "left")
      .select(col("doc_id"), col("match_jaccard").isNull.as("admitted"),
        col("match_id"), col("match_jaccard"))
      .orderBy("doc_id")
  }

  /** The three stores behind the STREAMING near-dup admission gate:
    * the growing band index, the growing distinct-shingle store, and
    * the per-batch admission results — all partitioned by batch_id so
    * a replayed micro-batch overwrites exactly its own partitions. */
  private[graft] case class NearRoots(bands: String, sh: String, res: String)

  /** Seed a streaming admission index at `base`: the persisted corpus
    * band/shingle tables land as partition batch_id = −1. Once per
    * (JVM, base) — the spec seeds a temp base, the declared twin the
    * scratch-keyed one. */
  private val nearStreamBases = new graft.core.BuildOnce[String, NearRoots]
  private[graft] def nearStreamSeed(s: SparkSession, dir: String,
      base: String): NearRoots =
    nearStreamBases.getOrElseUpdate(base, {
      val (bandPath, shPath) = deltaNearIndexPaths(s, dir)
      val roots = NearRoots(s"$base/bands", s"$base/sh", s"$base/res")
      s.read.parquet(bandPath).withColumn("batch_id", lit(-1L))
        .write.mode("overwrite").partitionBy("batch_id").parquet(roots.bands)
      s.read.parquet(shPath).withColumn("batch_id", lit(-1L))
        .write.mode("overwrite").partitionBy("batch_id").parquet(roots.sh)
      roots
    })

  /** Row-local MinHash band relation over (doc_id, text) — the
    * streaming-side shape: `array_min ∘ transform` produces the SAME
    * xxhash64 minima as the relational `explode ∘ min` stack in
    * [[graft.functions.Text.minhashSignature]] (asserted in
    * DedupSimilaritySpec), with zero shuffle and zero state, which is
    * what a micro-batch wants (batch-sized input, no corpus to
    * amortize the exchange over). Docs with no 3-gram drop out here,
    * exactly as they drop out of the exploded aggregate. */
  private def rowLocalBands(d: DataFrame): DataFrame = {
    val mh = (0 until NumHashes).map(j =>
      array_min(transform(col("sh"), x => xxhash64(x, lit(j)))))
    d.filter(size(col("sh")) > 0)
      .withColumn("bands", array(Text.bandKeys(mh, Bands, NumHashes / Bands): _*))
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_val")))
  }

  /** One micro-batch of streaming near-dup admission — the per-batch
    * fold [[graft.streaming.StreamOps.nearDedupAdmit]] runs in
    * foreachBatch, shared verbatim with the declared batch twin
    * [[streamDedupNear]] so the two cannot drift. A batch doc is
    * REJECTED iff it is a 3-gram-Jaccard ≥ 0.6 near-dup of (a) any
    * doc admitted by an EARLIER batch or the seeded corpus — served
    * by the persisted band index, batch_id < this batch only, so a
    * replayed batch never sees its own half-written partitions and
    * reprocessing is idempotent — or (b) any smaller-id doc of its
    * own batch (single-pass first-wins, the dedup_survivor rule;
    * within-batch precedence does not wait on (a)'s verdicts —
    * declared, deterministic, and what a single-pass gate can decide
    * without iterating). Admitted docs append their bands + distinct
    * shingles as this batch's partitions: the index the NEXT batch
    * reads. Scale: batch bands are batch-sized; the index side is a
    * bucketed band-equality join (16 longs/doc, partition-pruned to
    * earlier batches); shingle fetch touches candidate ids only;
    * corpus text is never re-read. */
  private[graft] def nearAdmitFold(s: SparkSession, roots: NearRoots,
      batch: DataFrame, batchId: Long): DataFrame = {
    val base = batch.select(col("doc_id"), col("text"))
      .withColumn("sh", Text.shingles(Text.words(col("text")), 3))
      .localCheckpoint() // batch-sized; bands/shd/result share one pass
    val bands = rowLocalBands(base)
    val shd = base.select(col("doc_id"), array_distinct(col("sh")).as("shd"))
    val idxBands = s.read.parquet(roots.bands)
      .filter(col("batch_id") < batchId) // partition-pruned replay guard
      .select(col("doc_id").as("corpus_id"), col("band_idx"),
        col("band_val"), lit(true).as("persisted"))
    val inBatch = bands
      .select(col("doc_id").as("corpus_id"), col("band_idx"),
        col("band_val"), lit(false).as("persisted"))
    val candidates = bands
      .join(idxBands.unionByName(inBatch), Seq("band_idx", "band_val"))
      .filter(col("persisted") || col("corpus_id") < col("doc_id"))
      .filter(col("corpus_id") =!= col("doc_id"))
      .select("doc_id", "corpus_id").distinct()
    val rightShd = s.read.parquet(roots.sh)
      .filter(col("batch_id") < batchId)
      .select(col("doc_id").as("corpus_id"), col("shd").as("shb"))
      .unionByName(shd.select(col("doc_id").as("corpus_id"), col("shd").as("shb")))
    val matches = candidates
      .join(shd.select(col("doc_id"), col("shd").as("sha")), "doc_id")
      .join(rightShd, "corpus_id")
      .withColumn("jaccard", round(Text.jaccard(col("sha"), col("shb")), 6))
      .filter(col("jaccard") >= 0.6)
      .groupBy("doc_id")
      .agg(max(struct(col("jaccard"), (-col("corpus_id")).as("negid"))).as("m"))
      .select(col("doc_id"), col("m.jaccard").as("match_jaccard"),
        (-col("m.negid")).as("match_id"))
    val result = base.select("doc_id")
      .join(matches, Seq("doc_id"), "left")
      .select(col("doc_id"), col("match_jaccard").isNull.as("admitted"),
        col("match_id"), col("match_jaccard"),
        lit(batchId).as("batch_id"))
      .localCheckpoint() // pin verdicts before the three writes
    def appendByBatch(df: DataFrame, root: String): Unit =
      df.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(root)
    appendByBatch(result, roots.res)
    val admitted = result.filter(col("admitted")).select("doc_id")
    appendByBatch(bands.join(admitted, "doc_id")
      .withColumn("batch_id", lit(batchId)), roots.bands)
    appendByBatch(shd.join(admitted, "doc_id")
      .withColumn("batch_id", lit(batchId)), roots.sh)
    result
  }

  /** Declared batch twin of the STREAMING near-dup admission gate —
    * [[dedupDeltaNear]]'s nightly shard arriving as a STREAM: the
    * same delta (novel slice ∪ planted corpus mutants at +2^40) split
    * into two deterministic micro-batches by doc_id parity, plus
    * IN-STREAM mutants (batch-0 novel docs < 40, first word dropped,
    * +2^41) that only the batch-1-reads-batch-0's-index path can
    * reject — the property dedup_delta_near cannot exhibit. Runs the
    * exact foreachBatch fold twice. Declared no-oracle (MinHash bands
    * are engine-defined); StreamingSpec drives the REAL readStream
    * over arriving files with a checkpoint restart and replay, and
    * DedupSimilaritySpec asserts the in-stream rejection + precision. */
  def streamDedupNear(s: SparkSession, dir: String): DataFrame = {
    val roots = nearStreamSeed(s, dir,
      RunId.scratchKeyed("neardedup_stream", dir))
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val delta = d.filter(pmod(col("doc_id"), lit(10)) >= 8)
      .unionByName(d
        .filter(pmod(col("doc_id"), lit(10)) < 8 && col("doc_id") < 20)
        .select((col("doc_id") + (1L << 40)).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))
    val b0 = delta.filter(pmod(col("doc_id"), lit(2)) === 0)
    val streamMut = b0
      .filter(col("doc_id") < 40)
      .select((col("doc_id") + (1L << 41)).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val b1 = delta.filter(pmod(col("doc_id"), lit(2)) === 1)
      .unionByName(streamMut)
    val r0 = nearAdmitFold(s, roots, b0, 0L)
    val r1 = nearAdmitFold(s, roots, b1, 1L)
    r0.unionByName(r1)
      .select("doc_id", "batch_id", "admitted", "match_id", "match_jaccard")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_delta" -> (dedupDelta _),
    "dedup_delta_near" -> (dedupDeltaNear _),
    "stream_dedup_near" -> (streamDedupNear _),
    "dedup_substring" -> (dedupSubstring _),
    "dedup_substring_apply" -> (dedupSubstringApply _),
    "dedup_near" -> (dedupNear _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_jaccard" -> (dedupJaccard _),
    "dedup_containment" -> (dedupContainment _),
    "dedup_minhash_eval" -> (dedupMinhashEval _),
    "dedup_cluster" -> (dedupCluster _),
    "dedup_survivor" -> (dedupSurvivor _),
    "dedup_soft" -> (dedupSoft _)
  )

  /** Shared oracle fragments — the 3-gram shingle relation and the
    * jaccard-threshold pair/edge/label chain appear in three oracles;
    * one definition keeps the 0.01 threshold, the shingle width and
    * the `doc_id < 60` bound from silently diverging between them. */
  private val shCteSql = """sh AS (
        SELECT doc_id,
          list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                         FOR i IN range(1, len(w)-1)]) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
              WHERE doc_id < 60))"""

  /** sh → pairs → edges → reach → lbl: connected-component labels
    * (label = min reachable id) over the jaccard pairs, seeded from
    * edge endpoints exactly like the RDD fixpoint. */
  private val clusterCteSql = s"""$shCteSql,
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
          AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) > 0.01),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs),
      reach(id, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
      lbl AS (SELECT id AS doc_id, min(label) AS cluster_id
              FROM reach GROUP BY id)"""

  val oracles: Map[String, String] = Map(
    // Same split, same +2^40 plants; NOT IN is safe (text is never
    // NULL) and states the anti-join directly.
    "dedup_delta" -> """
      WITH delta AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8
        UNION ALL
        SELECT doc_id + 1099511627776 AS doc_id, text
        FROM documents WHERE doc_id < 30)
      SELECT min(doc_id) AS doc_id, sha256(text) AS text_sha
      FROM delta
      WHERE text NOT IN (SELECT text FROM documents WHERE doc_id % 10 < 8)
      GROUP BY text ORDER BY doc_id""",
    // Same plants, same K=20 window hashes, same gaps-and-islands merge
    // as dedupSubstring — 0-based positions via i-1 to match posexplode.
    "dedup_substring" -> s"""
      WITH $substringCorpusSql,
      $substringWindowsSql,
      dirty AS (
        SELECT doc_id, pos FROM (
          SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS occ FROM wins)
        WHERE occ > 1),
      ${islandsSql("dirty")}
      SELECT doc_id,
        CAST(MIN(pos) AS INTEGER) AS span_start,
        CAST(MAX(pos) + 19 AS INTEGER) AS span_end,
        CAST(COUNT(*) AS BIGINT) AS n_windows
      FROM isl GROUP BY doc_id, island
      ORDER BY doc_id, span_start""",
    // Same corpus/windows; canonical = globally-first (doc_id, pos)
    // occurrence per hash, every other occurrence's windows merge to
    // removal spans, cleaned text drops the covered token indices.
    "dedup_substring_apply" -> s"""
      WITH $substringCorpusSql,
      $substringWindowsSql,
      marked AS (
        SELECT doc_id, pos,
          COUNT(*) OVER (PARTITION BY h) AS occ,
          ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
        FROM wins),
      rem AS (SELECT doc_id, pos FROM marked WHERE occ > 1 AND rn > 1),
      ${islandsSql("rem")},
      spans AS (
        SELECT doc_id, list(struct_pack(a := a, b := b) ORDER BY a) AS spans
        FROM (SELECT doc_id, MIN(pos) AS a, MAX(pos) + 19 AS b
              FROM isl GROUP BY doc_id, island)
        GROUP BY doc_id),
      joined AS (
        SELECT d.doc_id, string_split(d.text, ' ') AS w,
          COALESCE(s.spans, []) AS sp
        FROM all_docs d LEFT JOIN spans s ON d.doc_id = s.doc_id),
      cleaned AS (
        SELECT doc_id, w,
          [w[i] FOR i IN range(1, len(w) + 1)
           IF len(list_filter(sp, x -> i - 1 >= x.a AND i - 1 <= x.b)) = 0] AS kept
        FROM joined)
      SELECT doc_id,
        CAST(len(w) AS INTEGER) AS n_tokens,
        CAST(len(w) - len(kept) AS INTEGER) AS n_removed,
        md5(COALESCE(array_to_string(kept, ' '), '')) AS clean_md5
      FROM cleaned ORDER BY doc_id""",
    // estimator audit: md5 component hashes + relational MIN signature
    // mirrored verbatim; truth = the dedup_jaccard shingle kernel
    "dedup_minhash_eval" -> """
      WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 20
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, substring(text, instr(text, ' ') + 1)
        FROM documents WHERE doc_id < 20),
      sh AS (
        SELECT doc_id, sh FROM (
          SELECT doc_id,
            list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                           FOR i IN range(1, len(w)-1)]) AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus))
        WHERE len(sh) > 0),
      pairs AS (
        SELECT i AS id_a, i + 100000 AS id_b, 'planted' AS pair_type
        FROM range(0, 20) t(i)
        UNION ALL
        SELECT i, i + 10, 'random' FROM range(0, 10) t(i)),
      sig AS (
        SELECT doc_id, c,
          MIN(CAST(concat('0x',
            substring(md5(CAST(c AS VARCHAR) || ':' || g), 1, 15)) AS BIGINT))
            AS minh
        FROM (SELECT doc_id, unnest(sh) AS g FROM sh), range(0, 64) r(c)
        GROUP BY doc_id, c),
      m AS (
        SELECT p.id_a, p.id_b, p.pair_type,
          CAST(SUM(CASE WHEN a.minh = b.minh THEN 1 ELSE 0 END) AS INTEGER)
            AS est_matches
        FROM pairs p
        JOIN sig a ON a.doc_id = p.id_a
        JOIN sig b ON b.doc_id = p.id_b AND b.c = a.c
        GROUP BY 1, 2, 3),
      t AS (
        SELECT p.id_a, p.id_b,
          CAST(len(list_intersect(a.sh, b.sh)) AS INTEGER) AS inter,
          CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
            AS INTEGER) AS uni
        FROM pairs p
        JOIN sh a ON a.doc_id = p.id_a
        JOIN sh b ON b.doc_id = p.id_b)
      SELECT m.id_a, m.id_b, m.pair_type, m.est_matches,
        ROUND(CAST(m.est_matches AS DOUBLE) / 64, 6) AS est_jaccard,
        t.inter, t.uni,
        ROUND(CAST(t.inter AS DOUBLE) / t.uni, 6) AS true_jaccard
      FROM m JOIN t ON m.id_a = t.id_a AND m.id_b = t.id_b
      ORDER BY m.id_a, m.id_b""",
    "dedup_jaccard" -> s"""
      WITH $shCteSql
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_intersect(a.sh, b.sh)) AS INTEGER) AS inter,
        CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS INTEGER) AS uni,
        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM sh a, sh b
      WHERE a.doc_id < b.doc_id
        AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) > 0.01
      ORDER BY id_a, id_b""",
    // Asymmetric containment over originals ∪ planted first-third
    // quote mutants (id + 2^40): every value is integer arithmetic or
    // one exact IEEE division.
    "dedup_containment" -> s"""
      WITH ww AS (
        SELECT doc_id, string_split(text, ' ') AS w
        FROM documents WHERE doc_id < 20),
      uw AS (
        SELECT doc_id, w FROM ww
        UNION ALL
        SELECT doc_id + (1::BIGINT << 40) AS doc_id,
               w[1:greatest(len(w) // 3, 4)] AS w
        FROM ww),
      sh AS (
        SELECT doc_id,
          list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                         FOR i IN range(1, len(w)-1)]) AS sh
        FROM uw),
      p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.sh, b.sh)) AS INTEGER) AS inter,
          CAST(len(a.sh) AS INTEGER) AS n_a,
          CAST(len(b.sh) AS INTEGER) AS n_b
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.sh, b.sh)) > 0),
      c AS (
        SELECT id_a, id_b, inter, n_a, n_b,
          CAST(inter AS DOUBLE) / n_a AS c_ab,
          CAST(inter AS DOUBLE) / n_b AS c_ba,
          CAST(inter AS DOUBLE) / (n_a + n_b - inter) AS jaccard
        FROM p)
      SELECT id_a, id_b, inter, n_a, n_b, c_ab, c_ba, jaccard,
        (greatest(c_ab, c_ba) >= 0.5 AND jaccard < 0.5) AS partial_copy
      FROM c
      WHERE greatest(c_ab, c_ba) > 0.1
      ORDER BY id_a, id_b""",
    // Full MinHash-LSH mirror: one md5 base hash per shingle fanned
    // into 16 components by the SAME affine family (constants
    // interpolated from MinhashAffine), comma-joined band keys, the
    // per-band collision self-join, and the exact-Jaccard verify —
    // candidate generation included, bit-for-bit.
    "dedup_near" -> s"""
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id,
               substring(text, instr(text, ' ') + 1) AS text
        FROM documents WHERE doc_id < 20),
      sh AS (
        SELECT doc_id,
          [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           FOR i IN range(1, len(w)-1)] AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus)
        WHERE len(w) >= 3),
      aff(c, a, b) AS (VALUES ${MinhashAffine.zipWithIndex
        .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")}),
      hx AS (
        SELECT doc_id,
          CAST(concat('0x', substring(md5(g), 1, 15)) AS BIGINT)
            % $MinhashP AS h
        FROM (SELECT doc_id, unnest(sh) AS g FROM sh)),
      sig AS (
        SELECT doc_id, c, MIN((a * h + b) % $MinhashP) AS minh
        FROM hx, aff
        GROUP BY doc_id, c),
      band AS (
        SELECT doc_id, c // 4 AS band_idx,
          string_agg(CAST(minh AS VARCHAR), ',' ORDER BY c) AS band_val
        FROM sig GROUP BY doc_id, c // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM band a
        JOIN band b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        WHERE a.doc_id < b.doc_id),
      shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh)
      SELECT c.id_a, c.id_b,
        ROUND(CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE) /
          (len(a.shd) + len(b.shd) - len(list_intersect(a.shd, b.shd))), 6)
          AS jaccard
      FROM cand c
      JOIN shd a ON a.doc_id = c.id_a
      JOIN shd b ON b.doc_id = c.id_b
      WHERE ROUND(CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE) /
          (len(a.shd) + len(b.shd) - len(list_intersect(a.shd, b.shd))), 6)
          >= 0.6
      ORDER BY id_a, id_b""",
    // Full SimHash mirror: md5 hex-pair chunks as the bit source,
    // per-bit majorities via a bits join, chunk-PAIR banding (i<j),
    // per-chunk popcount Hamming — collision generation included.
    "dedup_simhash" -> """
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id,
               substring(text, instr(text, ' ') + 1) AS text
        FROM documents WHERE doc_id < 20),
      sh AS (
        SELECT doc_id,
          [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           FOR i IN range(1, len(w)-1)] AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus)
        WHERE len(w) >= 3),
      hx AS (
        SELECT doc_id, md5(g) AS h
        FROM (SELECT doc_id, unnest(sh[1:32767]) AS g FROM sh)),
      n AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY doc_id),
      cnts AS (
        SELECT doc_id, i, j,
          SUM((CAST(concat('0x', substring(h, 2*i+1, 2)) AS INTEGER) >> j) & 1)
            AS cnt
        FROM hx, range(0, 8) ci(i), range(0, 8) bj(j)
        GROUP BY doc_id, i, j),
      ch AS (
        SELECT c.doc_id, c.i,
          CAST(SUM(CASE WHEN 2 * c.cnt > n.n THEN (1 << c.j) ELSE 0 END)
            AS BIGINT) AS chv
        FROM cnts c JOIN n USING (doc_id)
        GROUP BY c.doc_id, c.i),
      bandrel AS (
        SELECT x.doc_id, x.i AS bi, y.i AS bj, x.chv * 256 + y.chv AS bv
        FROM ch x JOIN ch y ON x.doc_id = y.doc_id AND x.i < y.i),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bandrel a
        JOIN bandrel b ON a.bi = b.bi AND a.bj = b.bj AND a.bv = b.bv
        WHERE a.doc_id < b.doc_id),
      ham AS (
        SELECT c.id_a, c.id_b,
          CAST(SUM(bit_count(xor(xa.chv, xb.chv))) AS INTEGER) AS hamming
        FROM cand c
        JOIN ch xa ON xa.doc_id = c.id_a
        JOIN ch xb ON xb.doc_id = c.id_b AND xb.i = xa.i
        GROUP BY c.id_a, c.id_b)
      SELECT id_a, id_b, hamming FROM ham
      WHERE hamming <= 6
      ORDER BY id_a, id_b""",
    // Connected components as a recursive CTE over the SAME jaccard
    // pairs: label(id) = min node id reachable from id.
    "dedup_cluster" -> s"""
      WITH RECURSIVE $clusterCteSql,
      sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
             FROM lbl GROUP BY cluster_id)
      SELECT l.doc_id, l.cluster_id, s.cluster_size,
             l.doc_id = l.cluster_id AS is_canonical
      FROM lbl l JOIN sz s USING (cluster_id)
      ORDER BY l.doc_id""",
    // Same recursive-CTE labels; weight = 1e6 // cluster size, and the
    // demo-domain docs outside every pair are weight-1 singletons.
    "dedup_soft" -> s"""
      WITH RECURSIVE $clusterCteSql,
      sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
             FROM lbl GROUP BY cluster_id),
      d AS (SELECT doc_id FROM documents WHERE doc_id < 60)
      SELECT d.doc_id,
        COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
        COALESCE(s.cluster_size, 1) AS cluster_size,
        CAST(1000000 // COALESCE(s.cluster_size, 1) AS BIGINT) AS weight_fp
      FROM d
      LEFT JOIN lbl l ON d.doc_id = l.doc_id
      LEFT JOIN sz s ON l.cluster_id = s.cluster_id
      ORDER BY d.doc_id""",
    // Same recursive-CTE labels + keep-the-longest argmax window.
    "dedup_survivor" -> s"""
      WITH RECURSIVE $clusterCteSql,
      n AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words
            FROM documents WHERE doc_id < 60)
      SELECT l.doc_id, l.cluster_id, n.n_words,
        ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                           ORDER BY n.n_words DESC, l.doc_id ASC) = 1 AS is_survivor
      FROM lbl l JOIN n ON l.doc_id = n.doc_id
      ORDER BY l.doc_id""",
    // dedup_near and dedup_simhash ARE oracled above (md5-keyed
    // signatures, candidate generation mirrored bit-for-bit).
    // dedup_delta_near: candidate band join + exact-Jaccard verify +
    // admission left-join replayed over the persisted signature
    // artifacts (corpus index AND delta shard); the delta's full id
    // relation restates from documents, covering the no-shingle docs
    // the band table cannot carry
    "dedup_delta_near" -> """
      WITH delta AS (
        SELECT doc_id FROM documents WHERE doc_id % 10 >= 8
        UNION ALL
        SELECT doc_id + 1099511627776 AS doc_id FROM documents
        WHERE doc_id % 10 < 8 AND doc_id < 20),
      db AS (
        SELECT doc_id, band_idx, band_val
        FROM read_parquet('__ND_DELTA_BANDS__/*.parquet')),
      idx AS (
        SELECT doc_id AS corpus_id, band_idx, band_val
        FROM read_parquet('__ND_IDX_BANDS__/*.parquet')),
      cand AS (
        SELECT DISTINCT db.doc_id, idx.corpus_id
        FROM db JOIN idx USING (band_idx, band_val)),
      sha AS (
        SELECT doc_id, sha FROM read_parquet('__ND_DELTA_SH__/*.parquet')),
      shb AS (
        SELECT doc_id AS corpus_id, shd AS shb
        FROM read_parquet('__ND_IDX_SH__/*.parquet')),
      j AS (
        SELECT c.doc_id, c.corpus_id,
          ROUND(CAST(len(list_intersect(a.sha, b.shb)) AS DOUBLE) /
            (len(a.sha) + len(b.shb) - len(list_intersect(a.sha, b.shb))),
            6) AS jaccard
        FROM cand c
        JOIN sha a ON a.doc_id = c.doc_id
        JOIN shb b ON b.corpus_id = c.corpus_id),
      m AS (
        SELECT doc_id, jaccard AS match_jaccard, corpus_id AS match_id
        FROM (
          SELECT doc_id, jaccard, corpus_id,
            ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY jaccard DESC, corpus_id ASC) AS rk
          FROM j WHERE jaccard >= 0.6) WHERE rk = 1)
      SELECT d.doc_id, m.match_jaccard IS NULL AS admitted,
        m.match_id, m.match_jaccard
      FROM delta d LEFT JOIN m ON d.doc_id = m.doc_id
      ORDER BY d.doc_id"""
  )
}
