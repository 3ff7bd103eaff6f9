package graft

import org.apache.spark.sql.functions._

/** Planted-pair recovery for the no-oracle LSH operators and sanity
  * bounds for similarity search (SURVEY.md §2.K, §5.3). */
class DedupSimilaritySpec extends SparkSpec {

  test("dedup_near finds every planted near-duplicate pair") {
    val pairs = SparkEntry.queries("dedup_near")(spark, sf001)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 20L).map(i => (i, i + 100000L)).toSet
    assert(planted.subsetOf(pairs), s"missing: ${planted -- pairs}")
  }

  test("dedup_simhash equals brute-force Hamming<=6 pairs (no LSH misses)") {
    import graft.functions.Text
    import graft.operators.Dedup
    val base = Dedup.withPlanted(spark, sf001)
      .withColumn("sh", Text.shingles(Text.words(col("text")), 3))
      .select("doc_id", "sh")
    // ground truth over the SAME signature family the query banding
    // uses (md5 hex chunks — the oracle-mirrorable bit source): the
    // property under test is banding COMPLETENESS at Hamming<=6, which
    // must hold for any hash family
    val sig = Dedup.simhashSignatureMd5(base)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expected = (for {
      (ida, sa) <- sig; (idb, sb) <- sig
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= 6
    } yield (ida, idb)).toSet
    val got = SparkEntry.queries("dedup_simhash")(spark, sf001)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"missed: ${expected -- got}, spurious: ${got -- expected}")
    // the single-word mutation usually stays within Hamming 6
    val planted = (0L until 20L).map(i => (i, i + 100000L)).toSet
    assert((planted & got).size >= 14)
  }

  test("dedup_substring equals brute-force span merge and recovers planted spans") {
    import graft.core.Tables
    val K = 20
    val got = SparkEntry.queries("dedup_substring")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    // brute-force ground truth in plain Scala: same plants, global
    // 20-gram occurrence counts, per-doc gaps-and-islands merge
    val corpus = Tables.documents(spark, sf001).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val byId = corpus.toMap
    def first30(t: String) = t.split(" ").take(30).mkString(" ")
    val plants =
      (0L until 10L).map(i =>
        (i + (1L << 40)) -> (first30(byId(i)) + " " + first30(byId(i + 10)))) ++
      corpus.collect { case (id, t) if id < 40 && t.split(" ").length >= 80 =>
        val w = t.split(" ")
        (id + (1L << 40) + (1L << 20)) -> (w.slice(0, 30).mkString(" ") + " " + w.slice(50, 80).mkString(" "))
      }
    val all = corpus ++ plants
    val wins = all.flatMap { case (id, t) =>
      val w = t.split(" ")
      (0 to w.length - K).map(p => (id, p, w.slice(p, p + K).mkString(" ")))
    }
    val occ = wins.groupBy(_._3).map { case (g, vs) => g -> vs.length }
    val expected = wins.filter(w => occ(w._3) > 1)
      .groupBy(_._1).flatMap { case (id, ds) =>
        val ps = ds.map(_._2).sorted
        val islands = ps.tail.foldLeft(List(List(ps.head))) { (acc, p) =>
          if (p - acc.head.head <= K) (p :: acc.head) :: acc.tail
          else List(p) :: acc
        }
        islands.map(isl => (id, isl.min, isl.max + K - 1, isl.length.toLong))
      }.toSet
    assert(got == expected,
      s"missed: ${expected -- got}, spurious: ${got -- expected}")
    // planted-span guards (fixture-drift canaries): every cross-doc
    // plant whose halves are full 30-word copies merges to one [0,59]
    // span, and its sources carry a span starting at 0
    val bySrc = got.groupBy(_._1)
    for (i <- 0L until 10L
         if byId(i).split(" ").length >= 30 && byId(i + 10).split(" ").length >= 30) {
      assert(bySrc(i).exists(s => s._2 == 0 && s._3 >= 29), s"doc $i missing [0,29+]")
      assert(bySrc((1L << 40) + i).exists(s => s._2 == 0 && s._3 >= 59),
        s"plant ${(1L << 40) + i}: ${bySrc((1L << 40) + i)}")
    }
    // spans within a doc never overlap or touch (maximal-merge invariant)
    for ((_, ss) <- bySrc; sorted = ss.toSeq.sortBy(_._2); w <- sorted.sliding(2)
         if w.length == 2)
      assert(w(1)._2 > w(0)._3 + 1, s"non-maximal spans: ${w.toSeq}")
  }

  test("dedup_substring_apply equals brute-force removal; plants empty fully") {
    import graft.core.Tables
    val K = 20
    val got = SparkEntry.queries("dedup_substring_apply")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    val corpus = Tables.documents(spark, sf001).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val byId = corpus.toMap
    def first30(t: String) = t.split(" ").take(30).mkString(" ")
    val plants =
      (0L until 10L).map(i =>
        (i + (1L << 40)) -> (first30(byId(i)) + " " + first30(byId(i + 10)))) ++
      corpus.collect { case (id, t) if id < 40 && t.split(" ").length >= 80 =>
        val w = t.split(" ")
        (id + (1L << 40) + (1L << 20)) ->
          (w.slice(0, 30).mkString(" ") + " " + w.slice(50, 80).mkString(" "))
      }
    val all = corpus ++ plants
    val wins = all.flatMap { case (id, t) =>
      val w = t.split(" ")
      (0 to w.length - K).map(p => ((id, p), w.slice(p, p + K).mkString(" ")))
    }
    val byGram = wins.groupBy(_._2)
    // non-canonical occurrences of duplicated grams mark removal windows
    val remove = byGram.values.filter(_.length > 1).flatMap { occs =>
      val sorted = occs.map(_._1).sorted
      sorted.drop(1)
    }.toSeq.groupBy(_._1)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = all.map { case (id, t) =>
      val w = t.split(" ")
      val ps = remove.getOrElse(id, Nil).map(_._2).sorted
      val covered = Array.fill(w.length)(false)
      // islands merge is equivalent to directly covering each window
      for (p <- ps; j <- p until math.min(p + K, w.length)) covered(j) = true
      val kept = w.indices.filter(!covered(_)).map(w)
      (id, w.length, w.length - kept.length, md5hex(kept.mkString(" ")))
    }.toSet
    assert(got == expected,
      s"missed: ${(expected -- got).take(3)}, spurious: ${(got -- expected).take(3)}")
    // cross-doc plants are pure copies of earlier text: fully emptied
    for (i <- 0L until 10L
         if byId(i).split(" ").length >= 30 && byId(i + 10).split(" ").length >= 30)
      assert(got.contains((i + (1L << 40), 60, 60, md5hex(""))),
        s"plant ${(1L << 40) + i} not fully removed")
  }

  test("dedup_exact is idempotent and returns the dup-free corpus") {
    val once = SparkEntry.queries("dedup_exact")(spark, sf001)
    val n = graft.core.Tables.documents(spark, sf001).count()
    assert(once.count() == n)
    assert(once.dropDuplicates("text_sha").count() == n)
  }

  test("dedup_embed finds exactly the planted copies") {
    val pairs = SparkEntry.queries("dedup_embed")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planted = (0L until 10L).map(i => (i, i + 100000L)).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == planted)
    assert(pairs.forall(_._3 > 0.999))
  }

  test("sim_topk: 10 neighbors per query, scores in [-1, 1], self excluded") {
    val rows = SparkEntry.queries("sim_topk")(spark, sf001).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5 && byQ.values.forall(_.length == 10))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.000001))
    assert(rows.forall(r => r.getLong(1) != r.getLong(0)))
  }

  test("sim_topk_ivf: 10 neighbors per query with brute-force overlap") {
    val brute = SparkEntry.queries("sim_topk")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("sim_topk_ivf")(spark, sf001).collect()
    val byQ = ivf.groupBy(_.getLong(0))
    assert(byQ.size == 5 && byQ.values.forall(_.length == 10))
    val overlap = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet & brute
    assert(overlap.nonEmpty, "IVF shares no neighbor with brute force")
  }

  test("sim_index_delta: lossless append merge; probe recall matches a fresh full build") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val emb = graft.core.Tables.embeddings(spark, sf001)
    val nCorpus = emb.filter(pmod(col("vec_id"), lit(10)) < 8).count()
    val nDelta = emb.filter(pmod(col("vec_id"), lit(10)) >= 8).count()
    val out = SparkEntry.queries("sim_index_delta")(spark, sf001).collect()
    // lossless: every standing and delta vector lands in exactly one cell
    assert(out.map(_.getAs[Long]("n_corpus")).sum == nCorpus)
    assert(out.map(_.getAs[Long]("n_delta")).sum == nDelta)
    assert(out.map(_.getAs[Long]("n_total")).sum == nCorpus + nDelta)
    val merged = spark.read.parquet(
      graft.operators.Similarity.ivfDeltaPaths(spark, sf001)._2)
    assert(merged.select("vec_id").distinct().count() == nCorpus + nDelta,
      "append duplicated or lost vec_ids")
    // recall: probing the delta-appended index must match a fresh
    // full-corpus build (both vs the exact brute-force top-10)
    val brute = SparkEntry.queries("sim_topk")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (centPath, assignPath) = graft.operators.Similarity.ivfDeltaPaths(spark, sf001)
    val mergedProbe = graft.operators.Similarity
      .ivfProbe(spark.read.parquet(centPath), spark.read.parquet(assignPath))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val freshProbe = SparkEntry.queries("sim_topk_ivf")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (mr, fr) = ((mergedProbe & brute).size, (freshProbe & brute).size)
    assert(mr >= fr - 5,
      s"delta-merged recall $mr/50 fell more than 5 under fresh-build $fr/50")
    assert(mr > 0, "merged index shares no neighbor with brute force")
  }

  test("sim_topk_ivf_pq: int8 detour costs no recall vs float IVF at equal nprobe") {
    val brute = SparkEntry.queries("sim_topk")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("sim_topk_ivf")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SparkEntry.queries("sim_topk_ivf_pq")(spark, sf001).collect()
    val byQ = pq.groupBy(_.getLong(0))
    assert(byQ.size == 5 && byQ.values.forall(_.length == 10))
    val pqSet = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    // same coarse cells + exact rescore of a 3x over-fetch: the int8
    // approximation must not lose brute-force overlap vs the float probe
    assert((pqSet & brute).size >= (ivf & brute).size,
      s"pq overlap ${(pqSet & brute).size} < ivf overlap ${(ivf & brute).size}")
  }

  test("sim_topk_pq_adc: ADC detour holds float-IVF overlap at equal nprobe; codes are 32x smaller") {
    val brute = SparkEntry.queries("sim_topk")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("sim_topk_ivf")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SparkEntry.queries("sim_topk_pq_adc")(spark, sf001).collect()
    val byQ = pq.groupBy(_.getLong(0))
    assert(byQ.size == 5 && byQ.values.forall(_.length == 10))
    val pqSet = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    // same coarse cells + exact rescore of a 3x over-fetch: the
    // 8-subspace ADC approximation may reorder the over-fetch tail
    // but must not lose brute-force overlap vs the float probe beyond
    // a 10% slack (PQ at 32x compression is lossier than int8's 4x;
    // the rescore recovers the head)
    assert((pqSet & brute).size * 10 >= (ivf & brute).size * 9,
      s"pq-adc overlap ${(pqSet & brute).size} fell >10% under ivf ${(ivf & brute).size}")
    // the compression claim: one tinyint code per subspace
    val c = graft.operators.Similarity.pqCodebooks(spark, sf001)
    assert(c.length == 8 && c.forall(_.length == 16))
    val dim = graft.core.Tables.embeddings(spark, sf001)
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("embedding"))).head().getInt(0)
    assert(dim * 4 == 8 * 32, s"dim $dim: expected 8 code bytes vs ${dim * 4} float bytes (32x)")
  }

  test("sim_pq_delta: frozen-book delta encode is lossless, idempotent, and drift-bounded") {
    val s = spark
    val rows = SparkEntry.queries("sim_pq_delta")(s, sf001).collect()
    // lossless merge: every vector is coded exactly once
    val nTotal = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(nTotal == graft.core.Tables.embeddings(s, sf001).count(),
      s"code table carries $nTotal rows")
    assert(rows.map(_.getLong(2)).sum > 0, "no delta rows coded")
    // drift bound: same-distribution delta must reconstruct in the
    // corpus error class under the FROZEN books (weighted means)
    def wmean(nIdx: Int, eIdx: Int): Double = {
      val picked = rows.filter(r => r.getLong(nIdx) > 0 && !r.isNullAt(eIdx))
      picked.map(r => r.getDouble(eIdx) * r.getLong(nIdx)).sum /
        picked.map(_.getLong(nIdx)).sum
    }
    val (ec, ed) = (wmean(1, 3), wmean(2, 4))
    assert(ec > 0 && ed > 0, s"degenerate reconstruction errors: $ec / $ed")
    assert(ed <= 3 * ec, s"frozen-book drift: delta err $ed vs corpus err $ec")
    // idempotence: re-encoding the delta slice against the PERSISTED
    // artifacts reproduces the stored delta codes byte-for-byte (the
    // crash-replay / backfill property)
    val (booksPath, codesPath) = graft.operators.Similarity.pqDeltaPaths(s, sf001)
    val stored = s.read.parquet(codesPath)
      .filter(pmod(col("vec_id"), lit(10)) >= 8)
      .select("vec_id", "codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val books = s.read.parquet(booksPath).orderBy("m", "j").collect()
      .groupBy(_.getInt(0)).toIndexedSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Float](2)).toIndexedSeq)
    val centsF = s.read.parquet(
        graft.operators.Similarity.ivfDeltaPaths(s, sf001)._1)
      .orderBy("cent_cell").collect().map(_.getSeq[Float](1)).toSeq
    val re = graft.operators.Similarity.pqEncode(
        s.read.parquet(graft.operators.Similarity.ivfDeltaPaths(s, sf001)._2)
          .filter(pmod(col("vec_id"), lit(10)) >= 8), centsF, books)
      .select("vec_id", "codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(re == stored, "re-encode under the persisted artifacts diverged")
  }

  test("sim_threshold_lsh agrees with the exact bounded kernel (subset + recall)") {
    // exact all-pairs over vec_id < 300 is the ground-truth anchor
    val exact = SparkEntry.queries("sim_threshold")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SparkEntry.queries("sim_threshold_lsh")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lshBounded = lsh.filter { case ((a, b), _) => a < 300 && b < 300 }
    // precision 1.0: every bucketed pair is exact-verified, so on the
    // bounded range the LSH result must be a subset with equal scores
    assert(lshBounded.keySet.subsetOf(exact.keySet),
      s"spurious pairs: ${lshBounded.keySet -- exact.keySet}")
    assert(lshBounded.forall { case (k, v) => exact(k) == v }, "scores differ")
    // recall floor: banded SRP recall at tau=0.35 is similarity-
    // dependent; with 8x8-bit bands the fixture (seed-fixed, so this
    // is deterministic) recovers a nonempty slice of the exact pairs
    assert(exact.nonEmpty, "fixture has no pairs above tau — test is vacuous")
    assert(lshBounded.nonEmpty,
      s"LSH recovered none of the ${exact.size} exact pairs")
  }

  test("sim_threshold_lsh_tau08 recovers exactly the planted production-τ pairs") {
    // At τ=0.8 the un-planted corpus is empty (max pairwise cosine
    // ≈0.51), planted exact copies have cosine 1.0 — identical sign
    // patterns collide in EVERY band, so recall on them is exactly 1 —
    // and precision is 1.0 by the exact verify: the output must be
    // precisely the planted set.
    val got = SparkEntry.queries("sim_threshold_lsh_tau08")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val n = graft.core.Tables.embeddings(spark, sf001).count()
    val planted = (0L until n by 100L).map(i => (i, i + (1L << 40))).toSet
    assert(got.map(p => (p._1, p._2)).toSet == planted,
      s"missing: ${planted -- got.map(p => (p._1, p._2))}, " +
        s"spurious: ${got.map(p => (p._1, p._2)).toSet -- planted}")
    assert(got.forall(_._3 >= 0.999), "planted exact copies must score ~1")
  }

  test("sim_knn_join_lsh recovers every planted twin at rank 1, both directions") {
    // Exact copies collide in every SRP band, so for each planted
    // vector (id + 2^40) the twin is guaranteed in the candidate set;
    // cosine 1.0 beats every genuine pair (max ≈0.51), so it must
    // surface at rank 1 in BOTH directions with score ~1.
    val rank1 = SparkEntry.queries("sim_knn_join_lsh")(spark, sf001)
      .filter(col("rk") === 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val n = graft.core.Tables.embeddings(spark, sf001).count()
    (0L until n by 100L).foreach { i =>
      val p = i + (1L << 40)
      assert(rank1.get(i).exists(t => t._1 == p && t._2 >= 0.999),
        s"original $i did not rank its planted twin first: ${rank1.get(i)}")
      assert(rank1.get(p).exists(t => t._1 == i && t._2 >= 0.999),
        s"planted $p did not rank its original first: ${rank1.get(p)}")
    }
    // k discipline: no key may carry more than 3 rows.
    val counts = SparkEntry.queries("sim_knn_join_lsh")(spark, sf001)
      .groupBy("id_a").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 3))
  }

  test("sim_knn_join_lsh scores agree with the exact kernel on shared pairs") {
    val exact = SparkEntry.queries("sim_knn_join")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SparkEntry.queries("sim_knn_join_lsh")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = exact.keySet & lsh.keySet
    assert(shared.nonEmpty, "LSH k-NN shares no pair with the exact kernel")
    assert(shared.forall(k => exact(k) == lsh(k)), "scores differ between paths")
  }

  test("dedup_delta_near: precise rejections, planted mutants caught, >=0.9 pairs never missed") {
    import graft.functions.Text
    val out = SparkEntry.queries("dedup_delta_near")(spark, sf001).collect()
    val planted = out.filter(_.getLong(0) >= (1L << 40))
    assert(planted.nonEmpty)
    planted.foreach { r =>
      assert(!r.getAs[Boolean]("admitted"), s"planted ${r.getLong(0)} admitted")
      assert(r.getAs[Double]("match_jaccard") >= 0.6)
    }
    assert(out.exists(_.getAs[Boolean]("admitted")), "nothing admitted at all")
    // brute-force exact jaccard delta×corpus (500 docs at sf0.001):
    // ground truth for precision and the near-identical recall bar
    val d = graft.core.Tables.documents(spark, sf001).select("doc_id", "text")
    val delta = d.filter(pmod(col("doc_id"), lit(10)) >= 8)
      .unionByName(d.filter(pmod(col("doc_id"), lit(10)) < 8 && col("doc_id") < 20)
        .select((col("doc_id") + (1L << 40)).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))
    def shingled(df: org.apache.spark.sql.DataFrame, id: String, sh: String) =
      df.select(col("doc_id").as(id),
        array_distinct(Text.shingles(Text.words(col("text")), 3)).as(sh))
    val brute = shingled(delta, "doc_id", "sha")
      .crossJoin(shingled(d.filter(pmod(col("doc_id"), lit(10)) < 8), "corpus_id", "shb"))
      .withColumn("j", round(Text.jaccard(col("sha"), col("shb")), 6))
      .filter(col("j") >= 0.6)
      .groupBy("doc_id").agg(max(struct(col("j"), (-col("corpus_id")).as("negid"))).as("m"))
      .select(col("doc_id"), col("m.j").as("j"), (-col("m.negid")).as("best_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(1)))).toMap
    val rejected = out.filter(!_.getAs[Boolean]("admitted"))
    // precision 1.0: every rejection is backed by a real >=0.6 pair,
    // and the reported best match IS the brute-force best
    rejected.foreach { r =>
      val bf = brute.get(r.getLong(0))
      assert(bf.isDefined, s"${r.getLong(0)} rejected with no >=0.6 corpus pair")
      assert((r.getAs[Long]("match_id"), r.getAs[Double]("match_jaccard")) == bf.get,
        s"${r.getLong(0)}: reported ${(r.getAs[Long]("match_id"), r.getAs[Double]("match_jaccard"))} vs brute ${bf.get}")
    }
    // recall bar: near-identical pairs (>=0.9) collide in some band —
    // none may slip through the gate
    val rejectedIds = rejected.map(_.getLong(0)).toSet
    brute.filter(_._2._2 >= 0.9).keys.foreach { id =>
      assert(rejectedIds(id), s"near-identical $id (j=${brute(id)._2}) admitted") }
  }

  test("dedup_semantic drops exactly the planted copies; agrees with within-cell brute force") {
    val out = SparkEntry.queries("dedup_semantic")(spark, sf001).collect()
    val dropped = out.filter(_.getAs[Boolean]("dropped")).map(_.getLong(0)).toSet
    val planted = out.map(_.getLong(0)).filter(_ >= (1L << 40)).toSet
    assert(planted.nonEmpty, "no planted copies in the corpus union")
    assert(planted.subsetOf(dropped),
      s"planted copies kept: ${planted -- dropped}")
    out.filter(r => planted(r.getLong(0))).foreach { r =>
      assert(r.getAs[Double]("max_prior_sim") == 1.0,
        s"planted ${r.getLong(0)} max_prior_sim ${r.getAs[Double]("max_prior_sim")}") }
    // brute force: the paper's rule over ALL within-cell pairs (not
    // just band candidates) must produce the same dropped set.
    val cellOf = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val base = graft.core.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val all = (base ++ base.filter(_._1 % 100 == 0)
      .map { case (id, v) => (id + (1L << 40)) -> v }).sortBy(_._1)
    // mirror DotProductExpr: float products, each widened to double
    def sim(a: Array[Float], b: Array[Float]): Double =
      a.indices.map(i => (a(i) * b(i)).toDouble).sum
    val bf = (for {
      (i, vi) <- all
      if all.exists { case (j, vj) =>
        j < i && cellOf(j) == cellOf(i) && math.round(sim(vi, vj) * 1e6) / 1e6 > 0.96 }
    } yield i).toSet
    assert(dropped == bf,
      s"missed: ${bf -- dropped}, spurious: ${dropped -- bf}")
  }

  test("kmeans_fit separates planted Gaussians perfectly; fixture assignment is total") {
    val s = spark; import s.implicits._
    // planted: 10 orthogonal centers (one-hot dims 0..9), 40 points
    // each with bounded seeded noise; ids interleave mod 10 so the
    // deterministic k-smallest-ids init sees one seed per cluster
    val rng = new scala.util.Random(42)
    val planted = (0 until 400).map { id =>
      val c = id % 10
      val v = Array.tabulate(64)(d =>
        (if (d == c) 1.0f else 0.0f) + (rng.nextFloat() - 0.5f) * 0.2f)
      (id.toLong, v.toSeq, c)
    }
    val df = planted.toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity
      .kmeansAssign(df.select("vec_id", "embedding"), k = 10, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val label = planted.map(p => p._1 -> p._3).toMap
    val purity = out.groupBy(_._2).values.map { members =>
      members.map(kv => label(kv._1)).groupBy(identity).values.map(_.size).max
    }.sum.toDouble / out.size
    assert(purity == 1.0, s"purity $purity on separable planted clusters")
    assert(out.values.toSet.size == 10, "some centroid went unused")
    // the declared query on the fixture: total assignment, all ids,
    // clusters within range (label recovery is not asserted — the
    // fixture labels are geometrically near-random, see kernel doc)
    val fix = SparkEntry.queries("kmeans_fit")(spark, sf001).collect()
    val n = graft.core.Tables.embeddings(spark, sf001).count()
    assert(fix.length.toLong == n, "fixture assignment is not total")
    assert(fix.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 10))
  }

  test("embedding_pca recovers planted components; bit-identical across layouts") {
    import graft.operators.Similarity
    // planted anisotropic cloud in d=16: variance 9 along u (e0+e1)/√2,
    // variance 1 along w (e2−e3)/√2, 0.01² isotropic noise — the top-2
    // eigenvectors are u then w by construction
    val d = 16
    val rnd = new scala.util.Random(42)
    val u = Array.tabulate(d)(i => if (i <= 1) (1.0 / math.sqrt(2)).toFloat else 0f)
    val w = Array.tabulate(d)(i =>
      if (i == 2) (1.0 / math.sqrt(2)).toFloat
      else if (i == 3) (-1.0 / math.sqrt(2)).toFloat else 0f)
    val rows = (0 until 400).map { id =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 1.0
      val vec = Array.tabulate(d)(i =>
        (a * u(i) + b * w(i) + rnd.nextGaussian() * 0.01).toFloat)
      (id.toLong, vec.toSeq)
    }
    import spark.implicits._
    val emb = rows.toDF("vec_id", "embedding")
    val (_, comps, eig) = Similarity.pcaFit(emb, k = 2)
    def cos(a: Array[Double], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum)
    }
    assert(eig(0) > eig(1), s"eigenvalues not ordered: ${eig.toSeq}")
    assert(math.abs(cos(comps(0), u)) > 0.99,
      s"top component missed planted u: cos=${cos(comps(0), u)}")
    assert(math.abs(cos(comps(1), w)) > 0.99,
      s"second component missed planted w: cos=${cos(comps(1), w)}")
    // cross-layout determinism: the fixed-point Gram buffer sums longs,
    // so 1-partition and 7-partition fits must agree BIT-FOR-BIT
    val p1 = Similarity.pcaProject(emb.repartition(1), k = 2).collect()
    val p7 = Similarity.pcaProject(emb.repartition(7), k = 2).collect()
    assert(p1.length == p7.length && p1.zip(p7).forall { case (x, y) =>
      x.getLong(0) == y.getLong(0) &&
        x.getDouble(1) == y.getDouble(1) && x.getDouble(2) == y.getDouble(2)
    }, "projection differs across partition layouts")
    // the declared query on the fixture: total, 8 components, finite
    val fix = SparkEntry.queries("embedding_pca")(spark, sf001).collect()
    val n = graft.core.Tables.embeddings(spark, sf001).count()
    assert(fix.length.toLong == n && fix.head.length == 9)
    assert(fix.forall(r => (1 to 8).forall(i => !r.getDouble(i).isNaN)))
  }

  test("sim_topk_lsh candidates agree with brute force on shared pairs") {
    val brute = SparkEntry.queries("sim_topk")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SparkEntry.queries("sim_topk_lsh")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = brute.keySet & lsh.keySet
    assert(shared.nonEmpty, "LSH found no brute-force neighbor at all")
    assert(shared.forall(k => brute(k) == lsh(k)), "scores differ between paths")
  }

  test("dedup_containment: planted quotes score containment exactly 1.0 with low Jaccard") {
    val rows = SparkEntry.queries("dedup_containment")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getBoolean(8)))
    val planted = rows.filter(r => r._2 == r._1 + (1L << 40))
    assert(planted.length == 20, s"expected 20 planted pairs, got ${planted.length}")
    for ((ia, ib, inter, na, nb, cab, cba, j, pc) <- planted) {
      // the quote is a PREFIX of the original: its shingles are a
      // subset, so the quote-side containment is exactly 1.0 …
      assert(cba == 1.0, s"pair ($ia, $ib): c_ba $cba != 1.0")
      assert(inter == nb)
      // … while symmetric Jaccard sits near ⅓ — below any dedup
      // threshold. This is the pair class the operator exists for.
      assert(j < 0.5 && pc, s"pair ($ia, $ib): jaccard $j, partial_copy $pc")
      assert(cab == j || cab < 1.0) // directionality: original side diluted
    }
    // the flag is exactly its definition on every row (a quote CAN
    // legitimately be contained in a second, unrelated source — at
    // this fixture's shorter docs that genuinely happens — so the
    // check is flag consistency, not planted-only membership)
    for ((ia, ib, _, _, _, cab, cba, j, pc) <- rows)
      assert(pc == (math.max(cab, cba) >= 0.5 && j < 0.5),
        s"pair ($ia, $ib): flag $pc inconsistent with c=($cab, $cba), j=$j")
  }

  test("sim_topk_bq: Hamming shortlist + exact rescore, recall measured vs brute force") {
    val bq = SparkEntry.queries("sim_topk_bq")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getInt(4).toLong))
    assert(bq.nonEmpty)
    // shape: 10 rows per query, contiguous ranks, scores non-increasing
    for ((_, qRows) <- bq.groupBy(_._1)) {
      val ordered = qRows.sortBy(_._5)
      assert(ordered.map(_._5).toSeq == (1L to ordered.length).toSeq)
      assert(ordered.length == 10, s"under-filled top-k: ${ordered.length}")
      ordered.sliding(2).foreach {
        case Array((_, v1, _, s1, _), (_, v2, _, s2, _)) =>
          assert(s1 > s2 || (s1 == s2 && v1 < v2))
        case _ =>
      }
    }
    // Hamming distances live in [0, 64] (64 sign bits)
    assert(bq.forall(r => r._3 >= 0 && r._3 <= 64))
    // the rescore is the EXACT kernel: any pair the brute-force top-10
    // also surfaces must carry a bit-identical score
    val brute = SparkEntry.queries("sim_topk")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bqMap = bq.map(r => (r._1, r._2) -> r._4).toMap
    val shared = brute.keySet & bqMap.keySet
    assert(shared.nonEmpty, "BQ shortlist missed every true neighbor")
    assert(shared.forall(k => brute(k) == bqMap(k)),
      "rescore diverges from the exact kernel on shared pairs")
    // recall@10 from a 50-deep 64-bit Hamming shortlist: SRP makes
    // sign-bit Hamming monotone in angle in expectation, so the
    // shortlist concentrates true neighbors far above the 10% a
    // random 50-of-~500 pool would hit
    val recall = shared.size.toDouble / brute.size
    assert(recall >= 0.3, f"BQ recall@10 $recall%.3f below floor 0.3")
  }

  test("sim_recall_eval: recall monotone in nprobe, exactly 1.0 when every cell is probed") {
    val rows = SparkEntry.queries("sim_recall_eval")(spark, sf001).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8, 16))
    val n = rows.head.getLong(1)
    assert(n > 0 && rows.forall(_.getLong(1) == n),
      "ground-truth size must be fixed across nprobe rows")
    val recalls = rows.map(_.getDouble(3)).toSeq
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in nprobe: $recalls")
    // nprobe=16 probes all 16 cells: the candidate set is the whole
    // corpus, so candidate recall MUST be exactly 1 — the index
    // partitions losslessly or this fires.
    assert(rows.last.getLong(2) == n && rows.last.getDouble(3) == 1.0,
      s"full probe missed truth: ${rows.last}")
    // and a partial probe must already find something (planted
    // structure puts neighbors in near cells)
    assert(recalls.head > 0.0, "nprobe=1 found nothing — probe broken")
  }

  test("sample_coreset: k cells, ≤4 per cell, and each pick is genuinely most-central") {
    val rows = SparkEntry.queries("sample_coreset")(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byCell = rows.groupBy(_._1)
    assert(byCell.keySet.subsetOf((0 until 10).toSet))
    // the SELECTION claim is "spans the corpus's modes": a collapse to
    // one mega-cell (broken distance struct) must fail here, not pass
    // because subset+nonEmpty were vacuous
    assert(byCell.size >= 8, s"k-means collapsed: only ${byCell.size} of 10 cells populated")
    // every pick is non-negative true squared distance
    assert(rows.forall(_._4 >= 0.0), "negative squared distance in output")
    for ((c, members) <- byCell) {
      assert(members.length <= 4, s"cell $c over-selected: ${members.length}")
      // ranks dense from 1, distances non-decreasing with rank
      val sorted = members.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to members.length),
        s"cell $c ranks not dense")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq,
        s"cell $c distances not monotone in rank")
    }
    // brute-force check: recompute every vector's (cell, dist) from
    // the same trained centroids and confirm the selection per cell
    val emb = graft.core.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val cents = graft.operators.Similarity.kmeansCentroids(
      graft.core.Tables.embeddings(spark, sf001).select("vec_id", "embedding"),
      k = 10, iters = 5)
    def assign(v: Array[Float]): (Int, Double) =
      cents.zipWithIndex.map { case (c, i) =>
        val cc = c.map(x => x.toDouble * x).sum
        val dot = c.zip(v).foldLeft(0.0) { case (a, (x, y)) => a + (x * y).toDouble }
        (cc - 2.0 * dot, i)
      }.min match { case (d, i) => (i, d) }
    // within-cell ranking uses the TRUE squared distance (proxy + ‖x‖²)
    def norm2(v: Array[Float]): Double =
      v.foldLeft(0.0) { case (a, x) => a + (x * x).toDouble }
    val all = emb.map { case (id, v) =>
      val (c, d) = assign(v); (c, d + norm2(v), id)
    }
    for ((c, members) <- byCell) {
      val expect = all.filter(_._1 == c).sortBy(t => (t._2, t._3))
        .take(members.length).map(_._3).toSet
      val got = members.map(_._3).toSet
      assert(got == expect, s"cell $c picks differ: got $got expect $expect")
    }
  }

  test("sim_mmr: picks replay the exact greedy objective and beat plain top-k on diversity") {
    val got = SparkEntry.queries("sim_mmr")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val emb = graft.core.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def fdot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += (a(i) * b(i)).toDouble; i += 1 }
      s
    }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lam = 0.7
    for (qid <- 0L until 5L) {
      val qv = emb(qid)
      // the same top-20 pool: qsim desc, vec_id asc
      val pool = emb.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, r6(fdot(v, qv)), v) }
        .sortBy { case (id, s, _) => (-s, id) }.take(20)
      var sel = List.empty[(Long, Array[Float])]
      val expect = (1 to 10).map { r =>
        val scored = pool.filterNot { case (id, _, _) => sel.exists(_._1 == id) }
          .map { case (id, qs, v) =>
            val m =
              if (sel.isEmpty) qs
              else r6(lam * qs - (1 - lam) *
                sel.map(s => r6(fdot(v, s._2))).max)
            (id, qs, m, v)
          }
        val pick = scored.maxBy { case (id, _, m, _) => (m, -id) }
        sel = (pick._1, pick._4) :: sel
        (r, pick._1, pick._2, pick._3)
      }
      val gotQ = got.filter(_._1 == qid).sortBy(_._2)
        .map(t => (t._2, t._3, t._4, t._5))
      assert(gotQ.toSeq == expect.toSeq,
        s"query $qid MMR sequence differs:\n got   $gotQ\n expect $expect")
      // diversity: the MMR set's max internal similarity must not
      // exceed the plain top-10's (usually strictly lower)
      def maxInternal(ids: Seq[Long]): Double =
        (for (a <- ids; b <- ids if a < b) yield fdot(emb(a), emb(b))).max
      val mmrIds = gotQ.map(_._2).toSeq
      val topIds = pool.take(10).map(_._1).toSeq
      assert(maxInternal(mmrIds) <= maxInternal(topIds) + 1e-9,
        s"query $qid: MMR set less diverse than plain top-k")
    }
  }

  test("dedup_minhash_eval: estimator tracks truth and separates planted from random") {
    val rows = SparkEntry.queries("dedup_minhash_eval")(spark, sf001).collect()
      .map(r => (r.getString(2), r.getDouble(4), r.getDouble(7)))
    assert(rows.length == 30, s"expected 30 evaluation pairs, got ${rows.length}")
    val planted = rows.filter(_._1 == "planted")
    val random = rows.filter(_._1 == "random")
    assert(planted.length == 20 && random.length == 10)
    // k=64 binomial std at J≈0.9 is ~0.04; 0.2 is a 5-sigma band —
    // a hashing/indexing bug lands far outside it
    assert(planted.forall { case (_, est, truth) => math.abs(est - truth) < 0.2 },
      s"estimator off by >0.2 on a planted pair: ${planted.filterNot {
        case (_, e, t) => math.abs(e - t) < 0.2 }.toSeq}")
    // the gate's purpose: the estimate must order high-J pairs above
    // unrelated ones with a clean margin
    val minPlanted = planted.map(_._2).min
    val maxRandom = random.map(_._2).max
    assert(minPlanted > maxRandom + 0.3,
      s"no separation: min planted est $minPlanted vs max random est $maxRandom")
  }

  test("dedup_scoped: cross-source mirrors drop globally but survive scoped dedup") {
    val rows = SparkEntry.queries("dedup_scoped")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3)))
    val mirrors = rows.filter(_._2 == "src_mirror")
    assert(mirrors.length == 40, s"expected 40 planted mirrors, got ${mirrors.length}")
    // every mirror: the original (smaller id, same text) wins globally,
    // but the mirror is alone in its scope
    assert(mirrors.forall(m => !m._3 && m._4),
      "a planted mirror was not (dropped globally, kept scoped)")
    // originals win both rules (fixture originals < 40 are unique
    // texts at sf0.001)
    val originals = rows.filter(r => r._1 < 40 && r._2 != "src_mirror")
    assert(originals.forall(o => o._3 && o._4),
      "an original lost its survivor status")
  }
  test("sim_topk_mrl: exact at the minimum shortlist (threshold pass closes the gap)") {
    import graft.core.Tables
    import graft.functions.Vectors
    import graft.operators.Similarity
    import org.apache.spark.sql.expressions.Window
    // ground truth: full-dimension brute force over the same query
    // set, the identical expression stack as sim_topk
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id").asc)
    val truth = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", round(Vectors.fdot(col("embedding"), col("qv")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 8)
      .select("query_id", "vec_id", "score", "rk")
      .orderBy("query_id", "rk")
      .collect().map(_.toString).toSeq
    // adversarial shortlist C = k: the phase-1 threshold is as loose
    // as the contract allows, so exactness rests entirely on the
    // ub >= t survivor pass
    for (c <- Seq(8, 12)) {
      val got = Similarity.mrlTopk(spark, sf001, c = c)
        .collect().map(_.toString).toSeq
      assert(got == truth, s"MRL top-k (C=$c) diverged from brute force")
    }
  }
  test("stream_dedup_near: planted + in-stream mutants reject, matches re-verify") {
    import graft.core.Tables
    import graft.functions.Text
    val rows = SparkEntry.queries("stream_dedup_near")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)))
    val byId = rows.map(r => r._1 -> r).toMap
    // the +2^40 planted corpus mutants must ALL be rejected — this is
    // also the row-local-vs-relational band-identity proof: the batch
    // side signs with array_min∘transform, the seeded index with
    // explode∘min, and a value mismatch would break every collision
    val planted = rows.filter(r => r._1 >= (1L << 40) && r._1 < (1L << 41))
    assert(planted.nonEmpty && planted.forall(!_._3),
      s"a planted corpus mutant was admitted: ${planted.filter(_._3).toSeq}")
    // in-stream mutants (+2^41): whenever the batch-0 source was
    // admitted, the mutant MUST be rejected — the index-append path
    val inStream = rows.filter(_._1 >= (1L << 41))
    assert(inStream.nonEmpty)
    var provedInStream = false
    for ((id, _, admitted, matchId, _) <- inStream) {
      val src = byId(id - (1L << 41))
      if (src._3) {
        assert(!admitted, s"in-stream mutant $id admitted though source ${src._1} was")
        if (matchId == src._1) provedInStream = true
      }
    }
    assert(provedInStream,
      "no in-stream mutant matched its own batch-0 source — the batch-1-reads-batch-0-index path went unexercised")
    // precision: every reported match re-verifies at jaccard >= 0.6
    // against the actual pair of texts
    val delta = rows.map(_._1).toSet
    def textOf(id: Long): String = {
      val d = Tables.documents(spark, sf001)
      val base =
        if (id >= (1L << 41)) d.filter(col("doc_id") === id - (1L << 41))
          .select(expr("substring(text, instr(text, ' ') + 1)").as("t"))
        else if (id >= (1L << 40)) d.filter(col("doc_id") === id - (1L << 40))
          .select(expr("substring(text, instr(text, ' ') + 1)").as("t"))
        else d.filter(col("doc_id") === id).select(col("text").as("t"))
      base.head().getString(0)
    }
    def jac(a: String, b: String): Double = {
      def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val (sa, sb) = (sh(a), sh(b))
      (sa & sb).size.toDouble / (sa | sb).size
    }
    for ((id, _, admitted, matchId, j) <- rows if !admitted) {
      val reco = jac(textOf(id), textOf(matchId))
      assert(math.abs(reco - j) < 1e-6 || reco >= 0.6,
        s"match ($id, $matchId) does not re-verify: reported $j, recomputed $reco")
    }
  }
  test("multimodal_dedup_phash equals brute-force Hamming<=6 and recovers every planted re-encode") {
    import graft.core.Tables
    import graft.multimodal.{MediaCodec, MediaRecord}
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def mutate(t: String): String = {
      val p = t.length / 2
      t.substring(0, p) + "Z" + t.substring(p + 1)
    }
    val allm = docs ++ docs.filter(_._1 < 20)
      .map { case (id, t) => (id + (1L << 40), mutate(t)) }
    val sig = allm.map { case (id, t) =>
      id -> MediaCodec.ahash64(MediaCodec.resize(
        MediaRecord(id, t.getBytes("UTF-8"), "xx"), 64)._2)
    }
    // brute-force two-tier verdicts: exact groups by signature, then
    // min colliding representative at Hamming <= 6
    val byPh = sig.groupBy(_._2)
    val repOf = sig.map { case (id, ph) => id -> byPh(ph).map(_._1).min }.toMap
    val reps = byPh.map { case (ph, g) => (g.map(_._1).min, ph) }.toVector
    val repPairs = for {
      (ia, ha) <- reps; (ib, hb) <- reps
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb))
    val nearBest = repPairs.groupBy(_._2).map { case (b, ps) =>
      val best = ps.minBy(_._1); b -> (best._1, best._3)
    }
    val expected = sig.map { case (id, _) =>
      val rep = repOf(id)
      if (id != rep) (id, false, Some(rep), Some(0))
      else nearBest.get(id) match {
        case Some((a, h)) => (id, false, Some(a), Some(h))
        case None => (id, true, None, None)
      }
    }.toSet
    val got = SparkEntry.queries("multimodal_dedup_phash")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)))).toSet
    assert(got == expected,
      s"missed: ${(expected -- got).take(5)}, spurious: ${(got -- expected).take(5)}")
    // every planted re-encode must be dropped (exact or near tier)
    val mutantVerdicts = got.filter(_._1 >= (1L << 40))
    assert(mutantVerdicts.size == 20 && mutantVerdicts.forall(!_._2),
      s"a planted re-encode survived: ${mutantVerdicts.filter(_._2)}")
  }

  test("sim_topk_graph: beam recall vs brute force, and >= the IVF probe at a smaller scored budget") {
    import graft.operators.Similarity
    import org.apache.spark.sql.expressions.Window
    // a corpus with MANIFOLD structure — loose clusters so neighbors
    // form a continuum (real embedding geometry), and BOUNDARY
    // queries interpolated between two cluster directions: the case
    // where a Voronoi cell boundary splits a query's true neighbor
    // set and cell-probing must open extra cells, while graph
    // navigation just walks the manifold (on uniform random vectors
    // NO sublinear index navigates — both arms degrade to
    // budget/corpus recall)
    val dim = 64
    val rnd = new scala.util.Random(23)
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val cdirs = Array.fill(16)(normalize(Array.fill(dim)(rnd.nextGaussian())))
    val vrows = (0 until 4000).map { i =>
      // noise is PER-DIM: s per dim ⇒ ‖noise‖ ≈ s·√64 = 8s, so 0.1
      // gives in-cluster cosine ≈ 0.6 — a continuum, not point masses
      val v =
        if (i < 5) // boundary query: between clusters i and i+1
          normalize(cdirs(i).zip(cdirs(i + 1)).map { case (a, b) =>
            0.5 * a + 0.5 * b + 0.05 * rnd.nextGaussian() })
        else
          normalize(cdirs(i % 16).map(_ + 0.1 * rnd.nextGaussian()))
      (i.toLong, v.map(_.toFloat).toSeq, (i >> 4) % 10)
    }
    val fixDir = graft.core.RunId.scratch("graphfix")
    spark.createDataFrame(vrows).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$fixDir/embeddings.parquet")
    val k = 8
    val (outDf, visitedDf) = Similarity.graphAnnSearch(spark, fixDir,
      k = k, beam = 2, rounds = 12)
    val got = outDf.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val graphBudget = visitedDf.groupBy("query_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force truth on the same 5 probes
    val emb = graft.core.Tables.embeddings(spark, fixDir)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id").asc)
    val truth = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(graft.functions.Vectors.fdot(col("embedding"), col("qvec")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (qq, a) => qq -> a.map(_._2).toSet }
    val hitsG = truth.keys.toSeq.map(qq =>
      (truth(qq) & got.getOrElse(qq, Set.empty)).size).sum
    val recallG = hitsG.toDouble / (truth.size * k)
    // the EQUAL-BUDGET IVF arm: nprobe = 1 — the query's own Voronoi
    // cell (~250 candidates) against the graph walk's ~150 scored —
    // the fair fight; boundary queries' neighbor sets straddle the
    // cell boundary, which is exactly what cell probing cannot see
    // without paying more cells
    val (centPath, assignPath) = Similarity.ivfIndexPaths(spark, fixDir)
    val assigned = spark.read.parquet(assignPath)
    val cents = spark.read.parquet(centPath)
    val qc = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .crossJoin(broadcast(cents))
      .withColumn("cent_sim",
        graft.functions.Vectors.fdot(col("qvec"), col("cent")))
      .withColumn("cell_rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cent_sim").desc, col("cent_cell").asc)))
      .filter(col("cell_rk") <= 1)
      .select(col("query_id"), col("qvec"), col("cent_cell").as("cell"))
    val ivf1 = assigned.join(broadcast(qc), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(graft.functions.Vectors.fdot(col("embedding"), col("qvec")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (qq, a) => qq -> a.map(_._2).toSet }
    val hitsI = truth.keys.toSeq.map(qq =>
      (truth(qq) & ivf1.getOrElse(qq, Set.empty)).size).sum
    val recallI = hitsI.toDouble / (truth.size * k)
    val cellSizes = assigned.groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // the IVF arm's scored budget = its cell's members + the 16
    // centroid similarities the probe itself computes per query
    val ivfBudget = qc.select("query_id", "cell").collect()
      .map(r => r.getLong(0) -> (cellSizes(r.getInt(1)) + 16)).toMap
    info(s"graph recall@$k = $recallG (budgets $graphBudget), " +
      s"ivf nprobe=1 recall@$k = $recallI (budgets $ivfBudget)")
    assert(recallG >= 0.8, s"graph recall $recallG below 0.8")
    assert(recallG > recallI,
      s"graph recall $recallG did not beat equal-budget IVF $recallI")
    // budget comparison over the query BATCH (per-query cell sizes
    // vary by Voronoi luck; the walk's spend is uniform)
    val gTotal = graphBudget.values.sum
    val iTotal = ivfBudget.values.sum
    assert(gTotal <= iTotal,
      s"graph scored $gTotal candidates vs IVF's $iTotal — budget larger")
  }

  test("scan_sai_ann_tombstone: no deleted id surfaces, and the mask actually engaged") {
    val masked = SparkEntry.queries("scan_sai_ann_tombstone")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(masked.nonEmpty)
    assert(masked.forall(_._2 % 7 != 2),
      s"tombstoned id in output: ${masked.filter(_._2 % 7 == 2).take(3)}")
    // the mask changed the answer (a tombstoned id sat in the unmasked
    // top-k, so exclusion is observable, not vacuous)
    val unmasked = SparkEntry.queries("scan_sai_ann")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unmasked.exists(_._2 % 7 == 2) && masked != unmasked,
      "fixture drift: no tombstoned id in the unmasked top-k — the mask pin is vacuous")
    // compaction is invisible to reads: the clean read over the
    // PURGED layout (rebuilt leaves, tightened bounds, no mask at
    // all) returns byte-identical rows to the masked read
    val purged = SparkEntry.queries("compact_ann_purge")(spark, sf001)
      .collect().map(_.toString).toSeq
    val maskedRows = SparkEntry.queries("scan_sai_ann_tombstone")(spark, sf001)
      .collect().map(_.toString).toSeq
    assert(purged == maskedRows,
      "purged-layout read diverges from the tombstone-masked read")
  }

  test("sim_graph_delta: every insert links its exact twin at rank 1 on a navigable corpus") {
    import graft.operators.Similarity
    // the same manifold fixture class as the sim_topk_graph spec —
    // on uniform random vectors no graph walk navigates, so the
    // twin-recovery pin holds where the index family is FOR
    val dim = 64
    val rnd = new scala.util.Random(41)
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val cdirs = Array.fill(16)(normalize(Array.fill(dim)(rnd.nextGaussian())))
    val vrows = (0 until 4000).map { i =>
      val v = normalize(cdirs(i % 16).map(_ + 0.1 * rnd.nextGaussian()))
      (i.toLong, v.map(_.toFloat).toSeq, (i >> 4) % 10)
    }
    val fixDir = graft.core.RunId.scratch("graphdelta")
    spark.createDataFrame(vrows).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$fixDir/embeddings.parquet")
    val out = SparkEntry.queries("sim_graph_delta")(spark, fixDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val deltaIds = (0 until 4000).map(_.toLong).filter(_ % 97 == 13)
      .map(_ + (1L << 40))
    val byNode = out.groupBy(_._1)
    assert(byNode.keySet == deltaIds.toSet,
      s"insert set mismatch: ${byNode.keySet.size} vs ${deltaIds.size}")
    for (d <- deltaIds) {
      val links = byNode(d).sortBy(_._4)
      assert(links.length == Similarity.GraphM,
        s"insert $d got ${links.length} links")
      val twin = d - (1L << 40)
      assert(links.head._2 == twin && links.head._3 == 1.0,
        s"insert $d rank-1 link ${links.head} is not its twin $twin@1.0")
    }
  }

  test("hybrid vector arm: index pool equals the brute-force pool it retired, every mode") {
    import graft.operators.Search
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("query_id", "vec_rank").collect().map(_.toString).toSeq
    // unrestricted — the search_hybrid_rrf mode
    val (post, postPlan) = Search.annVecPool(spark, sf001, None)
    assert(postPlan.mode == "post" && postPlan.totalLeaves > 0)
    assert(rows(post) == rows(Search.bruteVecPool(spark, sf001, None)),
      "unrestricted index pool diverges from brute force")
    // corpus-restricted through the PROBE (the pipeline_rag shape):
    // every third vector, too many to fetch by address
    val restr = graft.core.Tables.embeddings(spark, sf001)
      .filter(pmod(col("vec_id"), lit(3)) === 0)
      .select(col("vec_id").as("doc_id"))
    val (rPost, rPlan) = Search.annVecPool(spark, sf001, Some(restr),
      fetchThreshold = 8)
    assert(rPlan.mode == "post" && rPlan.nRestrict > 8)
    assert(rows(rPost) == rows(Search.bruteVecPool(spark, sf001, Some(restr))),
      "restricted probe pool diverges from brute force")
    // gated pre-fetch: a 5-id restriction collects, opens only its
    // candidate leaves, and is UNDER-FILLED (< RrfPoolK) — totality of
    // the fetch keeps it exact anyway
    val tinyIds = Seq(10L, 20L, 30L, 40L, 50L)
    val tiny = graft.core.Tables.embeddings(spark, sf001)
      .filter(col("vec_id").isin(tinyIds: _*))
      .select(col("vec_id").as("doc_id"))
    val (pre, prePlan) = Search.annVecPool(spark, sf001, Some(tiny))
    assert(prePlan.mode == "pre" && prePlan.nRestrict == 5 &&
      prePlan.opened.nonEmpty && prePlan.opened.size <= 5,
      s"pre branch mis-planned: $prePlan")
    assert(rows(pre) == rows(Search.bruteVecPool(spark, sf001, Some(tiny))),
      "pre-fetch pool diverges from brute force")
    // the SAME under-filled restriction forced through the probe: the
    // θ sentinel must open every leaf rather than silently truncate
    val (uf, ufPlan) = Search.annVecPool(spark, sf001, Some(tiny),
      fetchThreshold = 0)
    assert(ufPlan.mode == "post")
    assert(rows(uf) == rows(pre),
      "under-filled probe diverges from the exact pre-fetch answer")
  }

  test("multi-probe LSH dominates single-probe and never beats brute force") {
    def byQuery(name: String): Map[Long, Seq[(Long, Double)]] =
      SparkEntry.queries(name)(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(-_._3).toSeq.map(t => (t._2, t._3)))
        .toMap
    val brute = byQuery("sim_topk")
    val single = byQuery("sim_topk_lsh")
    val multi = byQuery("sim_topk_lsh_multiprobe")
    assert(multi.nonEmpty)
    // candidate-superset dominance: at every rank the multi-probe
    // score is >= the single-probe score for the same query
    single.foreach { case (q, sp) =>
      val mp = multi.getOrElse(q, Seq.empty)
      assert(mp.size >= sp.size, s"query $q lost candidates under multi-probe")
      sp.map(_._2).zip(mp.map(_._2)).zipWithIndex.foreach { case ((ss, ms), i) =>
        assert(ms >= ss, s"query $q rank ${i + 1}: multi $ms < single $ss")
      }
    }
    // recall@10 vs the exact answer can only improve with more probes
    def recall(got: Map[Long, Seq[(Long, Double)]]): Double = {
      val per = brute.toSeq.map { case (q, b) =>
        val g = got.getOrElse(q, Seq.empty).map(_._1).toSet
        b.map(_._1).count(g) .toDouble / b.size
      }
      per.sum / per.size
    }
    val (rs, rm) = (recall(single), recall(multi))
    assert(rm >= rs, s"multi-probe recall $rm below single-probe $rs")
    // weak absolute floor only — the 50-vector sf0.001 pool makes
    // recall@10 coarse; the ORDERING above is the real guarantee
    assert(rm >= 0.3, s"multi-probe recall $rm unexpectedly low")
  }

  test("search_maxsim_ivf: one-sided approximation of the exact MaxSim, with overlap") {
    val exact = SparkEntry.queries("search_maxsim")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty)
    val approx = SparkEntry.queries("search_maxsim_ivf")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(approx.nonEmpty, "IVF MaxSim returned nothing")
    // dominance on the pairs both faces ranked: candidate pools only
    // shrink per-token maxima and drop absent tokens
    approx.foreach { case (qd, d, sc) =>
      exact.get((qd, d)).foreach(ex =>
        assert(sc <= ex + 1e-9, s"approx $sc > exact $ex for ($qd,$d)"))
    }
    // overlap@8 floor — weak by design at the 50-vector fixture; the
    // dominance above is the provable guarantee
    val overlap = approx.map(t => (t._1, t._2)).toSet
      .intersect(exact.keySet).size.toDouble / exact.size
    assert(overlap >= 0.25, s"IVF MaxSim overlap@8 $overlap vs exact")
  }

  test("search_maxsim equals a from-scratch Scala MaxSim over the raw vectors") {
    // independent reimplementation: same float-multiply/double-accumulate
    // kernel, same 6-dp roundings, plain Scala collections throughout
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = graft.core.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val byDoc = vecs.groupBy(_._1 / 4).view.mapValues(_.values.toSeq).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      // float multiply, double accumulate — the fdot kernel verbatim
      while (i < a.length) { s += (a(i) * b(i)).toDouble; i += 1 }
      s
    }
    val expected = (for {
      qd <- Seq(0L, 1L); (d, toks) <- byDoc if d != qd
    } yield {
      val score = BigDecimal(byDoc(qd).map(qv =>
        BigDecimal(r6(toks.map(tv => r6(dot(tv, qv))).max))).sum.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (qd, d, score)
    }).groupBy(_._1).flatMap { case (qd, ss) =>
      ss.sortBy(t => (-t._3, t._2)).take(8).zipWithIndex
        .map { case ((_, d, sc), i) => (qd, d, sc, i + 1L) }
    }.toSet
    val got = SparkEntry.queries("search_maxsim")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3).toLong))
      .toSet
    assert(got == expected,
      s"maxsim diverges: extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
  }
}
