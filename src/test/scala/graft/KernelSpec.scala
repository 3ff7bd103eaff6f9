package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import graft.core.Lww
import graft.functions.{Text, Vectors}

/** Unit + property tests for the shared kernels (SURVEY.md §5.3). */
class KernelSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }

  private def strDf(rows: Seq[String]) = {
    val s = spark; import s.implicits._
    rows.toDF("text")
  }

  test("shingles: k-grams in order, empty when too short") {
    val got = strDf(Seq("a b c d", "a b"))
      .select(Text.shingles(Text.words(col("text")), 3).as("sh"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("a b c", "b c d"), Nil))
  }

  test("jaccard: identity 1.0, disjoint 0.0") {
    val s = spark; import s.implicits._
    val df = Seq(("a b c", "a b c"), ("a b", "c d")).toDF("x", "y")
      .select(Text.jaccard(
        array_distinct(Text.words(col("x"))), array_distinct(Text.words(col("y")))).as("j"))
    assert(df.collect().map(_.getDouble(0)).toList == List(1.0, 0.0))
  }

  test("codegen DotProductExpr is bit-identical to the HOF dot product") {
    val emb = graft.core.Tables.embeddings(spark, sf001)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va")).filter(col("ia") < 30)
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb")).filter(col("ib") < 30)
    val both = a.crossJoin(b)
      .select(
        Vectors.dot(col("va"), col("vb")).as("hof"),
        Vectors.fdot(col("va"), col("vb")).as("gen"))
      .collect()
    assert(both.nonEmpty)
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("fused SrpBucketsExpr is bit-identical to the composed lshBucket form") {
    // The fused expression replaces 8×nbits composed when(fdot…)
    // columns on the threshold-LSH path; identical buckets ⇒ identical
    // candidate sets ⇒ identical verified outputs. 16-bit bands at dim
    // 64 exercise the production width that pushed the composed form
    // out of the JIT.
    val bands = (0 until 8).map(b =>
      Vectors.hyperplanes(nbits = 16, dim = 64, seed = 101L + b))
    val emb = graft.core.Tables.embeddings(spark, sf001).limit(200)
    val both = emb.select(
        array(bands.map(p => Vectors.lshBucket(col("embedding"), p)): _*)
          .as("composed"),
        Vectors.srpBuckets(col("embedding"), bands).as("fused"))
      .collect()
    assert(both.nonEmpty)
    assert(both.forall(r => r.getSeq[Int](0) == r.getSeq[Int](1)))
  }

  test("dot_product is SQL-registerable via GraftExtensions") {
    graft.plans.GraftExtensions.register(spark)
    graft.core.Tables.embeddings(spark, sf001).limit(5).createOrReplaceTempView("emb_tmp")
    val sims = spark.sql(
      "SELECT dot_product(embedding, embedding) AS d FROM emb_tmp")
      .collect().map(_.getDouble(0))
    assert(sims.length == 5 && sims.forall(d => math.abs(d - 1.0) < 1e-4))
  }

  test("char_bigrams is SQL-registerable and first-occurrence distinct") {
    graft.plans.GraftExtensions.register(spark)
    val out = spark.sql("SELECT char_bigrams('banana') AS b")
      .collect()(0).getSeq[String](0)
    assert(out == Seq("ba", "an", "na"))
    assert(spark.sql("SELECT char_bigrams('x') AS b")
      .collect()(0).getSeq[String](0).isEmpty)
  }

  test("dot product: self-similarity of normalized embeddings ≈ 1") {
    val emb = graft.core.Tables.embeddings(spark, sf001).limit(20)
    val sims = emb.select(Vectors.dot(col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0))
    assert(sims.forall(d => math.abs(d - 1.0) < 1e-4), sims.mkString(","))
  }

  test("simhash signatures: identical docs collide, signature is stable") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely here now ok then"))
      .toDF("doc_id", "text")
      .withColumn("sh", Text.shingles(Text.words(col("text")), 3))
    val sig = Text.simhashSignature(docs, "doc_id", "sh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("minhash signature: identical shingle sets have identical signatures") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "x y z w v"), (2L, "x y z w v"), (3L, "p q r s t"))
      .toDF("doc_id", "text")
      .withColumn("sh", Text.shingles(Text.words(col("text")), 3))
    val sig = Text.minhashSignature(docs, "doc_id", "sh", 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toList).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("Num.dsum: decimal-exact, equal to rational arithmetic (property)") {
    val s = spark; import s.implicits._
    val cents = Gen.listOfN(40, Gen.choose(-1000000L, 1000000L))
    check(Prop.forAll(cents) { cs =>
      cs.nonEmpty ==> {
        val doubles = cs.map(_ / 100.0)
        val got = doubles.toDF("x").agg(graft.core.Num.dsum(col("x"))).first().getDouble(0)
        val expect = cs.sum / 100.0 // exact integer cents, one rounding
        got == expect
      }
    })
  }

  test("freq-items sketch is sound: non-empty, only real values") {
    val row = SparkEntry.queries("agg_freq_items")(spark, sf001).collect().head
    val flags = row.getString(0).split(",").toSet
    val statuses = row.getString(1).split(",").toSet
    // The sketch guarantees a SUPERSET of values above the support
    // threshold, but none of these columns' values individually
    // exceed 30% by a margin the Misra-Gries retention bound covers —
    // so assert soundness (only genuine column values, nothing
    // fabricated, non-empty), not a specific member set.
    assert(flags.nonEmpty && flags.subsetOf(Set("A", "N", "R")), flags.mkString(","))
    assert(statuses.nonEmpty && statuses.subsetOf(Set("F", "O")), statuses.mkString(","))
  }

  test("approx quantiles track the exact percentiles within tolerance") {
    val exact = SparkEntry.queries("agg_quantile")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = SparkEntry.queries("agg_quantile_approx")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (p50, p90)) <- approx) {
      // GK with accuracy 1000 → rank error <= n/1000; quantities are
      // small integers, so values must land within a few units
      assert(math.abs(p50 - exact(k)._1) <= 2.0, s"$k p50 $p50 vs ${exact(k)._1}")
      assert(math.abs(p90 - exact(k)._2) <= 2.0, s"$k p90 $p90 vs ${exact(k)._2}")
    }
  }

  test("WeightedAvg: exact for fractional weights, matches post-sum division") {
    import graft.functions.WeightedAvg
    // fractional weights — the round-2 integer-cents buffer rounded
    // these per row and silently diverged from any SQL mirror
    val rows = Seq((19.99, 0.5), (5.25, 1.5), (100.0, 0.25), (0.01, 2.75))
    val buf = rows.foldLeft(WeightedAvg.zero)(WeightedAvg.reduce)
    val expected = {
      val num = rows.map { case (v, w) =>
        BigDecimal.valueOf(v) * BigDecimal.valueOf(w) }.sum
      val den = rows.map { case (_, w) => BigDecimal.valueOf(w) }.sum
      num.toDouble / den.toDouble
    }
    assert(WeightedAvg.finish(buf) == expected)
    // merge is associative with reduce (partial-aggregation safety)
    val (l, r) = rows.splitAt(2)
    val merged = WeightedAvg.merge(
      l.foldLeft(WeightedAvg.zero)(WeightedAvg.reduce),
      r.foldLeft(WeightedAvg.zero)(WeightedAvg.reduce))
    assert(WeightedAvg.finish(merged) == expected)
    assert(WeightedAvg.finish(WeightedAvg.zero).isNaN)
  }

  test("MediaCodec.resize: empty payload -> -1 sentinels, singleton repeats") {
    import graft.multimodal.{MediaCodec, MediaRecord}
    // the oracle mirrors this with CASE WHEN length(text)=0 THEN -1 —
    // asserted here so the sentinel contract can't silently drift
    val empty = MediaCodec.resize(MediaRecord(1L, Array.emptyByteArray, "en"), 8)
    assert(empty._2 == Seq.fill(8)(-1))
    val one = MediaCodec.resize(MediaRecord(2L, "x".getBytes("UTF-8"), "en"), 8)
    assert(one._2 == Seq.fill(8)('x'.toInt))
  }

  test("Lww.latest does not clobber a caller column named _lww_rn0") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 10L, "keep-me"), (1L, 20L, "winner")).toDF("k", "wt", "_lww_rn0")
    val out = Lww.latest(df, Seq("k"), Seq(col("wt").desc)).collect()
    assert(out.length == 1 && out.head.getString(2) == "winner")
  }

  test("tombstones: delete hides older versions, re-insert resurrects (property)") {
    val s = spark; import s.implicits._
    // rows: (key, writetime=index, isDelete); newest row per key decides
    val histories = Gen.listOfN(10,
      Gen.zip(Gen.choose(1L, 3L), Gen.oneOf(false, false, true)))
      .map(_.zipWithIndex.map { case ((k, del), i) => (k, i.toLong, del) })
    check(Prop.forAll(histories) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("k", "wt", "del")
        val got = Lww.mergeTombstones(
            df, Seq("k"), Seq(col("wt").desc), isDelete = col("del"))
          .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toList
        // survivors = keys whose newest version is NOT a delete
        val expect = rows.groupBy(_._1).toList.sortBy(_._1).flatMap { case (k, vs) =>
          val newest = vs.maxBy(_._2)
          if (newest._3) None else Some((k, newest._2))
        }
        got == expect
      }
    })
  }

  test("LWW: max-writetime wins, insensitive to input order (property)") {
    val s = spark; import s.implicits._
    val versions = Gen.listOfN(8, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 100L)))
      .map(_.zipWithIndex.map { case ((k, wt), i) => (k, wt, i.toLong) })
    check(Prop.forAll(versions) { rows =>
      rows.nonEmpty ==> {
        val df1 = rows.toDF("k", "wt", "uid")
        val df2 = scala.util.Random.shuffle(rows).toDF("k", "wt", "uid")
        def res(df: org.apache.spark.sql.DataFrame) =
          Lww.latest(df, Seq("k"), Seq(col("wt").desc, col("uid").desc))
            .orderBy("k").collect().map(_.toString).toList
        val r1 = res(df1)
        // newest (wt, uid) per key, idempotent, order-insensitive
        val expect = rows.groupBy(_._1).map { case (k, vs) =>
          val (wt, uid) = vs.map(v => (v._2, v._3)).max
          s"[$k,$wt,$uid]"
        }.toList.sorted
        r1 == res(df2) && r1 == expect &&
          res(Lww.latest(df1, Seq("k"), Seq(col("wt").desc, col("uid").desc))) == r1
      }
    })
  }

  test("agg_sketch_merge estimates track exact weekly distincts within 5%") {
    val approx = SparkEntry.queries("agg_sketch_merge")(spark, sf001)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = graft.core.Tables.events(spark, sf001)
      .groupBy(weekofyear(to_date(col("ts"))).as("week"))
      .agg(countDistinct("user_id").as("uniques"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((w, ex) <- exact) {
      val ap = approx(w).toDouble
      assert(math.abs(ap - ex) / ex <= 0.05, s"week $w: approx $ap vs exact $ex")
    }
  }

  test("dedup_cluster labels are consistent: pairs share clusters, canonical is min") {
    val pairs = SparkEntry.queries("dedup_jaccard")(spark, sf001)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val cluster = SparkEntry.queries("dedup_cluster")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty && cluster.nonEmpty)
    // every paired doc is labeled, endpoints agree, label is a member
    // of the component and its minimum (transitive closure via fixpoint)
    for ((a, b) <- pairs) {
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
      assert(cluster(a) <= math.min(a, b))
    }
    val members = cluster.groupBy(_._2).view.mapValues(_.keySet)
    for ((label, docs) <- members) assert(docs.min == label,
      s"cluster $label: min member ${docs.min} is not the label")
  }

  test("dedup_cluster releases every RDD it persisted (VERDICT r5 #3)") {
    // The fixpoint caches edges + per-round label RDDs; all of them
    // must be gone once the result is materialized, or a long-lived
    // session strands MEMORY_ONLY blocks per invocation. Compare
    // against the pre-existing set: the suite session may legitimately
    // hold unrelated persisted data.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = SparkEntry.queries("dedup_cluster")(spark, sf001).collect()
    assert(out.nonEmpty)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"dedup_cluster left persisted RDDs: $leaked")
  }

  test("fn_vector: query vector has dot=cosine=1-ish self-sim and distance 0") {
    val row = SparkEntry.queries("fn_vector")(spark, sf001)
      .filter(col("vec_id") === 0).collect().head
    // embeddings are L2-normalized: self dot ≈ 1 (float rounding), and
    // the self distance is exactly 0
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-5)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-9)
    assert(row.getDouble(3) == 0.0)
  }

  test("IVF index rebuilds when the fixture is regenerated under the same path") {
    // VERDICT r4 #3: the index cache used to key on the dir string for
    // the JVM lifetime; a refreshed parquet under the same path would
    // silently rerank against stale cell assignments. The key now
    // fingerprints the input files, so this overwrite must rebuild.
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_regen").toString
    def corpus(n: Int): org.apache.spark.sql.DataFrame =
      (0 until n).map { i =>
        val raw = Array.tabulate(8)(j => math.sin(i * 8 + j + 1).toFloat)
        val nrm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
        (i.toLong, raw.map(_ / nrm).toSeq, s"l${i % 3}")
      }.toDF("vec_id", "embedding", "label")
    corpus(40).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val first = SparkEntry.queries("sim_topk_ivf")(spark, dir).collect()
    assert(first.nonEmpty && first.forall(_.getLong(1) < 40))
    corpus(120).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val second = SparkEntry.queries("sim_topk_ivf")(spark, dir).collect()
    // Only a rebuilt index can surface vectors the first corpus never
    // contained; a stale index would keep every neighbor below id 40.
    assert(second.exists(_.getLong(1) >= 40),
      "regenerated corpus did not reach the IVF index — stale cache")
  }

  test("read repair: merge direction per key, both-missed keys absent") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("read_repair").toString
    // user 1: newest event 983 is missed by replica A → B is ahead → heal_a
    // user 2: newest event 991 is missed by replica B → A is ahead → heal_b
    // user 3: both replicas hold the newest (3) → in_sync
    // user 4: only event 0, missed by BOTH replicas → no state to read
    Seq(
      (983L, "2024-01-02 00:00:00", 1L, "click", 1.0, "{}"),
      (1L,   "2024-01-01 00:00:00", 1L, "view",  2.0, "{}"),
      (991L, "2024-01-02 00:00:00", 2L, "click", 3.0, "{}"),
      (2L,   "2024-01-01 00:00:00", 2L, "view",  4.0, "{}"),
      (3L,   "2024-01-02 00:00:00", 3L, "click", 5.0, "{}"),
      (4L,   "2024-01-01 00:00:00", 3L, "view",  6.0, "{}"),
      (0L,   "2024-01-02 00:00:00", 4L, "click", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Repair.readRepair(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(4)))).toMap
    assert(got == Map(
      1L -> ((983L, "heal_a")),
      2L -> ((991L, "heal_b")),
      3L -> ((3L, "in_sync"))))
  }

  test("dedup_delta: corpus collisions rejected, admission is idempotent") {
    val s = spark; import s.implicits._
    import graft.operators.Dedup
    // Kernel: min-id survivor within the delta, corpus text rejected.
    val corpus = Seq("a", "b").toDF("text")
    val delta = Seq((1L, "a"), (2L, "c"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "text")
    val admitted = Dedup.admit(corpus, delta).collect()
      .map(r => r.getLong(0)).sorted.toSeq
    assert(admitted == Seq(2L, 4L))
    // Idempotence: once the admitted texts join the corpus, re-running
    // the same shard admits nothing — the incremental-dedup invariant.
    val corpus2 = corpus.unionByName(Seq("c", "d").toDF("text"))
    assert(Dedup.admit(corpus2, delta).count() == 0)
    // Fixture-level: no surviving sha may exist in the corpus side,
    // and a planted +2^40 copy never beats its in-delta original.
    val survivors = SparkEntry.queries("dedup_delta")(spark, sf001)
    val corpusSha = graft.core.Tables.documents(spark, sf001)
      .filter(pmod(col("doc_id"), lit(10)) < 8)
      .select(sha2(col("text"), 256).as("text_sha")).distinct()
    assert(survivors.join(corpusSha, "text_sha").count() == 0)
    val deltaOrigSha = graft.core.Tables.documents(spark, sf001)
      .filter(pmod(col("doc_id"), lit(10)) >= 8)
      .select(sha2(col("text"), 256).as("text_sha")).distinct()
    assert(survivors.filter(col("doc_id") >= (1L << 40))
      .join(deltaOrigSha, "text_sha").count() == 0,
      "a planted copy survived over its in-delta original")
  }

  test("hint replay: flapped acks not duplicated, unhinted outage writes lost") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hint_replay").toString
    // Outage [01-10, 01-15), hint window [01-10, 01-12), flap = id % 3 == 0.
    Seq(
      (1L, "2024-01-05 00:00:00", 1L, "view", 1.0, "{}"), // pre-outage → direct
      (2L, "2024-01-10 12:00:00", 1L, "view", 2.0, "{}"), // hinted only → replayed
      (3L, "2024-01-11 00:00:00", 1L, "view", 3.0, "{}"), // flap: applied AND hinted → direct, exactly once
      (5L, "2024-01-13 00:00:00", 1L, "view", 4.0, "{}"), // past hint window, no flap → LOST
      (7L, "2024-01-20 00:00:00", 1L, "view", 5.0, "{}")) // post-outage → direct
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.operators.Repair.hintReplay(spark, dir).collect()
    val got = rows.map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(
      1L -> "direct", 2L -> "replayed", 3L -> "direct", 7L -> "direct"))
    assert(rows.length == got.size, "a flapped hint was replayed twice")
  }

  test("ring rebalance: plan matches brute-force ownership, rows conserved") {
    import graft.operators.Ring
    import graft.functions.CassandraMurmur3
    val before = Ring.vnodeTokens(0 until Ring.joiningNode)
    val after = Ring.vnodeTokens(0 to Ring.joiningNode)
    val moves = Ring.movedRanges
    assert(moves.forall(_._4 == Ring.joiningNode))
    val sorted = moves.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 <= b._1, s"overlapping ranges: $a $b")
      case _ =>
    }
    // Independent check per real key: ownership changes exactly on the
    // moved slices, old owner = from_node, and nowhere else.
    val toks = graft.core.Tables.events(spark, sf001)
      .select("event_id").collect()
      .map(r => CassandraMurmur3.tokenOfLong(r.getLong(0)))
    def inMove(t: Long) = moves.find(m => t > m._1 && t <= m._2)
    toks.foreach { t =>
      val bo = Ring.ownerOf(before, t)
      val ao = Ring.ownerOf(after, t)
      inMove(t) match {
        case Some((_, _, from, to)) =>
          assert(ao == to && bo == from,
            s"token $t: plan says $from→$to but ring says $bo→$ao")
        case None =>
          assert(ao == bo, s"token $t changed owner $bo→$ao outside the plan")
      }
    }
    // The operator's per-range accounting equals brute force.
    val got = graft.operators.Ring.ringRebalance(spark, sf001).collect()
    got.foreach { r =>
      val c = toks.count(t => t > r.getLong(0) && t <= r.getLong(1))
      assert(c == r.getLong(4), s"range ${r.getLong(0)}..${r.getLong(1)}")
    }
    assert(got.map(_.getLong(4)).sum == toks.count(t => inMove(t).isDefined))
  }

  test("ring decommission: leaver's data all moves, nothing else does") {
    import graft.operators.Ring
    import graft.functions.CassandraMurmur3
    val all = Ring.vnodeTokens(0 until Ring.joiningNode)
    val after = all.filterNot(_._2 == Ring.leavingNode)
    val moves = Ring.decommissionRanges
    assert(moves.forall(_._3 == Ring.leavingNode))
    assert(moves.forall(_._4 != Ring.leavingNode))
    val toks = graft.core.Tables.events(spark, sf001)
      .select("event_id").collect()
      .map(r => CassandraMurmur3.tokenOfLong(r.getLong(0)))
    def inMove(t: Long) = moves.find(m => t > m._1 && t <= m._2)
    toks.foreach { t =>
      val bo = Ring.ownerOf(all, t)
      val ao = Ring.ownerOf(after, t)
      inMove(t) match {
        case Some((_, _, _, to)) =>
          assert(bo == Ring.leavingNode && ao == to,
            s"token $t: plan says ${Ring.leavingNode}→$to but ring says $bo→$ao")
        case None =>
          assert(bo != Ring.leavingNode, s"token $t owned by leaver but unmoved")
          assert(ao == bo, s"token $t changed owner $bo→$ao outside the plan")
      }
    }
    val got = graft.operators.Ring.ringDecommission(spark, sf001).collect()
    got.foreach { r =>
      val c = toks.count(t => t > r.getLong(0) && t <= r.getLong(1))
      assert(c == r.getLong(4), s"range ${r.getLong(0)}..${r.getLong(1)}")
    }
    assert(got.map(_.getLong(4)).sum ==
      toks.count(t => Ring.ownerOf(all, t) == Ring.leavingNode))
  }

  test("ring multidc: rf=3 per DC, both racks covered, first replica = DC successor, rows conserved") {
    import graft.operators.Ring
    import graft.functions.CassandraMurmur3
    val ring = Ring.vnodeTokens(Ring.multidcNodes)
    val placement = Ring.multidcPlacement
    assert(placement.size == ring.size)
    placement.foreach { case (_, end, d1, d2) =>
      for ((dc, reps) <- Seq("dc1" -> d1, "dc2" -> d2)) {
        assert(reps.size == 3 && reps.distinct.size == 3, s"$dc at $end: $reps")
        assert(reps.forall(n => Ring.dcOf(n) == dc), s"$dc at $end: $reps")
        assert(reps.map(Ring.rackOf).toSet == Set(0, 1),
          s"$dc at $end misses a rack: $reps")
      }
      // NTS invariant: the first replica in each DC is the first node
      // of that DC reached walking clockwise from the range's end.
      val idx = ring.indexWhere(_._1 == end)
      def firstOf(dc: String): Int =
        ring.indices.map(i => ring((idx + i) % ring.size)._2)
          .find(n => Ring.dcOf(n) == dc).get
      assert(d1.head == firstOf("dc1") && d2.head == firstOf("dc2"))
    }
    // Ranges tile the ring: every real key falls in exactly one range,
    // and the operator's accounting sums to the full table.
    val got = Ring.ringMultidc(spark, sf001).collect()
    val toks = graft.core.Tables.events(spark, sf001)
      .select("event_id").collect()
      .map(r => CassandraMurmur3.tokenOfLong(r.getLong(0)))
    toks.foreach { t =>
      val n = got.count(r => t > r.getLong(0) && t <= r.getLong(1))
      assert(n == 1, s"token $t covered by $n ranges")
    }
    assert(got.map(_.getLong(8)).sum == toks.length)
  }

  test("NTS walk invariants hold on random vnode rings (property)") {
    import graft.operators.Ring
    val gen = for {
      counts <- Gen.listOfN(8, Gen.choose(0, 4)).suchThat(_.sum >= 1)
      seed <- Gen.choose(0L, Long.MaxValue)
      start <- Gen.choose(0, 200)
      rf <- Gen.choose(1, 3)
    } yield (counts, seed, start, rf)
    check(Prop.forAll(gen) { case (counts, seed, start, rf) =>
      val nodes = counts.zipWithIndex.flatMap { case (c, n) => Seq.fill(c)(n) }
      val ring = new scala.util.Random(seed).shuffle(nodes).zipWithIndex
        .map { case (n, i) => (i.toLong, n) }
      val reps = Ring.ntsReplicas(ring, start % ring.size, rf)
      Seq("dc1", "dc2").forall { dc =>
        val dcNodes = nodes.filter(n => Ring.dcOf(n) == dc).distinct
        val racksAvail = dcNodes.map(Ring.rackOf).distinct.size
        val r = reps(dc)
        // rf satisfied up to the DC's node supply, no duplicates,
        // DC-pure, rack coverage maximal for the replica count, and
        // the first replica is the first DC node reached on the walk.
        r.size == math.min(rf, dcNodes.size) &&
          r.distinct.size == r.size &&
          r.forall(n => Ring.dcOf(n) == dc) &&
          r.map(Ring.rackOf).distinct.size == math.min(racksAvail, r.size) &&
          (r.isEmpty || r.head == ring.indices
            .map(i => ring((start % ring.size + i) % ring.size)._2)
            .find(n => Ring.dcOf(n) == dc).get)
      }
    })
  }

  test("repair digests: identical replicas agree on every bucket, divergence localizes") {
    import graft.operators.Repair
    val a = Repair.replicaA(spark, sf001)
    // Identical replicas → identical digest per bucket (the synced
    // fast path: zero dirty buckets, the drill-down never runs).
    val clean = Repair.digests(a, "da")
      .join(Repair.digests(Repair.replicaA(spark, sf001), "db"), Seq("bucket"), "full_outer")
      .filter(!(col("da") <=> col("db")))
    assert(clean.count() == 0, "identical replicas produced dirty buckets")
    // Planted divergence → dirty buckets are a strict subset (the
    // prune is real: some ranges verify clean even with divergence).
    val dirty = Repair.digests(a, "da")
      .join(Repair.digests(Repair.replicaB(spark, sf001), "db"), Seq("bucket"), "full_outer")
      .filter(!(col("da") <=> col("db")))
      .count()
    val total = Repair.digests(a, "da").count()
    assert(dirty > 0 && dirty < total,
      s"divergence did not localize: $dirty dirty of $total buckets")
  }

  test("write_quorum: per-day ack/hint/loss ledger on a known-answer outage calendar") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wquorum").toString
    // One write per interesting calendar point; A down [01-05,01-08)
    // hinted through 01-07, B down [01-10,01-15) hinted through 01-12,
    // C drops id%17==0 (always hinted).
    Seq(
      (1L,  "2024-01-02 12:00:00", 1L), // all up            → all
      (17L, "2024-01-02 13:00:00", 1L), // C drop, hinted    → quorum
      (2L,  "2024-01-05 12:00:00", 1L), // A down, hinted    → quorum
      (3L,  "2024-01-07 12:00:00", 1L), // A down, PAST hint → quorum + lost
      (34L, "2024-01-05 13:00:00", 1L), // A down + C drop   → one, A hint + C hint
      (4L,  "2024-01-11 12:00:00", 1L), // B down, hinted    → quorum
      (5L,  "2024-01-13 12:00:00", 1L)) // B down, past hint → quorum + lost
      .toDF("event_id", "ts", "user_id")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Repair.writeQuorum(spark, dir).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got == Map(
      //            writes all quorum one hints lost
      "2024-01-02" -> ((2L, 1L, 1L, 0L, 1L, 0L)),
      "2024-01-05" -> ((2L, 0L, 1L, 1L, 3L, 0L)),
      "2024-01-07" -> ((1L, 0L, 1L, 0L, 0L, 1L)),
      "2024-01-11" -> ((1L, 0L, 1L, 0L, 1L, 0L)),
      "2024-01-13" -> ((1L, 0L, 1L, 0L, 0L, 1L))), got.toString)
  }

  test("consistency_quorum: LWW winner, reply count and stale accounting per key") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("quorum").toString
    // Replica misses: A drops id%7==0, B id%11==0, C id%13==0.
    // user 1: newest 7 missed by A only → winner 7, 1 stale, CL all
    // user 2: newest 77 missed by A AND B (both fall back to 2) →
    //         winner 77 via LWW even though the STALE state has the
    //         majority — the Cassandra reconcile is timestamp, not vote
    // user 3: only event 77 → A and B have no row → replies 1, CL one
    // user 4: only event 1001 (7·11·13) → no replica replies → absent
    // user 5: events 3, 4 → everyone agrees on 4 → 0 stale
    // user 6: only event 7 → A empty → replies 2, CL quorum
    Seq(
      (7L,    "2024-01-02 00:00:00", 1L, "click", 1.0, "{}"),
      (1L,    "2024-01-01 00:00:00", 1L, "view",  2.0, "{}"),
      (77L,   "2024-01-02 00:00:00", 2L, "click", 3.0, "{}"),
      (2L,    "2024-01-01 00:00:00", 2L, "view",  4.0, "{}"),
      (77L,   "2024-01-02 00:00:00", 3L, "click", 5.0, "{}"),
      (1001L, "2024-01-02 00:00:00", 4L, "click", 6.0, "{}"),
      (3L,    "2024-01-01 00:00:00", 5L, "view",  7.0, "{}"),
      (4L,    "2024-01-02 00:00:00", 5L, "click", 8.0, "{}"),
      (7L,    "2024-01-02 00:00:00", 6L, "click", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Repair.consistencyQuorum(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(4), r.getLong(5), r.getString(6)))).toMap
    assert(got == Map(
      1L -> ((7L, 3L, 1L, "all")),
      2L -> ((77L, 3L, 2L, "all")),
      3L -> ((77L, 1L, 2L, "one")),
      5L -> ((4L, 3L, 0L, "all")),
      6L -> ((7L, 2L, 1L, "quorum"))), got.toString)
  }

  test("shuffle_deterministic: bucketed two-phase rank equals the global rank") {
    val rows = graft.operators.TextOps.shuffleDeterministic(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // positions are exactly the permutation 1..n
    assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    // and agree with a driver-side global sort by (skey, doc_id)
    val expected = rows.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
    rows.foreach { case (id, _, pos) =>
      assert(pos == expected(id), s"doc $id: $pos vs ${expected(id)}") }
  }

  test("chunk_documents: window/stride placement, tail clamp, overlap carry") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("chunks").toString
    val toks = (0 until 100).map(i => s"t$i")
    Seq((1L, toks.mkString(" "), "en", "web", 1L),
        (2L, (0 until 10).map(i => s"u$i").mkString(" "), "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val got = graft.operators.TextOps.chunkDocuments(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc 1: 100 tokens → starts 0/48/96, lens 64/52/4; chunk 1 overlaps
    // chunk 0 by 16 tokens (the context carry); the tail clamps to 4.
    assert(got == Map(
      (1L, 0L) -> ((0L, 64L, md5hex(toks.slice(0, 64).mkString(" ")))),
      (1L, 1L) -> ((48L, 52L, md5hex(toks.slice(48, 100).mkString(" ")))),
      (1L, 2L) -> ((96L, 4L, md5hex(toks.slice(96, 100).mkString(" ")))),
      (2L, 0L) -> ((0L, 10L,
        md5hex((0 until 10).map(i => s"u$i").mkString(" "))))), got.toString)
  }

  test("chunkCorpusStats: doc-level arithmetic == explode-computed chunk stats on edge shapes") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // adversarial shapes: null text, empty text (split -> [""], n=1),
    // double spaces (empty tokens count), exact stride multiple (49
    // tokens -> starts 0/48, tail len 1), single window, long doc
    val docs = Seq(
      (1L, (0 until 100).map(i => s"t$i").mkString(" ")),
      (2L, ""),
      (3L, null.asInstanceOf[String]),
      (4L, "a  b   c"),
      (5L, (0 until 49).map(i => s"u$i").mkString(" ")),
      (6L, (0 until 200).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
    // reference = the materialized chunk corpus re-split, the exact
    // pass bm25RankedOf used to run over the chunk faces
    val ref = graft.operators.TextOps.chunkCorpus(docs)
      .select(size(split(col("chunk_text"), " ")).cast("long").as("dl"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("dl").cast("long").as("sum_dl"))
      .collect()(0)
    val got = graft.operators.TextOps.chunkCorpusStats(docs).collect()(0)
    assert(got == ref, s"arith $got vs explode $ref")
  }

  test("hilbertCol matches the driver xy2d reference: 64x64 bijection + unit-step adjacency") {
    val s = spark; import s.implicits._
    val order = 6
    // independent driver-side reimplementation of the iterative xy2d
    def xy2d(x0: Long, y0: Long): Long = {
      var x = x0; var y = y0; var d = 0L
      var sBit = (1L << order) / 2
      while (sBit > 0) {
        val rx = if ((x & sBit) > 0) 1L else 0L
        val ry = if ((y & sBit) > 0) 1L else 0L
        d += sBit * sBit * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = sBit - 1 - x; y = sBit - 1 - y }
          val t = x; x = y; y = t
        }
        sBit /= 2
      }
      d
    }
    val n = 1L << order
    val grid = (for { x <- 0L until n; y <- 0L until n } yield (x, y)).toDF("x", "y")
    val got = grid
      .withColumn("d", graft.operators.Scans.hilbertCol(col("x"), col("y"), order))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (((x, y), d) <- got) assert(d == xy2d(x, y), s"($x,$y): $d vs ${xy2d(x, y)}")
    val byD = got.toSeq.sortBy(_._2)
    assert(byD.map(_._2) == (0L until n * n), "not a bijection onto 0..n^2-1")
    byD.sliding(2).foreach { case Seq(((x1, y1), _), ((x2, y2), _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("search_bm25: independent BM25 reimplementation on a known corpus") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    val texts = Map(
      1L -> "spark stream join spark", // all three q1 terms, spark twice
      2L -> "spark table",             // one q1 term, short doc
      3L -> "join join join stream",   // high tf join, no spark
      4L -> "vector")                  // q2 term only
    texts.toSeq.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // The formula recomputed in plain Scala doubles, same association
    // order as the shared SQL string (left-assoc products).
    val n = 4.0
    val sumdl = texts.values.map(_.split(" ").length).sum.toDouble
    def dfOf(t: String) = texts.values.count(_.split(" ").contains(t)).toDouble
    // normalized by n (corpus size) exactly as the shared SQL string:
    // ((A)/(B)) / n_docs, same association order
    def tscore(tf: Double, df: Double, dl: Double) =
      ((44.0 * tf * (2.0 * n - 2.0 * df + 1.0) * sumdl) /
        ((2.0 * df + 1.0) * (20.0 * tf * sumdl + 6.0 * sumdl + 18.0 * dl * n))) / n
    def score(docId: Long, terms: Seq[String]): Double = {
      val w = texts(docId).split(" ")
      val sq = terms.flatMap { t =>
        val tf = w.count(_ == t)
        if (tf == 0) None
        else Some(math.floor(tscore(tf, dfOf(t), w.length) * 1e12).toLong)
      }.sum
      sq.toDouble / 1e12
    }
    val q1 = Seq("spark", "stream", "join")
    val got = graft.operators.Search.searchBm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4))))
    val forQ1 = got.collect { case ((1L, rank), v) => rank -> v }.toMap
    // doc 1 matches all three terms, doc 3 two, doc 2 one; exact scores
    // from the independent reimplementation, bit-for-bit.
    assert(forQ1 == Map(
      1L -> ((1L, score(1L, q1), 3L)),
      2L -> ((3L, score(3L, q1), 2L)),
      3L -> ((2L, score(2L, q1), 1L))), forQ1.toString)
    assert(score(1L, q1) > score(3L, q1) && score(3L, q1) > score(2L, q1))
    // q2 = (vector, hash): doc 4 matches vector only; q3 matches nothing
    val q2q3 = got.collect { case ((q, _), v) if q != 1L => q -> v._1 }.toSet
    assert(q2q3 == Set(2L -> 4L), q2q3.toString)
    // boolean AND: only doc 1 has every q1 term; no doc satisfies q2/q3
    val andGot = graft.operators.Search.searchMatchAll(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(andGot == Set((1L, 1L, 4L)), andGot.toString)
  }

  test("search_hybrid_rrf: fusion is exactly the RRF recurrence over the two pools") {
    val rows = SparkEntry.queries("search_hybrid_rrf")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    for ((_, _, _, rrf, kw, vec) <- rows) {
      // 0 marks "not in that pool" — that arm contributes 0
      val expected = (if (kw > 0) 1.0 / (60.0 + kw) else 0.0) +
        (if (vec > 0) 1.0 / (60.0 + vec) else 0.0)
      assert(rrf == expected, s"rrf $rrf != $expected for ranks ($kw, $vec)")
      assert(kw >= 0 && kw <= 20 && vec >= 0 && vec <= 20)
      assert(kw > 0 || vec > 0, "fused a doc retrieved by neither arm")
    }
    // per query: ranks are 1..n contiguous and rrf is the sort key
    for ((_, qRows) <- rows.groupBy(_._1)) {
      val ordered = qRows.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1L to ordered.length).toSeq)
      ordered.sliding(2).foreach {
        case Array((_, _, d1, s1, _, _), (_, _, d2, s2, _, _)) =>
          assert(s1 > s2 || (s1 == s2 && d1 < d2),
            s"fused order violated: ($s1, $d1) before ($s2, $d2)")
        case _ =>
      }
    }
    // both arms actually contribute somewhere (the fixture has docs
    // ranked by keywords only, vectors only, and both)
    assert(rows.exists(r => r._5 > 0 && r._6 > 0), "no doc fused from both pools")
    assert(rows.exists(r => r._5 == 0 || r._6 == 0), "every doc in both pools — pools degenerate")
  }

  test("sample_token_budget: clean prefix in shuffle order, boundary doc excluded") {
    val rows = graft.operators.Mixture.sampleTokenBudget(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // every kept doc's cumulative end fits the budget
    assert(rows.forall(_._4 <= 10000L))
    // the kept set is EXACTLY the budget-fitting prefix of the global
    // (skey, doc_id) order: recompute driver-side and compare ids
    val all = graft.core.Tables.documents(spark, sf001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.md5(org.apache.spark.sql.functions
          .concat_ws(":", org.apache.spark.sql.functions.lit("42"),
            org.apache.spark.sql.functions.col("doc_id").cast("string"))).as("skey"),
        org.apache.spark.sql.functions.size(
          Text.words(org.apache.spark.sql.functions.col("text")))
          .cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._2, t._1))
    val expected = all.scanLeft((0L, 0L, "", 0L)) { case ((_, cum, _, _), (id, k, n)) =>
      (id, cum + n, k, n) }.tail.takeWhile(_._2 <= 10000L)
      .map(t => (t._1, t._3, t._4, t._2))
    assert(rows.sortBy(t => (t._2, t._1)).toSeq == expected.toSeq)
    // and the cut is real: the full corpus exceeds the budget
    assert(all.map(_._3).sum > 10000L)
  }

  test("mix_sources: per-source ranks are dense permutations, vtime = r/w exact") {
    val rows = graft.operators.Mixture.mixSources(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val bySrc = rows.groupBy(_._2)
    for ((src, rs) <- bySrc) {
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq,
        s"$src ranks not a dense permutation")
      val w = src match { case "src0" => 4.0; case "src1" => 2.0; case _ => 1.0 }
      assert(rs.forall(t => t._4 == t._3 / w), s"$src vtime mismatch")
    }
    // weighted round-robin property: in vtime order, src0 appears ~4x
    // as often as an unweighted source within the first positions
    val firstN = rows.sortBy(t => (t._4, t._2)).take(100)
    val c0 = firstN.count(_._2 == "src0")
    val cOther = bySrc.keys.filter(s => s != "src0" && s != "src1")
      .map(s => firstN.count(_._2 == s)).maxOption.getOrElse(0)
    assert(c0 > 2 * cOther, s"src0 $c0 vs other $cOther in first 100")
  }

  test("chunk_cdc: boundaries re-synchronize after an insertion (fixed stride does not)") {
    val s = spark; import s.implicits._
    // a long pseudo-random word stream, and a copy with 3 words
    // inserted near the front — the edit CDC must localize
    val words = (0 until 2000).map(i => s"w${(i * 2654435761L) % 997}")
    val edited = words.take(10) ++ Seq("x1", "x2", "x3") ++ words.drop(10)
    val chunks = graft.operators.TextOps.cdcChunks(
      Seq((0L, words.mkString(" ")), (1L, edited.mkString(" ")))
        .toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(4)))
    val orig = chunks.filter(_._1 == 0L).map(_._2)
    val edit = chunks.filter(_._1 == 1L).map(_._2)
    val shared = orig.toSet.intersect(edit.toSet).size
    // all but the chunk(s) containing the edit must match by digest
    assert(shared >= orig.toSet.size - 2,
      s"CDC failed to re-sync: $shared of ${orig.toSet.size} chunks shared")
    // and the fixed-stride chunker shares almost nothing after the
    // same edit (every window shifts by 3) — the property CDC buys
    val fixedShared = {
      def fixed(ws: Seq[String]) =
        ws.sliding(64, 48).map(_.mkString(" ")).toSet
      fixed(words).intersect(fixed(edited)).size
    }
    assert(fixedShared <= 1, s"fixed stride unexpectedly re-synced: $fixedShared")
  }

  test("agg_sketch_intersect: inclusion-exclusion estimate tracks the exact overlap") {
    val sp = spark; import sp.implicits._
    val est = SparkEntry.queries("agg_sketch_intersect")(spark, sf001)
      .select("week", "est_overlap").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exact overlap per week over ALL weeks with any click/purchase
    // activity — a week holding only one arm must appear with overlap
    // 0 (the operator coalesces its missing-arm estimate to 0), not
    // vanish from the comparison
    val exact = graft.core.Tables.events(spark, sf001)
      .filter(col("event_type").isin("click", "purchase"))
      .select(weekofyear(col("ts")).as("week"), col("user_id"), col("event_type"))
      .distinct()
      .groupBy("week", "user_id").count()
      .groupBy("week")
      .agg(sum(when(col("count") === 2, 1L).otherwise(0L)).as("overlap"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet, s"weeks differ: ${est.keySet} vs ${exact.keySet}")
    for ((w, ex) <- exact) {
      val e = est(w)
      // inclusion-exclusion carries both arms' HLL error; at this
      // cardinality (~15 users) the sketches are in sparse mode and
      // near-exact — a loose band still catches any set-logic bug
      assert(math.abs(e - ex) <= math.max(2L, ex / 5),
        s"week $w: estimate $e vs exact $ex")
    }
  }

  test("pack_greedy: fold matches the sequential NFD walk; bins respect the budget") {
    val rows = SparkEntry.queries("pack_greedy")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    // every fixture doc packed exactly once
    val total = graft.core.Tables.documents(spark, sf001).count()
    assert(rows.length.toLong == total && rows.map(_._1).distinct.length == rows.length)
    // bin_tokens is consistent and ≤ budget unless the bin is a single
    // oversized doc (none exist in this fixture, so strictly ≤ 512)
    for (((_, bin), members) <- rows.groupBy(r => (r._2, r._3))) {
      val sumTok = members.map(_._4.toLong).sum
      assert(members.forall(_._5 == sumTok), s"bin_tokens mismatch in bin $bin")
      assert(sumTok <= 512 || members.length == 1, s"bin over budget: $sumTok")
    }
    // the distributed fold ≡ an independent sequential reimplementation
    // of next-fit-decreasing over the same (tokens desc, doc_id) order
    for ((_, members) <- rows.groupBy(_._2)) {
      val walk = members.sortBy(r => (-r._4, r._1))
      var bin = 0; var used = 0
      val expect = walk.map { r =>
        if (used + r._4 > 512 && used > 0) { bin += 1; used = r._4 }
        else used += r._4
        (r._1, bin)
      }.toMap
      assert(walk.forall(r => expect(r._1) == r._3), "fold diverged from NFD walk")
    }
    // no bin closes early: whenever bin b+1 exists, its first doc (the
    // largest remaining) genuinely did not fit into bin b — the
    // next-fit invariant that makes the packing tight
    for ((_, members) <- rows.groupBy(_._2)) {
      val byBin = members.groupBy(_._3)
      for (b <- byBin.keys if byBin.contains(b + 1)) {
        val fill = byBin(b).map(_._4.toLong).sum
        val next = byBin(b + 1).sortBy(r => (-r._4, r._1)).head._4
        assert(fill + next > 512, s"bin $b closed early: $fill + $next <= 512")
      }
    }
  }

  test("commitlog_replay: recovery is idempotent and flush-point-invariant") {
    import org.apache.spark.sql.functions.col
    val once = SparkEntry.queries("commitlog_replay")(spark, sf001)
      .collect().map(_.toString).sorted.toSeq
    val log = graft.core.Tables.events(spark, sf001)
      .select("user_id", "event_id", "event_type", "value", "ts")
    val flushCut = lit("2024-01-14 00:00:00").cast("timestamp_ntz")
    val ord = Seq(col("ts").desc, col("event_id").desc)
    def out(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        (col("ts") >= flushCut).as("recovered_from_log"))
        .collect().map(_.toString).sorted.toSeq
    // independent twin: full-history LWW (no crash happened)
    assert(once == out(Lww.latest(log, Seq("user_id"), ord)),
      "recovered state differs from full-history LWW")
    // a second crash mid-replay re-applies the tail segments AGAIN;
    // LWW reconciliation must make the double replay a no-op
    val flushed = Lww.latest(
      log.filter(col("ts") < flushCut), Seq("user_id"), ord)
    val tail = log.filter(
      col("ts") >= lit("2024-01-13 00:00:00").cast("timestamp_ntz"))
    val twice = Lww.latest(
      flushed.unionByName(tail).unionByName(tail), Seq("user_id"), ord)
    assert(once == out(twice), "double replay changed the recovered state")
    // and recovery must not depend on WHERE the flush stopped: an
    // earlier flush point with a correspondingly longer replay tail
    // yields the identical state
    val earlier = lit("2024-01-08 00:00:00").cast("timestamp_ntz")
    val alt = Lww.latest(
      Lww.latest(log.filter(col("ts") < earlier), Seq("user_id"), ord)
        .unionByName(log.filter(col("ts") >= earlier)),
      Seq("user_id"), ord)
    assert(once == out(alt), "recovered state depends on the flush point")
  }
  test("pack_attention_spans tiles every sequence and conserves doc tokens") {
    val spans = SparkEntry.queries("pack_attention_spans")(spark, sf001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val placed = SparkEntry.queries("pack_sequences")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap // doc -> n_tokens
    // per doc: spans sum to the doc's token count (no token lost at a tear)
    val perDoc = spans.groupBy(_._4).view.mapValues(_.map(s => s._6 - s._5).sum)
    for ((doc, n) <- placed) assert(perDoc.getOrElse(doc, 0L) == n,
      s"doc $doc: spans cover ${perDoc.getOrElse(doc, 0L)} of $n tokens")
    // per sequence: slots abut from offset 0 with no gap or overlap,
    // and n_docs matches the slot count
    for (((shard, seq), rows) <- spans.groupBy(s => (s._1, s._2))) {
      val ordered = rows.sortBy(_._3)
      assert(ordered.head._3 == 1 && ordered.last._3 == rows.length)
      assert(rows.forall(_._7 == rows.length), s"n_docs wrong in ($shard, $seq)")
      ordered.foldLeft(0L) { case (expectedStart, (_, _, _, doc, st, en, _)) =>
        assert(st == expectedStart, s"gap before doc $doc in ($shard, $seq)")
        assert(en > st && en <= 2048)
        en
      }
    }
  }
  test("contamination bloom prefilter: no false negatives, bounded FP tail, confirm equals exact") {
    import org.apache.spark.sql.functions._
    val (flaggedDf, outDf) =
      graft.operators.TextOps.contaminationBloomParts(spark, sf001)
    val flagged = flaggedDf.collect().map(_.getLong(0)).toSet
    // ground truth: the exact face aggregated to the doc level
    val exact = SparkEntry.queries("text_contamination")(spark, sf001)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty, "exact contamination found nothing — fixture broke")
    // a Bloom filter can NEVER miss a true member: flagged ⊇ exact
    assert(exact.subsetOf(flagged),
      s"bloom missed contaminated docs: ${(exact -- flagged).take(5)}")
    // fpp 1e-6 × ~100 grams/doc ⇒ expected extra flags ≪ 1; allow 10
    assert(flagged.size - exact.size <= 10,
      s"FP tail too fat: ${flagged.size} flagged vs ${exact.size} exact")
    // FPs die in the confirm join: the report's doc set IS the exact set
    val confirmed = outDf.collect().map(_.getLong(0)).toSet
    assert(confirmed == exact,
      "confirmed report diverges from the exact contamination set")
  }

  test("agg_quantile_merge: every estimate honors the (k-1)*shards rank-error guarantee") {
    import org.apache.spark.sql.functions._
    val est = SparkEntry.queries("agg_quantile_merge")(spark, sf001).collect()
    assert(est.length == 6, "one row per declared quantile")
    val vals = graft.core.Tables.lineitem(spark, sf001)
      .select(graft.core.Num.d2(col("l_extendedprice")).as("v"))
    vals.cache()
    est.foreach { r =>
      val t = r.getAs[Long]("target_rank")
      // est ships as integer cents (float-free face, r16) — rebuild
      // the exact DECIMAL(18,2) value for the rank probes
      val e = java.math.BigDecimal.valueOf(r.getAs[Long]("est_cents"), 2)
      val bound = r.getAs[Long]("err_bound")
      // two-sided guarantee against EXACT ranks: the estimate's true
      // rank reaches the target, and the count strictly below it
      // cannot overshoot the target by the advertised bound
      val le = vals.filter(col("v") <= lit(e)).count()
      val lt = vals.filter(col("v") < lit(e)).count()
      assert(le >= t, s"rank(est)=$le below target $t at q_permille=${r.getLong(0)}")
      assert(lt < t + bound,
        s"est overshoots: $lt strictly-below vs target $t + bound $bound")
    }
    vals.unpersist()
  }

  test("agg_decay: halving-table domain covers the data span; decay only shrinks") {
    val rows = SparkEntry.queries("agg_decay")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the fixed 1200-week domain is a documented bound, not a silent
      // cap: the join would DROP rows past it, so pin the headroom
      assert(r.getAs[Int]("max_halflives") < 1100,
        s"data span ${r.getAs[Int]("max_halflives")} weeks approaches the halving-table bound")
      assert(r.getAs[Double]("decayed") <= r.getAs[Long]("raw_count").toDouble,
        "decayed total exceeds the raw count")
      assert(r.getAs[Double]("decayed") > 0.0)
    }
  }

  test("agg_sample_estimate: the interval covers the exact mean; expansion total is close") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("agg_sample_estimate")(spark, sf001).collect()(0)
    val exact = graft.core.Tables.lineitem(spark, sf001)
      .agg(sum(graft.core.Num.d2(col("l_extendedprice"))).cast("double").as("t"),
        count(lit(1)).as("n")).collect()(0)
    val exactMean = exact.getDouble(0) / exact.getLong(1)
    assert(r.getAs[Long]("n_sample") > 100, "sample too small to mean anything")
    assert(r.getAs[Double]("ci95_lo") <= exactMean &&
      exactMean <= r.getAs[Double]("ci95_hi"),
      s"exact mean $exactMean outside [${r.getAs[Double]("ci95_lo")}, ${r.getAs[Double]("ci95_hi")}]")
    val relErr = math.abs(r.getAs[Double]("est_total") - exact.getDouble(0)) /
      exact.getDouble(0)
    // mean error is CI-bounded; the expansion total also carries the
    // sampled-count noise — 10% is generous at the 6k-row fixture and
    // deterministic (fixed hash, fixed fixture)
    assert(relErr <= 0.10, s"expansion total off by ${relErr * 100}%")
  }

  test("stats_spearman: value-rank path equals row-level average ranks; sign sanity") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("stats_spearman")(spark, sf001)
      .collect().map { r =>
        // boxed read: the den==0 degenerate-variance branch yields a
        // NULL rho, and an unboxing getAs[Double] would NPE opaquely
        // on a future fixture instead of failing with a message
        // (ADVICE r13)
        def d(c: String): Double = {
          val v = r.getAs[java.lang.Double](c)
          assert(v != null, s"flag ${r.getString(0)}: $c is NULL " +
            "(degenerate variance on this fixture?)")
          v.doubleValue()
        }
        r.getString(0) -> (d("rho_qty_disc"), d("rho_qty_tax"))
      }.toMap
    // independent row-level reference: avg-rank windows over raw rows
    // (the O(n log n) textbook form the bounded-domain path replaces).
    // BOTH rho channels get the full reference — the DuckDB oracle
    // mirrors the same stated computation, so a shared z-channel
    // moment mixup (sxz/szz) would pass the oracle hash; only an
    // independently-derived rho_qty_tax catches it (ADVICE r13).
    def rk(v: String) = {
      val w = Window.partitionBy("g").orderBy(v)
      (rank().over(w) * 2 + count(lit(1)).over(
        Window.partitionBy("g", v)) - 1).cast("double")
    }
    val rows = graft.core.Tables.lineitem(spark, sf001)
      .select(col("l_returnflag").as("g"),
        graft.core.Num.d2(col("l_quantity")).as("x"),
        graft.core.Num.d2(col("l_discount")).as("y"),
        graft.core.Num.d2(col("l_tax")).as("z"))
      .withColumn("rx", rk("x")).withColumn("ry", rk("y"))
      .withColumn("rz", rk("z"))
    val ref = rows.groupBy("g").agg(
        count(lit(1)).cast("double").as("n"),
        sum("rx").as("sx"), sum("ry").as("sy"), sum("rz").as("sz"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("rz") * col("rz")).as("szz"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rz")).as("sxz"))
      .collect().map { r =>
        val n = r.getDouble(1)
        def g(i: Int) = r.getDouble(i)
        def pearson(sab: Double, sa: Double, sb: Double,
            saa: Double, sbb: Double): Double =
          (n * sab - sa * sb) /
            math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
        r.getString(0) -> (
          pearson(g(8), g(2), g(3), g(5), g(6)),
          pearson(g(9), g(2), g(4), g(5), g(7)))
      }.toMap
    got.foreach { case (g, (rhoQd, rhoQt)) =>
      assert(math.abs(rhoQd - ref(g)._1) < 1e-5,
        s"flag $g: bounded-domain rho_qty_disc $rhoQd != row-rank reference ${ref(g)._1}")
      assert(math.abs(rhoQt - ref(g)._2) < 1e-5,
        s"flag $g: bounded-domain rho_qty_tax $rhoQt != row-rank reference ${ref(g)._2}")
    }
    got.values.foreach { case (a, b) =>
      assert(math.abs(a) <= 1.0 && math.abs(b) <= 1.0, "rho out of [-1, 1]")
    }
  }

  test("agg_count_min: estimates never undercount and cover every probe key") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("agg_count_min")(spark, sf001).collect()
    assert(rows.nonEmpty, "no probe keys under user_id < 40")
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"CM undercounted key ${r.getAs[Long]("user_id")}: " +
          s"est ${r.getAs[Long]("cm_est")} < exact ${r.getAs[Long]("exact_n")}")
      assert(r.getAs[Long]("cm_est") ==
        r.getAs[Long]("exact_n") + r.getAs[Long]("overcount"))
    }
    // the sketch is 1024 cells at ANY corpus size; with n events and
    // w=256 buckets the expected per-row collision mass is n/256 —
    // min over 4 rows should keep the worst estimate within a loose
    // multiple of that on the fixture (deterministic, fixed hashes)
    val n = graft.core.Tables.events(spark, sf001).count()
    val worst = rows.map(_.getAs[Long]("overcount")).max
    assert(worst <= math.max(8L, 8L * n / 256),
      s"worst overcount $worst implausibly large for n=$n")
  }

  test("chunkCorpus windows are exactly the windows chunk_documents digests") {
    import org.apache.spark.sql.functions._
    // no-drift pin between the retrieval corpus (search_hybrid_chunks)
    // and the digest face: md5(chunk_text) must equal chunk_md5 on
    // every (doc_id, chunk_id), and the unit sets must be identical
    val docs = graft.core.Tables.documents(spark, sf001)
    val corpus = graft.operators.TextOps.chunkCorpus(docs)
      .select(col("doc_id"), col("chunk_id"), md5(col("chunk_text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val digests = SparkEntry.queries("chunk_documents")(spark, sf001)
      .select("doc_id", "chunk_id", "chunk_md5")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(corpus == digests,
      s"chunk corpus drifted from chunk_documents: ${(corpus.keySet diff digests.keySet).take(3)} / ${(digests.keySet diff corpus.keySet).take(3)}")
  }

  test("packedChunkKey: exact pack/unpack in bounds, raise_error beyond them") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    def pk(doc: Long, chunk: Long): Long =
      Seq((doc, chunk)).toDF("d", "c")
        .select(graft.operators.Search.packedChunkKey(col("d"), col("c")))
        .collect()(0).getLong(0)
    // in-bounds keys pack and unpack exactly at the corners
    for ((d, c) <- Seq((0L, 0L), (1L, (1L << 20) - 1), ((1L << 43) - 1, 7L))) {
      val k = pk(d, c)
      assert(k / (1L << 20) == d && k % (1L << 20) == c, s"($d,$c) -> $k")
    }
    // out-of-bounds inputs must FAIL, not silently corrupt a
    // neighboring document's key space (the bound the scaladoc
    // states: <2^20 windows/doc, doc_id < 2^43 — ADVICE r12)
    for ((d, c) <- Seq((0L, 1L << 20), (1L << 43, 0L), (-1L, 0L), (0L, -1L)))
      assertThrows[Exception] { pk(d, c) }
  }
}
