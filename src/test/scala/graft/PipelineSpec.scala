package graft

import org.apache.spark.sql.functions._

/** pipeline_pretrain carries no oracle (semantic dedup + BPE have no
  * SQL form) — these assertions are its correctness gate: the composed
  * chain must agree with the STANDALONE operators it chains, the shard
  * layout must tile the survivor order exactly, and the manifest must
  * be deterministic. */
class PipelineSpec extends SparkSpec {

  private lazy val manifest =
    graft.operators.Pipeline.pipelinePretrain(spark, sf001).collect()

  test("survivor count equals ccnet-keep minus semantic-dropped (composition vs standalone)") {
    val keep = graft.operators.Perplexity.sampleCcnetBuckets(spark, sf001)
      .filter(col("keep")).select("doc_id")
    val dropped = graft.operators.Similarity.dedupSemantic(spark, sf001)
      .filter(col("dropped") && col("vec_id") < (1L << 40))
      .select(col("vec_id").as("doc_id"))
    val expected = keep.join(dropped, Seq("doc_id"), "left_anti").count()
    val got = manifest.map(_.getAs[Long]("n_docs")).sum
    assert(got == expected,
      s"pipeline carried $got docs into shards; standalone stages say $expected")
    assert(expected > 0 && got < 500, "gate dropped nothing — stages not composing")
  }

  test("shard positions tile 1..N contiguously and shards never overlap") {
    val rows = manifest.sortBy(_.getAs[Long]("shard_id"))
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Long]("first_pos") == 1L, "order does not start at 1")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("first_pos") == a.getAs[Long]("last_pos") + 1,
          s"gap/overlap between shards ${a.getAs[Long]("shard_id")} and ${b.getAs[Long]("shard_id")}")
      case _ => ()
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("last_pos") - r.getAs[Long]("first_pos") + 1 ==
        r.getAs[Long]("n_docs"), s"shard ${r.getAs[Long]("shard_id")} span != n_docs")
    }
  }

  test("token totals are conserved and every shard meets its budget shape") {
    // re-aggregate the WRITTEN layout directly — the manifest's
    // grouping must conserve what was written
    val raw = spark.read.parquet(
      graft.operators.Pipeline.pretrainRoot(spark, sf001))
    val rawTokens = raw.agg(sum("n_tokens")).collect()(0).getLong(0)
    val manTokens = manifest.map(_.getAs[Long]("n_bpe_tokens")).sum
    assert(manTokens == rawTokens, s"manifest says $manTokens tokens, layout has $rawTokens")
    manifest.foreach { r =>
      val (t, s) = (r.getAs[Long]("n_bpe_tokens"), r.getAs[Long]("n_seqs"))
      assert(s == (t + 2047) / 2048, s"shard ${r.getAs[Long]("shard_id")} n_seqs wrong")
      assert(t > 0, "empty shard")
    }
    // document-atomic token-budget sharding: every shard STARTS within
    // its budget window, so no shard is empty and none skips a window
    val ids = manifest.map(_.getAs[Long]("shard_id")).sorted
    assert(ids.head == 0L && ids.sameElements(ids.head to ids.last),
      s"shard ids not contiguous: ${ids.mkString(",")}")
  }

  test("manifest is deterministic across a fresh rebuild") {
    val again = graft.operators.Pipeline.pipelinePretrain(spark, sf001)
      .collect().map(_.toString).sorted
    assert(again.sameElements(manifest.map(_.toString).sorted))
  }

  test("sft_pack_masked: spans tear at sequence boundaries and reassemble exactly") {
    val spans = SparkEntry.queries("sft_render")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val parts = SparkEntry.queries("sft_pack_masked")(spark, sf001).collect()
    val L = 48L
    // every part is 1-indexed inside its sequence and non-empty
    assert(parts.forall(r => r.getLong(5) >= 1 && r.getLong(6) <= L &&
      r.getLong(5) <= r.getLong(6)), "part outside its sequence")
    // the tear path is exercised by construction (L < max conv length)
    assert(parts.exists(_.getLong(4) == 1L),
      "no torn span — the boundary case is unexercised")
    // torn parts reassemble: per (conv, span), covered words == width
    val widths = parts.groupBy(r => (r.getLong(2), r.getLong(3)))
      .map { case (k, rs) =>
        k -> rs.map(r => r.getLong(6) - r.getLong(5) + 1).sum }
    assert(widths.keySet == spans.keySet, "span set drifted through packing")
    assert(widths.forall { case (k, w) => w == spans(k)._2 - spans(k)._1 + 1 },
      "torn parts do not cover their span exactly")
  }

  test("pipeline_sft manifest conserves the independently-derived survivor set") {
    import graft.core.Tables
    import graft.functions.Text
    val sft = graft.operators.Pipeline.pipelineSft(spark, sf001).collect()
    // independent derivation via a DIFFERENT formulation (groupBy-min
    // instead of the pipeline's window): gated docs → min-id survivor
    // per (source, text) → doc/token totals
    val gated = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("n_chars"), col("lang"),
        col("text"), Text.words(col("text")).as("w"))
      .filter(graft.operators.TextOps.funnelFlags.reduce(_ && _))
    val survivors = gated.groupBy("source", "text")
      .agg(min("doc_id").as("doc_id"), min(size(col("w"))).as("n_tokens"))
    val (nDocs, nTokens) = (survivors.count(),
      survivors.agg(sum("n_tokens")).head().getLong(0))
    assert(sft.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "manifest doc total differs from the independent survivor count")
    assert(sft.map(_.getAs[Long]("bin_tokens")).sum == nTokens,
      "manifest token total differs from the independent survivor tokens")
    // the gates must actually gate, and the packing must actually pack
    assert(nDocs > 0 && nDocs < 500, s"funnel passed $nDocs of 500 docs")
    assert(sft.length < nDocs, "every doc got its own bin — fold not folding")
  }
  test("pipeline_dpo: preference agrees with standalone text_quality and masks bound the response") {
    val dpo = graft.operators.Pipeline.pipelineDpo(spark, sf001)
    val q = graft.operators.TextOps.textQuality(spark, sf001)
      .select(col("doc_id"), col("quality_score"))
    // the preference RULE re-checked against the standalone operator:
    // chosen quality >= rejected quality, pair for pair
    val joined = dpo
      .join(q.select(col("doc_id").as("chosen_doc"),
        col("quality_score").as("cq")), "chosen_doc")
      .join(q.select(col("doc_id").as("rejected_doc"),
        col("quality_score").as("rq")), "rejected_doc")
    assert(joined.filter(col("cq") < col("rq")).count() == 0,
      "a pair prefers the lower-quality candidate")
    val rows = dpo.collect()
    assert(rows.nonEmpty, "no complete 4-doc groups at sf0.001+")
    // pair count = complete 4-slot groups, recomputed from the corpus
    val expected = graft.core.Tables.documents(spark, sf001)
      .filter(length(col("text")) >= 1)
      .groupBy(expr("doc_id div 4")).count()
      .filter(col("count") === 4).count()
    assert(rows.length == expected,
      s"${rows.length} pairs vs $expected complete groups")
    rows.foreach { r =>
      assert(r.getAs[Double]("margin") >= 0.0, "negative margin")
      assert(r.getAs[Long]("mask_start") ==
        r.getAs[Long]("prompt_words") + 2, "mask_start != prompt + marker")
      assert(r.getAs[Long]("chosen_mask_end") >= r.getAs[Long]("mask_start"),
        "chosen span empty")
      assert(r.getAs[Long]("rejected_mask_end") >= r.getAs[Long]("mask_start"),
        "rejected span empty")
      assert(r.getAs[Long]("chosen_doc") != r.getAs[Long]("rejected_doc"))
    }
    // the two renderings actually differ somewhere (the md5 pins bite)
    assert(rows.exists(r => r.getAs[String]("chosen_md5") !=
      r.getAs[String]("rejected_md5")), "all pairs rendered identically")
  }

  test("pipeline_forget: holes match the tombstone slice and every move shifts down") {
    val rows = graft.operators.Pipeline.pipelineForget(spark, sf001).collect()
    assert(rows.nonEmpty, "no affected conversations — tombstone slice empty")
    val (purged, moved) = rows.partition(_.getAs[String]("action") == "purge")
    // every hole is a tombstoned conversation and vice versa
    purged.foreach(r => assert(r.getAs[Long]("doc_id") % 23 == 5,
      s"purged conv ${r.getAs[Long]("doc_id")} is not in the tombstone slice"))
    val convs = graft.operators.Pipeline.sftRender(spark, sf001)
      .select("conv_id").distinct().collect().map(_.getLong(0))
    assert(purged.length == convs.count(_ % 23 == 5),
      "purge rows != tombstoned conversations present in the render")
    moved.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 23 != 5,
        "a tombstoned conversation survived as a move")
      assert(r.getAs[Long]("new_tok_start") < r.getAs[Long]("old_tok_start"),
        "a move shifted up — compaction can only close holes")
    }
    // shift arithmetic: a survivor's shift equals the tokens of the
    // holes placed before it in its shard
    val holes = purged.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("old_tok_start"))).toSeq
    val widths = graft.operators.Pipeline.sftRender(spark, sf001)
      .select("conv_id", "conv_words").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    moved.foreach { r =>
      val expectedShift = holes.collect {
        case (sh, d, _) if sh == r.getAs[Long]("shard") &&
          d < r.getAs[Long]("doc_id") => widths(d)
      }.sum
      assert(r.getAs[Long]("old_tok_start") - r.getAs[Long]("new_tok_start")
        == expectedShift, s"wrong shift for conv ${r.getAs[Long]("doc_id")}")
    }
  }

  test("pretrain_fim: segments tile every transformed doc; both orders appear; rate holds") {
    val rows = graft.operators.Pipeline.pretrainFim(spark, sf001).collect()
    assert(rows.nonEmpty)
    val (fim, plain) = rows.partition(_.getAs[String]("mode") != "plain")
    assert(fim.nonEmpty && plain.nonEmpty)
    fim.foreach { r =>
      val (n, a, m) = (r.getAs[Long]("n_words"),
        r.getAs[Long]("pre_words"), r.getAs[Long]("mid_words"))
      // all three segments non-empty and tiling the word array
      assert(a >= 1 && m >= 1 && n - a - m >= 1,
        s"degenerate split n=$n a=$a m=$m for doc ${r.getAs[Long]("doc_id")}")
    }
    plain.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("pre_words")), "plain row carries a split")
    }
    val modes = fim.map(_.getAs[String]("mode")).toSet
    assert(modes == Set("psm", "spm"), s"missing a sentinel order: $modes")
    // the FIM rate: about half of ELIGIBLE (>= 9 words) docs transform
    val eligible = rows.count(_.getAs[Long]("n_words") >= 9)
    assert(fim.length * 10 >= eligible * 3 && fim.length * 10 <= eligible * 7,
      s"${fim.length} transformed of $eligible eligible — rate drifted")
  }

  test("pipeline_multimodal manifest conserves the independently-derived kept set") {
    import org.apache.spark.sql.functions._
    import graft.core.Tables
    import graft.functions.Vectors
    // independent re-derivation: clip survivors + planted re-encodes,
    // minus the larger id of every pHash pair over that same feed
    val emb = Tables.embeddings(spark, sf001)
    val img = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
      .select(expr("vec_id div 2").as("doc_id"), col("embedding").as("vi"))
    val txt = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
      .select(expr("(vec_id - 1) div 2").as("doc_id"), col("embedding").as("vt"))
    val survivors = img.join(txt, "doc_id")
      .withColumn("cs", round(Vectors.fdot(col("vi"), col("vt")), 6))
      .filter(col("cs") >= 0.1)
      .join(Tables.documents(spark, sf001).select("doc_id", "text"), "doc_id")
    val feed = survivors.select("doc_id", "text")
      .unionByName(survivors.filter(col("doc_id") < 20)
        .select((col("doc_id") + (1L << 40)).as("doc_id"),
          graft.operators.Multimodal.reencodeMutant.as("text")))
    val dropped = graft.operators.Multimodal.phashVerdicts(spark, feed)
      .filter(!col("kept")).count()
    val expectedKept = feed.count() - dropped
    val manifest = SparkEntry.queries("pipeline_multimodal")(spark, sf001).collect()
    assert(manifest.map(_.getLong(1)).sum == expectedKept,
      s"manifest total ${manifest.map(_.getLong(1)).sum} != derived $expectedKept")
    // every clip-gate survivor < 20 spawned a planted re-encode, and
    // every one of those must have been deduped away (kept <= feed - plants)
    val plants = survivors.filter(col("doc_id") < 20).count()
    assert(plants > 0, "no clip survivor below id 20 — planted class empty")
    assert(manifest.map(_.getLong(1)).sum <= feed.count() - plants,
      "a planted re-encode survived perceptual dedup")
  }

  test("pretrain_mlm: selection rate near 15%, labels only at selected positions, deterministic") {
    val rows = graft.operators.Pipeline.pretrainMlm(spark, sf001).collect()
    assert(rows.nonEmpty)
    val words = rows.map(_.getAs[Long]("n_words")).sum
    val masked = rows.map(_.getAs[Long]("n_masked")).sum
    val rate = masked.toDouble / words
    assert(rate > 0.10 && rate < 0.20,
      s"selection rate $rate far from the 15% target over $words positions")
    // determinism: a second plan build yields byte-identical digests
    val again = graft.operators.Pipeline.pretrainMlm(spark, sf001).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // a doc with zero selected positions must keep its text verbatim:
    // its masked_md5 equals md5(text)
    val plain = graft.operators.Pipeline.pretrainMlm(spark, sf001)
      .filter(col("n_masked") === 0).select("doc_id", "masked_md5")
      .join(graft.core.Tables.documents(spark, sf001), "doc_id")
      .withColumn("want", md5(col("text")))
    plain.collect().foreach(r =>
      assert(r.getAs[String]("masked_md5") == r.getAs[String]("want"),
        s"doc ${r.getAs[Long]("doc_id")}: unselected doc was rewritten"))
  }

  test("split_leakage_safe: no surviving train doc is a near-dup of any holdout doc") {
    val split = graft.operators.Pipeline.splitLeakageSafe(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = split.size
    val holdout = split.count(_._2 == "holdout")
    assert(holdout > 0 && holdout < n / 2,
      s"holdout fraction ${holdout.toDouble / n} not a minority split")
    assert(split.values.exists(_ == "purged"),
      "no doc purged — the planted cross-split near-dups missed")
    // ground truth: dedup_near's verified pairs on the same planted
    // corpus (collected ONCE — it is one of the suite's expensive
    // operators); any pair crossing the split must have lost its
    // train arm
    val nearPairs = graft.operators.Dedup.dedupNear(spark, sf001).collect()
    nearPairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      (split(a), split(b)) match {
        case ("holdout", sb) if sb != "holdout" =>
          assert(sb == "purged", s"train doc $b near-dups holdout doc $a but survived")
        case (sa, "holdout") if sa != "holdout" =>
          assert(sa == "purged", s"train doc $a near-dups holdout doc $b but survived")
        case _ => ()
      }
    }
    // a purged doc must have a REASON: it near-dups some holdout doc
    val pairs = nearPairs
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    split.collect { case (id, "purged") => id }.foreach { id =>
      assert(pairs.getOrElse(id, Set.empty).exists(split(_) == "holdout"),
        s"doc $id purged without a holdout near-dup witness")
    }
  }
}
