package graft

/** The single biggest t2 risk (SURVEY.md §7.4 #1): results must be
  * identical under different parallelism. Representative queries run
  * under shuffle.partitions 1 vs 4 and must collect identically. */
class DeterminismSpec extends SparkSpec {

  private val names = Seq(
    "q1_pricing", "join_asof", "win_lww", "stream_session",
    "dedup_near", "agg_udaf", "win_frame", "sim_topk",
    "set_except", "stream_sliding", "text_fingerprint", "dedup_jaccard",
    "multimodal_decode", "topk", "agg_gsets", "fn_json",
    // rows-only queries must be stable too (the driver still compares
    // row counts; and flapping outputs would be a real bug):
    "dedup_simhash", "dedup_embed", "sim_topk_lsh", "scan_token_range",
    "fn_token", "text_langid", "agg_approx_distinct", "agg_collect",
    "win_static", "scan_secondary_index", "q3_shipping", "q5_supplier",
    // round-2 set: the salted two-phase agg merge, the window-dedup
    // pipeline, and the storage-semantics merges are exactly the shapes
    // partitioning could perturb
    "agg_skew_twophase", "pipeline_curation", "stream_join",
    "cdc_apply", "tombstone_merge", "fn_duration",
    // round-3 set: the CAS/batch write paths share cdc_apply's
    // Lww+left-join shape, and the banded LSH threshold join is
    // exactly the candidate-generation shape partitioning could perturb
    "cas_apply", "batch_apply", "sim_threshold_lsh",
    // round-4 set: iterative label propagation, sketch merges, and the
    // float vector kernel must not depend on partition layout
    "dedup_cluster", "agg_sketch_merge", "fn_vector",
    "join_interval", "sample_stratified", "embedding_quantize",
    "win_distribution", "agg_mode", "mv_incremental",
    "join_bloom_prefilter", "text_rarity_score",
    "q10_returns", "q18_large_orders", "scan_paging",
    "text_contamination", "text_pii_scrub", "source_csv",
    "scan_schema_evolution",
    // round-6 set: the newly oracle-checked exact float kernels and
    // the production-τ banded join (fused SrpBucketsExpr path)
    "sim_threshold", "sim_threshold_lsh_tau08",
    // round-6 additions: the Murmur3 token queries (fn_token /
    // scan_token_range now ride cass_token), the digest-pruned repair
    // diff, the islands sessionization, and the repetition gate's
    // explode+max path are all shapes partitioning could perturb
    "repair_diff", "stream_sessionize", "text_repetition",
    "sample_temperature", "pack_sequences", "sim_topk_filtered",
    "join_asof_fwd", "scan_bucket_pruned", "repair_apply", "source_orc",
    // round-7 set: the window-hash occurrence count + islands merge,
    // the BPE encode (driver-trained, row-local apply), the int8
    // probe's over-fetch rank, the learned gate's fixed-point training,
    // and the stat-skipped scan are all partition-perturbable shapes
    "dedup_substring", "dedup_substring_apply", "tokenize_bpe",
    "pack_sequences_bpe", "sim_topk_ivf_pq", "text_quality_model",
    "sink_sorted_stats", "sink_zorder", "compact_generations", "scan_snapshot",
    // round-7 additions: the filtered max_by merge, the two anti-join
    // admission gates, and the broadcast range-join accounting
    "read_repair", "dedup_delta", "hint_replay",
    "ring_rebalance", "ring_decommission",
    // the per-row top-k join in both its exact and banded forms
    "sim_knn_join", "sim_knn_join_lsh",
    // late round 7: the two-phase bucketed global rank (offset map is
    // collected — layout must not leak into positions), the row-local
    // chunk explode, and the RF=3 LWW merge with reply accounting
    "shuffle_deterministic", "chunk_documents", "consistency_quorum",
    // BM25 ranking: quantized per-term longs summed per doc — the rank
    // must not depend on which partition summed first
    "search_bm25", "search_match_all",
    // two-phase prefix sum / per-source rank — offset maps collected
    "sample_token_budget", "mix_sources",
    // round-8: cell-local banded candidates + left-join drop flags —
    // the candidate dedup and max/count aggregates must not depend on
    // partition layout (centroids are built once per JVM)
    "dedup_semantic",
    // band-join admission against the persisted index + struct-max
    // best-match — candidate generation must not depend on layout
    "dedup_delta_near",
    // two-phase (stage, sub) rank — another collected offset map
    "curriculum_order",
    // LWW window + TTL classification — the Lww merge shape again
    "ttl_compact",
    // two frames over one window sort — frame resolution must not
    // depend on partition layout
    "join_asof_nearest",
    // histogram-median: partial agg + running-count window
    "stats_corpus",
    // round-8 third wave: the DSIR weight is a per-doc integer sum of
    // quantized log-prob diffs plus a histogram cutoff (both designed
    // for layout independence — prove it), phrase adjacency joins over
    // positional postings, the funnel's chained stage mins, and the
    // one-pass stats row with its stack unpivot
    "sample_dsir", "search_phrase", "agg_funnel", "agg_retention",
    "stats_analyze", "sample_fixed_k", "compact_twcs", "compact_lcs",
    // iterative Lloyd with quantized-long centroid updates — the whole
    // point of the fixed-point discipline is layout independence
    "kmeans_fit",
    // round-9: the composed 5-stage pipeline (every stage's artifact
    // feeds the next — any layout leak compounds), the assign-only
    // IVF delta append, the quorum write ledger's reply accounting,
    // and the per-partition-limit page rank
    "pipeline_pretrain", "sim_index_delta", "write_quorum",
    "scan_paging_pplimit",
    // round-9 faces: the argmin equality join-back, the LEFT-join
    // double aggregation, the scalar-max equality join-back, the
    // decorrelated float-avg comparison, the min/max correlation
    // collapse, and the scalar-avg filter — every one compares
    // aggregate outputs across relations, exactly where a
    // layout-dependent float would flap
    "q2_min_cost_supplier", "q13_custdist", "q15_top_supplier",
    "q17_small_quantity", "q21_waiting_supplier", "q22_global_sales",
    // fixed-point Gram + driver Jacobi — layout independence is the
    // design claim (also asserted bit-for-bit in DedupSimilaritySpec)
    "embedding_pca",
    // static cell LWW + visibility join + static-only anti join
    "static_cells",
    // per-partition tombstone array + row-local exists + LWW merge
    "tombstone_range",
    // round-9 third wave: struct-keyed min_by/max_by first/last in one
    // aggregate (tie-break must not depend on layout), the broadcast
    // min/max bounds + integer bucket ids, the per-(n, lang) gram rank,
    // and the integer fixed-point power iteration over the collected
    // bounded adjacency (collect order must not leak into ranks)
    "agg_downsample", "stats_histogram", "text_ngram_topk",
    "graph_pagerank",
    // six max_by FILTER replica states + row-local LWW merge — the
    // consistency_quorum shape at 2-DC width
    "consistency_multidc",
    // decimal second moments: the order-independence claim extended
    // to Σx²/Σxy must hold on any layout
    "stats_corr",
    // driver-ring placement + broadcast range-join accounting (the
    // ring_rebalance shape with the NTS walk on top)
    "ring_multidc",
    // bounded-kernel truth + broadcast cell lookups — integer counts
    // must not depend on layout
    "sim_recall_eval",
    // two-round integer water-filling over source-domain aggregates
    "mix_epochs",
    // peer-inclusive RANGE frame + decimal rolling sum; quantized
    // per-char entropy terms — both must hold on any layout
    "win_range_time", "text_entropy",
    // digest-pruned drill-down: the dirty-bucket set and the keyed
    // diff must not depend on layout
    "mv_validate",
    // shard running totals + struct-max merges — the CRDT value must
    // be identical on any layout
    "counter_crdt",
    // two LWW passes + PK outer join — churn classification must not
    // depend on layout
    "scan_snapshot_diff",
    // spine join + LOCF window over domain-sized relations
    "agg_gapfill",
    // vocabulary prefilter + struct-min best match per doc
    "search_fuzzy",
    // round-10: postings intersection + collected generation list
    // (the planning collect must not leak layout into the fetch),
    // snapshot ∪ overlap-replay LWW (duplicate identical rows tie),
    // the per-shard collect_list + fold (collect order is sorted
    // away — prove it), the pair-key equi-join float kernel, and the
    // one-pass cumulative-conjunction funnel
    "scan_sai", "commitlog_replay", "pack_greedy",
    "multimodal_clip_filter", "quality_funnel",
    // round-10 second wave: the shared-exchange double window (global
    // + scoped survivor flags) and the relational minhash signature
    // (component mins + match-count join)
    "dedup_scoped", "dedup_minhash_eval",
    // postings union + collected generation list
    "scan_sai_or",
    // the composed funnel → scoped-dedup → NFD-pack chain: a layout
    // leak in ANY stage surfaces in the walk-ordered bin md5s
    "pipeline_sft",
    // two budget prefixes (collected offset maps) + the gated subset;
    // register-maxima sketch estimates must be layout-free
    "mix_anneal", "agg_sketch_intersect",
    // broadcast-centroid assignment + WindowGroupLimit rank; element
    // postings intersection + collected generation list
    "sample_coreset", "scan_sai_contains",
    // ten fixed argmax rounds over the pinned pool — every round's
    // pick must be layout-free
    "sim_mmr",
    // key aggregate + 1-row broadcast stats + top-10 rank
    "stats_skew",
    // round-11: the two-phase exact ANN probe (collected θ bounds and
    // leaf plans must not leak layout), the map-postings probes
    // (collected generation lists + size-gated fetch), and the
    // digest-pruned incremental session report
    "scan_sai_ann", "scan_sai_contains_key", "scan_sai_map_entry",
    "repair_incremental",
    // snapshot-seeded cell LWW + tail union — the commitlog_replay
    // shape on the streaming state key
    "stream_commitlog",
    // byte-level BPE: driver-trained merges, row-local encode — the
    // tokenize_bpe discipline over the byte alphabet
    "tokenize_bpe_bytes",
    // digest compare + dirty-range drill-down with NO heal; per-level
    // scaling-parameter compaction plan over the sstable list
    "repair_preview", "compact_ucs",
    // segment-metadata-pruned numeric range probe (collected 8-row
    // metadata + generation list must not leak layout); frozen
    // byte-level artifact encode; RRF fusion of two ranked pools
    "scan_sai_range", "tokenize_bpe_bytes_frozen", "search_hybrid_rrf",
    // flushed-postings ∪ memtable-linear union read
    "scan_sai_memtable",
    // 64-bit sign-signature Hamming shortlist + exact rescore
    "sim_topk_bq",
    // asymmetric containment over the planted-quote eval union
    "dedup_containment",
    // prefix-dim bound pass + exact-threshold rescore: the pinned
    // bound relation and the kth-score cutoff must not leak layout
    "sim_topk_mrl",
    // two-level aggregate + exact interpolated percentiles — the
    // value buffer must sort away partition order
    "stats_partition_hist",
    // sharded prefix sums exploded to the (shard, seq) domain + slot
    // rank — span order must not depend on layout
    "pack_attention_spans",
    // two sequential admission folds over batch_id-partitioned state:
    // row-local bands, partition-pruned index reads, struct-max best
    // match — replays overwrite their own partitions identically
    "stream_dedup_near",
    // typed-map signature + 8-band self-join + popcount verify — the
    // pinned signature pass and band candidates must not leak layout
    "multimodal_dedup_phash",
    // the composed clip-gate → pHash-dedup → manifest chain: a layout
    // leak in any stage surfaces in the id-ordered shard md5s
    "pipeline_multimodal",
    // driver-trained quantized-score vocab + row-local Viterbi — the
    // tokenize_bpe discipline for the unigram family
    "tokenize_unigram",
    // two stacked sequence windows (rn, then LEAD over the non-mid
    // subsequence) — match endpoints must not depend on layout
    "win_pattern",
    // decimal second moments → REGR_* scalar formulas: the
    // order-independence claim extended to slope/intercept/r2
    "stats_regression",
    // round-11 continuation: the bloom prefilter's EXISTS + confirm
    // join, the adaptive branch pick, the report aggregates, and the
    // pair-domain t-test must not depend on partition layout
    "text_contamination_bloom", "scan_sai_ann_adaptive",
    "pack_efficiency", "stats_ttest", "stats_anova", "stats_chi2",
    // the composed curation->retrieval capstone: gates + dedup window +
    // postings + fusion must hold on any layout
    "pipeline_rag",
    // round-12: the paged ANN cursor (driver-held keyset state per
    // page must not depend on layout); driver-trained likelihood vocab
    // + row-local greedy longest-match — the tokenize_bpe discipline
    // for the WordPiece family
    "scan_sai_ann_paged", "tokenize_wordpiece",
    // chunk pool + max-passage dedup + dense re-rank + fusion over the
    // index-backed vector arm — every window must hold on any layout
    "search_hybrid_chunks",
    // flushed IVF probe ∪ brute memtable arm union rank (collected θ
    // planning state must not leak layout)
    "scan_sai_ann_memtable",
    // round-13: the passage-granularity capstone — curation gates +
    // dedup window + chunk explode + both rank windows + fusion must
    // hold on any layout
    "pipeline_rag_chunks",
    // base ∪ flushed-generation probe with the extra postings/bounds
    // unioned into the planning relations — exactness must not depend
    // on layout
    "stream_ann_memtable",
    // running word offsets from two stacked conv_id windows + the
    // order-sensitive render md5 — must hold on any layout
    "sft_render",
    // the render spans remapped through the sharded prefix-sum pack +
    // the boundary-tear explode — placement must hold on any layout
    "sft_pack_masked",
    // conditional-pivot aggregate + quality-kernel preference rule —
    // chosen/rejected assignment must hold on any layout
    "pipeline_dpo",
    // driver-collected bucket offsets + within-bucket CDF windows +
    // the sup/argmax reduction — must hold on any layout
    "stats_ks",
    // shard-partitioned stride sampling + the merged rank cumulative —
    // sample (rank, value) pairs and estimates must hold on any layout
    "agg_quantile_merge",
    // two stacked aggregates (per-token max, decimal maxima sum) +
    // the top-k window — must hold on any layout
    "search_maxsim",
    // two shard-keyed prefix sums + the action tri-state join — hole
    // and shift placement must hold on any layout
    "pipeline_forget",
    // pooled average ranks from driver-collected offsets + the
    // decimal rank-sum — must hold on any layout
    "stats_mannwhitney",
    // 1-row reference-day cross join + broadcast halving table +
    // quantized decimal sums — must hold on any layout
    "agg_decay",
    // union+window as-of with the row-local tolerance null-out —
    // must hold on any layout
    "join_asof_tolerance",
    // broadcast probe explode + banded candidate join + top-k window —
    // must hold on any layout
    "sim_topk_lsh_multiprobe",
    // per-token cell probe + candidate-pool MaxSim reduction over the
    // persisted IVF layout — must hold on any layout
    "search_maxsim_ivf",
    // degree-ordered wedge join + closing semi join — triangle
    // ownership must hold on any layout
    "graph_triangles",
    // content-hash sample + decimal moments + CLT interval — must
    // hold on any layout
    "agg_sample_estimate",
    // row-local md5-seeded splits + dual-order rendering — must hold
    // on any layout
    "pretrain_fim",
    // six planning-relation counts over postings + data — must hold
    // on any layout
    "scan_allow_filtering",
    // round-13 closing wave: bounded-domain rank moments, the 1 024-cell
    // sketch aggregate, the row-local MLM transform, and the banded
    // cross-split purge are all partition-perturbable shapes
    "stats_spearman", "agg_count_min", "pretrain_mlm", "split_leakage_safe")

  for (name <- names) test(s"$name is partitioning-insensitive") {
    val fn = SparkEntry.queries(name)
    def run(parts: String): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try fn(spark, sf001).collect().toSeq.map(_.toString)
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(run("1") == run("4"))
  }

  test("agg_quantile_merge survives cache eviction between planning collect and output pass") {
    // the r13 driver flake class: an operator that driver-collects
    // planning state (bucket offsets, n) from a relation and then
    // re-reads that relation for the output pass must produce the
    // SAME rows even when every cached/persisted block is dropped
    // between the two runs — a `.cache()`-backed sample relation
    // could re-evaluate under eviction and let the collected state
    // drift from the final pass; the persisted-parquet summary
    // artifact pins one materialization for both.
    val fn = SparkEntry.queries("agg_quantile_merge")
    def run(parts: String): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try fn(spark, sf001).collect().toSeq.map(_.toString)
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    val first = run("1")
    // simulate full eviction: drop every persisted block and clear
    // the SQL cache before the re-read
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    assert(run("32") == first,
      "agg_quantile_merge output drifted across eviction + repartitioning")
  }
}
