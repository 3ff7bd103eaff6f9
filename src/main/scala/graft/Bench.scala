package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every `SparkEntry.queries` entry at the
  * `SPARK_GRAFT_SF_DIR` scale factor and emits the metric JSON the
  * round driver records.
  *
  * Output protocol (VERDICT r1 "What's wrong" #3): the full per-query
  * map goes out first on its own line, then a SHORT final
  * `{"metric":"total",...}` line so any last-line or regex parser
  * finds the metric even when a build tool (sbt) appends trailing
  * lines. The full JSON is also written to `target/bench_last.json`.
  */
/** Shared timing kernel for [[Bench]] and [[TimeQuery]]. */
object BenchKit {
  /** Honest materialization (VERDICT r8 #5): `.count()` lets Catalyst
    * prune every column the count doesn't need. Touch EVERY output
    * column with one codegen xxhash64 per row (maps → map_entries:
    * hash over MapType is rejected by Spark), summed so nothing
    * short-circuits; the count rides the same single pass. */
  def materialize(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.functions.{col, count, expr, lit, map_entries, xxhash64}
    import org.apache.spark.sql.types.MapType
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: MapType => map_entries(col(f.name))
        case _          => col(f.name)
      }
    }
    df.select(xxhash64(cols.toIndexedSeq: _*).as("h"))
      .agg(expr("bit_xor(h)"), count(lit(1)))  // xor: overflow-free under ANSI
      .collect()(0).getLong(1)
  }
}

/** Times queries IN ARGUMENT ORDER in one JVM, repeats allowed —
  * `TimeQuery q q` prints a cold then a steady line, isolating
  * read-path cost from one-time layout builds (BuildOnce makes the
  * second construction reuse the persisted artifact). Diagnostic aid
  * for ledger work; the round receipt remains [[Bench]], whose map
  * order and prewarm pass decide build accounting. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.zipWithIndex.foreach { case (name, i) =>
      val t0 = System.nanoTime()
      val n = BenchKit.materialize(SparkEntry.queries(name)(spark, sfDir))
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(f"[timequery] $i $name ${dt}%.3f s ($n rows) $sfDir")
    }
    spark.stop()
  }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default 4 threads: measured 52.8 s total vs 57.5 s at local[32]
    // on the full 98-query suite at sf0.1 — per-stage scheduling
    // overhead dominates at this data size. SPARK_GRAFT_CPUS overrides
    // (at real scale more cores win; shuffle.partitions tracks it).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // NTZ casts in Tables.events are value-preserving only under a
      // UTC session zone — set it in code, not just in run scripts.
      .config("spark.sql.session.timeZone", "UTC")
      // The degraded-epoch VM freezes for minutes at a time; local
      // mode's heartbeat default (120 s) then REMOVES the driver
      // executor and shuts the context down, zeroing the whole run
      // (r14: a 131 s freeze mid ×100 failed 236 queries with
      // "stopped SparkContext"). There is no remote executor to
      // lose in local[*] — a long timeout only rides out the stall.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/IO once so the first timed query isn't charged
    // for session initialization.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // Optional CLI args name specific queries to time (iteration aid);
    // no args = the full suite the driver records. Unknown names are
    // fatal — silently dropping a typo would record total=0 as real.
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"[bench] unknown queries: ${unknown.mkString(", ")}")
      spark.stop()
      sys.exit(2)
    }
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    // Honest materialization (VERDICT r8 #5): `.count()` lets Catalyst
    // prune every column the count doesn't need — three BASELINE rows
    // were documented as count-pruned (join_asof_fwd,
    // dedup_substring_apply, stats_analyze). Touch EVERY output column
    // with one codegen xxhash64 per row (maps → map_entries: hash over
    // MapType is rejected by Spark), summed so nothing short-circuits;
    // the count rides the same single pass.
    def materialize(df: org.apache.spark.sql.DataFrame): Long =
      BenchKit.materialize(df)
    // One-time persisted layouts (sorted/z-ordered copies, bloom +
    // SAI postings, IVF indexes, sketch tables, the BPE vocab,
    // pipeline shard trees) are NIGHTLY-JOB cost, not query cost: a
    // deployment builds them once and every query reads them. Charged
    // to whichever query the map ordering touched first, they made
    // pipeline_pretrain's driver line carry its whole dependency build
    // (VERDICT r10 weak #2). The prewarm pass calls exactly the
    // queries whose constructors build persisted artifacts — builds
    // are eager side effects of query CONSTRUCTION, so no result is
    // materialized — and reports its wall-clock separately as
    // prewarm_sec. SPARK_GRAFT_PREWARM=off restores first-touch
    // timing for comparison.
    val prewarmNames = Seq(
      "sink_sorted_stats", "sink_zorder", "sink_hilbert",
      "scan_manifest_pruned", "scan_bloom_pruned", "scan_bucket_pruned",
      "scan_sai", "scan_sai_contains", "scan_sai_contains_key",
      "scan_sai_ann", "scan_sai_range", "scan_sai_memtable",
      "backfill_partitioned", "join_dpp",
      "sim_topk_ivf", "sim_topk_ivf_pq", "sim_topk_pq_adc", "sim_index_delta",
      "sim_pq_delta",
      "dedup_delta", "dedup_delta_near", "dedup_cluster",
      "tokenize_bpe_frozen", "tokenize_bpe_bytes", "tokenize_bpe_bytes_frozen",
      "tokenize_wordpiece_frozen", "tokenize_unigram_frozen",
      "sim_topk_graph", "scan_sai_ann_memtable",
      "compact_ann_purge", "scan_sai_ann_tombstone", "stream_ann_memtable",
      "agg_sketch_merge", "agg_sketch_intersect", "agg_quantile_merge",
      "kmeans_fit", "sample_coreset", "embedding_pca",
      "compact_generations", "scan_snapshot", "batch_apply",
      "sink_shards", "text_quality_model", "pipeline_pretrain")
      .filter(SparkEntry.queries.contains)
    // Returns (wall seconds, failure count): a broken one-time layout
    // build must be visible in the JSON receipt, not just stderr —
    // every dependent timed query would otherwise carry the failure
    // accounting alone (ADVICE r11).
    def prewarm(dir: String): (Double, Int) = {
      if (sys.env.get("SPARK_GRAFT_PREWARM").contains("off")) return (0.0, 0)
      val t0 = System.nanoTime()
      var nFailed = 0
      prewarmNames.foreach { n =>
        try { SparkEntry.queries(n)(spark, dir); () }
        catch { case e: Throwable =>
          nFailed += 1
          System.err.println(s"[bench] prewarm $n failed: ${e.getMessage}") }
        finally spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      ((System.nanoTime() - t0) / 1e9, nFailed)
    }
    def runSuite(dir: String): Map[String, (Double, Long)] =
      selected.map { case (name, fn) =>
        // Label the query's jobs (guide §1.5) so UI/event-log analysis
        // can attribute stages to queries; zero-cost, thread-local.
        spark.sparkContext.setJobDescription(s"bench: $name @ $dir")
        val t0 = System.nanoTime()
        val n = try { materialize(fn(spark, dir)) } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1L
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // Release checkpoint/cache blocks a query may have pinned so
        // later queries aren't measured under accumulated memory load.
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        name -> (dt, n)
      }
    val benchStart = System.nanoTime()
    def sinceStart: Double = (System.nanoTime() - benchStart) / 1e9
    // Host-health canary (VERDICT r13 next #8): one stats_ks run BEFORE
    // the suite, recorded in the receipt itself, so the driver can
    // deflate epoch-scale host degradation (documented 2×–50× swings on
    // this VM) without trusting ledger prose. ~3.6 s at sf0.1 means a
    // quiet box; 2× that means a degraded epoch and the totals that
    // follow are inflated by the HOST, not the plans.
    // A FAILED canary records the -1.0 sentinel, not its elapsed time:
    // a fast-fail wall time is indistinguishable from a healthy
    // measurement and would let the driver deflate totals against a
    // bogus denominator (ADVICE r14).
    def timeCanary(): Double =
      if (SparkEntry.queries.contains("stats_ks")) {
        // Own label: canary jobs must not inherit the last suite
        // query's description in event logs (ADVICE r16).
        spark.sparkContext.setJobDescription("bench: canary stats_ks")
        val t0 = System.nanoTime()
        val ok = try {
          materialize(SparkEntry.queries("stats_ks")(spark, sfDir)); true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] canary failed: ${e.getMessage}")
          false
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        // clear the label so the next unlabeled phase (prewarm's
        // layout-build jobs) is not attributed to the canary
        spark.sparkContext.setJobDescription(null)
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      } else -1.0
    val canarySec: Double = if (args.isEmpty) timeCanary() else -1.0
    val (prewarmSec, prewarmFailed) =
      if (args.isEmpty) prewarm(sfDir) else (0.0, 0)
    val results0 = runSuite(sfDir)
    // Environmental-stall re-time (VERDICT r11 next #7): a single
    // transient GC/concurrent-load stall (q5_supplier recorded 112 s
    // for a 1.9 s plan in the r11 driver bench) must not dominate the
    // recorded total. Any line > 10× its same-config snapshot time AND
    // > 5 s absolute is re-run once; the re-timed value goes into the
    // per-query map and the original is reported alongside under
    // "stalled" so the anomaly stays visible. Snapshot = a previous
    // full-output bench JSON for the SAME sf dir (committed per round
    // as target/bench_snapshot.json; SPARK_GRAFT_BENCH_SNAPSHOT
    // overrides, missing file = pass-through).
    def snapshotTimes(dir: String): Map[String, Double] = {
      val path = sys.env.getOrElse("SPARK_GRAFT_BENCH_SNAPSHOT",
        "target/bench_snapshot.json")
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")
        // sf gate and the queries-block locator are whitespace-tolerant
        // (r17 measurement-bug fix, disclosed in OPTIMIZATION_r17.md):
        // the r16 snapshot was regenerated by a JSON library that emits
        // `"queries": {` with a space, the exact-substring indexOf found
        // nothing, and the stall gate silently DISABLED itself — the
        // driver's r16 receipt kept a 34.4 s fn_string host stall (25×
        // its 1.36 s snapshot line) that the gate exists to re-time.
        val sfGate = ("\"sf\"\\s*:\\s*\"" + java.util.regex.Pattern.quote(dir) + "\"").r
        if (sfGate.findFirstIn(txt).isEmpty) return Map.empty
        val qm = "\"queries\"\\s*:\\s*\\{".r.findFirstMatchIn(txt)
        if (qm.isEmpty) return Map.empty
        val body = txt.substring(qm.get.end, txt.indexOf('}', qm.get.end))
        // Anchor the parse to the writer's exact format ("name":num per
        // entry) instead of naive split-on-','/':' — a snapshot with
        // nested values or a ':' inside a name would silently yield a
        // wrong map (ADVICE r12), and SPARK_GRAFT_BENCH_SNAPSHOT admits
        // arbitrary files. A body containing '{' is not ours: warn and
        // pass through (stall gate disabled, never mis-keyed).
        if (body.contains('{')) {
          System.err.println(s"[bench] snapshot $path queries block has " +
            "nested values - not this writer's format, ignoring snapshot")
          return Map.empty
        }
        // exponent part accepted: a foreign JSON writer may emit
        // doubles as 1.36E1/6.3e-05, and a mantissa-only parse would
        // yield a silently WRONG map (1.36 for 13.6) — worse than the
        // disabled-gate failure the whitespace fix addressed
        val entry =
          """"([^"]+)"\s*:\s*(-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)""".r
        entry.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    }
    val snap = if (args.isEmpty) snapshotTimes(sfDir) else Map.empty[String, Double]
    // Gate thresholds (r17, disclosed in OPTIMIZATION_r17.md): 10× →
    // 4× and 5 s → 2.5 s. The r16 driver receipt carried ~7 lines at
    // 4–7× their quiet snapshot (stats_mannwhitney 10.2 s vs 2.5,
    // stats_ttest 4.7 vs 1.0, sft_render 3.6 vs 0.7, …) — ~50 s of
    // transient host-epoch tax on UNTOUCHED code that the old gate was
    // blind to; only the 25× fn_string line crossed 10×. 4× sits far
    // outside the measured ±20–50 % same-code wobble once the 2.5 s
    // absolute floor filters the sub-second lines, and a re-time costs
    // only the line's true time. The originals stay visible under
    // "stalled" either way.
    val stalled: Map[String, Double] = results0.collect {
      case (name, (t, n)) if n >= 0 && t > 2.5 &&
        snap.get(name).exists(s => s > 0 && t > 4 * s) => name -> t
    }
    def f3(x: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    def qsJson(rs: Map[String, (Double, Long)]): String = rs
      .map { case (k, (v, _)) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val canaryPart = if (canarySec >= 0) s""","canary_sec":${f3(canarySec)}""" else ""
    // Partial receipt (VERDICT r13 "What's wrong" #2): round 13's
    // driver bench died at rc=124 mid re-time pass with ZERO parseable
    // output — the metric line only printed after sf0.1 + re-times +
    // the full ×10 chain. Flush the sf0.1 metric line (with the full
    // per-query map) the moment the primary suite finishes, BEFORE the
    // re-time pass and the ×10 chain: if the driver timeout kills the
    // process later, this is the last line and it parses. On a clean
    // exit the final full/brief lines below supersede it under the
    // last-line protocol; "partial":true keeps the two states
    // distinguishable in scrollback.
    if (args.isEmpty) {
      val t0 = results0.values.map(_._1).sum
      val f0 = results0.values.count(_._2 < 0)
      println(s"""{"metric":"total","value":$t0,"unit":"sec","failed":$f0,"queries":${qsJson(results0)},"prewarm_sec":${f3(prewarmSec)},"prewarm_failed":$prewarmFailed$canaryPart,"partial":true,"sf":"$sfDir"}""")
      Console.flush()
    }
    // Re-time budget cap (VERDICT r13 "What's wrong" #2b): the stall
    // gate exists for ISOLATED transient stalls (one GC pause, one
    // contending process). When many lines stall simultaneously the
    // problem is the host epoch, not the queries — re-timing them all
    // just doubles the overrun on a box that will mis-time the re-runs
    // too (r13: 7+ re-times fired, then rc=124). Keep the originals,
    // record the degradation, and let the canary field tell the story.
    // Cap 3 → 8 with the 4× threshold (r17): a bursty-contention epoch
    // legitimately trips several mid-size lines at once (the r16 driver
    // run had exactly 8), and 8 re-times bound the added wall clock at
    // roughly one minute. Past the cap the budget goes to the WORST
    // lines by stall ratio instead of skipping all re-times (r17): the
    // all-or-nothing skip reverted to uncorrected totals precisely on
    // the moderately-degraded epochs the gate exists for, while the
    // wall-clock risk the r13 skip protected against is already
    // covered by the partial-receipt flush above (the primary totals
    // are on stdout before any re-time runs).
    val stallCap = 8
    if (stalled.size > stallCap)
      System.err.println(s"[bench] ${stalled.size} lines stalled (cap $stallCap) - " +
        s"re-timing only the $stallCap worst by ratio, keeping the rest")
    val toRetime = stalled.toSeq
      .sortBy { case (name, t) => -t / snap(name) }
      .take(stallCap).map(_._1)
    val results = results0 ++ toRetime.flatMap { name =>
      System.err.println(s"[bench] re-timing stalled line $name " +
        s"(${results0(name)._1} s vs snapshot ${snap(name)} s)")
      spark.sparkContext.setJobDescription(s"bench: re-time $name @ $sfDir")
      val t0 = System.nanoTime()
      val n = try { materialize(SparkEntry.queries(name)(spark, sfDir)) }
        catch { case _: Throwable => -1L }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // A failed re-run must not replace a SUCCESSFUL original
      // measurement (ADVICE r12): keep the original (t, n) and only
      // note the failed attempt on stderr; "stalled" already carries
      // the original time either way.
      if (n < 0 && results0(name)._2 >= 0) {
        System.err.println(s"[bench] re-time of $name failed; keeping original line")
        None
      } else Some(name -> ((System.nanoTime() - t0) / 1e9, n))
    }
    // clear the last re-time label before the x10 chain's prewarm
    spark.sparkContext.setJobDescription(null)
    // Second total at the ×10 fixture (VERDICT r4 #7 / r6 #5): the 2×
    // budget at sf0.1 no longer discriminates — the scale-up ratio is
    // the number that does. Gated on the dir existing (ScaleGen writes
    // it; see BASELINE.md) and on a full-suite run; SPARK_GRAFT_X10_DIR
    // overrides, "none" disables.
    val x10Dir = sys.env.getOrElse("SPARK_GRAFT_X10_DIR", "/tmp/graft_scale/sf1")
    // Wall-clock budget (VERDICT r13 next #2): SPARK_GRAFT_BENCH_BUDGET_SEC
    // caps the whole run. The ×10 chain historically costs ~1.6–2.4×
    // the sf0.1 chain, so skip it when the projected finish would blow
    // the budget — a receipt missing x10_total_sec is degraded; a
    // receipt the driver's timeout zeroed entirely is useless.
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_SEC")
      .flatMap(v => scala.util.Try(v.toDouble).toOption)
    val x10Projected = 2.5 * sinceStart
    val x10OverBudget = budgetSec.exists(b => sinceStart + x10Projected > b)
    if (x10OverBudget)
      System.err.println(s"[bench] skipping x10 suite: ${f3(sinceStart)} s elapsed + " +
        s"~${f3(x10Projected)} s projected exceeds budget ${budgetSec.get} s")
    val x10Results =
      if (args.isEmpty && x10Dir != "none" && !x10OverBudget &&
          new java.io.File(s"$x10Dir/lineitem.parquet").exists()) {
        System.err.println(s"[bench] running x10 suite at $x10Dir")
        Some((prewarm(x10Dir), runSuite(x10Dir)))
      } else None
    // End-of-suite canary (VERDICT r14 next #8): a SECOND stats_ks
    // run at the same fixture after the last timed line, so epoch
    // drift WITHIN a run is measurable — canary_sec ≈ canary_end_sec
    // means the receipt's lines share one host epoch and per-line
    // deflation against either is defensible; a large gap means the
    // epoch changed mid-run and the totals straddle it.
    val canaryEndSec: Double = if (args.isEmpty) timeCanary() else -1.0
    val canaryEndPart =
      if (canaryEndSec >= 0) s""","canary_end_sec":${f3(canaryEndSec)}""" else ""
    // Locale.ROOT (via f3): the f-interpolator honors the JVM default
    // locale, and a comma-decimal locale would corrupt the JSON
    val qs = qsJson(results)
    // Output rows per query, for output-normalized scale-up analysis
    // (time/row separates output-driven growth from plan growth).
    // Env-gated and printed BEFORE the metric lines so the driver's
    // last-line/regex protocol is unaffected.
    if (sys.env.contains("SPARK_GRAFT_EMIT_ROWS")) {
      val rows = results
        .map { case (k, (_, n)) => s"\"" + k + "\":" + n }
        .mkString("{", ",", "}")
      println(s"""{"metric":"rows","rows":$rows,"sf":"$sfDir"}""")
    }
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    // Both totals ride the one metric line: x10_total_sec is additive
    // JSON (last-line/regex parsers that only read metric/value/queries
    // are unaffected).
    // Failure counts ride the metric lines: a failed query records its
    // time-to-failure (n = -1), and a total silently summing those
    // would report a misleadingly GOOD scale-up ratio — the one number
    // the x10 suite exists to measure. Zero means every query returned.
    val failed = results.values.count(_._2 < 0)
    // Declared output-driven DEMOS reported under their own subtotal
    // (VERDICT r15 next #6): sim_threshold_lsh's τ=0.35 exploration
    // face is candidate-volume-driven BY DESIGN (the τ=0.8 sibling is
    // the production face) and alone was 20.5% of the r15 ×100 total,
    // drowning the scale-up signal. demo_total_sec/core_total_sec make
    // every receipt readable without a one-query asterisk; additive
    // JSON, last-line parsers unaffected.
    val demoNames = Set("sim_threshold_lsh")
    def demoPartOf(r: Map[String, (Double, Long)], prefix: String): String = {
      val demo = r.filter { case (k, _) => demoNames(k) }
      if (demo.isEmpty) ""
      else {
        val d = demo.values.map(_._1).sum
        val core = r.values.map(_._1).sum - d
        s""","${prefix}demo_total_sec":${f3(d)},"${prefix}core_total_sec":${f3(core)}"""
      }
    }
    val x10Part = x10Results.map { case ((pw, pwF), r) =>
      val t = f3(r.values.map(_._1).sum)
      val x10Failed = r.values.count(_._2 < 0)
      s""","x10_total_sec":$t,"x10_failed":$x10Failed,"x10_prewarm_sec":${f3(pw)},"x10_prewarm_failed":$pwF,"x10_dir":"$x10Dir"""" +
        demoPartOf(r, "x10_")
    }.getOrElse("")
    val pwPart =
      s""","prewarm_sec":${f3(prewarmSec)},"prewarm_failed":$prewarmFailed"""
    // Stalled lines: original (pre-re-time) seconds, so the anomaly is
    // in the ledger even though the map carries the re-timed value.
    val stalledPart = {
      val body =
        if (stalled.isEmpty) ""
        else stalled.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
          .mkString(""","stalled":{""", ",", "}")
      // stall_epoch: true = more lines stalled than the re-time cap,
      // so SOME per-query entries carry their ORIGINAL (degraded-host)
      // times — only the worst `stallCap` by ratio were re-timed.
      body + (if (stalled.size > stallCap) s""","stall_epoch":true""" else "")
    }
    // Stable-core subtotal (VERDICT r11 next #8): the subtotal over
    // queries present in BOTH this run and the snapshot separates gate
    // drift caused by new-operator mix from real regressions on the
    // stable core.
    val overlapPart = {
      val ov = results.filter { case (k, _) => snap.contains(k) }
      if (ov.isEmpty) ""
      else s""","overlap_total_sec":${f3(ov.values.map(_._1).sum)},"overlap_n":${ov.size},"overlap_snapshot_sec":${f3(ov.keys.map(snap).sum)}"""
    }
    val demoPart = demoPartOf(results, "")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs$pwPart$canaryPart$canaryEndPart$stalledPart$overlapPart$demoPart$x10Part,"sf":"$sfDir"}"""
    val brief =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"n_queries":${results.size}$pwPart$canaryPart$canaryEndPart$stalledPart$overlapPart$demoPart$x10Part,"sf":"$sfDir"}"""
    try {
      val p = java.nio.file.Paths.get("target/bench_last.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, full.getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    println(full)
    println(brief)
    spark.stop()
  }
}
