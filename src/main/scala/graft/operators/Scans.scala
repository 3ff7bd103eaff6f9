package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scans, sources, sinks (SURVEY.md §2.A).
  *
  * Cassandra's read paths map onto parquet scans: a partition-key
  * point read becomes a pushed-down equality filter (parquet row-group
  * + page pruning stand in for the partitioner's hash lookup), a
  * clustering-range read becomes a pushed range filter + sort, and the
  * token-range scan that the wide-column store uses to parallelize
  * full scans becomes a deterministic hash-bucket filter.
  *
  * Scale: every filter here reaches the parquet reader as a
  * PushedFilter (verified via explain in ScanSpec), so a 100 TB scan
  * touches only matching row groups; no operator collects to the
  * driver.
  */
object Scans extends QueryGroup {

  /** Full-row total order for lineitem outputs: (l_orderkey,
    * l_linenumber) is NOT unique in the synthetic fixture (measured:
    * 11 785 tied pairs at sf0.01), and rows tied on a partial sort key
    * would be ordered by engine-internal sort stability — a silent
    * cross-engine hash-compare hazard. Sorting on every output column
    * makes any remaining ties identical rows, where order cannot
    * matter. Oracles mirror the same ORDER BY list. */
  private val lineitemOrder = Seq(
    "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate").map(col)
  private[operators] val lineitemOrderSql =
    "l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, " +
      "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"

  /** Full-table scan, the CQL `SELECT *` / connector token sweep. */
  def scanFull(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).orderBy(lineitemOrder: _*)

  /** Partition-key point read — THE Cassandra read path. */
  def scanPartitionLookup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") === 42L)
      .orderBy(lineitemOrder: _*)

  /** PK equality + clustering-column range, rows in clustering order. */
  def scanClusteringRange(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") === 7L && col("l_linenumber") > 1)
      .orderBy(lineitemOrder: _*)

  /** Multi-partition `WHERE pk IN (…)` read. */
  def scanPkIn(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey").isin(1L, 7L, 42L, 99L, 123L))
      .orderBy("o_orderkey")

  /** Token-range scan: how the wide-column store shards a full scan.
    * `WHERE token(pk) > a AND token(pk) <= b` over the REAL
    * Murmur3Partitioner token ([[graft.plans.CassTokenExpr]],
    * SURVEY.md §2.A — round 6 upgrade from the xxhash64 stand-in), so
    * the selected keys are exactly the keys a Cassandra node owning
    * (a, b] would serve. The bounds carve 1/16 of the ring; DuckDB
    * has no murmur3-128, so the oracle applies the same slice
    * predicate to the persisted token relation ([[Ring.tokenPath]],
    * hash-exact since r15; Murmur3Spec anchors the hash itself
    * against Guava's canonical murmur3_128). */
  def scanTokenRange(s: SparkSession, dir: String): DataFrame = {
    val tok = graft.plans.CassTokenExpr.token(col("o_orderkey"))
    val span = Long.MaxValue >> 3 // 2^60 = one sixteenth of the ring
    Tables.orders(s, dir)
      .filter(tok > lit(0L) && tok <= lit(span))
      .orderBy("o_orderkey")
  }

  /** Keyset pagination — CQL's paging-state contract: each page is
    * `WHERE pk > <last key of previous page> ORDER BY pk LIMIT n`.
    * Never OFFSET: the filter is pushed to the scan and the limit
    * compiles to TakeOrderedAndProject, so page N costs the same as
    * page 1 at 100 TB. */
  def scanPaging(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") > 400L) // paging state from the previous page
      .orderBy("o_orderkey")
      .limit(200)

  /** CQL `PER PARTITION LIMIT k` composed with driver paging — the
    * "newest k rows per partition, one page at a time" read every
    * wide-column inbox/timeline runs: resume past the paging state
    * (the previous page fully consumed partitions ≤ 150), take the
    * newest 2 clustering rows per partition, emit one 200-row page in
    * (partition, rank) order.
    *
    * Scale shape: the paging-state predicate pushes to the scan
    * (partition pruning at the storage layer), the per-partition cap
    * rides Spark's WindowGroupLimit rewrite (each task forwards ≤2
    * rows per partition key — the shuffle carries capped groups, not
    * partitions' full history), and the page LIMIT compiles to
    * TakeOrderedAndProject (no global sort materializes). PlanSpec
    * pins all three. */
  def scanPagingPplimit(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, dir)
      .filter(col("o_custkey") > 150L) // paging state: partitions ≤150 done
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .orderBy("o_custkey", "rn")
      .limit(200)
      .select("o_custkey", "o_orderkey", "o_orderdate", "rn")
  }

  /** Sparse-column schema evolution — CQL `ALTER TABLE ADD`: rows
    * written before the column existed read back as null. Two file
    * generations with different schemas are merged at read
    * (mergeSchema), the columnar twin of Cassandra's per-cell sparse
    * rows. */
  def scanSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val path = graft.core.RunId.scratch("evolution/orders")
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$path/v1")
    o.filter(col("o_orderkey") % 2 === 1)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$path/v2")
    s.read.option("mergeSchema", "true").parquet(s"$path/v1", s"$path/v2")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** ORC source/sink round-trip — the other columnar interchange
    * format Spark ships natively (predicate pushdown, column pruning
    * and vectorized reads work the same as parquet). Lossless for the
    * full row including the timestamp: the oracle reads the ORIGINAL
    * parquet table, so any encode/decode drift would hash-mismatch. */
  def sourceOrc(s: SparkSession, dir: String): DataFrame = {
    val path = graft.core.RunId.scratch("io/events_orc")
    Tables.events(s, dir)
      .select("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").orc(path)
    s.read.orc(path)
      .orderBy("event_id")
  }

  /** CSV source/sink round-trip (the CQL COPY TO/FROM surface): write
    * typed rows as CSV, read back under an explicit schema — never
    * inferSchema, which would re-scan the data and guess. Doubles
    * round-trip exactly (Spark writes shortest-round-trip decimal
    * strings). */
  def sourceCsv(s: SparkSession, dir: String): DataFrame = {
    val path = graft.core.RunId.scratch("io/events_csv")
    Tables.events(s, dir)
      .select("event_id", "user_id", "event_type", "value")
      .write.mode("overwrite").option("header", "true").csv(path)
    s.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("header", "true").csv(path)
      .orderBy("event_id")
  }

  /** JSON-lines source/sink round-trip; the stored `props` column is
    * itself a JSON string, so the write escapes it and the read must
    * recover it byte-identically for the oracle to hash-match. */
  def sourceJson(s: SparkSession, dir: String): DataFrame = {
    val path = graft.core.RunId.scratch("io/events_json")
    Tables.events(s, dir)
      .select("event_id", "event_type", "props")
      .write.mode("overwrite").json(path)
    s.read
      .schema("event_id BIGINT, event_type STRING, props STRING")
      .json(path)
      .withColumn("k_value", get_json_object(col("props"), "$.k").cast("int"))
      .orderBy("event_id")
  }

  /** Per-(JVM, dir) path of the sorted-layout lineitem table — written
    * once per run (dirs are immutable for a run's lifetime, same
    * contract as the IVF index and dedup_cluster labels) and shared by
    * [[sinkSortedStats]] and PlanSpec's row-group-skip measurement.
    * Layout: range-partitioned then sorted on (l_shipdate,
    * l_orderkey), written with 64 KiB parquet row groups so each file
    * holds many groups with TIGHT min/max stats on the sort key — the
    * z-order-lite / clustering-key locality layout. At 100 TB this is
    * the lever after partition and bucket pruning: a date-range scan
    * touches only the row groups whose stats intersect the range,
    * turning a full-file read into a few pages per file. */
  private val sortedLineitemPaths =
    new graft.core.BuildOnce[String, String]
  private[graft] def sortedLineitemPath(s: SparkSession, dir: String): String =
    sortedLineitemPaths.getOrElseUpdate(dir, {
      val path = graft.core.RunId.scratchKeyed("sorted/lineitem", dir)
      // The sort key is stored as DATE, not TIMESTAMP_NTZ: lineitem
      // shipdates are date-grained, and (measured, Spark 4.1) NTZ
      // predicates are LISTED in PushedFilters but never converted to
      // parquet FilterPredicates — row-group stats go unused and every
      // group decodes. DATE predicates convert, so the layout's whole
      // point (stat-based skipping) actually engages.
      // 8 MiB row groups (not the 128 MiB default, not the 64 KiB of
      // the first cut): small SFs land one group per range-partitioned
      // file — skipping then happens at FILE granularity via the same
      // min/max stats — while ×100's 60 M rows get ~30 groups per file
      // for intra-file skipping. The 64 KiB first cut made the ×100
      // write grind through ~100k tiny groups (48.7 s → measured
      // 12.7× scale ratio driven by the write, not the read).
      Tables.lineitem(s, dir)
        .withColumn("l_shipdate", col("l_shipdate").cast("date"))
        .repartitionByRange(8, col("l_shipdate"), col("l_orderkey"))
        .sortWithinPartitions("l_shipdate", "l_orderkey")
        .write.mode("overwrite")
        .option("parquet.block.size", 8 * 1024 * 1024)
        .parquet(path)
      path
    })

  /** Z-ORDER layout — the 2-D upgrade over [[sortedLineitemPath]]'s
    * linear sort: a lexicographic (date, key) sort only prunes on the
    * LEADING column; interleaving the bits of both dimensions into a
    * Morton code and range-partitioning + sorting on it gives every
    * file/row-group a bounded rectangle in (date, key) space, so
    * min/max stats prune on EITHER predicate alone. 12 bits per
    * dimension: date = days since 1995-01-01 (fixture span ≈2500
    * fits), key = l_orderkey scaled into 4096 buckets by its max (one
    * bounded agg at build time). Pure long bit-ops ⇒ whole-stage
    * codegen; build cached per (JVM, dir) like the other layouts. */
  private val zorderLineitemPaths =
    new graft.core.BuildOnce[String, String]
  private[graft] def zorderLineitemPath(s: SparkSession, dir: String): String =
    zorderLineitemPaths.getOrElseUpdate(dir, {
      val path = graft.core.RunId.scratchKeyed("zorder/lineitem", dir)
      val base = Tables.lineitem(s, dir)
        .withColumn("l_shipdate", col("l_shipdate").cast("date"))
      // BOTH dimensions scale into the full 12-bit space by their max:
      // raw day ordinals (0..~2500 of 4096) leave the top date bits
      // skewed, the range partitioner's equal-frequency cuts then stop
      // aligning with bit boundaries, and the rectangles degrade
      // (measured: a 25% date slice decoded ~50% unscaled vs ~25% scaled).
      // epoch = min(l_shipdate) from the same bounded agg, so d ≥ 0 by
      // construction — a fixed epoch would sign-extend into every
      // interleaved bit (one max-Morton rectangle) if the fixture's
      // date floor ever moved below it
      val (maxKey, epoch, maxD) = {
        val r = base.agg(max("l_orderkey"), min("l_shipdate"),
          max("l_shipdate")).head()
        val lo = r.getDate(1).toLocalDate
        (r.getLong(0), lo.toString, r.getDate(2).toLocalDate.toEpochDay - lo.toEpochDay)
      }
      val d = floor(datediff(col("l_shipdate"), lit(epoch)) *
        4096L / (maxD + 1)).cast("long")
      val ob = floor(col("l_orderkey") * 4096L / (maxKey + 1)).cast("long")
      val morton = (0 until 12).map { i =>
        shiftleft(shiftright(d, i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(shiftleft(shiftright(ob, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }.reduce(_ bitwiseOR _)
      base.withColumn("_z", morton)
        .repartitionByRange(16, col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("parquet.block.size", 8 * 1024 * 1024)
        .parquet(path)
      path
    })

  /** Hilbert index at `order` bits per dimension — the
    * locality-better alternative to the Morton interleave (every step
    * along the curve moves one cell, so a sort range maps to one
    * contiguous rectangle run instead of Morton's seam jumps).
    * Delegates to the codegen'd [[graft.plans.HilbertExpr]]: the
    * stateful xy2d rotation has no bounded Column form (an unrolled
    * when()-chain grows ~3^order nodes), so it joins cass_token and
    * the dot product in the native-Expression tier. */
  private[graft] def hilbertCol(x0: Column, y0: Column, order: Int): Column =
    graft.plans.HilbertExpr.hilbert(x0, y0, order)

  /** lineitem clustered along the 12+12-bit HILBERT curve over
    * (shipdate, orderkey) — same scaled dimensions, same row-group
    * budget as the Morton layout, so the PlanSpec skip measurement
    * compares the two curves directly. */
  private val hilbertLineitemPaths =
    new graft.core.BuildOnce[String, String]
  private[graft] def hilbertLineitemPath(s: SparkSession, dir: String): String =
    hilbertLineitemPaths.getOrElseUpdate(dir, {
      val path = graft.core.RunId.scratchKeyed("hilbert/lineitem", dir)
      val base = Tables.lineitem(s, dir)
        .withColumn("l_shipdate", col("l_shipdate").cast("date"))
      val (maxKey, epoch, maxD) = {
        val r = base.agg(max("l_orderkey"), min("l_shipdate"),
          max("l_shipdate")).head()
        val lo = r.getDate(1).toLocalDate
        (r.getLong(0), lo.toString, r.getDate(2).toLocalDate.toEpochDay - lo.toEpochDay)
      }
      val d = floor(datediff(col("l_shipdate"), lit(epoch)) *
        4096L / (maxD + 1)).cast("long")
      val ob = floor(col("l_orderkey") * 4096L / (maxKey + 1)).cast("long")
      base.withColumn("_h", hilbertCol(d, ob, 12))
        .repartitionByRange(16, col("_h"))
        .sortWithinPartitions("_h")
        .drop("_h")
        .write.mode("overwrite")
        .option("parquet.block.size", 8 * 1024 * 1024)
        .parquet(path)
      path
    })

  /** Manifest (file-level zone map) for the range-clustered lineitem
    * copy — the Iceberg/Delta pattern one level ABOVE the parquet
    * row-group stats the sorted/z-order layouts exploit: a tiny
    * side table with one row per data file carrying the file's
    * min/max of the cluster key. Planning reads the manifest (file
    * count, not data, rows), selects only overlapping files, and the
    * scan never OPENS the rest — at 100 TB that's the difference
    * between listing a million footers and reading one manifest.
    * The data layout is [[sortedLineitemPath]]'s range-clustered copy
    * reused verbatim — same files, one extra bounded aggregate
    * (`_metadata.file_path` groupBy: #files rows) for the manifest.
    * Driver-side state is the SELECTED file list only (bounded by the
    * file count; a petabyte deployment makes planning hierarchical —
    * manifest-of-manifests — before this collect ever grows). */
  private val manifestLineitemPaths =
    new graft.core.BuildOnce[String, String]
  private[graft] def manifestLineitemPath(s: SparkSession, dir: String): String =
    manifestLineitemPaths.getOrElseUpdate(dir, {
      val mf = graft.core.RunId.scratchKeyed("manifest/lineitem_files", dir)
      s.read.parquet(sortedLineitemPath(s, dir))
        .groupBy(col("_metadata.file_path").as("path"))
        .agg(min("l_shipdate").as("min_sd"), max("l_shipdate").as("max_sd"))
        .coalesce(1)
        .write.mode("overwrite").parquet(mf)
      mf
    })

  /** Files of the clustered copy whose [min,max] zone intersects
    * [lo, hi) — the planning step, shared with PlanSpec's
    * strict-subset assertion. Returns (selected paths, total files). */
  private[graft] def manifestSelect(
      s: SparkSession, dir: String, lo: String, hi: String): (Seq[String], Long) = {
    val mf = s.read.parquet(manifestLineitemPath(s, dir))
    val selected = mf
      .filter(col("max_sd") >= lit(lo).cast("date") && col("min_sd") < lit(hi).cast("date"))
      .select("path").collect().map(_.getString(0)).toSeq
    (selected, mf.count())
  }

  /** Date-range aggregate planned THROUGH the manifest: only files
    * whose zone intersects the predicate are opened; the residual
    * filter still runs (zones overlap range edges). Layout + manifest
    * are output-invisible ⇒ oracle runs the same aggregate on the
    * original table (the sink_sorted_stats discipline). */
  def scanManifestPruned(s: SparkSession, dir: String): DataFrame = {
    val (lo, hi) = ("1996-09-01", "1996-12-01")
    val (files, _) = manifestSelect(s, dir, lo, hi)
    s.read.parquet(files: _*)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_items"),
        graft.core.Num.dsum(col("l_quantity")).as("sum_qty"),
        graft.core.Num.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** SSTable bloom-filter skip — the OTHER half of Cassandra's file-
    * pruning story. Zone maps ([[scanManifestPruned]]) prune RANGE
    * predicates on the cluster key; they are useless for a point read
    * on a key that is HASH-scattered across generations (every file's
    * [min,max] spans the whole domain). Cassandra's answer is a bloom
    * filter per sstable over the partition keys, consulted BEFORE the
    * file is opened: a point read touches the one generation that
    * holds the key (plus a bounded false-positive tail) instead of
    * every file. Here: events split into 8 hash-assigned generations
    * (a flush history — min/max prunes nothing by construction), one
    * 2-hash 2^17-bit bloom per generation kept as bit-position sets in
    * a manifest. Bloom size follows Cassandra's sizing rule — bits ∝
    * distinct keys per sstable (~10 bits/key), NOT corpus bytes — and
    * the manifest stays file-count rows. False positives cost one
    * extra file read and are corrected by the residual filter, never
    * visible in results. */
  private val BloomBits = 131072L
  private val BloomGens = 8L
  /** Hex-slice layout shared by the Column-side hashes and the
    * driver-side probe mirror — ONE definition, so an offset/width/
    * modulus edit cannot drift between the two and silently prune the
    * true generation. (start0 is 0-based; the SQL substring is
    * 1-based, derived here.) */
  private val BloomSlices: Seq[(Int, Int, Long)] = Seq(
    (0, 5, BloomBits), (5, 5, BloomBits), (10, 2, BloomGens))
  private def bloomHashCols(c: Column): Seq[Column] = {
    val m = md5(c.cast("string"))
    BloomSlices.map { case (start0, width, mod) =>
      pmod(conv(substring(m, start0 + 1, width), 16, 10).cast("long"), lit(mod))
    }
  }
  private def bloomHashKey(key: Long): Seq[Long] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    BloomSlices.map { case (start0, width, mod) =>
      java.lang.Long.parseLong(hex.substring(start0, start0 + width), 16) % mod
    }
  }
  private val bloomEventsPaths =
    new graft.core.BuildOnce[String, (String, String)]
  private[graft] def bloomEventsPath(
      s: SparkSession, dir: String): (String, String) =
    bloomEventsPaths.getOrElseUpdate(dir, {
      val root = graft.core.RunId.scratchKeyed("bloom/events_gen", dir)
      val mf = graft.core.RunId.scratchKeyed("bloom/events_manifest", dir)
      val Seq(h1, h2, g) = bloomHashCols(col("event_id"))
      val base = Tables.events(s, dir).withColumn("_gen", g)
      base.write.mode("overwrite").partitionBy("_gen").parquet(root)
      base.select(col("_gen"), explode(array(h1, h2)).as("p"))
        .groupBy("_gen").agg(collect_set("p").as("bits"))
        .coalesce(1).write.mode("overwrite").parquet(mf)
      (root, mf)
    })

  /** Generations whose bloom contains BOTH hash positions of `key` —
    * the planning step, shared with PlanSpec's strict-subset
    * assertion. Returns (selected generation ids, total files). */
  private[graft] def bloomSelect(
      s: SparkSession, dir: String, key: Long): (Seq[Long], Long) = {
    val (_, mf) = bloomEventsPath(s, dir)
    val Seq(k1, k2, _) = bloomHashKey(key)
    val m = s.read.parquet(mf)
    val sel = m
      .filter(array_contains(col("bits"), k1) && array_contains(col("bits"), k2))
      .select("_gen").collect().map(_.getLong(0)).toSeq
    (sel, m.count())
  }

  /** Point read planned THROUGH the per-generation blooms: only
    * generations whose bloom matches are opened; the residual equality
    * filter still runs (false positives). Layout + bloom are
    * output-invisible ⇒ oracle runs the same point read on the
    * original table. */
  def scanBloomPruned(s: SparkSession, dir: String): DataFrame = {
    val key = 777L
    val (root, _) = bloomEventsPath(s, dir)
    val (gens, _) = bloomSelect(s, dir, key)
    // Every bloom can answer "definitely absent" — the normal negative
    // lookup. A zero-path parquet read would throw on schema
    // inference; a constant-false filter folds to an empty
    // LocalRelation with the right schema and zero I/O.
    val src =
      if (gens.isEmpty) Tables.events(s, dir).filter(lit(false))
      else s.read.parquet(gens.map(g => s"$root/_gen=$g"): _*)
    src
      .filter(col("event_id") === key)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  /** Storage-Attached Index (Cassandra 5 SAI) — the index family the
    * bloom/zone-map pair cannot cover: predicates on NON-key columns
    * of an sstable the data is not sorted by. SAI keeps, PER SSTABLE,
    * one postings structure per indexed column (term → row ids); a
    * query with several indexed predicates INTERSECTS the postings
    * lists and materializes only the surviving row ids — it never
    * scans sstable rows, and sstables with an empty intersection are
    * never opened. Model: events in 8 hash generations (the flush
    * history — same substrate as [[scanBloomPruned]], built separately
    * so the two layouts stay independent), two postings tables
    * (user_id and the props "k" value — the 2i column and a JSON-path
    * index, both real SAI targets). The probe filters each postings
    * table (filters push to the postings scan; at 100 TB the postings
    * are additionally partitioned by term so a probe lists one value
    * partition), equi-joins them on (generation, row id) — the AND of
    * the two predicates — then fetches full rows only from
    * generations holding candidates. Residual re-verify keeps the
    * result correct even if an index were stale. Driver state: the
    * candidate GENERATION list (≤ the sstable count), never row ids. */
  private val SaiGens = 8L
  private def saiK(c: Column): Column =
    regexp_extract(c, "\"k\": ([0-9]+)", 1).cast("int")
  private val saiEventsPaths =
    new graft.core.BuildOnce[String, String]
  private[graft] def saiEventsPath(s: SparkSession, dir: String): String =
    saiEventsPaths.getOrElseUpdate(dir, {
      val root = graft.core.RunId.scratchKeyed("sai/events", dir)
      val base = Tables.events(s, dir)
        .withColumn("_gen", pmod(xxhash64(col("event_id")), lit(SaiGens)))
      base.write.mode("overwrite").partitionBy("_gen").parquet(s"$root/data")
      base.select(col("_gen"), col("user_id"), col("event_id"))
        .write.mode("overwrite").parquet(s"$root/idx_user")
      base.select(col("_gen"), saiK(col("props")).as("k"), col("event_id"))
        .write.mode("overwrite").parquet(s"$root/idx_k")
      root
    })

  /** Postings intersection for `user_id = user AND k ∈ [kLo, kHi]` —
    * the planning step, shared with PlanSpec's subset assertion.
    * Returns (candidate (gen, event_id) rows, generations holding at
    * least one candidate). */
  /** Pin a candidate relation and read off its generation list: the
    * postings join is pinned BEFORE the planning collect, so the
    * fetch's broadcast id set reuses the same execution instead of
    * re-reading both postings tables (2× index I/O per probe
    * otherwise). */
  private def saiCandGens(cand: DataFrame): (DataFrame, Seq[Long]) = {
    val pinned = cand.localCheckpoint()
    val gens = pinned.select("_gen").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    (pinned, gens)
  }

  private[graft] def saiSelect(
      s: SparkSession, dir: String,
      user: Long, kLo: Int, kHi: Int): (DataFrame, Seq[Long]) = {
    val root = saiEventsPath(s, dir)
    val u = s.read.parquet(s"$root/idx_user")
      .filter(col("user_id") === user).select("_gen", "event_id")
    val k = s.read.parquet(s"$root/idx_k")
      .filter(col("k").between(kLo, kHi)).select("_gen", "event_id")
    saiCandGens(u.join(k, Seq("_gen", "event_id")))
  }

  /** Size gate for the SAI candidate-id fetch (VERDICT r10 weak #1):
    * SAI probes are selective by use, but the candidate set is bounded
    * only by MATCHING ROWS — an unselective term (hot user, wide
    * k-range, a popular word) at 100 TB would ship an unbounded
    * broadcast to every executor and OOM the driver first. Below the
    * gate: broadcast semi-join (no shuffle of the fetched rows). At or
    * above: shuffle-hash left-semi — both sides exchange on the id,
    * and the fetched side is already generation-pruned, so the shuffle
    * is candidate-generation-sized, never corpus-sized. `pinned` is
    * localCheckpoint-ed by [[saiCandGens]], so the gating count reads
    * materialized blocks, not a postings-join recompute. PlanSpec
    * exercises both branches through the threshold override. */
  private val SaiBroadcastMax = 1000000L
  private[graft] def gatedSemiJoin(src: DataFrame, pinned: DataFrame,
      idCol: String, broadcastMax: Long = SaiBroadcastMax): DataFrame = {
    val ids = pinned.select(idCol)
    if (pinned.count() < broadcastMax)
      src.join(broadcast(ids), Seq(idCol), "left_semi")
    else
      src.join(ids.hint("shuffle_hash"), Seq(idCol), "left_semi")
  }

  /** Fetch tail shared by the AND and OR probes: open only the
    * candidate generations, size-gated semi-join on the pinned id set,
    * residual re-verify, fixed output shape. */
  private def saiFetch(
      s: SparkSession, dir: String,
      pinned: DataFrame, gens: Seq[Long], residual: Column): DataFrame = {
    val root = saiEventsPath(s, dir)
    val src =
      if (gens.isEmpty) Tables.events(s, dir).filter(lit(false))
      else s.read.parquet(gens.map(g => s"$root/data/_gen=$g"): _*)
    gatedSemiJoin(src, pinned, "event_id")
      .withColumn("k", saiK(col("props")))
      .filter(residual)
      .select("event_id", "user_id", "event_type", "value", "k")
      .orderBy("event_id")
  }

  /** Point-plus-range read answered THROUGH the SAI postings: index
    * intersection picks the row ids, only candidate generations are
    * opened, the fetch is a broadcast semi-join on the id set, and
    * the residual predicate re-verifies. Index + layout are
    * output-invisible ⇒ oracle runs the same filter on the original
    * table (the bloom/manifest discipline). */
  def scanSai(s: SparkSession, dir: String): DataFrame = {
    val (user, kLo, kHi) = (7L, 80, 99)
    val (cand, gens) = saiSelect(s, dir, user, kLo, kHi)
    saiFetch(s, dir, cand, gens,
      col("user_id") === user && col("k").between(kLo, kHi))
  }

  /** CQL `ALLOW FILTERING` planning semantics — the guard rail CQL
    * puts between a user and an accidental cluster-wide scan: a
    * SELECT is admitted without the clause only when every
    * restriction is index-answerable (here, the REAL SAI postings of
    * this layout — user_id and the k metadata column); any residual
    * on an unindexed column (value, event_type) degrades the read to
    * a filtering scan and REQUIRES the clause. One row per probe
    * shape of the fixed six-predicate set: the chosen path, the
    * required-clause verdict, and the estimated row count measured
    * from the layout the decision would actually touch — postings
    * counts for index paths (the planning input a coordinator reads),
    * data counts for filtering paths (what the scan would pay).
    * Postings are complete over the substrate by construction, so
    * every count is SQL-stateable on the base table ⇒ hash-exact.
    * Shape: six 1-row aggregates over postings/data unioned — pure
    * planning-relation arithmetic, corpus touched only by the
    * declared filtering probes. */
  def scanAllowFiltering(s: SparkSession, dir: String): DataFrame = {
    val root = saiEventsPath(s, dir)
    val data = s.read.parquet(s"$root/data")
    val idxU = s.read.parquet(s"$root/idx_user")
    val idxK = s.read.parquet(s"$root/idx_k")
    def probe(id: Int, pred: String, path: String, af: Boolean,
        rows: DataFrame): DataFrame =
      rows.agg(count(lit(1)).as("est_rows"))
        .select(lit(id).as("probe_id"), lit(pred).as("predicate"),
          lit(path).as("path"), lit(af).as("requires_allow_filtering"),
          col("est_rows"))
    probe(1, "user_id = 7", "sai_index", af = false,
        idxU.filter(col("user_id") === 7))
      .unionByName(probe(2, "k BETWEEN 80 AND 99", "sai_index", af = false,
        idxK.filter(col("k").between(80, 99))))
      .unionByName(probe(3, "user_id = 7 AND k BETWEEN 80 AND 99",
        "sai_intersection", af = false,
        idxU.filter(col("user_id") === 7).select("_gen", "event_id")
          .join(idxK.filter(col("k").between(80, 99))
            .select("_gen", "event_id"), Seq("_gen", "event_id"))))
      .unionByName(probe(4, "value > 100.0", "full_scan", af = true,
        data.filter(col("value") > 100.0)))
      .unionByName(probe(5, "event_type = 'click'", "full_scan", af = true,
        data.filter(col("event_type") === "click")))
      .unionByName(probe(6, "user_id = 7 AND value > 100.0",
        "sai_index_residual", af = true,
        data.filter(col("user_id") === 7 && col("value") > 100.0)))
      .orderBy("probe_id")
  }

  /** SAI disjunction — the CQL 5.0 headline feature: `WHERE a = x OR
    * b = y` becomes legal once every disjunct is SAI-indexed (classic
    * CQL had no OR at all), executed as a postings UNION where
    * [[scanSai]]'s AND intersects. Same index artifacts, same
    * planning shape: filtered postings per disjunct, union + distinct
    * on (generation, row id), open only generations holding
    * candidates, broadcast-semi fetch, residual OR re-verify. The
    * union's candidate count is the SUM of the disjuncts' postings
    * (an OR is as selective as its weakest arm) — still bounded by
    * matching rows, never a scan. */
  def scanSaiOr(s: SparkSession, dir: String): DataFrame = {
    val root = saiEventsPath(s, dir)
    val u = s.read.parquet(s"$root/idx_user")
      .filter(col("user_id") === 3).select("_gen", "event_id")
    val k = s.read.parquet(s"$root/idx_k")
      .filter(col("k") >= 97).select("_gen", "event_id")
    val (cand, gens) = saiCandGens(u.unionByName(k).distinct())
    saiFetch(s, dir, cand, gens,
      col("user_id") === 3 || col("k") >= 97)
  }

  /** SAI over a COLLECTION column — CQL `WHERE col CONTAINS x` made
    * indexable (Cassandra 5 SAI indexes list/set/map elements, the
    * query 2i/SASI could only answer by scanning): documents in 8
    * hash generations, the stored `words` array exploded into a
    * per-generation element-postings table (element → row ids; the
    * postings are element-domain × docs-containing rows, the same
    * bound an inverted index always has). Two CONTAINS predicates
    * intersect their postings on (generation, row id) exactly like
    * [[scanSai]]'s scalar AND; fetch + residual re-verify, same
    * discipline. */
  private val saiDocsPaths =
    new graft.core.BuildOnce[String, String]
  private[graft] def saiDocsPath(s: SparkSession, dir: String): String =
    saiDocsPaths.getOrElseUpdate(dir, {
      val root = graft.core.RunId.scratchKeyed("sai/docs", dir)
      val base = Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.Text.words(col("text")).as("words"),
          col("lang"), col("n_chars"))
        .withColumn("_gen", pmod(xxhash64(col("doc_id")), lit(SaiGens)))
      base.write.mode("overwrite").partitionBy("_gen").parquet(s"$root/data")
      base.select(col("_gen"), explode(array_distinct(col("words"))).as("w"),
        col("doc_id"))
        .write.mode("overwrite").parquet(s"$root/idx_words")
      root
    })

  def scanSaiContains(s: SparkSession, dir: String): DataFrame = {
    val (w1, w2) = ("dup", "vector")
    val root = saiDocsPath(s, dir)
    val idx = s.read.parquet(s"$root/idx_words")
    val p1 = idx.filter(col("w") === w1).select("_gen", "doc_id")
    val p2 = idx.filter(col("w") === w2).select("_gen", "doc_id")
    val (cand, gens) = saiCandGens(p1.join(p2, Seq("_gen", "doc_id")))
    val src =
      if (gens.isEmpty)
        s.read.parquet(s"$root/data").filter(lit(false))
      else s.read.parquet(gens.map(g => s"$root/data/_gen=$g"): _*)
    gatedSemiJoin(src, cand, "doc_id")
      .filter(array_contains(col("words"), w1) &&
        array_contains(col("words"), w2))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(col("words")).as("n_words"))
      .orderBy("doc_id")
  }

  /** SAI over a MAP column — the last collection-index form: Cassandra
    * 5 SAI indexes map KEYS (`WHERE m CONTAINS KEY ?`) and ENTRIES
    * (`WHERE m[?] = ?`) next to [[scanSaiContains]]'s list elements
    * (VERDICT r10 next #6). Substrate: a STORED map<word, count> per
    * document (the CellStore.fnMapStored map-column discipline — the
    * map is built once by a linear explode + count aggregate, never a
    * per-row quadratic scan) in 8 hash generations. ONE postings table
    * serves both probes: (generation, key, count, row id) — an entry
    * posting IS a key posting with the value attached, exactly how SAI
    * stores map entries; the key probe filters on `key`, the entry
    * probe on (key, count). Same discipline as every SAI face: probe
    * postings, open candidate generations only, size-gated semi-join,
    * residual re-verify on the stored map. */
  private val saiMapPaths = new graft.core.BuildOnce[String, String]
  private[graft] def saiMapPath(s: SparkSession, dir: String): String =
    saiMapPaths.getOrElseUpdate(dir, {
      val root = graft.core.RunId.scratchKeyed("sai/docmap", dir)
      val counts = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.functions.Text.words(col("text"))).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).cast("int").as("cnt"))
      val wc = counts.groupBy("doc_id")
        .agg(map_from_entries(
          array_sort(collect_list(struct(col("word"), col("cnt"))))).as("wc"))
      val base = Tables.documents(s, dir).select("doc_id", "lang")
        .join(wc, "doc_id")
        .withColumn("_gen", pmod(xxhash64(col("doc_id")), lit(SaiGens)))
      base.write.mode("overwrite").partitionBy("_gen").parquet(s"$root/data")
      base.select(col("_gen"), explode(col("wc")).as(Seq("key", "cnt")),
          col("doc_id"))
        .write.mode("overwrite").parquet(s"$root/idx_entries")
      root
    })

  private def saiMapFetch(s: SparkSession, root: String,
      postings: DataFrame, residual: Column): DataFrame = {
    val (cand, gens) = saiCandGens(postings.select("_gen", "doc_id"))
    val src =
      if (gens.isEmpty) s.read.parquet(s"$root/data").filter(lit(false))
      else s.read.parquet(gens.map(g => s"$root/data/_gen=$g"): _*)
    gatedSemiJoin(src, cand, "doc_id")
      .filter(residual)
      .withColumn("n_keys", size(col("wc")))
  }

  /** CQL `WHERE wc CONTAINS KEY 'dup'` through the map-key postings. */
  def scanSaiContainsKey(s: SparkSession, dir: String): DataFrame = {
    val key = "dup"
    val root = saiMapPath(s, dir)
    val idx = s.read.parquet(s"$root/idx_entries")
    saiMapFetch(s, root, idx.filter(col("key") === key),
        map_contains_key(col("wc"), key))
      .withColumn("n_occurrences", element_at(col("wc"), key))
      .select("doc_id", "lang", "n_keys", "n_occurrences")
      .orderBy("doc_id")
  }

  /** CQL `WHERE wc['spark'] = 5` through the map-entry postings. */
  def scanSaiMapEntry(s: SparkSession, dir: String): DataFrame = {
    val (key, v) = ("spark", 5)
    val root = saiMapPath(s, dir)
    val idx = s.read.parquet(s"$root/idx_entries")
    saiMapFetch(s, root, idx.filter(col("key") === key && col("cnt") === v),
        element_at(col("wc"), key) === v)
      .select("doc_id", "lang", "n_keys")
      .orderBy("doc_id")
  }

  /** SAI NUMERIC RANGE — the remaining scalar SAI form: Cassandra 5
    * SAI keeps a balanced numeric tree per sstable plus SEGMENT
    * METADATA (the indexed column's min/max per sstable), and a range
    * probe `WHERE ts >= a AND ts <= b` consults the metadata first so
    * sstables whose [min, max] misses the range are never opened — at
    * the index level, not just the data level. [[scanSai]]'s k-range
    * arm cannot show this: its generations are hash-assigned, so every
    * value lands in every generation and metadata would prune nothing.
    * Here the substrate is the layout that makes numeric-range SAI
    * shine in production: FLUSH-ORDERED generations (memtables flush
    * in arrival order, so each sstable covers a narrow ts band — the
    * classic time-series shape), built by binning ts into 8
    * equal-width epochs over the corpus [min, max] (two-value bounded
    * stats, the AQE move).
    *
    * Probe: read the 8-row segment metadata, keep generations with
    * max_us ≥ lo ∧ min_us ≤ hi (2 of 8 at this window), range-scan
    * ONLY those generations' postings partitions (path-level pruning —
    * non-surviving postings files are never listed), size-gated
    * semi-join fetch from the same surviving generations, residual
    * re-verify. Driver state: 8 metadata rows + the generation list.
    * At 100 TB: thousands of generations, metadata still
    * one-row-per-sstable — the prune is what makes a month-window
    * query touch a month of sstables instead of years. Index + layout
    * are output-invisible ⇒ the oracle is the plain range filter on
    * the original table. */
  private val saiRangePaths = new graft.core.BuildOnce[String, String]
  private[graft] def saiRangePath(s: SparkSession, dir: String): String =
    saiRangePaths.getOrElseUpdate(dir, {
      val root = graft.core.RunId.scratchKeyed("sai/events_range", dir)
      val withUs = Tables.events(s, dir)
        .withColumn("_us", unix_micros(col("ts").cast("timestamp")))
      // corpus ts bounds: a 2-value bounded aggregate (never row data)
      val b = withUs.agg(min("_us"), max("_us")).collect()(0)
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val span = math.max(hi - lo + 1, 1L)
      val base = withUs.withColumn("_gen",
        least(floor((col("_us") - lit(lo)) * lit(SaiGens) / lit(span)),
          lit(SaiGens - 1)).cast("long"))
      base.drop("_us").write.mode("overwrite")
        .partitionBy("_gen").parquet(s"$root/data")
      base.select(col("_gen"), col("_us"), col("event_id"))
        .write.mode("overwrite").partitionBy("_gen").parquet(s"$root/idx_ts")
      // segment metadata: per-generation min/max of the indexed value
      base.groupBy("_gen")
        .agg(min("_us").as("min_us"), max("_us").as("max_us"))
        .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
      root
    })

  /** `SELECT … WHERE ts BETWEEN ? AND ?` answered through the SAI
    * numeric index: segment-metadata prune → postings range scan on
    * surviving generations only → gated semi-join fetch → residual. */
  def scanSaiRange(s: SparkSession, dir: String): DataFrame = {
    // Jan 10 00:00 .. Jan 13 00:00 — ~10% of the fixture's 30-day
    // span, crossing one generation boundary (opens 2 of 8).
    val qLo = java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli * 1000L
    val qHi = java.time.Instant.parse("2024-01-13T00:00:00Z").toEpochMilli * 1000L
    val root = saiRangePath(s, dir)
    val gens = s.read.parquet(s"$root/meta")
      .filter(col("max_us") >= qLo && col("min_us") <= qHi)
      .select("_gen").collect().map(_.getLong(0)).toSeq.sorted
    val resid = unix_micros(col("ts").cast("timestamp")).between(qLo, qHi)
    if (gens.isEmpty)
      return Tables.events(s, dir).filter(lit(false))
        .select("event_id", "user_id", "event_type", "value", "ts")
    val cand = s.read.parquet(gens.map(g => s"$root/idx_ts/_gen=$g"): _*)
      .filter(col("_us").between(qLo, qHi))
      .select("event_id").localCheckpoint()
    val src = s.read.parquet(gens.map(g => s"$root/data/_gen=$g"): _*)
    gatedSemiJoin(src, cand, "event_id")
      .filter(resid)
      .select("event_id", "user_id", "event_type", "value", "ts")
      .orderBy("event_id")
  }

  /** SAI + MEMTABLE — the read path as Cassandra actually runs it:
    * an SAI query consults the postings of every FLUSHED sstable AND
    * the memtable's in-memory trie index (here: a linear filter over
    * the unflushed tail — the memtable is flush-interval-sized, so
    * the linear arm is bounded by write throughput, never corpus
    * size). Every other SAI face reads a fully-flushed layout; this
    * one models the steady state where recent writes haven't flushed
    * yet, so a correct read MUST union both arms. Layout: events with
    * ts < flush-cut in 8 flush-ordered generations (data + user
    * postings), the tail stored as `memtable/` (what RAM holds).
    * Probe: postings → candidate generations → gated semi-join fetch
    * → residual, UNION the memtable linear filter; `flushed` marks
    * the serving arm. The streaming side of this layout —
    * micro-batches flushing into NEW generations with their postings
    * built per flush, exactly Cassandra's memtable→sstable+index
    * lifecycle — is driven by StreamingSpec over [[saiFlushProbe]].
    * Oracle: the plain user filter (layout + split invisible;
    * `flushed` restates ts < cut). */
  private val SaiMemFlushCutUs =
    java.time.Instant.parse("2024-01-25T00:00:00Z").toEpochMilli * 1000L
  private val saiMemPaths = new graft.core.BuildOnce[String, String]
  private[graft] def saiMemPath(s: SparkSession, dir: String): String =
    saiMemPaths.getOrElseUpdate(dir, {
      val root = graft.core.RunId.scratchKeyed("sai/memtable", dir)
      val withUs = Tables.events(s, dir)
        .withColumn("_us", unix_micros(col("ts").cast("timestamp")))
      val flushed = withUs.filter(col("_us") < SaiMemFlushCutUs)
      val b = flushed.agg(min("_us")).collect()(0)
      val lo = b.getLong(0)
      val span = math.max(SaiMemFlushCutUs - lo, 1L)
      val base = flushed.withColumn("_gen",
        least(floor((col("_us") - lit(lo)) * lit(SaiGens) / lit(span)),
          lit(SaiGens - 1)).cast("long"))
      base.drop("_us").write.mode("overwrite")
        .partitionBy("_gen").parquet(s"$root/data")
      base.select(col("_gen"), col("user_id"), col("event_id"))
        .write.mode("overwrite").parquet(s"$root/idx_user")
      withUs.filter(col("_us") >= SaiMemFlushCutUs).drop("_us")
        .write.mode("overwrite").parquet(s"$root/memtable")
      root
    })

  /** The flushed-arm probe, shared by the declared query and the
    * StreamingSpec flush-lifecycle test: postings (base + any
    * appended-generation postings) → candidate generations → gated
    * fetch → residual. `extraGens` are generations flushed AFTER the
    * base layout build (each with `data/_gen=g` + rows appended under
    * `idx_user_extra/`), exactly what a per-micro-batch flush writes. */
  private[graft] def saiFlushProbe(s: SparkSession, root: String,
      user: Long, extraGens: Seq[Long] = Nil): DataFrame = {
    val baseIdx = s.read.parquet(s"$root/idx_user")
    // extra postings restricted to the LISTED generations — the
    // signature promises per-generation selection, so a caller passing
    // a subset of the flushed generations must not read postings of
    // generations it did not request (ADVICE r11).
    val idx =
      if (extraGens.isEmpty) baseIdx
      else baseIdx.unionByName(s.read.parquet(s"$root/idx_user_extra")
        .filter(col("_gen").isin(extraGens: _*)))
    val (cand, gens) = saiCandGens(
      idx.filter(col("user_id") === user).select("_gen", "event_id"))
    if (gens.isEmpty)
      return s.read.parquet(s"$root/memtable").filter(lit(false))
        .select("event_id", "user_id", "event_type", "value")
    val src = s.read.parquet(gens.map(g => s"$root/data/_gen=$g"): _*)
    gatedSemiJoin(src, cand, "event_id")
      .filter(col("user_id") === user)
      .select("event_id", "user_id", "event_type", "value")
  }

  /** `SELECT … WHERE user_id = ?` over flushed-sstable SAI postings ∪
    * the memtable linear arm. */
  def scanSaiMemtable(s: SparkSession, dir: String): DataFrame = {
    val user = 5L
    val root = saiMemPath(s, dir)
    val flushedHits = saiFlushProbe(s, root, user)
      .withColumn("flushed", lit(true))
    val memHits = s.read.parquet(s"$root/memtable")
      .filter(col("user_id") === user)
      .select("event_id", "user_id", "event_type", "value")
      .withColumn("flushed", lit(false))
    flushedHits.unionByName(memHits).orderBy("event_id")
  }

  /** Cassandra 5 `ANN OF` — the composed CQL-5 headline read:
    * `SELECT … WHERE label = ? ORDER BY embedding ANN OF ? LIMIT k`,
    * a metadata predicate answered from SAI postings PLUS a
    * per-sstable vector index probe PLUS exact rescore + global top-k
    * (VERDICT r10 next #1). Layout: embeddings in 8 hash generations
    * (the flush history, [[scanSai]]'s substrate), each generation
    * partitioned by IVF cell under shared trained centroids
    * ([[Similarity.trainCentroids]] — per-sstable graph indexes in
    * Cassandra, one shared coarse quantizer here; both are
    * "vector index per sstable segment" reads), a per-generation
    * label postings table, and a per-(generation, cell) residual
    * bound max ‖x − c‖₂ (8×16 rows at any corpus size).
    *
    * The probe is EXACT, not best-effort: phase 1 opens the nprobe
    * closest cells per query inside label-matching generations only
    * and takes a provisional top-k; phase 2 re-opens exactly those
    * extra (gen, cell) leaves whose Cauchy–Schwarz bound
    * dot(q,c) + ‖q‖·r_gc can still beat the provisional kth score
    * (margins cover float-accumulation error), so the result equals
    * brute-force filtered top-k — the oracle states it on the original
    * table — while the plan touches only index-chosen leaves.
    * Driver state is bounded: 16 centroids, ≤128 stats rows, ≤8
    * generation ids, k×queries provisional scores — never row ids.
    * At 100 TB: more cells (4096), same bounded planning relations;
    * the unselective-θ fallback degrades to scanning only the
    * label-matching generations, never the corpus. */
  /** The IVF-layout builder over an arbitrary vector source — shared
    * by the full-corpus layout ([[saiAnnPath]]) and the flushed-only
    * layout ([[saiAnnMemPath]]); one definition, so the memtable face
    * probes artifacts byte-compatible with scan_sai_ann's. */
  private[graft] def buildAnnLayout(s: SparkSession, root: String,
      src: DataFrame): Unit = {
    val cents = Similarity.trainCentroids(src)
    val cnorm2 = cents.map(c => c.map(x => x.toDouble * x).sum)
    val a = Similarity.cellArgmax(cents)
    val base = src
      .withColumn("_gen", pmod(xxhash64(col("vec_id")), lit(SaiGens)))
      .withColumn("cell", (-a.getField("negcell")).as("cell"))
      .withColumn("csim", a.getField("sim"))
    base.select(col("vec_id"), col("label"), col("embedding"),
        col("_gen"), col("cell"))
      .write.mode("overwrite").partitionBy("_gen", "cell")
      .parquet(s"$root/data")
    // the metadata SAI postings (generation, label, row id) — cell
    // rides along as the row ADDRESS inside its generation, which is
    // what lets the adaptive pre-filter branch fetch candidate rows
    // without opening any non-candidate leaf (scan_sai_ann itself
    // reads only _gen/label, so column pruning keeps its probe
    // byte-identical)
    base.select(col("_gen"), col("label"), col("vec_id"), col("cell"))
      .write.mode("overwrite").parquet(s"$root/idx_label")
    // per-(generation, cell) residual bound: max ‖x − c‖² =
    // max(‖x‖² + ‖c‖² − 2·⟨x,c⟩) — one tiny aggregate
    val d2 = graft.functions.Vectors.fdot(col("embedding"), col("embedding"))
      .cast("double") - lit(2.0) * col("csim").cast("double") +
      element_at(typedlit(cnorm2.toSeq), col("cell") + 1)
    base.groupBy("_gen", "cell")
      .agg(max(d2).as("max_d2"), count(lit(1)).as("n"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/stats")
    s.createDataFrame(cents.zipWithIndex.map { case (c, i) => (i, c, cnorm2(i)) })
      .toDF("cell", "cent", "cnorm2")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/cents")
  }

  /** Per-(JVM, layout-root) memo of the collected 16-row centroid
    * table (r17, VERDICT r16 next #4). Safe by construction: the root
    * is RunId-scoped (unique per JVM) and `cents` is written exactly
    * once per root by [[buildAnnLayout]] — [[annFlush]] appends
    * generations but NEVER retrains, so the file is immutable for the
    * JVM's life. Saves one collect job per probe across the 6 SAI-ANN
    * faces and every annFlush batch. gens/stats stay UNCACHED — those
    * grow mid-suite. */
  private val centsCache =
    new graft.core.BuildOnce[String, Array[(Int, Seq[Float], Double)]]
  private[graft] def readCents(s: SparkSession,
      root: String): Array[(Int, Seq[Float], Double)] =
    centsCache.getOrElseUpdate(root,
      s.read.parquet(s"$root/cents").orderBy("cell").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1), r.getDouble(2))))

  /** Per-(JVM, layout-root) memo of the BASE per-leaf stats collect
    * (≤ 128 rows of (_gen, cell, max_d2, n)) — the same immutability
    * class as [[readCents]]: [[buildAnnLayout]] writes `$root/stats`
    * exactly once; every later flush writes `stats_extra/_gen=g`,
    * never this file (and compaction faces build a NEW root). Callers
    * that union flushed generations (extraGens nonEmpty) bypass the
    * memo and read relationally as before. */
  private val baseStatsCache =
    new graft.core.BuildOnce[String, Array[(Long, Int, Double)]]
  private[graft] def readBaseStats(s: SparkSession,
      root: String): Array[(Long, Int, Double)] =
    baseStatsCache.getOrElseUpdate(root,
      s.read.parquet(s"$root/stats").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))))

  /** Per-(JVM, layout-root, label) memo of the candidate-generation
    * list from the BASE label postings — `$root/idx_label` is written
    * once by [[buildAnnLayout]]; flushes append `idx_label_extra`
    * only. Bounded key domain (≤ 8 labels per layout). */
  private val baseGensCache = new graft.core.BuildOnce[(String, Int), Seq[Long]]
  private def readBaseGens(s: SparkSession, root: String,
      labelSel: Int): Seq[Long] =
    baseGensCache.getOrElseUpdate((root, labelSel),
      s.read.parquet(s"$root/idx_label")
        .filter(col("label") === labelSel).select("_gen").distinct()
        .collect().map(_.getLong(0)).toSeq.sorted)

  private val saiAnnPaths = new graft.core.BuildOnce[String, String]
  private[graft] def saiAnnPath(s: SparkSession, dir: String): String =
    saiAnnPaths.getOrElseUpdate(dir, {
      val root = graft.core.RunId.scratchKeyed("sai/ann", dir)
      buildAnnLayout(s, root, Tables.embeddings(s, dir))
      root
    })

  /** Flushed-only IVF layout + the UNINDEXED vector memtable: a 10%
    * id slice (pmod 10 == 3, SQL-expressible so the oracle can state
    * the arm flag) never reaches the index — the write path's
    * memtable-before-flush state for vectors. */
  private val saiAnnMemPaths = new graft.core.BuildOnce[String, String]
  private[graft] def saiAnnMemPath(s: SparkSession, dir: String): String =
    saiAnnMemPaths.getOrElseUpdate(dir, {
      val root = graft.core.RunId.scratchKeyed("sai/annmem", dir)
      val emb = Tables.embeddings(s, dir)
      buildAnnLayout(s, root, emb.filter(pmod(col("vec_id"), lit(10)) =!= 3))
      emb.filter(pmod(col("vec_id"), lit(10)) === 3)
        .write.mode("overwrite").parquet(s"$root/memtable")
      root
    })

  private[graft] case class SaiAnnPlan(
      gens: Seq[Long], phase1: Seq[(Long, Int)], phase2: Seq[(Long, Int)],
      totalLeaves: Int)

  /** The planned search behind [[scanSaiAnn]], returning the probe
    * plan so PlanSpec can pin generation pruning and the
    * strictly-partial leaf coverage. */
  private[graft] def saiAnnSearch(s: SparkSession, dir: String,
      labelSel: Int = 2, k: Int = 8, nprobe: Int = 4,
      residual: Column = lit(true),
      qPred: Column = col("vec_id") < 5,
      rootOverride: Option[String] = None,
      tombstones: Option[DataFrame] = None,
      extraGens: Seq[Long] = Nil): (DataFrame, SaiAnnPlan) = {
    val root = rootOverride.getOrElse(saiAnnPath(s, dir))
    val margin = 1e-5
    // Bounded planning relations (collect is the AQE-stats move, never
    // row ids): centroids, per-leaf radii, candidate generations, the
    // 5 query vectors.
    val cents = readCents(s, root)
      .map { case (c, v, _) => (c, v.map(_.toDouble).toArray) }
    // stats/postings of generations flushed AFTER the base build
    // ([[annFlush]] writes each as its own _gen=<g> partition) join the
    // planning relations only when LISTED — the saiFlushProbe contract:
    // a caller naming a subset must not read the others' artifacts.
    // Partition-dir readback infers _gen as INT; cast back.
    def withExtra(base: DataFrame, sub: String, cols: Seq[String]): DataFrame =
      if (extraGens.isEmpty) base
      else base.unionByName(s.read.parquet(s"$root/$sub")
        .withColumn("_gen", col("_gen").cast("long"))
        .filter(col("_gen").isin(extraGens: _*))
        .select(cols.map(col): _*))
    // extraGens = Nil (every declared face except the flush probes):
    // the planning inputs are the write-once base files — serve them
    // from the per-(JVM, root) memo instead of re-collecting per call
    // (r17; one stats job + one gens job saved per probe).
    val radius: Map[(Long, Int), Double] =
      (if (extraGens.isEmpty) readBaseStats(s, root)
       else withExtra(s.read.parquet(s"$root/stats"), "stats_extra",
           Seq("_gen", "cell", "max_d2", "n")).collect()
         .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))))
        .map { case (g, c, d2) =>
          (g, c) -> math.sqrt(math.max(0.0, d2 + margin)) }.toMap
    val gens =
      if (extraGens.isEmpty) readBaseGens(s, root, labelSel)
      else withExtra(s.read.parquet(s"$root/idx_label"), "idx_label_extra",
          Seq("_gen", "label", "vec_id", "cell"))
        .filter(col("label") === labelSel).select("_gen").distinct()
        .collect().map(_.getLong(0)).toSeq.sorted
    if (gens.isEmpty) {
      val e = Tables.embeddings(s, dir).filter(lit(false))
        .select(col("vec_id").as("query_id"), col("vec_id"), col("label"),
          lit(0.0).as("score"), lit(0).as("rk"))
      return (e, SaiAnnPlan(Nil, Nil, Nil, radius.size))
    }
    val qs = Tables.embeddings(s, dir).filter(qPred)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def ddot(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var j = 0
      while (j < a.length) { d += a(j) * b(j); j += 1 }; d
    }
    val qsD = qs.map { case (qid, qv) => (qid, qv.map(_.toDouble)) }
    val qnorm = qsD.map { case (qid, qv) => qid -> math.sqrt(ddot(qv, qv)) }.toMap
    val probe1Cells: Map[Long, Seq[Int]] = qsD.map { case (qid, qv) =>
      qid -> cents.map { case (c, cv) => (c, ddot(qv, cv)) }
        .sortBy { case (c, sim) => (-sim, c) }.take(nprobe).map(_._1).toSeq
    }.toMap
    def leaves(cellSet: Set[Int]): Seq[(Long, Int)] =
      for (g <- gens; c <- cellSet.toSeq.sorted; if radius.contains((g, c)))
        yield (g, c)
    def readLeaves(ls: Seq[(Long, Int)]): DataFrame =
      s.read.option("basePath", s"$root/data")
        .parquet(ls.map { case (g, c) => s"$root/data/_gen=$g/cell=$c" }: _*)
    def probeDf(cells: Map[Long, Seq[Int]]): DataFrame =
      s.createDataFrame(qs.toSeq.collect {
          case (qid, qv) if cells(qid).nonEmpty => (qid, qv.toSeq, cells(qid)) })
        .toDF("query_id", "qvec", "cells")
    // (rounded score desc, vec_id asc) is the FINAL output order, so
    // the phase-1 cut keeps exactly the best provisional k
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id").asc)
    def score(src: DataFrame, probe: DataFrame): DataFrame = {
      // tombstones (deleted row ids) mask candidates by anti-join —
      // like the residual, exclusion only SHRINKS the candidate set,
      // so the leaf bound (valid for every member row, deleted or
      // not) stays admissible and the probe stays exact
      val live = tombstones.fold(src)(t =>
        src.join(t.select("vec_id"), Seq("vec_id"), "left_anti"))
      live.join(broadcast(probe), expr("array_contains(cells, cell)"))
        // residual only SHRINKS the candidate set, so the
        // Cauchy–Schwarz leaf bound (valid for every row) stays
        // admissible and the probe stays exact under any predicate
        .filter(col("label") === labelSel && residual &&
          col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), col("label"),
          graft.functions.Vectors.fdot(col("embedding"), col("qvec")).as("score_raw"))
        .withColumn("score", round(col("score_raw"), 6))
    }
    // Fallback: if every probed cell is empty in every candidate
    // generation (possible on a tiny or skewed corpus), probe ALL
    // present cells — phase 1 must read something for θ to exist, and
    // an empty path list would fail the parquet read outright.
    val allCells = radius.keysIterator.map(_._2).toSet
    val (phase1, phase1Cells) = {
      val p = leaves(probe1Cells.values.flatten.toSet)
      if (p.nonEmpty) (p, probe1Cells)
      else (leaves(allCells), probe1Cells.map { case (q, _) => q -> allCells.toSeq.sorted })
    }
    val kept1 = score(readLeaves(phase1), probeDf(phase1Cells))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .localCheckpoint()
    // per-query pruning bound θ: the min UNROUNDED kept score; under-
    // filled top-k ⇒ θ below any possible dot ⇒ no leaf is skipped
    val theta: Map[Long, Double] = kept1.groupBy("query_id")
      .agg(min("score_raw").as("th"), count(lit(1)).as("n"))
      .collect().map { r =>
        r.getLong(0) -> (if (r.getLong(2) < k) -2.0 else r.getDouble(1)) }.toMap
    // phase 2: cells OUTSIDE a query's probe set that can still beat
    // its θ in SOME candidate generation (Cauchy–Schwarz:
    // ⟨q,x⟩ ≤ ⟨q,c⟩ + ‖q‖·‖x−c‖); margins make skipping provably safe
    // under the rounded output order
    val probe2Cells: Map[Long, Seq[Int]] = qsD.map { case (qid, qv) =>
      val th = theta.getOrElse(qid, -2.0)
      val p1 = phase1Cells(qid).toSet
      qid -> cents.collect {
        case (c, cv) if !p1.contains(c) && gens.exists { g =>
          radius.get((g, c)).exists(r => ddot(qv, cv) + qnorm(qid) * r >= th - margin)
        } => c
      }.toSeq
    }.toMap
    // NOTE: phase2 may re-list a leaf phase 1 already read — for a
    // DIFFERENT query (each query's probe2 set excludes only its OWN
    // phase-1 cells, and scoring is per (query, cell) via the cells
    // array, so no (query, leaf) pair is ever scored twice)
    val phase2 = leaves(probe2Cells.values.flatten.toSet)
    val result =
      if (phase2.isEmpty) kept1
      else kept1.drop("rk")
        .unionByName(score(readLeaves(phase2), probeDf(probe2Cells)))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
    val out = result
      .select(col("query_id"), col("vec_id"), col("label"), col("score"), col("rk"))
      .orderBy("query_id", "rk")
    (out, SaiAnnPlan(gens, phase1, phase2, radius.size))
  }

  def scanSaiAnn(s: SparkSession, dir: String): DataFrame =
    saiAnnSearch(s, dir)._1

  /** SAI ANN × driver paging — the CQL fetch-size contract over a
    * vector read (VERDICT r11 missing #5): `SELECT … WHERE label = ?
    * ORDER BY embedding ANN OF ? LIMIT 12` consumed through a
    * fetch-size-4 cursor. The probe runs ONCE ([[saiAnnSearch]] at
    * k = LIMIT, checkpointed): the server computes the full ANN
    * result and the paging state only WALKS it — re-probing per page
    * would re-open index leaves and could tear the result if a flush
    * landed between pages. Each subsequent page applies the KEYSET
    * predicate from the previous page's last row per query — strictly
    * after (score, vec_id) in cursor order, the scan_paging
    * discipline, never OFFSET; rounded scores CAN tie, so the
    * composite comparison is load-bearing. The paging state is
    * driver-held by definition (queries × one (score, id) pair — the
    * same bounded class as the probe's θ map). A query whose page
    * comes back short simply leaves the cursor exhausted: it drops
    * out of the state and yields no further pages, the CQL contract.
    * PlanSpec pins no-recompute-across-pages: the composed result
    * reads NO parquet (every page is a filter over the one
    * checkpointed probe) and the page union re-assembles the k = 12
    * probe exactly. */
  def scanSaiAnnPaged(s: SparkSession, dir: String): DataFrame = {
    val fetch = 4; val k = 12
    val full = saiAnnSearch(s, dir, k = k)._1
      .select("query_id", "vec_id", "label", "score")
      .localCheckpoint()
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id").asc)
    var state: Map[Long, (Double, Long)] = Map.empty
    val pages = (0 until k / fetch).map { p =>
      val afterState =
        if (p == 0) full
        else if (state.isEmpty) full.filter(lit(false))
        else {
          val sdf = s.createDataFrame(
              state.toSeq.map { case (q, (sc, v)) => (q, sc, v) })
            .toDF("query_id", "s_last", "v_last")
          full.join(broadcast(sdf), Seq("query_id"))
            .filter(col("score") < col("s_last") ||
              (col("score") === col("s_last") && col("vec_id") > col("v_last")))
            .drop("s_last", "v_last")
        }
      val page = afterState
        .withColumn("page_rk", row_number().over(w).cast("long"))
        .filter(col("page_rk") <= fetch)
        .withColumn("page", lit(p.toLong))
        .localCheckpoint()
      state = page.filter(col("page_rk") === fetch)
        .select("query_id", "score", "vec_id").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
      page
    }
    pages.reduce(_ unionByName _)
      .select("query_id", "page", "page_rk", "vec_id", "label", "score")
      .orderBy("query_id", "page", "page_rk")
  }

  /** `ANN OF` under DELETES — reads must mask tombstoned rows that
    * are still physically present in every index artifact (data
    * leaves, postings, leaf bounds: a Cassandra delete writes a
    * tombstone, it does not rewrite sstables). The tombstone sstable
    * (a 1/7 id slice, written once as its own relation) anti-joins
    * the candidate rows inside the exact probe; exclusion only
    * shrinks the candidate set, so the Cauchy–Schwarz leaf bound —
    * computed over the PRE-delete leaves, a superset — stays
    * admissible and the masked read is still provably exact. The
    * split is SQL-expressible, so the oracle is the brute-force scan
    * minus the deleted ids. */
  private val saiAnnTombPaths = new graft.core.BuildOnce[String, String]
  def scanSaiAnnTombstone(s: SparkSession, dir: String): DataFrame = {
    val tpath = saiAnnTombPaths.getOrElseUpdate(dir, {
      val p = graft.core.RunId.scratchKeyed("sai/anntomb", dir)
      Tables.embeddings(s, dir)
        .filter(pmod(col("vec_id"), lit(7)) === 2).select("vec_id")
        .coalesce(1).write.mode("overwrite").parquet(p)
      p
    })
    saiAnnSearch(s, dir,
      tombstones = Some(s.read.parquet(tpath)))._1
  }

  /** Compaction PURGES tombstones — the other half of the delete
    * lifecycle [[scanSaiAnnTombstone]] starts: a major compaction
    * rewrites the vector sstables WITHOUT the deleted rows (data
    * leaves, postings, and the per-leaf bounds all rebuilt over the
    * live set by the same [[buildAnnLayout]] definition — the bounds
    * TIGHTEN, they were a superset before), drops the tombstone
    * sstable, and the read runs clean with no mask at all. The
    * contract the spec and the shared oracle pin: the masked read
    * over the pre-compaction layout and the clean read over the
    * purged layout return byte-identical rows (CQL semantics —
    * compaction is invisible to reads), so this face reuses
    * scan_sai_ann_tombstone's oracle verbatim. */
  private val saiAnnPurgePaths = new graft.core.BuildOnce[String, String]
  def compactAnnPurge(s: SparkSession, dir: String): DataFrame = {
    val root = saiAnnPurgePaths.getOrElseUpdate(dir, {
      val p = graft.core.RunId.scratchKeyed("sai/annpurge", dir)
      buildAnnLayout(s, p, Tables.embeddings(s, dir)
        .filter(pmod(col("vec_id"), lit(7)) =!= 2))
      p
    })
    saiAnnSearch(s, dir, rootOverride = Some(root))._1
  }

  /** Cassandra 5 `ANN OF` over flushed sstables ∪ the UNINDEXED
    * memtable — the vector sibling of [[scanSaiMemtable]]: a write
    * lands in the memtable first and has NO vector index until flush,
    * yet `SELECT … ORDER BY embedding ANN OF ? LIMIT k` must see it.
    * Flushed arm = the exact two-phase IVF probe over the
    * flushed-only layout ([[saiAnnMemPath]], built by the same
    * [[buildAnnLayout]] definition as scan_sai_ann's); memtable arm =
    * brute-force over the unflushed tail — small BY CONSTRUCTION at
    * any corpus size (it is one flush interval of writes) — with the
    * probe vectors broadcast; global top-k over the union. Both arms
    * are exact on their partition of the corpus, so the union rank is
    * the exact corpus answer ⇒ ONE brute-force oracle over the whole
    * table, with the arm flag stated by the SQL-expressible split. */
  def scanSaiAnnMem(s: SparkSession, dir: String): DataFrame = {
    val root = saiAnnMemPath(s, dir)
    val labelSel = 1; val k = 8
    val qPred = col("vec_id") >= 5 && col("vec_id") < 10
    val (flushedArm, _) = saiAnnSearch(s, dir, labelSel = labelSel, k = k,
      qPred = qPred, rootOverride = Some(root))
    val q = Tables.embeddings(s, dir).filter(qPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val mem = s.read.parquet(s"$root/memtable")
      .filter(col("label") === labelSel)
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        round(graft.functions.Vectors.fdot(col("embedding"), col("qvec")), 6)
          .as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id").asc)
    flushedArm.drop("rk").withColumn("flushed", lit(true))
      .unionByName(mem.withColumn("flushed", lit(false)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "vec_id", "label", "score", "rk", "flushed")
      .orderBy("query_id", "rk")
  }

  /** Flushed generations start here — batchId-derived, so a crash
    * replay of a micro-batch lands on the SAME generation and
    * overwrites instead of duplicating (base generations are
    * 0..SaiGens-1, far below). */
  private[graft] val AnnFlushGenBase = 100L

  /** One micro-batch FLUSH into an existing ANN layout — the vector
    * side of the memtable→sstable lifecycle ([[saiFlushProbe]]'s
    * discipline applied to the IVF artifacts): the arriving vectors
    * become a brand-new generation with ALL index artifacts built at
    * flush time — data leaves partitioned by cell under the layout's
    * PERSISTED coarse quantizer (a flush quantizes against the current
    * centroids; it never retrains), label postings, and the
    * per-(gen, cell) residual bounds that keep [[saiAnnSearch]]'s
    * Cauchy–Schwarz phase-2 skip provably safe over the new rows.
    * Every write is generation-keyed `mode=overwrite` (gen =
    * AnnFlushGenBase + batchId), so foreachBatch replay after a crash
    * or checkpoint restart is idempotent by construction. Driver state
    * is the 16-row centroid table — the existing bounded class. */
  private[graft] def annFlush(s: SparkSession, root: String,
      batch: DataFrame, batchId: Long): Unit = {
    val gen = AnnFlushGenBase + batchId
    val cr = readCents(s, root)
    val cents: IndexedSeq[Seq[Float]] = cr.map(_._2).toIndexedSeq
    val cnorm2 = cr.map(_._3).toSeq
    val a = Similarity.cellArgmax(cents)
    val b = batch
      .withColumn("cell", -a.getField("negcell"))
      .withColumn("csim", a.getField("sim"))
    b.select(col("vec_id"), col("label"), col("embedding"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/data/_gen=$gen")
    b.select(col("label"), col("vec_id"), col("cell"))
      .write.mode("overwrite").parquet(s"$root/idx_label_extra/_gen=$gen")
    val d2 = graft.functions.Vectors.fdot(col("embedding"), col("embedding"))
      .cast("double") - lit(2.0) * col("csim").cast("double") +
      element_at(typedlit(cnorm2), col("cell") + 1)
    b.groupBy("cell")
      .agg(max(d2).as("max_d2"), count(lit(1)).as("n"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$root/stats_extra/_gen=$gen")
  }

  /** STREAMING vector ingest (VERDICT r12 missing #3) — the
    * scan_sai_memtable flush lifecycle applied to the ANN layout:
    * arriving vector micro-batches flush into brand-new generations
    * via [[annFlush]] (postings + leaf bounds built AT FLUSH TIME,
    * batchId-keyed overwrite ⇒ replay-idempotent), and the ONE
    * [[saiAnnSearch]] probe answers over base ∪ flushed generations —
    * a flushed generation is a first-class index member the moment its
    * artifacts land, so the read needs no memtable brute-force arm at
    * all. This declared face is the deterministic batch twin: the base
    * layout holds all but two id slices, the slices arrive as batches
    * 0 and 1 through the same [[annFlush]] the real readStream
    * lifecycle runs (StreamingSpec drives that: file waves,
    * checkpoint restart without re-flush, replay idempotence, planted
    * twins at rank 1). The probe is exact over base ∪ flushed = the
    * whole corpus and the split is SQL-expressible ⇒ ONE brute-force
    * oracle with the flush batch stated as an id-arithmetic flag —
    * hash-exact. */
  private val annStreamPaths = new graft.core.BuildOnce[String, String]
  def streamAnnMemtable(s: SparkSession, dir: String): DataFrame = {
    val root = annStreamPaths.getOrElseUpdate(dir, {
      val p = graft.core.RunId.scratchKeyed("sai/annstream", dir)
      val emb = Tables.embeddings(s, dir)
      buildAnnLayout(s, p, emb.filter(
        pmod(col("vec_id"), lit(10)) =!= 3 && pmod(col("vec_id"), lit(10)) =!= 7))
      annFlush(s, p, emb.filter(pmod(col("vec_id"), lit(10)) === 3), 0L)
      annFlush(s, p, emb.filter(pmod(col("vec_id"), lit(10)) === 7), 1L)
      p
    })
    val (df, _) = saiAnnSearch(s, dir, labelSel = 0, k = 8,
      qPred = col("vec_id") >= 10 && col("vec_id") < 15,
      rootOverride = Some(root),
      extraGens = Seq(AnnFlushGenBase, AnnFlushGenBase + 1L))
    df.withColumn("flush_batch",
        when(pmod(col("vec_id"), lit(10)) === 3, 0L)
          .when(pmod(col("vec_id"), lit(10)) === 7, 1L)
          .otherwise(-1L))
      .select("query_id", "vec_id", "label", "score", "rk", "flush_batch")
      .orderBy("query_id", "rk")
  }

  private[graft] case class SaiAnnAdaptiveChoice(
      mode: String, nCand: Long, leaves: Seq[(Long, Int)])

  /** The pre-filter vs post-filter planning decision every vector
    * store makes for `WHERE <pred> ORDER BY emb ANN OF ? LIMIT k`:
    * when the metadata predicate is SELECTIVE, probing the vector
    * index and filtering after is wasteful-to-wrong (the index
    * surfaces mostly non-matching neighbors and k survivors may not
    * exist in the probed cells without deep over-fetch) — the right
    * plan fetches exactly the matching rows through the SAI postings
    * and brute-forces them; when the predicate is UNSELECTIVE the
    * filtered set is corpus-sized and only the IVF probe (with the
    * predicate as a residual) stays index-shaped. The decision input
    * is the postings COUNT — an index-sized aggregate, never a corpus
    * scan, exactly the statistics read a Cassandra 5 SAI query plan
    * does. Both branches are EXACT (pre scores every matching row;
    * post is [[saiAnnSearch]]'s bound-complete probe), so one
    * brute-force oracle covers whichever branch the count picks —
    * correctness is decision-independent, only the plan shape moves.
    * The declared face runs one selective probe (a bounded vec_id
    * range: ~20 matches at ANY corpus size — the "search my recent
    * partition" query) and one unselective probe (label only: grows
    * with the corpus), exercising both branches on every fixture. */
  private[graft] def saiAnnAdaptive(s: SparkSession, dir: String,
      labelSel: Int, lo: Long, hi: Long, k: Int,
      threshold: Long = 32): (DataFrame, SaiAnnAdaptiveChoice) = {
    val root = saiAnnPath(s, dir)
    val qPred = col("vec_id") >= 5 && col("vec_id") <= 8
    val residual = col("vec_id").between(lo, hi)
    val idx = s.read.parquet(s"$root/idx_label")
      .filter(col("label") === labelSel && col("vec_id").between(lo, hi))
    val nCand = idx.count() // index-sized statistics read
    if (nCand > threshold) {
      val (df, _) = saiAnnSearch(s, dir, labelSel, k, nprobe = 4,
        residual = residual, qPred = qPred)
      (df.withColumn("mode", lit("post")),
        SaiAnnAdaptiveChoice("post", nCand, Nil))
    } else {
      // postings rows double as row ADDRESSES: (gen, cell) names the
      // leaf, vec_id the row — collect is gated at `threshold`, the
      // same bounded-planning-relation class as the centroids
      val cands = idx.select("_gen", "cell", "vec_id").collect()
      val w = Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("vec_id").asc)
      val qs = Tables.embeddings(s, dir).filter(qPred)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      if (cands.isEmpty) {
        val e = Tables.embeddings(s, dir).filter(lit(false))
          .select(col("vec_id").as("query_id"), col("vec_id"), col("label"),
            lit(0.0).as("score"), lit(0).as("rk"), lit("pre").as("mode"))
        return (e, SaiAnnAdaptiveChoice("pre", nCand, Nil))
      }
      val leaves = cands.map(r => (r.getLong(0), r.getInt(1)))
        .distinct.sorted.toSeq
      val ids = cands.map(_.getLong(2)).toSeq
      val fetched = s.read.option("basePath", s"$root/data")
        .parquet(leaves.map { case (g, c) => s"$root/data/_gen=$g/cell=$c" }: _*)
        .filter(col("vec_id").isin(ids: _*)) // ≤ threshold ids
      // bounded cross: ≤ threshold candidate rows × the 4 query
      // vectors — gated by the branch condition itself
      val out = fetched.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), col("label"),
          round(graft.functions.Vectors.fdot(col("embedding"), col("qvec")), 6)
            .as("score"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .withColumn("mode", lit("pre"))
      (out, SaiAnnAdaptiveChoice("pre", nCand, leaves))
    }
  }

  def scanSaiAnnAdaptive(s: SparkSession, dir: String): DataFrame = {
    val pre = saiAnnAdaptive(s, dir, labelSel = 2, lo = 0L, hi = 199L, k = 6)._1
    val post = saiAnnAdaptive(s, dir, labelSel = 2, lo = 0L,
      hi = 1L << 50, k = 6)._1
    pre.unionByName(post)
      .select("mode", "query_id", "vec_id", "label", "score", "rk")
      .orderBy("mode", "query_id", "rk")
  }

  /** 2-D range aggregate answered from the Hilbert-clustered copy —
    * the sink_zorder surface on the better curve (different slice so
    * the two queries aren't duplicates). Layout is output-invisible ⇒
    * oracle runs the same aggregate on the original table. */
  def sinkHilbertStats(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(hilbertLineitemPath(s, dir))
      .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1997-07-01" &&
        col("l_orderkey") < 5000)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_items"),
        graft.core.Num.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")

  /** 2-D range aggregate answered from the z-ordered copy: BOTH the
    * date predicate and the key predicate prune files/row-groups via
    * column stats (PlanSpec measures each dimension alone against the
    * linear-sorted layout, where the trailing column prunes nothing).
    * Layout must be output-invisible ⇒ oracle runs on the original. */
  def sinkZorderStats(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(zorderLineitemPath(s, dir))
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-07-01" &&
        col("l_orderkey") < 5000)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_items"),
        graft.core.Num.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")

  /** Sorted-write layout + row-group skipping: write lineitem sorted
    * on (l_shipdate, l_orderkey), then answer a one-month date-range
    * aggregate from the sorted copy. The filter pushes to the parquet
    * reader, whose row-group min/max stats eliminate ~99% of the
    * groups before a single value is decoded — PlanSpec measures the
    * scan's numOutputRows against an UNSORTED control copy of the same
    * data (sorted reads a small multiple of the matching rows; the
    * control decodes every row-group it can't exclude). The layout
    * must be output-invisible, so the oracle runs the same aggregate
    * on the ORIGINAL parquet — codec/layout drift would hash-mismatch
    * (same discipline as source_orc). */
  def sinkSortedStats(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(sortedLineitemPath(s, dir))
      .filter(col("l_shipdate") >= "1998-06-01" && col("l_shipdate") < "1998-07-01")
      .groupBy("l_shipdate")
      .agg(
        count(lit(1)).as("n_items"),
        graft.core.Num.dsum(col("l_quantity")).as("sum_qty"),
        graft.core.Num.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_shipdate")

  /** Parquet source/sink round-trip (the engine's storage layer). The
    * sink half is exercised by Verify's own parquet write of this
    * result. */
  def sourceParquet(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir).orderBy("s_suppkey")

  /** Materialized-view maintenance: re-key orders by customer (the MV
    * partition key) and sort within partitions by date — the
    * wide-column MV contract. At scale this is one shuffle, writer-side
    * partitioned; the global orderBy exists only for the oracle hash.
    */
  def sinkMv(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .repartition(col("o_custkey"))
      .sortWithinPartitions("o_custkey", "o_orderdate", "o_orderkey")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")

  /** Partition pruning: write events hive-partitioned by event_type,
    * read back one partition — the scan touches only that directory
    * (PartitionFilters, asserted in PlanSpec). The storage-layout
    * twin of Cassandra's partition-key routing, and the first lever
    * for 100 TB scans (date/type partitioning). */
  def scanPartitionPruned(s: SparkSession, dir: String): DataFrame = {
    val path = graft.core.RunId.scratch("partitioned/events_by_type")
    Tables.events(s, dir).write.partitionBy("event_type").mode("overwrite").parquet(path)
    s.read.parquet(path)
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  /** Dynamic-partition overwrite of `df`'s partitions under `path`:
    * only partitions present in `df` are replaced; every other
    * partition's files are untouched (asserted byte-for-byte in
    * PlanSpec). Shared by [[backfillPartitioned]] and the spec. */
  private[graft] def overwritePartitions(df: DataFrame, path: String): Unit =
    df.write.partitionBy("event_type")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(path)

  /** Partition backfill — the INSERT OVERWRITE PARTITION workhorse of
    * a 100 TB pipeline: one partition of a partitioned table is
    * recomputed (here: a value correction on `click`) and replaced
    * in place via DYNAMIC partition overwrite, which rewrites only
    * the partitions the batch contains — static overwrite mode would
    * truncate the whole table, and a delete-then-append is not
    * atomic per partition. Every other partition's files are not
    * rewritten (PlanSpec snapshots them around the backfill). The
    * layout is output-invisible ⇒ the oracle applies the same
    * correction to the original table. */
  private val backfillRoots =
    new graft.core.BuildOnce[String, String]
  def backfillPartitioned(s: SparkSession, dir: String): DataFrame = {
    val path = backfillRoots.getOrElseUpdate(dir, {
      val p = graft.core.RunId.scratchKeyed("backfill/events_by_type", dir)
      val ev = Tables.events(s, dir)
        .select("event_id", "user_id", "value", "event_type")
      ev.write.partitionBy("event_type").mode("overwrite").parquet(p)
      overwritePartitions(
        ev.filter(col("event_type") === "click")
          .withColumn("value", col("value") + lit(10.0)), p)
      p
    })
    s.read.parquet(path)
      .select("event_id", "user_id", "value", "event_type")
      .orderBy("event_id")
  }

  /** Star-schema join with DYNAMIC partition pruning — the canonical
    * Spark scale pattern for dimension-filtered fact scans: the fact
    * table is hive-partitioned on the join key, the dimension side is
    * filtered at runtime, and Catalyst injects a dynamicpruning
    * subquery on the fact scan so only the partitions matching the
    * filtered dimension keys are ever LISTED or read. Static pruning
    * cannot do this — the matching keys are not known until the dim
    * filter runs. At 100 TB this is the first lever after layout:
    * the fact side reads 2 of 5 partitions here, and the same plan
    * reads dim-selected partitions out of thousands in production.
    * PlanSpec asserts the dynamicpruning filter (the sim_topk_ivf
    * precedent); the channel map is a domain-bounded literal relation
    * (the broadcast side DPP requires). */
  private val dppFactRoots =
    new graft.core.BuildOnce[String, String]
  def joinDpp(s: SparkSession, dir: String): DataFrame = {
    val path = dppFactRoots.getOrElseUpdate(dir, {
      val p = graft.core.RunId.scratchKeyed("dpp/events_by_type", dir)
      Tables.events(s, dir)
        .select("event_id", "user_id", "value", "event_type")
        .write.partitionBy("event_type").mode("overwrite").parquet(s"$p/fact")
      // the dim must be a TABLE, not a literal relation: Catalyst
      // folds a filtered LocalRelation before the PartitionPruning
      // rule looks for a selective predicate, and DPP never fires
      import s.implicits._
      Seq(("click", "web"), ("view", "web"), ("purchase", "checkout"),
        ("signup", "checkout"), ("error", "ops"))
        .toDF("event_type", "channel")
        .coalesce(1).write.mode("overwrite").parquet(s"$p/dim")
      p
    })
    val dim = s.read.parquet(s"$path/dim")
    s.read.parquet(s"$path/fact")
      .join(dim.filter(col("channel") === "web"), "event_type")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        graft.core.Num.dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** Secondary-index emulation (SURVEY.md §1.1): a precomputed
    * inverted-index table — (indexed_value, row_key) ROWS, never a
    * per-value array, so no aggregation buffer grows with the number
    * of matching rows — answers a point lookup on a non-key column,
    * then joins back to fetch rows, the pattern a SASI/2i index plays
    * inside the wide-column store. Result ≡ the plain filter
    * (oracle-checked). At 100 TB: the index is written once
    * partitioned by value; the probe is a pruned scan of one value
    * partition + a join back on the row key. */
  def scanSecondaryIndex(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val index = events.select(col("event_type"), col("event_id"))
    val keys = index.filter(col("event_type") === "signup").select("event_id")
    events.join(broadcast(keys), "event_id")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  /** One oracle for BOTH halves of the vector delete lifecycle: the
    * tombstone-masked read over the pre-compaction layout and the
    * clean read over the purged layout must answer identically. */
  private val SaiAnnTombstoneOracle: String = """
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec
        FROM embeddings WHERE vec_id < 5),
      d AS (
        SELECT q.query_id, e.vec_id, e.label,
          ROUND(list_aggregate(list_transform(range(1, len(e.embedding) + 1),
            i -> CAST(e.embedding[i] * q.qvec[i] AS DOUBLE)), 'sum'), 6) AS score
        FROM embeddings e, q
        WHERE e.vec_id <> q.query_id AND e.label = 2
          AND e.vec_id % 7 <> 2),
      r AS (
        SELECT query_id, vec_id, label, score,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY score DESC, vec_id ASC) AS rk
        FROM d)
      SELECT query_id, vec_id, label, score, rk FROM r
      WHERE rk <= 8 ORDER BY query_id, rk"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_secondary_index" -> (scanSecondaryIndex _),
    "scan_partition_pruned" -> (scanPartitionPruned _),
    "scan_full" -> (scanFull _),
    "scan_partition_lookup" -> (scanPartitionLookup _),
    "scan_clustering_range" -> (scanClusteringRange _),
    "scan_pk_in" -> (scanPkIn _),
    "scan_token_range" -> (scanTokenRange _),
    "scan_paging" -> (scanPaging _),
    "scan_paging_pplimit" -> (scanPagingPplimit _),
    "scan_schema_evolution" -> (scanSchemaEvolution _),
    "source_parquet" -> (sourceParquet _),
    "source_csv" -> (sourceCsv _),
    "source_json" -> (sourceJson _),
    "source_orc" -> (sourceOrc _),
    "sink_mv" -> (sinkMv _),
    "sink_sorted_stats" -> (sinkSortedStats _),
    "scan_manifest_pruned" -> (scanManifestPruned _),
    "scan_bloom_pruned" -> (scanBloomPruned _),
    "scan_sai" -> (scanSai _),
    "scan_allow_filtering" -> (scanAllowFiltering _),
    "scan_sai_or" -> (scanSaiOr _),
    "scan_sai_contains" -> (scanSaiContains _),
    "scan_sai_ann" -> (scanSaiAnn _),
    "scan_sai_ann_paged" -> (scanSaiAnnPaged _),
    "scan_sai_ann_memtable" -> (scanSaiAnnMem _),
    "stream_ann_memtable" -> (streamAnnMemtable _),
    "scan_sai_ann_tombstone" -> (scanSaiAnnTombstone _),
    "compact_ann_purge" -> (compactAnnPurge _),
    "scan_sai_ann_adaptive" -> (scanSaiAnnAdaptive _),
    "scan_sai_contains_key" -> (scanSaiContainsKey _),
    "scan_sai_map_entry" -> (scanSaiMapEntry _),
    "scan_sai_range" -> (scanSaiRange _),
    "scan_sai_memtable" -> (scanSaiMemtable _),
    "backfill_partitioned" -> (backfillPartitioned _),
    "join_dpp" -> (joinDpp _),
    "sink_zorder" -> (sinkZorderStats _),
    "sink_hilbert" -> (sinkHilbertStats _)
  )

  val oracles: Map[String, String] = Map(
    "scan_secondary_index" -> """
      SELECT event_id, user_id, event_type, value FROM events
      WHERE event_type = 'signup' ORDER BY event_id""",
    "scan_partition_pruned" -> """
      SELECT event_id, user_id, event_type, value FROM events
      WHERE event_type = 'purchase' ORDER BY event_id""",
    "scan_full" ->
      s"SELECT * FROM lineitem ORDER BY $lineitemOrderSql",
    "scan_partition_lookup" ->
      s"SELECT * FROM lineitem WHERE l_orderkey = 42 ORDER BY $lineitemOrderSql",
    "scan_clustering_range" ->
      s"SELECT * FROM lineitem WHERE l_orderkey = 7 AND l_linenumber > 1 ORDER BY $lineitemOrderSql",
    "scan_pk_in" ->
      "SELECT * FROM orders WHERE o_orderkey IN (1, 7, 42, 99, 123) ORDER BY o_orderkey",
    "scan_paging" ->
      "SELECT * FROM orders WHERE o_orderkey > 400 ORDER BY o_orderkey LIMIT 200",
    "scan_paging_pplimit" -> """
      SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_custkey > 150) t
      WHERE rn <= 2 ORDER BY o_custkey, rn LIMIT 200""",
    "scan_schema_evolution" -> """
      SELECT o_orderkey, o_custkey,
        CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice ELSE NULL END AS o_totalprice
      FROM orders ORDER BY o_orderkey""",
    "source_parquet" ->
      "SELECT * FROM supplier ORDER BY s_suppkey",
    "source_csv" -> """
      SELECT event_id, user_id, event_type, value
      FROM events ORDER BY event_id""",
    "source_orc" -> """
      SELECT event_id, user_id, event_type, value, ts
      FROM events ORDER BY event_id""",
    "source_json" -> """
      SELECT event_id, event_type, props,
        CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k_value
      FROM events ORDER BY event_id""",
    "sink_mv" ->
      "SELECT * FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey",
    "sink_sorted_stats" -> s"""
      SELECT l_shipdate,
        CAST(COUNT(*) AS BIGINT) AS n_items,
        ${graft.core.Num.sqlDsum("l_quantity")} AS sum_qty,
        ${graft.core.Num.sqlDsum("l_extendedprice")} AS sum_price
      FROM (SELECT CAST(l_shipdate AS DATE) AS l_shipdate,
                   l_quantity, l_extendedprice FROM lineitem)
      WHERE l_shipdate >= '1998-06-01' AND l_shipdate < '1998-07-01'
      GROUP BY l_shipdate ORDER BY l_shipdate""",
    "join_dpp" -> s"""
      SELECT e.event_type, COUNT(*) AS n,
        ${graft.core.Num.sqlDsum("e.value")} AS sum_value
      FROM events e
      JOIN (SELECT * FROM (VALUES
              ('click', 'web'), ('view', 'web'), ('purchase', 'checkout'),
              ('signup', 'checkout'), ('error', 'ops'))
            AS t(event_type, channel)) d
        ON e.event_type = d.event_type
      WHERE d.channel = 'web'
      GROUP BY e.event_type ORDER BY e.event_type""",
    "backfill_partitioned" -> """
      SELECT event_id, user_id,
        CASE WHEN event_type = 'click' THEN value + 10.0 ELSE value END
          AS value,
        event_type
      FROM events ORDER BY event_id""",
    // layout + bloom are output-invisible: same point read, original table
    "scan_bloom_pruned" -> """
      SELECT event_id, user_id, event_type, value
      FROM events WHERE event_id = 777 ORDER BY event_id""",
    // SAI index + generation layout are output-invisible: same
    // two-predicate filter on the original table (k extraction is the
    // source_json regexp, shared string)
    // every est_rows stated on the base table: the postings are
    // complete over the substrate by construction, so index-path
    // counts equal base-table predicate counts
    "scan_allow_filtering" -> """
      SELECT CAST(1 AS INTEGER) AS probe_id, 'user_id = 7' AS predicate,
        'sai_index' AS path, FALSE AS requires_allow_filtering,
        CAST(count(*) AS BIGINT) AS est_rows
      FROM events WHERE user_id = 7
      UNION ALL
      SELECT 2, 'k BETWEEN 80 AND 99', 'sai_index', FALSE, CAST(count(*) AS BIGINT)
      FROM events
      WHERE CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER)
        BETWEEN 80 AND 99
      UNION ALL
      SELECT 3, 'user_id = 7 AND k BETWEEN 80 AND 99', 'sai_intersection',
        FALSE, CAST(count(*) AS BIGINT)
      FROM events
      WHERE user_id = 7
        AND CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER)
          BETWEEN 80 AND 99
      UNION ALL
      SELECT 4, 'value > 100.0', 'full_scan', TRUE, CAST(count(*) AS BIGINT)
      FROM events WHERE value > 100.0
      UNION ALL
      SELECT 5, 'event_type = ''click''', 'full_scan', TRUE,
        CAST(count(*) AS BIGINT)
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT 6, 'user_id = 7 AND value > 100.0', 'sai_index_residual', TRUE,
        CAST(count(*) AS BIGINT)
      FROM events WHERE user_id = 7 AND value > 100.0
      ORDER BY probe_id""",
    "scan_sai" -> """
      SELECT event_id, user_id, event_type, value,
        CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k
      FROM events
      WHERE user_id = 7
        AND CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER)
              BETWEEN 80 AND 99
      ORDER BY event_id""",
    "scan_sai_or" -> """
      SELECT event_id, user_id, event_type, value,
        CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k
      FROM events
      WHERE user_id = 3
         OR CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) >= 97
      ORDER BY event_id""",
    // collection index + layout are output-invisible: same double
    // CONTAINS on the original table
    "scan_sai_contains" -> """
      SELECT doc_id, lang, n_chars,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words
      FROM documents
      WHERE list_contains(string_split(text, ' '), 'dup')
        AND list_contains(string_split(text, ' '), 'vector')
      ORDER BY doc_id""",
    // map layout + entry postings are output-invisible: the map is
    // word → occurrence count, so CONTAINS KEY ≡ list_contains over
    // the distinct words and the entry value ≡ the occurrence count
    "scan_sai_contains_key" -> """
      SELECT doc_id, lang,
        CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_keys,
        CAST(len(list_filter(string_split(text, ' '), w -> w = 'dup'))
          AS INTEGER) AS n_occurrences
      FROM documents
      WHERE list_contains(string_split(text, ' '), 'dup')
      ORDER BY doc_id""",
    "scan_sai_map_entry" -> """
      SELECT doc_id, lang,
        CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_keys
      FROM documents
      WHERE len(list_filter(string_split(text, ' '), w -> w = 'spark')) = 5
      ORDER BY doc_id""",
    // flush-ordered layout + numeric postings + segment metadata are
    // output-invisible: the oracle is the plain range filter
    "scan_sai_range" -> """
      SELECT event_id, user_id, event_type, value, ts
      FROM events
      WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                   AND TIMESTAMP '2024-01-13 00:00:00'
      ORDER BY event_id""",
    // flushed/memtable split + layout are output-invisible; `flushed`
    // restates which side of the flush cut the row falls on
    "scan_sai_memtable" -> """
      SELECT event_id, user_id, event_type, value,
             (ts < TIMESTAMP '2024-01-25 00:00:00') AS flushed
      FROM events
      WHERE user_id = 5
      ORDER BY event_id""",
    // generation layout + vector index + bounds are output-invisible
    // and the probe is provably exact, so the oracle is brute-force
    // filtered top-k on the original table (sim_topk_filtered's
    // float-mirror discipline: FLOAT products CAST to DOUBLE,
    // accumulated left-to-right)
    "scan_sai_ann" -> """
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec
        FROM embeddings WHERE vec_id < 5),
      d AS (
        SELECT q.query_id, e.vec_id, e.label,
          ROUND(list_aggregate(list_transform(range(1, len(e.embedding) + 1),
            i -> CAST(e.embedding[i] * q.qvec[i] AS DOUBLE)), 'sum'), 6) AS score
        FROM embeddings e, q
        WHERE e.vec_id <> q.query_id AND e.label = 2),
      r AS (
        SELECT query_id, vec_id, label, score,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY score DESC, vec_id ASC) AS rk
        FROM d)
      SELECT query_id, vec_id, label, score, rk FROM r
      WHERE rk <= 8 ORDER BY query_id, rk""",
    // the paged read is the same exact top-k in pages of 4: the keyset
    // walk over the once-computed probe is positionally identical to
    // slicing the brute-force ranking (ties break on vec_id in both)
    "scan_sai_ann_paged" -> """
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec
        FROM embeddings WHERE vec_id < 5),
      d AS (
        SELECT q.query_id, e.vec_id, e.label,
          ROUND(list_aggregate(list_transform(range(1, len(e.embedding) + 1),
            i -> CAST(e.embedding[i] * q.qvec[i] AS DOUBLE)), 'sum'), 6) AS score
        FROM embeddings e, q
        WHERE e.vec_id <> q.query_id AND e.label = 2),
      r AS (
        SELECT query_id, vec_id, label, score,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY score DESC, vec_id ASC) AS rk
        FROM d)
      SELECT query_id, CAST((rk - 1) // 4 AS BIGINT) AS page,
             CAST((rk - 1) % 4 + 1 AS BIGINT) AS page_rk,
             vec_id, label, score
      FROM r WHERE rk <= 12 ORDER BY query_id, page, page_rk""",
    // the masked read = brute force minus the deleted ids (tombstone
    // split SQL-expressible)
    "scan_sai_ann_tombstone" -> SaiAnnTombstoneOracle,
    // compaction is invisible to reads: the purged-layout clean read
    // answers the SAME oracle as the masked pre-compaction read —
    // sharing the string IS the no-drift pin
    "compact_ann_purge" -> SaiAnnTombstoneOracle,
    // both arms exact on their partition of the corpus ⇒ the union
    // rank is the exact corpus answer; the memtable split (pmod 10 ==
    // 3) is stated directly as the flushed flag
    "scan_sai_ann_memtable" -> """
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec
        FROM embeddings WHERE vec_id >= 5 AND vec_id < 10),
      d AS (
        SELECT q.query_id, e.vec_id, e.label,
          ROUND(list_aggregate(list_transform(range(1, len(e.embedding) + 1),
            i -> CAST(e.embedding[i] * q.qvec[i] AS DOUBLE)), 'sum'), 6) AS score,
          (e.vec_id % 10 <> 3) AS flushed
        FROM embeddings e, q
        WHERE e.vec_id <> q.query_id AND e.label = 1),
      r AS (
        SELECT query_id, vec_id, label, score, flushed,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY score DESC, vec_id ASC) AS rk
        FROM d)
      SELECT query_id, vec_id, label, score, rk, flushed FROM r
      WHERE rk <= 8 ORDER BY query_id, rk""",
    // the flushed generations are first-class index members, so the
    // probe over base ∪ flushed is exact over the whole corpus — one
    // brute-force oracle, the flush batch stated by the id arithmetic
    "stream_ann_memtable" -> """
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec
        FROM embeddings WHERE vec_id >= 10 AND vec_id < 15),
      d AS (
        SELECT q.query_id, e.vec_id, e.label,
          ROUND(list_aggregate(list_transform(range(1, len(e.embedding) + 1),
            i -> CAST(e.embedding[i] * q.qvec[i] AS DOUBLE)), 'sum'), 6) AS score,
          CAST(CASE WHEN e.vec_id % 10 = 3 THEN 0
                    WHEN e.vec_id % 10 = 7 THEN 1
                    ELSE -1 END AS BIGINT) AS flush_batch
        FROM embeddings e, q
        WHERE e.vec_id <> q.query_id AND e.label = 0),
      r AS (
        SELECT query_id, vec_id, label, score, flush_batch,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY score DESC, vec_id ASC) AS rk
        FROM d)
      SELECT query_id, vec_id, label, score, rk, flush_batch FROM r
      WHERE rk <= 8 ORDER BY query_id, rk""",
    // both branches are exact, so the oracle is brute-force filtered
    // top-k per probe — which branch ran is invisible in the output
    "scan_sai_ann_adaptive" -> """
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec
        FROM embeddings WHERE vec_id BETWEEN 5 AND 8),
      d AS (
        SELECT m.mode, m.hi, q.query_id, e.vec_id, e.label,
          ROUND(list_aggregate(list_transform(range(1, len(e.embedding) + 1),
            i -> CAST(e.embedding[i] * q.qvec[i] AS DOUBLE)), 'sum'), 6) AS score
        FROM embeddings e, q,
          (VALUES ('pre', 199), ('post', 1125899906842624)) m(mode, hi)
        WHERE e.vec_id <> q.query_id AND e.label = 2
          AND e.vec_id BETWEEN 0 AND m.hi),
      r AS (
        SELECT mode, query_id, vec_id, label, score,
          ROW_NUMBER() OVER (PARTITION BY mode, query_id
                             ORDER BY score DESC, vec_id ASC) AS rk
        FROM d)
      SELECT mode, query_id, vec_id, label, score, rk FROM r
      WHERE rk <= 6 ORDER BY mode, query_id, rk""",
    "scan_manifest_pruned" -> s"""
      SELECT l_returnflag, l_linestatus,
        CAST(COUNT(*) AS BIGINT) AS n_items,
        ${graft.core.Num.sqlDsum("l_quantity")} AS sum_qty,
        ${graft.core.Num.sqlDsum("l_extendedprice")} AS sum_price
      FROM lineitem
      WHERE l_shipdate >= '1996-09-01' AND l_shipdate < '1996-12-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "sink_zorder" -> s"""
      SELECT l_returnflag,
        CAST(COUNT(*) AS BIGINT) AS n_items,
        ${graft.core.Num.sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem
      WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-07-01'
        AND l_orderkey < 5000
      GROUP BY l_returnflag ORDER BY l_returnflag""",
    "sink_hilbert" -> s"""
      SELECT l_returnflag,
        CAST(COUNT(*) AS BIGINT) AS n_items,
        ${graft.core.Num.sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem
      WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-07-01'
        AND l_orderkey < 5000
      GROUP BY l_returnflag ORDER BY l_returnflag""",
    // the murmur3 kernel stays Guava-anchored (Murmur3Spec); the
    // oracle applies the same (0, 2^60] ring-slice predicate to the
    // engine's persisted token relation (Ring.tokenPath)
    "scan_token_range" -> """
      SELECT o.* FROM orders o
      JOIN read_parquet('__TOK_ORDERS_PATH__/*.parquet') t
        ON o.o_orderkey = t.o_orderkey
      WHERE t.token > 0 AND t.token <= 1152921504606846975
      ORDER BY o.o_orderkey"""
  )
}
