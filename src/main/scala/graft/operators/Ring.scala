package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.CassandraMurmur3
import graft.plans.CassTokenExpr

/** Token-ring topology operations (SURVEY.md §1.1 partition-key ring):
  * what `nodetool`-class cluster maintenance computes when membership
  * changes. A Cassandra cluster assigns each node a set of vnode
  * tokens on the Murmur3 ring; the node owning range `(prev, t]` is
  * the one holding `t` (successor ownership, wrapping). When a node
  * bootstraps, each of its new tokens splits an existing range and the
  * joining node STREAMS exactly that slice from the old owner — the
  * rest of the cluster's data does not move.
  *
  * The engine-side value is the streaming PLAN: which ranges move,
  * from whom, and how many rows ride each transfer. Because
  * [[CassTokenExpr]] is the real Murmur3Partitioner placement
  * function, the ranges this operator emits are the ranges a live
  * cluster would stream.
  *
  * Scale shape: the ring itself is a bounded driver-side domain
  * (nodes × vnodes tokens — here 4×4 + 4 joining), the moved-range
  * table is broadcast, and row accounting is one scan with a
  * broadcast range join + partial aggregation. Nothing driver-side
  * grows with data; at 100 TB the plan costs one pruned pass over the
  * keys in the moved slices (in a real layout, only the SSTables whose
  * token span intersects a moved range are read at all).
  */
object Ring extends QueryGroup {

  private val vnodesPerNode = 4
  private[graft] val joiningNode = 4

  /** Deterministic vnode tokens: node n's v-th vnode sits at the REAL
    * Murmur3 token of seed n*1000+v (seeds are arbitrary but fixed —
    * what `initial_token` pins in a real cluster). Sorted ring order. */
  private[graft] def vnodeTokens(nodes: Seq[Int]): Seq[(Long, Int)] =
    (for { n <- nodes; v <- 0 until vnodesPerNode }
      yield (CassandraMurmur3.tokenOfLong(n * 1000L + v), n)).sortBy(_._1)

  /** Successor ownership with wraparound: the owner of ring position
    * `t` is the node holding the smallest vnode token >= t, wrapping
    * to the globally smallest token. */
  private[graft] def ownerOf(ring: Seq[(Long, Int)], t: Long): Int =
    ring.find(_._1 >= t).getOrElse(ring.head)._2

  /** Bootstrap streaming plan: for each vnode token t of the joining
    * node, the slice `(pred_after(t), t]` (predecessor taken in the
    * POST-join ring, so two new tokens in one old range split it
    * correctly) moves from the pre-join owner of t to the joiner. No
    * other range changes hands — the Cassandra bootstrap invariant. */
  private[graft] def plan(before: Seq[(Long, Int)], newNode: Int)
      : Seq[(Long, Long, Int, Int)] = {
    val newTokens = vnodeTokens(Seq(newNode))
    val after = (before ++ newTokens).sortBy(_._1)
    newTokens.map { case (t, _) =>
      val idx = after.indexWhere(_._1 == t)
      val pred = after((idx - 1 + after.size) % after.size)._1
      (pred, t, ownerOf(before, t), newNode)
    }
  }

  /** Decommission plan — the inverse move: when `leaving` exits, each
    * of its ranges `(pred(t), t]` merges into the successor range and
    * streams TO the post-removal owner of t. Everything the leaver
    * held moves; nothing else does. */
  private[graft] def decommissionPlan(all: Seq[(Long, Int)], leaving: Int)
      : Seq[(Long, Long, Int, Int)] = {
    val after = all.filterNot(_._2 == leaving)
    all.filter(_._2 == leaving).map { case (t, _) =>
      val idx = all.indexWhere(_._1 == t)
      val pred = all((idx - 1 + all.size) % all.size)._1
      (pred, t, leaving, ownerOf(after, t))
    }
  }

  /** Wraparound spans split in two, so every range is a plain
    * `start < tok AND tok <= end` conjunction. MinValue as an open
    * lower bound is exact: Murmur3Partitioner normalizes
    * Long.MinValue to MaxValue, so no key ever sits AT MinValue.
    * The ONE definition of the convention — every ring operator's
    * range table goes through here. */
  private[graft] def wrapSpans(start: Long, end: Long): Seq[(Long, Long)] =
    if (start < end) Seq((start, end))
    else Seq((start, Long.MaxValue), (Long.MinValue, end))

  private[graft] def wrapSplit(ranges: Seq[(Long, Long, Int, Int)])
      : Seq[(Long, Long, Int, Int)] =
    ranges.flatMap { case (start, end, from, to) =>
      wrapSpans(start, end).map { case (a, b) => (a, b, from, to) }
    }

  private[graft] def movedRanges: Seq[(Long, Long, Int, Int)] =
    wrapSplit(plan(vnodeTokens(0 until joiningNode), joiningNode))

  private[graft] def decommissionRanges: Seq[(Long, Long, Int, Int)] =
    wrapSplit(decommissionPlan(vnodeTokens(0 until joiningNode), leavingNode))

  private[graft] val leavingNode = 3

  /** Per-range row counts over `events` (partition key = event_id, its
    * real ring position via `cass_token`). Ranges that happen to hold
    * zero keys stay in the plan with n_rows = 0 — the transfer still
    * exists. */
  private def withCounts(s: SparkSession, dir: String,
      ranges: Seq[(Long, Long, Int, Int)]): DataFrame = {
    import s.implicits._
    val moves = ranges.toDF("range_start", "range_end", "from_node", "to_node")
    val toks = Tables.events(s, dir)
      .select(CassTokenExpr.token(col("event_id")).as("tok"))
    val counts = toks
      .join(broadcast(moves),
        col("tok") > col("range_start") && col("tok") <= col("range_end"))
      .groupBy("range_start", "range_end", "from_node", "to_node")
      .agg(count(lit(1)).as("n_rows"))
    moves.join(counts,
        Seq("range_start", "range_end", "from_node", "to_node"), "left_outer")
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
      .orderBy("range_start", "range_end")
  }

  /** Bootstrap: node 4 joins the 4-node ring. */
  def ringRebalance(s: SparkSession, dir: String): DataFrame =
    withCounts(s, dir, movedRanges)

  /** Decommission: node 3 leaves the 4-node ring. */
  def ringDecommission(s: SparkSession, dir: String): DataFrame =
    withCounts(s, dir, decommissionRanges)

  // ---- NetworkTopologyStrategy placement (ring_multidc) ----------------
  // Topology: 8 nodes, dc1 = {0,1,2,3}, dc2 = {4,5,6,7}; two racks per
  // DC (nodes 0,1 / 4,5 on rack 0; 2,3 / 6,7 on rack 1).
  private[graft] val multidcNodes: Seq[Int] = 0 until 8
  private[graft] def dcOf(n: Int): String = if (n < 4) "dc1" else "dc2"
  private[graft] def rackOf(n: Int): Int = (n % 4) / 2

  /** Cassandra's NetworkTopologyStrategy walk for one range: starting
    * at the range's end token, walk the ring clockwise; per DC, a node
    * whose RACK is not yet represented becomes a replica immediately,
    * same-rack nodes are remembered as "skipped" and only fill the
    * remaining slots after the rack pass — so with rf=3 over 2 racks
    * every replica set spans BOTH racks (the guarantee that lets a
    * whole rack fail without losing quorum). Walk order is total and
    * deterministic; the whole computation is ring-domain bounded. */
  private[graft] def ntsReplicas(ring: Seq[(Long, Int)], startIdx: Int,
      rf: Int): Map[String, Seq[Int]] = {
    val dcs = Seq("dc1", "dc2")
    var replicas = Map("dc1" -> Vector.empty[Int], "dc2" -> Vector.empty[Int])
    var racks = Map("dc1" -> Set.empty[Int], "dc2" -> Set.empty[Int])
    var skipped = Map("dc1" -> Vector.empty[Int], "dc2" -> Vector.empty[Int])
    for (i <- ring.indices) {
      val node = ring((startIdx + i) % ring.size)._2
      val dc = dcOf(node)
      if (replicas(dc).size < rf && !replicas(dc).contains(node)) {
        if (!racks(dc).contains(rackOf(node))) {
          replicas = replicas.updated(dc, replicas(dc) :+ node)
          racks = racks.updated(dc, racks(dc) + rackOf(node))
        } else if (!skipped(dc).contains(node))
          skipped = skipped.updated(dc, skipped(dc) :+ node)
      }
    }
    for (dc <- dcs; n <- skipped(dc)
         if replicas(dc).size < rf && !replicas(dc).contains(n))
      replicas = replicas.updated(dc, replicas(dc) :+ n)
    replicas
  }

  /** Per-range NTS placement rows: (start, end, dc1 replicas, dc2
    * replicas) for every vnode range of the 8-node 2-DC ring, rf=3
    * per DC. Wraparound ranges stay whole here (the split happens in
    * the counting join). */
  private[graft] def multidcPlacement: Seq[(Long, Long, Seq[Int], Seq[Int])] = {
    val ring = vnodeTokens(multidcNodes)
    ring.indices.map { i =>
      val (t, _) = ring(i)
      val pred = ring((i - 1 + ring.size) % ring.size)._1
      val r = ntsReplicas(ring, i, 3)
      (pred, t, r("dc1"), r("dc2"))
    }
  }

  /** NetworkTopologyStrategy placement — the replica map behind
    * [[Repair.consistencyMultidc]]'s 2-DC quorum ledger: every vnode
    * range of the 8-node / 2-DC / 2-racks-per-DC ring placed at rf=3
    * PER DC by Cassandra's rack-aware walk, with per-range row
    * accounting over the real `cass_token` positions of `events`.
    * Both-racks coverage per DC is structural (KernelSpec pins it,
    * plus replica distinctness and row conservation). Scale shape:
    * identical to the other ring ops — bounded driver ring, broadcast
    * range table, one partial-aggregated scan. */
  def ringMultidc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = multidcPlacement.flatMap { case (start, end, d1, d2) =>
      wrapSpans(start, end).map { case (a, b) =>
        (a, b, d1(0), d1(1), d1(2), d2(0), d2(1), d2(2))
      }
    }
    val moves = rows.toDF("range_start", "range_end",
      "dc1_r1", "dc1_r2", "dc1_r3", "dc2_r1", "dc2_r2", "dc2_r3")
    val toks = Tables.events(s, dir)
      .select(CassTokenExpr.token(col("event_id")).as("tok"))
    val counts = toks
      .join(broadcast(moves.select("range_start", "range_end")),
        col("tok") > col("range_start") && col("tok") <= col("range_end"))
      .groupBy("range_start", "range_end")
      .agg(count(lit(1)).as("n_rows"))
    moves.join(counts, Seq("range_start", "range_end"), "left_outer")
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
      .orderBy("range_start", "range_end")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ring_rebalance" -> (ringRebalance _),
    "ring_decommission" -> (ringDecommission _),
    "ring_multidc" -> (ringMultidc _)
  )

  /** Bump when the token-table build arithmetic changes in a way no
    * parameter captures (oracle reads the same artifact; ADVICE r15). */
  private val RingKernelVer = 1
  private val tokenDirs = new graft.core.BuildOnce[String, String]

  /** Persisted (key → Murmur3 token) relation — DuckDB has no
    * murmur3-x64-128, so the token-family oracles (ring_*, fn_token,
    * scan_token_range) read the engine's own published token table
    * instead of recomputing the hash (VERDICT r14 next #4 stretch).
    * The HASH KERNEL itself stays Guava-anchored in Murmur3Spec; what
    * the oracle now hash-checks is everything downstream of it —
    * bucket arithmetic, range predicates, counting joins — plus the
    * kernel's cross-JVM determinism. */
  private[graft] def tokenPath(s: SparkSession, dir: String,
      table: String, keyCol: String): String =
    tokenDirs.getOrElseUpdate(s"$dir|$table|$keyCol", {
      val key = s"$table|$keyCol|" +
        graft.core.StableStore.inputKey(s, dir, s"$table.parquet")
      graft.core.StableStore.getOrBuild("cass_tokens_v1", key,
          RingKernelVer) { tmp =>
        val t = table match {
          case "orders" => Tables.orders(s, dir)
          case "events" => Tables.events(s, dir)
          case other => throw new IllegalArgumentException(
            s"no token relation defined for table $other")
        }
        t.select(col(keyCol), CassTokenExpr.token(col(keyCol)).as("token"))
          .write.mode("overwrite").parquet(tmp)
      }
    })

  /** Artifact-path substitutions for the token-family oracles (merged
    * by [[graft.Verify]] at dump time; Scans/ScalarFns share these). */
  private[graft] def oracleArtifactSubs(
      s: SparkSession, dir: String): Map[String, String] = Map(
    "__TOK_ORDERS_PATH__" -> tokenPath(s, dir, "orders", "o_orderkey"),
    "__TOK_EVENTS_PATH__" -> tokenPath(s, dir, "events", "event_id"))

  /** The streaming-plan oracle shape shared by rebalance/decommission:
    * the bounded ring plan interpolates as VALUES (pure function of
    * the fixed vnode seeds — the MinhashAffine precedent), counts come
    * from the persisted token relation. */
  private def ringOracle(rs: Seq[(Long, Long, Int, Int)]): String = s"""
      WITH moves(range_start, range_end, from_node, to_node) AS (
        VALUES ${rs.map { case (a, b, f, t) => s"($a, $b, $f, $t)" }
          .mkString(", ")}),
      toks AS (
        SELECT token FROM read_parquet('__TOK_EVENTS_PATH__/*.parquet')),
      counts AS (
        SELECT m.range_start, m.range_end, m.from_node, m.to_node,
          CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM moves m JOIN toks t
          ON t.token > m.range_start AND t.token <= m.range_end
        GROUP BY m.range_start, m.range_end, m.from_node, m.to_node)
      SELECT m.range_start, m.range_end, m.from_node, m.to_node,
        COALESCE(c.n_rows, 0) AS n_rows
      FROM moves m LEFT JOIN counts c
        ON m.range_start = c.range_start AND m.range_end = c.range_end
          AND m.from_node = c.from_node AND m.to_node = c.to_node
      ORDER BY m.range_start, m.range_end"""

  // The ring plans and NTS placement are bounded driver-side constants
  // (KernelSpec additionally verifies them against an independent
  // brute-force owner computation and a row-conservation law); the
  // oracles restate the counting join over the persisted token
  // relation, so the driver's hash now covers the data-dependent half.
  val oracles: Map[String, String] = Map(
    "ring_rebalance" -> ringOracle(movedRanges),
    "ring_decommission" -> ringOracle(decommissionRanges),
    "ring_multidc" -> {
      val rows = multidcPlacement.flatMap { case (start, end, d1, d2) =>
        wrapSpans(start, end).map { case (a, b) =>
          s"($a, $b, ${d1(0)}, ${d1(1)}, ${d1(2)}, ${d2(0)}, ${d2(1)}, ${d2(2)})"
        }
      }
      s"""
      WITH moves(range_start, range_end, dc1_r1, dc1_r2, dc1_r3,
                 dc2_r1, dc2_r2, dc2_r3) AS (
        VALUES ${rows.mkString(", ")}),
      toks AS (
        SELECT token FROM read_parquet('__TOK_EVENTS_PATH__/*.parquet')),
      counts AS (
        SELECT m.range_start, m.range_end,
          CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM (SELECT DISTINCT range_start, range_end FROM moves) m
        JOIN toks t
          ON t.token > m.range_start AND t.token <= m.range_end
        GROUP BY m.range_start, m.range_end)
      SELECT m.range_start, m.range_end, m.dc1_r1, m.dc1_r2, m.dc1_r3,
        m.dc2_r1, m.dc2_r2, m.dc2_r3, COALESCE(c.n_rows, 0) AS n_rows
      FROM moves m LEFT JOIN counts c
        ON m.range_start = c.range_start AND m.range_end = c.range_end
      ORDER BY m.range_start, m.range_end"""
    })
}
