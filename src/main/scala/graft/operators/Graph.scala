package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Graph centrality over a relation-derived graph — the host-ranking
  * step of web-corpus curation (Common Crawl pipelines rank hosts by
  * link centrality before sampling; the same read re-expressed on the
  * engine's star schema: nations linked by trade volume).
  *
  * Scale shape (the 100 TB contract): the ONLY data-sized work is the
  * edge aggregation — one pass over the fact tables compacted
  * map-side onto the bounded (src, dst) node-pair domain. The
  * adjacency that reaches the driver is ≤ N² rows for the N-node
  * domain (N = 25 nations here; a host graph caps N by taking the
  * top-K hosts the same way) — the embedding_pca precedent: one
  * bounded aggregate, a driver-side iterative kernel on KB-sized
  * state, distributed everything else. Power iterations run in pure
  * 64-bit INTEGER fixed-point (ranks scaled 1e9, transition
  * probabilities scaled 1e6, every per-edge term floored
  * individually), so the result is bit-identical regardless of
  * partitioning, summation order, or engine — the kmeans_fit
  * fixed-point discipline applied to PageRank.
  */
object Graph extends QueryGroup {

  private val RS = 1000000000L // rank mass scale (1e9)
  private val PS = 1000000L    // transition-probability scale (1e6)
  private val D  = 850000L     // damping 0.85 in PS units
  private val ITERS = 5

  /** PageRank over the customer-nation → supplier-nation trade graph
    * (edge weight = lineitem count routed from a customer of nation
    * `src` to a supplier of nation `dst`), 5 damped power iterations.
    * Output: one row per nation, fixed-point rank (1e9 scale) plus the
    * same as a double fraction, ranked descending. */
  def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(s, dir).select("n_nationkey", "n_name")
    val li  = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val o   = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val c   = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")

    // Edge aggregation: the one fact-sized stage. lineitem⋈orders is
    // the orderkey co-shuffle every TPC-H face pays once; customer and
    // supplier are broadcast dims. Map-side combine compacts each task
    // to ≤ N² partial counts before the final shuffle.
    val edges = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))

    // Bounded driver state: ≤ N² = 625 (src, dst, w) rows + N node ids.
    val adj = edges.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val nodes = nation.select("n_nationkey").collect().map(_.getInt(0)).sorted
    val nN = nodes.length.toLong

    val outW = adj.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    // p(src→dst) = floor(w * PS / out(src)) — integer, order-free.
    val p = adj.map { case (src, dst, w) => (src, dst, w * PS / outW(src)) }

    var rank: Map[Int, Long] = nodes.map(k => k -> RS / nN).toMap
    for (_ <- 1 to ITERS) {
      val contrib = p.groupBy(_._2).view.mapValues(
        _.map { case (src, _, pp) => rank(src) * pp / PS }.sum).toMap
      val tele = (RS * (PS - D) / PS) / nN
      rank = nodes.map(k => k -> (tele + D * contrib.getOrElse(k, 0L) / PS)).toMap
    }

    val ranks = s.createDataFrame(rank.toSeq.map { case (k, r) => (k, r) })
      .toDF("k", "rank_fp")
    nation.join(broadcast(ranks), col("n_nationkey") === col("k"))
      .select(col("n_nationkey"), col("n_name"), col("rank_fp"),
        (col("rank_fp").cast("double") / RS).as("rank"))
      .orderBy(col("rank_fp").desc, col("n_nationkey"))
  }

  /** Triangle counting over the undirected nation trade graph — the
    * clustering-structure face next to [[graphPagerank]]'s
    * centrality: per-nation triangle participation via the
    * DEGREE-ORDERED orientation algorithm (public knowledge — the
    * standard MapReduce/GraphX scheme: orient every edge from its
    * (degree, id)-smaller endpoint, build wedges only at the smaller
    * endpoint, close them with a semi join). Each triangle is
    * produced EXACTLY once (its order-minimal vertex owns the wedge),
    * and the wedge count is Σ d_out(v)² with d_out bounded by
    * √(2·|E|) under this orientation — the property that keeps the
    * join tractable on skewed real graphs at 100 TB, where the naive
    * E⋈E explodes on hubs. The edge aggregation is the one fact-sized
    * stage (the graphPagerank shape: orderkey co-shuffle + broadcast
    * dims); everything after runs on the ≤ N² nation-pair relation.
    * Pure integer arithmetic ⇒ hash-exact. */
  def graphTriangles(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(s, dir).select("n_nationkey", "n_name")
    val li  = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val o   = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val c   = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val und = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(least(col("c_nationkey"), col("s_nationkey")).as("a"),
        greatest(col("c_nationkey"), col("s_nationkey")).as("b"))
      .distinct()
    // Bounded driver state, the graphPagerank precedent: the distinct
    // nation-pair edge relation is ≤ N² rows (N = 25), so collect it
    // ONCE and run orientation + wedge closing as a driver kernel.
    // The previous all-DataFrame formulation re-evaluated the
    // fact-sized edge aggregation for every reuse of `und` (deg ×2,
    // orient ×3, tri ×3 …) — explain("formatted") showed 181 parquet
    // scans / ~230 Exchanges; the ONE unavoidable fact-sized pass is
    // this collect (guide §1.1 first-principles / §2.4). Pure integer
    // arithmetic, same orientation and tie rules ⇒ identical rows.
    val edges = und.collect().map(r => (r.getInt(0), r.getInt(1)))
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // orient each edge from its (degree, id)-smaller endpoint; carry
    // the head's degree for the wedge ordering rule
    val orient = edges.map { case (a, b) =>
      val aFirst = deg(a) < deg(b) || (deg(a) == deg(b) && a < b)
      if (aFirst) (a, b, deg(b)) else (b, a, deg(a))
    }
    val orientSet = orient.map { case (u, v, _) => (u, v) }.toSet
    val tris = scala.collection.mutable.Map.empty[Int, Long]
    orient.groupBy(_._1).foreach { case (u, out) =>
      val vs = out.map { case (_, v, dv) => (v, dv) }
      for {
        (v1, dv1) <- vs; (v2, dv2) <- vs
        if dv1 < dv2 || (dv1 == dv2 && v1 < v2)
        if orientSet((v1, v2))
      } Seq(u, v1, v2).foreach(n => tris(n) = tris.getOrElse(n, 0L) + 1L)
    }
    import s.implicits._
    val part = tris.toSeq.toDF("node", "tris")
    nation.join(broadcast(part), col("n_nationkey") === col("node"), "left")
      .select(col("n_nationkey"), col("n_name"),
        coalesce(col("tris"), lit(0L)).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("n_nationkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (graphPagerank _),
    "graph_triangles" -> (graphTriangles _)
  )

  // Same integer fixed-point recurrence as chained CTEs; every SUM is
  // cast back to BIGINT (DuckDB sums BIGINT into HUGEINT — the
  // stats_corpus type-drift lesson).
  private def iterCte(i: Int): String = {
    val prev = if (i == 1) "r0" else s"r${i - 1}"
    s"""r$i AS (
      SELECT nn.k,
        (CAST(150000000 AS BIGINT) // nN)
          + (850000 * COALESCE(t.s, 0)) // 1000000 AS r
      FROM nn CROSS JOIN cnt LEFT JOIN (
        SELECT p.dst AS k, CAST(SUM((r.r * p.p) // 1000000) AS BIGINT) AS s
        FROM p JOIN $prev r ON p.src = r.k GROUP BY p.dst) t
      ON nn.k = t.k)"""
  }

  val oracles: Map[String, String] = Map(
    // the degree-ordered orientation restated verbatim: same
    // (degree, id) total order, same wedge ownership, same closing
    // semi join — pure integer arithmetic
    "graph_triangles" -> """
      WITH e0 AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey),
      und AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e0),
      deg AS (
        SELECT n, COUNT(*) AS d FROM (
          SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und)
        GROUP BY n),
      orient AS (
        SELECT
          CASE WHEN da.d < db.d OR (da.d = db.d AND u0.a < u0.b)
               THEN u0.a ELSE u0.b END AS u,
          CASE WHEN da.d < db.d OR (da.d = db.d AND u0.a < u0.b)
               THEN u0.b ELSE u0.a END AS v,
          CASE WHEN da.d < db.d OR (da.d = db.d AND u0.a < u0.b)
               THEN db.d ELSE da.d END AS dv
        FROM und u0
        JOIN deg da ON da.n = u0.a
        JOIN deg db ON db.n = u0.b),
      tri AS (
        SELECT e1.u, e1.v AS v1, e2.v AS v2
        FROM orient e1
        JOIN orient e2 ON e1.u = e2.u
          AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
        WHERE EXISTS (SELECT 1 FROM orient e3
                      WHERE e3.u = e1.v AND e3.v = e2.v)),
      part AS (
        SELECT node, COUNT(*) AS tris FROM (
          SELECT u AS node FROM tri
          UNION ALL SELECT v1 AS node FROM tri
          UNION ALL SELECT v2 AS node FROM tri)
        GROUP BY node)
      SELECT n.n_nationkey, n.n_name,
        CAST(COALESCE(p.tris, 0) AS BIGINT) AS n_triangles
      FROM nation n LEFT JOIN part p ON p.node = n.n_nationkey
      ORDER BY n_triangles DESC, n.n_nationkey""",
    "graph_pagerank" -> s"""
      WITH e AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2),
      outd AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY src),
      p AS (SELECT e.src, e.dst, (e.w * 1000000) // o.outw AS p
            FROM e JOIN outd o ON e.src = o.src),
      nn AS (SELECT n_nationkey AS k FROM nation),
      cnt AS (SELECT CAST(count(*) AS BIGINT) AS nN FROM nn),
      r0 AS (SELECT k, 1000000000 // nN AS r FROM nn CROSS JOIN cnt),
      ${(1 to ITERS).map(iterCte).mkString(",\n      ")}
      SELECT n.n_nationkey, n.n_name,
             CAST(r.r AS BIGINT) AS rank_fp,
             CAST(r.r AS DOUBLE) / 1000000000 AS rank
      FROM nation n JOIN r$ITERS r ON n.n_nationkey = r.k
      ORDER BY rank_fp DESC, n.n_nationkey"""
  )
}
