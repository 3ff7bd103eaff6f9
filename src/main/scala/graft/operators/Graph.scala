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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (graphPagerank _)
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
