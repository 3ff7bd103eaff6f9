package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Sort / limit / top-k (SURVEY.md §2.F).
  *
  * CQL ORDER BY is per-partition clustering order; the engine's global
  * orderBy is a superset (range-partitioned sort at scale). Ordered
  * limits compile to Spark's TakeOrderedAndProject — a per-partition
  * top-k + driver merge, no global sort — which is exactly the 100 TB
  * execution you want for LIMIT/top-k.
  */
object SortLimit extends QueryGroup {

  /** ORDER BY clustering columns, mixed asc/desc. */
  def sortClustering(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 100L)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
      .orderBy(col("l_orderkey").asc, col("l_linenumber").desc)

  /** LIMIT n with explicit order (unordered limit is not stable). */
  def limitN(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).orderBy("o_orderkey").limit(50)

  /** Top-k by measure with unique-key tiebreak. */
  def topk(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_clustering" -> (sortClustering _),
    "limit_n" -> (limitN _),
    "topk" -> (topk _)
  )

  val oracles: Map[String, String] = Map(
    "sort_clustering" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      FROM lineitem WHERE l_orderkey < 100
      ORDER BY l_orderkey ASC, l_linenumber DESC""",
    "limit_n" ->
      "SELECT * FROM orders ORDER BY o_orderkey LIMIT 50",
    "topk" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"""
  )
}
