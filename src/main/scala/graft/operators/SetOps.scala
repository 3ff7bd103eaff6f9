package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Set operations (SURVEY.md §2.G) — not in CQL; engine superset.
  *
  * Operands: the customer-key sets of finished ('F') vs open ('O')
  * orders. UNION/INTERSECT/EXCEPT all hash-partition both sides on the
  * full row — at scale these are single-shuffle aggregations, same
  * cost shape as a groupBy on the key.
  */
object SetOps extends QueryGroup {

  private def custkeys(s: SparkSession, dir: String, status: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === status)
      .select(col("o_custkey"))

  def setUnion(s: SparkSession, dir: String): DataFrame =
    custkeys(s, dir, "F").union(custkeys(s, dir, "O"))
      .distinct()
      .orderBy("o_custkey")

  def setIntersect(s: SparkSession, dir: String): DataFrame =
    custkeys(s, dir, "F").intersect(custkeys(s, dir, "O"))
      .orderBy("o_custkey")

  def setExcept(s: SparkSession, dir: String): DataFrame =
    custkeys(s, dir, "F").except(custkeys(s, dir, "O"))
      .orderBy("o_custkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_union" -> (setUnion _),
    "set_intersect" -> (setIntersect _),
    "set_except" -> (setExcept _)
  )

  val oracles: Map[String, String] = Map(
    "set_union" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY o_custkey""",
    "set_intersect" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY o_custkey""",
    "set_except" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY o_custkey"""
  )
}
