package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}

/** Projection, filters, predicates (SURVEY.md §2.B).
  *
  * CQL restricts WHERE to key columns and has no OR; the engine
  * supports arbitrary boolean predicates as a superset. All predicates
  * stay in the declarative plan so Catalyst pushes them into the scan.
  */
object Filters extends QueryGroup {

  /** Column subset + computed column (CQL selection clause). */
  def project(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(Num.d2(col("l_extendedprice")) * (one - Num.d2(col("l_discount"))), 2)
          .cast("double").as("revenue"))
      // (l_orderkey, l_linenumber) is non-unique in the fixture —
      // revenue completes a total order (see Scans.lineitemOrder)
      .orderBy("l_orderkey", "l_linenumber", "revenue")
  }

  /** `=, <, >=, IN, AND, OR` conjunctions (OR is an engine superset). */
  def filterPred(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(
        (col("o_orderstatus") === "F" || col("o_totalprice") > 200000.0) &&
          col("o_orderkey") >= 100L &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
      .orderBy("o_orderkey")

  /** SASI-style LIKE prefix/substring match. */
  def filterLike(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_type").like("PRO%") || col("p_name").like("%er%"))
      .orderBy("p_partkey")

  /** CONTAINS on a collection column (tokenized text stands in for the
    * wide-column list cell). */
  def filterCollection(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(array_contains(split(col("text"), " "), "merge"))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** Null three-valued logic; the store's null = absent cell, modeled
    * with nullif-synthesized nulls (fixtures are null-free). */
  def filterNull(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("status_or_null", nullif(col("o_orderstatus"), lit("P")))
      .filter(col("status_or_null").isNull && col("o_totalprice").isNotNull)
      .select("o_orderkey", "o_orderstatus", "status_or_null")
      .orderBy("o_orderkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "project" -> (project _),
    "filter_pred" -> (filterPred _),
    "filter_like" -> (filterLike _),
    "filter_collection" -> (filterCollection _),
    "filter_null" -> (filterNull _)
  )

  val oracles: Map[String, String] = Map(
    "project" -> """
      SELECT l_orderkey, l_linenumber,
        CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
      FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue""",
    "filter_pred" -> """
      SELECT * FROM orders
      WHERE (o_orderstatus = 'F' OR o_totalprice > 200000.0)
        AND o_orderkey >= 100
        AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      ORDER BY o_orderkey""",
    "filter_like" -> """
      SELECT * FROM part
      WHERE p_type LIKE 'PRO%' OR p_name LIKE '%er%'
      ORDER BY p_partkey""",
    "filter_collection" -> """
      SELECT doc_id, lang, source FROM documents
      WHERE list_contains(string_split(text, ' '), 'merge')
      ORDER BY doc_id""",
    "filter_null" -> """
      SELECT o_orderkey, o_orderstatus, NULLIF(o_orderstatus, 'P') AS status_or_null
      FROM orders
      WHERE NULLIF(o_orderstatus, 'P') IS NULL AND o_totalprice IS NOT NULL
      ORDER BY o_orderkey"""
  )
}
