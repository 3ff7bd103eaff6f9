package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Text

/** UDF/UDTF surface (SURVEY.md §2.J).
  *
  * CQL `CREATE FUNCTION` maps to a registered Scala UDF; the UDTF
  * (generator) need maps to posexplode of an array-producing
  * expression. Scaladoc note per §4.3: a UDF black-boxes the
  * optimizer (no pushdown through it, no codegen); the engine keeps
  * UDFs off hot paths — `udf_scalar` exists to cover the surface, and
  * its body is also expressible as the CASE expression the oracle
  * uses.
  */
object Udfs extends QueryGroup {

  /** CQL CREATE FUNCTION equivalent: a scalar price-band UDF. */
  def udfScalar(s: SparkSession, dir: String): DataFrame = {
    val priceBand = udf((p: Double) =>
      if (p < 50000.0) "low" else if (p < 150000.0) "mid" else "high")
    s.udf.register("price_band", priceBand)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"),
        priceBand(col("o_totalprice")).as("band"))
      .orderBy("o_orderkey")
  }

  /** UDTF/generator: explode 3-gram shingles with position. */
  def udtfShingle(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("doc_id") < 100)
      .withColumn("w", Text.words(col("text")))
      .select(col("doc_id"),
        posexplode(Text.shingles(col("w"), 3)).as(Seq("pos", "shingle")))
      .orderBy("doc_id", "pos")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "udf_scalar" -> (udfScalar _),
    "udtf_shingle" -> (udtfShingle _)
  )

  val oracles: Map[String, String] = Map(
    "udf_scalar" -> """
      SELECT o_orderkey, o_totalprice,
        CASE WHEN o_totalprice < 50000.0 THEN 'low'
             WHEN o_totalprice < 150000.0 THEN 'mid'
             ELSE 'high' END AS band
      FROM orders ORDER BY o_orderkey""",
    "udtf_shingle" -> """
      SELECT doc_id, i-1 AS pos, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
            WHERE doc_id < 100) t,
           LATERAL (SELECT unnest(range(1, len(w)-1)) AS i) g
      ORDER BY doc_id, pos"""
  )
}
