package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Last-write-wins read repair (SURVEY.md §1.1, §4.3).
  *
  * Cassandra reads merge cell versions by writetime, newest wins.
  * The engine models version history as plain rows and resolves LWW
  * with a rank-filter window: one shuffle on the key, and Spark's
  * WindowGroupLimit rewrite keeps only the top row per key before the
  * full window materializes.
  *
  * Library-function contract (no custom optimizer Rule): callers apply
  * [[latest]] FIRST, before user filters, so predicates never observe
  * superseded versions.
  */
object Lww {
  /** Newest row per key; `ordering` must totally order versions
    * (e.g. writetime desc, then a unique tiebreak desc). */
  def latest(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("_lww_rn", row_number().over(w))
      .filter(col("_lww_rn") === 1)
      .drop("_lww_rn")
  }
}
