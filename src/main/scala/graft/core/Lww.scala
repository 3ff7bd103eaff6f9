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
    * (e.g. writetime desc, then a unique tiebreak desc). The internal
    * rank column name is collision-checked against the input schema so
    * a caller column is never silently overwritten and dropped. */
  def latest(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val rn = Iterator.from(0).map(i => s"_lww_rn$i")
      .find(n => !df.columns.contains(n)).get
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Newest-wins merge INCLUDING delete markers (tombstones): the
    * newest version per key decides, and when it is a delete the key
    * is absent from the result — so CQL DELETE hides every older
    * upsert, and a later re-INSERT resurrects the key. `isDelete`
    * must be evaluable on the surviving row. Same single-shuffle
    * shape as [[latest]]; the tombstone filter is row-local. */
  def mergeTombstones(
      df: DataFrame, keys: Seq[String], ordering: Seq[Column], isDelete: Column): DataFrame =
    latest(df, keys, ordering).filter(!isDelete)
}
