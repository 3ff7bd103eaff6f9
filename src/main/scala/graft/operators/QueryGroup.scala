package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One object per SURVEY.md §2 group; SparkEntry concatenates them. */
trait QueryGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** DuckDB-runnable SQL per oracle-checkable query (subset of queries). */
  def oracles: Map[String, String]
}

object Registry {
  def groups: Seq[QueryGroup] =
    Seq(Aggregates, Scans, Filters, SortLimit, SetOps, Joins, Windows, ScalarFns,
      StreamingBatch, TextOps, Dedup, Similarity, Udfs, Multimodal, Headline)
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap
  def oracles: Map[String, String] = groups.flatMap(_.oracles).toMap
}
