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
      StreamingBatch, TextOps, Dedup, Similarity, Udfs, Multimodal, Headline, HeadlineFaces, CellStore,
      Repair, QualityModel, Ring, Search, Mixture, Perplexity, Shards, Analytics, Pipeline, Graph)

  private def merged[V](maps: Seq[Map[String, V]], what: String): Map[String, V] = {
    val keys = maps.flatMap(_.keys)
    val dups = keys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate $what ids across groups (one would silently win): ${dups.mkString(", ")}")
    maps.flatten.toMap
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(groups.map(_.queries), "query")
  def oracles: Map[String, String] = merged(groups.map(_.oracles), "oracle")
}
