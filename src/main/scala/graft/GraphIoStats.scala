package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec

/** Dev utility: measures one graph-ANN walk round's edge-scan IO
  * against the whole persisted layout — the receipt behind the
  * VERDICT r12 weak #1 retirement (frontier-proportional, not
  * edge-list-proportional). Prints total layout files/edges, then for
  * a read-walk-sized frontier (beam × queries ids drawn from the real
  * entry table) the files actually opened and the rows the scan
  * emitted after partition pruning + the pushed src_id filter.
  *
  * Usage: runMain graft.GraphIoStats <sfDir> [frontierSize]
  */
object GraphIoStats {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val fsz = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.operators.Similarity.graphAnnPath(spark, dir)
    val graph = spark.read.parquet(s"$root/graph")
    val totalFiles = graph.inputFiles.length
    val totalEdges = graph.count()
    // a read-walk round's frontier: beam × queries ids, drawn from the
    // REAL entry table so the scan hits populated buckets
    val frontier = spark.read.parquet(s"$root/entries")
      .select("vec_id").distinct().orderBy("vec_id").limit(fsz)
      .collect().map(_.getLong(0))
    val df = graft.operators.Similarity.graphEdgesFor(spark, root, frontier)
    val emitted = df.collect().length
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f }
    val filesOpened = scans.map(_.metrics("numFiles").value).sum
    println(s"""{"layout_files":$totalFiles,"layout_edges":$totalEdges,""" +
      s""""frontier_ids":${frontier.length},"files_opened":$filesOpened,""" +
      s""""rows_emitted":$emitted}""")
    spark.stop()
  }
}
