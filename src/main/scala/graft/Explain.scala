package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the executed plan (and optionally time) of one
  * declared query. Usage: runMain graft.Explain <name> [sfDir] [time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = if (args.length > 2) args(2) else ""
    // "time-full" measures what Bench measures: query CONSTRUCTION
    // (driver-side collects, checkpoints, plan compilation) + count.
    // It must run FIRST — constructing the query for explain would
    // warm every per-(JVM, dir) build cache (trained weights, sorted
    // layouts, IVF codes, BPE merges) and make run 1 report a
    // warm-cache cost Bench would never see. Run 1 alone carries the
    // one-time builds; later runs show the cached steady state.
    if (mode == "time-full") {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(s"full run $i: ${(System.nanoTime() - t0) / 1e9} s, $n rows")
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (mode == "time") {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(s"run $i: ${(System.nanoTime() - t0) / 1e9} s, $n rows")
      }
    }
    spark.stop()
  }
}
