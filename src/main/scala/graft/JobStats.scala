package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Dev utility (optimization rounds): time queries like [[TimeQuery]]
  * but also count the Spark jobs / stages / tasks each one launches —
  * the fixed-overhead lens: a query whose seconds track its job count
  * is paying scheduling, not compute (guide §1.2).
  *
  * Usage: runMain graft.JobStats <name> [name ...]
  */
object JobStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Listener events post asynchronously; a fixed sleep is a race for
    // queries with large task counts (ADVICE r16). listenerBus is
    // private[spark], so settle by polling the counters until they stop
    // moving (two consecutive 100 ms windows with no change, 5 s cap).
    def settle(): Unit = {
      var prev = (jobs.get, stages.get, tasks.get)
      var still = 0
      var waited = 0
      while (still < 2 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val cur = (jobs.get, stages.get, tasks.get)
        if (cur == prev) still += 1 else { still = 0; prev = cur }
      }
    }
    // one settle after the warmup job; inside the loop the pre-print
    // settle doubles as the next query's pre-read settle (no jobs run
    // between a print and the next iteration's counter read)
    settle()
    args.foreach { name =>
      val (j0, s0, t0c) = (jobs.get, stages.get, tasks.get)
      val t0 = System.nanoTime()
      val n = BenchKit.materialize(SparkEntry.queries(name)(spark, sfDir))
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      settle()
      println(f"[jobstats] $name ${dt}%.3f s jobs=${jobs.get - j0} " +
        f"stages=${stages.get - s0} tasks=${tasks.get - t0c} ($n rows)")
    }
    spark.stop()
  }
}
