package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: restrict to named queries (iteration aid;
    // the driver always passes exactly two args → full run). Unknown
    // names are fatal — a typo writing zero outputs and exiting 0
    // would green-light a broken operator (same guard as Bench).
    val only = args.drop(2).toSet
    val unknown = only.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); Spark 4 rejects it
      // unless read as raw long (graft.core.Tables converts to µs).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Ride out multi-minute host freezes instead of letting the
      // 120 s heartbeat default kill the local context (see Bench).
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Artifact-path substitution (VERDICT r13 next #6): the
    // index-backed oracles read the engine's own persisted
    // StableStore parquet; their SQL carries `__..._PATH__` tokens
    // that only Verify — which knows the dir it just ran — can
    // resolve. Substitution happens here so the dumped JSON is
    // directly runnable by the driver's DuckDB.
    val subs = graft.operators.Similarity.oracleArtifactSubs(spark, sfDir) ++
      graft.operators.Aggregates.oracleArtifactSubs(spark, sfDir) ++
      graft.operators.QualityModel.oracleArtifactSubs(spark, sfDir) ++
      graft.operators.Ring.oracleArtifactSubs(spark, sfDir) ++
      graft.operators.Pipeline.oracleArtifactSubs(spark, sfDir) ++
      graft.operators.Dedup.oracleArtifactSubs(spark, sfDir)
    val json = SparkEntry.oracleSql
      .map { case (k, v0) =>
        val v = subs.foldLeft(v0) { case (acc, (tok, p)) => acc.replace(tok, p) }
        s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
