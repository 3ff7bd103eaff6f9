package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Dev utility: bucket-occupancy histogram for the SRP threshold
  * bands, the diagnostic behind the sim_threshold_lsh candidate-volume
  * model. Candidate pairs per band are Σ size²/2 over its buckets, NOT
  * n²/2^bits — the uniform-occupancy estimate — whenever the embedding
  * distribution makes hyperplane signs correlated, so this prints both
  * (and the top buckets) to show which regime a corpus is in.
  *
  * Usage: runMain graft.BandStats <sfDir> <occupancy>
  */
object BandStats {
  def main(args: Array[String]): Unit = {
    val (dir, occ) = (args(0), args(1).toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    val n = emb.count()
    // The PRODUCTION banding, not a local re-derivation: a drifted
    // copy of the nbits formula / band count / seed scheme would make
    // this histogram describe bands the engine no longer uses.
    val bands = graft.operators.Similarity.thresholdBands(n, occ)
    val nbits = bands.head.size
    val banded = emb.select(col("vec_id"),
      posexplode(Vectors.srpBuckets(col("embedding"), bands))
        .as(Seq("band", "bucket")))
    val sizes = banded.groupBy("band", "bucket").count().localCheckpoint()
    val Array(r) = sizes
      .agg(count(lit(1)).as("nbuckets"), max("count").as("maxb"),
        sum(col("count") * (col("count") - 1) / 2).as("cand_pairs"))
      .collect()
    println(s"BANDSTATS n=$n nbits=$nbits occ_target=$occ " +
      s"nonempty_buckets=${r.getLong(0)} max_bucket=${r.getLong(1)} " +
      s"candidate_pairs=${r.getDouble(2).toLong} " +
      s"uniform_estimate=${8L * n * n / (1L << nbits) / 2}")
    println("TOP10 " + sizes.orderBy(desc("count")).limit(10).collect()
      .mkString(" | "))
    spark.stop()
  }
}
