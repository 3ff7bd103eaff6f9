package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: write a key-shifted ×N copy of the fixture tables so
  * operators can be measured at a scale factor the driver does not
  * ship. Fact tables get disjoint key ranges per copy (joins fan out
  * ×N against unchanged dimension keys); document text is perturbed
  * per copy so dedup operators measure pure scaling, not an artificial
  * all-copies-collide load.
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <outDir> <factor>
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val (src, out, n) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame)(mutate: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(i => mutate(df, i)).reduce(_ unionByName _)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    write(copies(spark.read.parquet(s"$src/lineitem.parquet")) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L))
    }, "lineitem")
    write(copies(spark.read.parquet(s"$src/orders.parquet")) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * 10000000L))
    }, "orders")
    // events go through the Tables reader so ts is written back as a
    // proper (µs, NTZ) timestamp column — raw nanos-as-long would make
    // the scaled dir unreadable by the DuckDB oracle path
    write(copies(graft.core.Tables.events(spark, src)) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * 1000000L))
    }, "events")
    write(copies(spark.read.parquet(s"$src/documents.parquet")) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("text", concat(col("text"), lit(s" copymark$i")))
        // keep the FIXTURES.md invariant n_chars = length(text)
        .withColumn("n_chars", length(col("text")))
    }, "documents")
    write(copies(spark.read.parquet(s"$src/embeddings.parquet")) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
    }, "embeddings")
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    spark.stop()
  }
}
