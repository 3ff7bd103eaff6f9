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

    // Per-copy key shifts are FIXED (not max-derived: the planted-pair
    // convention puts synthetic ids at key+100000/+200000, and a
    // max-derived dense shift would collide with them) but now
    // asserted against the source's actual max key — a source that
    // already exceeds the offset (e.g. scaling an already-scaled dir)
    // previously produced silently colliding ids, corrupting LWW and
    // dedup measurements with no error (ADVICE r2).
    def shifted(df: DataFrame, keyCol: String, offset: Long)(
        extra: (DataFrame, Int) => DataFrame): DataFrame = {
      val maxKeyRaw = df.agg(max(col(keyCol))).head().get(0)
      require(maxKeyRaw != null,
        s"source table is empty (max($keyCol) is null) — nothing to scale; " +
          "check the src dir argument")
      val maxKey = maxKeyRaw.asInstanceOf[Number].longValue
      require(maxKey < offset,
        s"$keyCol max $maxKey >= per-copy offset $offset — copies would collide " +
          "(is the source already a scaled dir?)")
      copies(df) { (d, i) =>
        extra(d.withColumn(keyCol, col(keyCol) + lit(i * offset)), i)
      }
    }
    def noop(d: DataFrame, i: Int): DataFrame = d

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    write(shifted(spark.read.parquet(s"$src/lineitem.parquet"), "l_orderkey", 10000000L)(noop),
      "lineitem")
    write(shifted(spark.read.parquet(s"$src/orders.parquet"), "o_orderkey", 10000000L)(noop),
      "orders")
    // events go through the Tables reader so ts is written back as a
    // proper (µs, NTZ) timestamp column — raw nanos-as-long would make
    // the scaled dir unreadable by the DuckDB oracle path.
    // Each copy's timeline is shifted by a month: a real ×N event
    // corpus covers more time, it does not replay the same fortnight
    // N times — and un-shifted copies share timestamps, so interval
    // joins and sessionization gain O(copies²) cross-copy matches
    // that measure the FIXTURE, not the plan (the round-2 ×10 table's
    // stream_join outlier was exactly this artifact).
    write(shifted(graft.core.Tables.events(spark, src), "event_id", 1000000L) { (d, i) =>
      d.withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 31} DAYS"))
    }, "events")
    // Copies must be DISTINCT documents, not near-duplicates of the
    // source: tagging every 3rd word per copy puts one tagged word
    // into every 3-shingle (cross-copy Jaccard ≈ 0, cross-copy
    // simhash distance large) while leaving within-copy structure —
    // including the planted-mutation pairs the dedup operators
    // rediscover — equivalent. The old suffix-mark mutation kept ~97%
    // of shingles shared, so every doc became an N-way near-dup group
    // and dedup output grew quadratically by construction (~25 M
    // pairs at ×100 — a fixture artifact, not a plan property).
    write(shifted(spark.read.parquet(s"$src/documents.parquet"), "doc_id", 1000000L) { (d, i) =>
      if (i == 0) d
      else d.withColumn("text",
          array_join(expr("transform(split(text, ' '), (w, j) -> " +
            s"CASE WHEN j % 3 = 0 THEN concat(w, '~$i') ELSE w END)"), " "))
        // keep the FIXTURES.md invariant n_chars = length(text)
        .withColumn("n_chars", length(col("text")))
    }, "documents")
    // Per-copy ±1 diagonal sign flip: an ORTHOGONAL transform, so all
    // within-copy pairwise cosines are preserved exactly (xᵀD D y =
    // xᵀy) while cross-copy cosines collapse to ~0 — without it every
    // vector has N-1 identical twins and threshold-similarity output
    // grows ×N² by construction (measured 227× at ×10).
    write(shifted(spark.read.parquet(s"$src/embeddings.parquet"), "vec_id", 1000000L) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        expr(s"transform(embedding, (x, j) -> " +
          s"CASE WHEN pmod(xxhash64(j * 31 + $i), 2) = 0 THEN -x ELSE x END)"))
    }, "embeddings")
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    spark.stop()
  }
}
