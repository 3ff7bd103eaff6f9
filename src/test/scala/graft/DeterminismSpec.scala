package graft

/** The single biggest t2 risk (SURVEY.md §7.4 #1): results must be
  * identical under different parallelism. Representative queries run
  * under shuffle.partitions 1 vs 4 and must collect identically. */
class DeterminismSpec extends SparkSpec {

  private val names = Seq(
    "q1_pricing", "join_asof", "win_lww", "stream_session",
    "dedup_near", "agg_udaf", "win_frame", "sim_topk",
    "set_except", "stream_sliding", "text_fingerprint", "dedup_jaccard",
    "multimodal_decode", "topk", "agg_gsets", "fn_json")

  for (name <- names) test(s"$name is partitioning-insensitive") {
    val fn = SparkEntry.queries(name)
    def run(parts: String): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try fn(spark, sf001).collect().toSeq.map(_.toString)
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(run("1") == run("4"))
  }
}
